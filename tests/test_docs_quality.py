"""Repetition + PII operators: properties the oracle can't see — degenerate
inputs (1-word docs, empty bigram sets), clean-text identity, and overlap
ordering (emails masked before their digits could look like phones/IPs)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_repetition_degenerate_and_known_values(spark):
    from uncharted_ta1_pipeline_spark.functions.docf import repetition_features

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),                 # one word repeated
            (2, "w"),                       # single word: no bigrams
            (3, "x y x y x y"),             # perfect 2-gram loop
            (4, "all words here differ"),   # no repetition
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in repetition_features(docs).collect()
    }
    assert out[1].dup_word_frac == 0.75          # 4 words, 1 distinct
    assert out[1].dup_2gram_frac == round(1 - 1 / 3, 6)
    assert out[1].top_2gram_share == 1.0
    assert out[2].dup_2gram_frac is None         # no bigrams -> NULL
    assert out[2].top_2gram_share is None
    assert out[2].dup_word_frac == 0.0
    # "x y x y x y": bigrams [xy, yx, xy, yx, xy] -> 2 distinct of 5
    assert out[3].dup_2gram_frac == 0.6
    assert out[3].top_2gram_share == 0.6         # 'x y' appears 3/5
    assert out[4].dup_word_frac == 0.0
    assert out[4].dup_2gram_frac == 0.0


def test_pii_mask_behaviors(spark):
    from uncharted_ta1_pipeline_spark.functions.docf import pii_mask

    docs = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@sub.example.org thanks"),
            (2, "server 192.168.10.250 and backup 10.0.0.1"),
            (3, "call 555-123-4567 or +155 555 1234 x"),
            (4, "perfectly clean text with no identifiers at all"),
            (5, "mixed bob@x.io from 8.8.8.8 dial 800-555-0199"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_mask(docs).collect()}
    assert out[1].masked_text == "reach me at <EMAIL> thanks"
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (1, 0, 0)
    assert out[2].masked_text == "server <IP> and backup <IP>"
    assert out[2].n_ips == 2
    # both space-separated numbers are phone-shaped; the '+' sits outside
    # the \b-anchored match and survives
    assert out[3].masked_text == "call <PHONE> or +<PHONE> x"
    assert out[3].n_phones == 2
    assert out[4].masked_text == out[4].text  # clean text is untouched
    assert (out[5].n_emails, out[5].n_ips, out[5].n_phones) == (1, 1, 1)
    assert out[5].masked_text == "mixed <EMAIL> from <IP> dial <PHONE>"
