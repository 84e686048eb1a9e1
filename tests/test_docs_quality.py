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


def test_bm25_known_values_and_length_normalization(spark):
    """Hand-computed BM25 (linear idf, k1=1.2, b=0.75) on a 2-doc corpus:
    N=2, avgdl=2.5; rare terms outrank common ones, and the shorter doc's
    rare term scores higher than the longer doc's (length normalization)."""
    from uncharted_ta1_pipeline_spark.functions.docf import bm25_top_terms

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog bird")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.rank): r for r in bm25_top_terms(docs, k=2).collect()
    }
    # doc1: idf(cat)=1.0, denom=2+1.2*(0.25+0.75*3/2.5)=3.38 -> 4.4/3.38
    assert (rows[(1, 1)].word, rows[(1, 1)].bm25) == ("cat", 1.301775)
    assert (rows[(1, 2)].word, rows[(1, 2)].bm25) == ("dog", 0.184874)
    # doc2: denom=1+1.2*(0.25+0.75*2/2.5)=2.02 -> 2.2/2.02
    assert (rows[(2, 1)].word, rows[(2, 1)].bm25) == ("bird", 1.089109)
    assert (rows[(2, 2)].word, rows[(2, 2)].bm25) == ("dog", 0.217822)
    # length normalization: same (tf, df) 'dog' scores higher in shorter doc
    assert rows[(2, 2)].bm25 > rows[(1, 2)].bm25


def test_bleu_clipping_and_empty_overlap(spark):
    """Clipped counts: a candidate repeating a reference word scores
    min(cand_count, ref_count), and disjoint bigrams give p2 = 0."""
    from uncharted_ta1_pipeline_spark.operators.evalm import bleu_precisions

    t = spark.createDataFrame(
        [
            # conv 1: cand "the the the" vs ref "the cat"
            (1, "user", "the cat", 1, 0),
            (1, "assistant", "the the the", 2, 1),
            # conv 2: exact match -> p1 = p2 = 1
            (2, "user", "a b c", 1, 0),
            (2, "assistant", "a b c", 2, 1),
            # conv 3: single-word candidate -> no bigrams, p2 null
            (3, "user", "x", 1, 0),
            (3, "assistant", "x", 2, 1),
        ],
        "conv_id long, role string, text string, ts long, turn_idx long",
    )
    rows = {r.conv_id: r for r in bleu_precisions(t).collect()}
    assert (rows[1].clip1, rows[1].p1) == (1, 0.333333)  # min(3, 1) / 3
    assert (rows[1].clip2, rows[1].p2) == (0, 0.0)       # 'the the' not in ref
    assert (rows[2].p1, rows[2].p2) == (1.0, 1.0)
    assert rows[3].n2 == 0 and rows[3].p2 is None
    assert rows[3].p1 == 1.0


def test_url_filter_outer_survival_and_blocklist(spark):
    """Docs with no URLs survive with zero counts; one blocked host
    flips keep; host matching is lowercased."""
    from uncharted_ta1_pipeline_spark.functions.docf import url_host_filter

    d = spark.createDataFrame(
        [
            (1, "no links here"),
            (2, "see https://Bad.Example.com/x and https://ok.example.org/y"),
            (3, "only https://ok.example.org/z"),
        ],
        "doc_id long, text string",
    )
    block = spark.createDataFrame([("bad.example.com",)], "host string")
    rows = {r.doc_id: r for r in url_host_filter(d, block).collect()}
    assert (rows[1].n_urls, rows[1].n_blocked, rows[1].keep) == (0, 0, True)
    assert (rows[2].n_urls, rows[2].n_blocked, rows[2].keep) == (2, 1, False)
    assert (rows[3].n_urls, rows[3].n_blocked, rows[3].keep) == (1, 0, True)


def test_oov_rate_vocab_cut(spark):
    """vocab_size=1 keeps only the corpus-top word ('a', freq 3); every
    other token counts as OOV."""
    from uncharted_ta1_pipeline_spark.functions.docf import oov_rate

    d = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in oov_rate(d, vocab_size=1).collect()}
    assert (rows[1].n_tokens, rows[1].n_oov, rows[1].oov_rate) == (3, 1, 0.333333)
    assert (rows[2].n_tokens, rows[2].n_oov, rows[2].oov_rate) == (2, 1, 0.5)


def test_curation_funnel_monotone_and_partitioned(spark):
    """Properties the oracle twin can't express as a hash: the funnel is
    non-increasing through the filter stages, and the split sizes
    partition the decontaminated set exactly."""
    from uncharted_ta1_pipeline_spark.operators.curation import curation_funnel

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r.stage: r.n_docs for r in curation_funnel(docs).collect()}
    assert rows["input"] >= rows["quality"] >= rows["dedup"] >= rows["decontam"]
    splits = sum(v for k, v in rows.items() if k.startswith("split_"))
    assert splits == rows["decontam"]
