"""Document/text-analysis functions for training-data pipelines: language
ID (stopword-marker heuristic), quality scoring, token counting,
fingerprinting.  Pure Catalyst expressions — no UDFs."""

from __future__ import annotations

import pyspark.sql.functions as F

EN_MARKERS = ("a", "the", "of", "and", "to", "is")
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(text: F.Column) -> F.Column:
    return F.split(text, " ")


def lang_id(text: F.Column, threshold: float = 0.02) -> F.Column:
    """N-gram/stopword-marker language heuristic: fraction of tokens in the
    English marker set -> 'en' when above threshold, else 'other'."""
    words = _words(F.lower(text))
    hits = F.size(F.filter(words, lambda w: w.isin(*EN_MARKERS)))
    ratio = hits / F.size(words)
    return F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("other"))


def stopword_ratio(text: F.Column) -> F.Column:
    words = _words(F.lower(text))
    hits = F.size(F.filter(words, lambda w: w.isin(*EN_MARKERS)))
    return F.round(hits / F.size(words), 6)


def quality_features(df, text_col: str = "text"):
    """Length / punctuation / stopword quality features + composite score."""
    t = F.col(text_col)
    words = _words(t)
    n_chars = F.length(t)
    n_words = F.size(words)
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    return (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn(
            "avg_word_len",
            F.round((n_chars - (n_words - 1)) / n_words, 6),
        )
        .withColumn("punct_ratio", F.round(punct / n_chars, 6))
        .withColumn("stop_ratio", stopword_ratio(t))
        .withColumn(
            "quality_score",
            F.round(
                F.least(n_words / F.lit(50.0), F.lit(1.0)) * 0.5
                + (1 - F.least(F.col("punct_ratio") * 10, F.lit(1.0))) * 0.3
                + F.least(F.col("stop_ratio") * 10, F.lit(1.0)) * 0.2,
                6,
            ),
        )
    )


def token_counts(df, text_col: str = "text"):
    """Whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    ws = F.size(_words(t))
    bpe = F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0))
    return df.withColumn("ws_tokens", ws.cast("long")).withColumn(
        "re_tokens", bpe.cast("long")
    ).withColumn(
        "chars_per_token", F.round(F.length(t) / bpe, 6)
    )


def fingerprint(df, text_col: str = "text", gram: int = 8, stride: int = 4):
    """Rolling-hash document fingerprint (winnowing-lite): min md5 over
    character ``gram``-grams sampled every ``stride`` chars, plus the
    distinct shingle count."""
    t = F.col(text_col)
    n = F.greatest(
        F.floor((F.length(t) - gram) / stride).cast("int"), F.lit(0)
    )
    idx = F.sequence(F.lit(0), n)
    shingles = F.transform(idx, lambda i: F.substring(t, i * stride + 1, gram))
    hashes = F.transform(shingles, F.md5)
    return df.withColumn("fingerprint", F.array_min(hashes)).withColumn(
        "n_distinct_shingles", F.size(F.array_distinct(shingles)).cast("long")
    )
