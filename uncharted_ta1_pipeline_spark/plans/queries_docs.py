"""Training-data pipeline queries over documents / embeddings (dedup,
similarity search, text analysis) — DuckDB twins in plans/oracles_docs.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from uncharted_ta1_pipeline_spark.functions.docf import (
    fingerprint,
    lang_id,
    quality_features,
    token_counts,
)
from uncharted_ta1_pipeline_spark.operators import dedup as dd
from uncharted_ta1_pipeline_spark.operators.similarity import (
    ann_bruteforce,
    ann_lsh,
    ann_recall,
    ivf_assign,
    ivf_cluster_stats,
    ivf_topk,
)


def _spread(df: DataFrame, spark: SparkSession, key: str) -> DataFrame:
    """Fan a parallelism-starved scan out across the cluster before the
    per-row heavy work (explode / md5 / regex / array folds) that dominates
    every docs query.

    The bench corpora are written as ONE parquet row group per file, so the
    scan runs as a single task and everything up to the first exchange is
    single-threaded on one of N cores (guide §2.5 "input skew: one huge
    unsplittable file ... repartition immediately after the read").  The
    deterministic hash repartition costs one exchange of the raw rows —
    small next to the 10-30x parallelism it buys the map work.

    Scale-adaptive, not a local[32] constant: the guard only fires when the
    source actually yields fewer scan partitions than the cluster has cores
    (``df.rdd.getNumPartitions()`` is the real post-split count).  On a
    production corpus of many splittable files the scan already exceeds
    defaultParallelism and this is a no-op — no extra exchange at 100 TB.
    The explicit partition count keeps AQE from re-coalescing the exchange
    below core count (advisory size would merge these small inputs back to
    one partition).  Every operator is deterministic at any partitioning
    (the engine's core contract, exercised by the local-cluster scaling
    bench), so results are unchanged.
    """
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n, F.col(key))
    return df


def _docs(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # spread=False for queries whose pre-shuffle per-row work is trivial
    # (pure md5 / tiny projections): there the fan-out exchange costs more
    # than the parallelism it buys (measured at sf1.0, e.g. hash_split).
    return _spread(df, spark, "doc_id") if spread else df


def _emb(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _spread(df, spark, "vec_id") if spread else df


def q_dedup_exact(spark, sf_dir):
    return dd.dedup_exact(_docs(spark, sf_dir))


def q_minhash_signature(spark, sf_dir):
    return dd.minhash_signature(_docs(spark, sf_dir))


def q_minhash_lsh_pairs(spark, sf_dir):
    return dd.minhash_lsh_pairs(_docs(spark, sf_dir))


def q_ngram_jaccard_pairs(spark, sf_dir):
    return dd.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.3)


def q_simhash(spark, sf_dir):
    # production width: 64-bit signature as a 16-hex-char string (the
    # band-int internals stay private; hash parity is on the hex form)
    return dd.simhash64(_docs(spark, sf_dir)).select("doc_id", "simhash_hex")


def q_simhash_pairs(spark, sf_dir):
    return dd.simhash_pairs(_docs(spark, sf_dir))


def q_embedding_cosine_pairs(spark, sf_dir):
    # first op is the block-pack groupBy (a keyed shuffle anyway) and the
    # heavy work is numpy inside mapInPandas — spread buys nothing here
    return dd.embedding_cosine_pairs(_emb(spark, sf_dir, spread=False), threshold=0.5)


def q_ann_bruteforce(spark, sf_dir):
    return ann_bruteforce(_emb(spark, sf_dir), n_queries=5, k=10)


def q_ann_lsh(spark, sf_dir):
    # n_planes follows similarity.ANN_PLANES (8 -> 256 buckets/table); the
    # oracle generator is parameterized on the same constants
    return ann_lsh(_emb(spark, sf_dir), n_queries=5, k=10)


def q_ivf_assign(spark, sf_dir):
    return ivf_assign(_emb(spark, sf_dir)).withColumn(
        "cluster", F.col("cluster").cast("long")
    )


def q_ivf_cluster_stats(spark, sf_dir):
    return ivf_cluster_stats(_emb(spark, sf_dir)).withColumn(
        "cluster", F.col("cluster").cast("long")
    )


def q_ivf_topk(spark, sf_dir):
    return ivf_topk(_emb(spark, sf_dir), n_queries=5, k=10)


def q_ann_recall(spark, sf_dir):
    return ann_recall(_emb(spark, sf_dir), n_queries=5, k=10)


def q_dedup_recall(spark, sf_dir):
    # threshold grid starts at q_ngram_jaccard_pairs' own 0.3 so the truth
    # window is the registered exact query, not a new one
    return dd.dedup_recall(_docs(spark, sf_dir), thresholds=(0.3, 0.5, 0.7))


def q_lang_id(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        "lang",
        lang_id(F.col("text")).alias("pred_lang"),
    )


def q_quality_score(spark, sf_dir):
    return quality_features(_docs(spark, sf_dir)).select(
        "doc_id", "n_chars", "n_words", "avg_word_len", "punct_ratio",
        "stop_ratio", "quality_score",
    )


def q_token_count(spark, sf_dir):
    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "ws_tokens", "re_tokens", "chars_per_token"
    )


def q_doc_fingerprint(spark, sf_dir):
    return fingerprint(_docs(spark, sf_dir)).select(
        "doc_id", "fingerprint", "n_distinct_shingles"
    )


def q_repetition(spark, sf_dir):
    """Gopher-style repetition signals (dup-word / dup-2-gram fraction,
    top-2-gram share) — the published boilerplate filters for LM corpora."""
    from uncharted_ta1_pipeline_spark.functions.docf import repetition_features

    return repetition_features(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "dup_word_frac", "dup_2gram_frac",
        "top_2gram_share",
    )


def q_pii_mask(spark, sf_dir):
    """PII redaction over corpus text with deterministic injected PII
    (email / IPv4 / phone derived from doc_id) so the masking actually
    fires — mirrored verbatim in the oracle."""
    from uncharted_ta1_pipeline_spark.functions.docf import pii_mask

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".7 or 555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return pii_mask(d).select(
        "doc_id", "masked_text", "n_emails", "n_ips", "n_phones"
    )


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment by hashed doc_id — stable
    under repartitioning and row additions (the split invariant training
    pipelines rely on)."""
    from uncharted_ta1_pipeline_spark.operators.sampling import hash_split

    return hash_split(_docs(spark, sf_dir, spread=False)).select(
        "doc_id", "split"
    )


def q_stratified_sample(spark, sf_dir):
    """Per-source deterministic downsampling against a broadcast rate dim:
    rate = 1 / (1 + source index mod 4) — several distinct rates so the
    filter genuinely differs per stratum."""
    from uncharted_ta1_pipeline_spark.operators.sampling import stratified_sample

    d = _docs(spark, sf_dir, spread=False)
    rates = d.select("source").distinct().select(
        "source",
        (
            1.0
            / (1 + F.regexp_extract("source", r"(\d+)", 1).cast("int") % 4)
        ).alias("rate"),
    )
    return stratified_sample(d, rates).select("doc_id", "source", "rate")


def q_dedup_clusters(spark, sf_dir):
    """Connected-components cluster resolution over the LSH candidate
    pairs: every doc gets a cluster_id (component min doc_id), cluster
    size, and a keep-longest canonical flag."""
    # the timed final plan only projects (doc_id, n_chars) and joins the
    # checkpointed components — spread would add three fan-out exchanges
    # for trivial per-row work; the pair generator keeps the spread input
    return dd.dedup_clusters(
        _docs(spark, sf_dir, spread=False),
        dd.minhash_lsh_pairs(_docs(spark, sf_dir)),
    )


def q_contamination(spark, sf_dir):
    """Benchmark n-gram decontamination: distinct-shingle overlap of every
    non-benchmark doc against the broadcast benchmark shingle set."""
    return dd.contamination(_docs(spark, sf_dir))


def q_tfidf_top_terms(spark, sf_dir):
    from uncharted_ta1_pipeline_spark.functions.docf import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir))


def q_bm25_top_terms(spark, sf_dir):
    """Okapi BM25 (linear-idf variant) top terms per document."""
    from uncharted_ta1_pipeline_spark.functions.docf import bm25_top_terms

    return bm25_top_terms(_docs(spark, sf_dir))


def q_domain_mix(spark, sf_dir):
    """Target-mix rebalancing plan: per-source rates that reshape the
    corpus to target shares proportional to 1 + (source index mod 3),
    capped by no-upsampling feasibility."""
    from uncharted_ta1_pipeline_spark.operators.sampling import domain_mix_rates

    d = _docs(spark, sf_dir, spread=False)
    w = d.select("source").distinct().select(
        "source",
        (1 + F.regexp_extract("source", r"(\d+)", 1).cast("int") % 3).alias(
            "_w"
        ),
    )
    tot = w.agg(F.sum("_w").alias("_tw"))
    targets = w.crossJoin(F.broadcast(tot)).select(
        "source", (F.col("_w") / F.col("_tw")).alias("target_share")
    )
    return domain_mix_rates(d, targets)


def q_url_filter(spark, sf_dir):
    """URL census + domain blocklist decision over corpus text with
    deterministic injected URLs (derived from doc_id, mirrored verbatim in
    the oracle) so extraction and blocking actually fire; blocklist =
    site{0,5,..,45}.example.com + m0.example.org, built as a broadcast dim."""
    from uncharted_ta1_pipeline_spark.functions.docf import url_host_filter

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and http://m"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.org/x"),
        ).alias("text"),
    )
    block = (
        spark.range(0, 50, 5)
        .select(
            F.concat(
                F.lit("site"), F.col("id").cast("string"), F.lit(".example.com")
            ).alias("host")
        )
        .union(spark.createDataFrame([("m0.example.org",)], "host string"))
    )
    return url_host_filter(d, block)


def q_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per doc vs the corpus top-100 vocabulary."""
    from uncharted_ta1_pipeline_spark.functions.docf import oov_rate

    return oov_rate(_docs(spark, sf_dir))


def q_line_dedup(spark, sf_dir):
    """CCNet-style cross-document line removal + ordered re-assembly."""
    return dd.line_dedup(_docs(spark, sf_dir))


def q_pack_sequences(spark, sf_dir):
    """Concat-then-chunk packing offsets per (source, hash shard)."""
    from uncharted_ta1_pipeline_spark.operators.sampling import pack_sequences

    return pack_sequences(_docs(spark, sf_dir, spread=False)).select(
        "doc_id", "source", "shard", "n_tokens", "start_offset",
        "pack_id", "spans_boundary",
    )


def q_lm_score(spark, sf_dir):
    """Corpus-bigram LM fluency score per document (CCNet-style
    perplexity-filter analog; rational statistics, see docf.lm_score)."""
    from uncharted_ta1_pipeline_spark.functions.docf import lm_score

    return lm_score(_docs(spark, sf_dir))


QUERIES_DOCS = {
    "dedup_exact": q_dedup_exact,
    "minhash_signature": q_minhash_signature,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "embedding_cosine_pairs": q_embedding_cosine_pairs,
    "ann_bruteforce": q_ann_bruteforce,
    "ann_lsh": q_ann_lsh,
    "ivf_assign": q_ivf_assign,
    "ivf_cluster_stats": q_ivf_cluster_stats,
    "ivf_topk": q_ivf_topk,
    "ann_recall": q_ann_recall,
    "dedup_recall": q_dedup_recall,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "repetition": q_repetition,
    "pii_mask": q_pii_mask,
    "hash_split": q_hash_split,
    "stratified_sample": q_stratified_sample,
    "dedup_clusters": q_dedup_clusters,
    "contamination": q_contamination,
    "tfidf_top_terms": q_tfidf_top_terms,
    "bm25_top_terms": q_bm25_top_terms,
    "domain_mix": q_domain_mix,
    "url_filter": q_url_filter,
    "oov_rate": q_oov_rate,
    "line_dedup": q_line_dedup,
    "pack_sequences": q_pack_sequences,
    "lm_score": q_lm_score,
}


def q_curriculum(spark, sf_dir):
    """Curriculum bucket assignment (tie-coherent distributed ntile over
    the quality score; see operators/sampling.py)."""
    from uncharted_ta1_pipeline_spark.operators.sampling import (
        curriculum_buckets,
    )

    return curriculum_buckets(_docs(spark, sf_dir))


QUERIES_DOCS["curriculum"] = q_curriculum


def q_ann_bucket_stats(spark, sf_dir):
    """LSH bucket-occupancy telemetry per hash table (plane-count tuning:
    max >> avg flags a degenerate bucket; used << total flags over-hashing)."""
    from uncharted_ta1_pipeline_spark.operators.similarity import ann_bucket_stats

    return ann_bucket_stats(_emb(spark, sf_dir))


QUERIES_DOCS["ann_bucket_stats"] = q_ann_bucket_stats


def q_curation_funnel(spark, sf_dir):
    """End-to-end curation funnel: per-stage survivor counts for the
    quality -> exact-dedup -> decontamination -> split DAG (the same
    composition tests/test_curation_pipeline.py runs through the manifest
    layer; see operators/curation.py)."""
    from uncharted_ta1_pipeline_spark.operators.curation import curation_funnel

    return curation_funnel(_docs(spark, sf_dir))


QUERIES_DOCS["curation_funnel"] = q_curation_funnel


def q_semdedup(spark, sf_dir):
    """SemDeDup: within-IVF-cluster cosine dedup, keep-smallest-id rule."""
    from uncharted_ta1_pipeline_spark.operators.similarity import semdedup

    return semdedup(_emb(spark, sf_dir))


QUERIES_DOCS["semdedup"] = q_semdedup


def q_span_dedup(spark, sf_dir):
    """Cross-document repeated k-word-span share (exact-substring dedup
    signal at k-gram granularity)."""
    return dd.span_dedup(_docs(spark, sf_dir), k=8)


QUERIES_DOCS["span_dedup"] = q_span_dedup
