"""Skew guards for the dedup/ANN family: degenerate hot buckets must stay
bounded, and the multi-table ANN OR-construction must not lose recall
against the single-table variant."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_lsh_band_cap_bounds_degenerate_bucket(spark):
    """Hundreds of identical documents share every band; without the cap the
    band self-join is quadratic (~80k pairs here).  With the cap the bucket
    is stop-listed and only genuinely-discriminative buckets join."""
    from uncharted_ta1_pipeline_spark.operators.dedup import minhash_lsh_pairs

    same = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text appears in every document body").alias(
            "text"
        ),
    )
    near = spark.createDataFrame(
        [
            (1000, "alpha beta gamma delta epsilon zeta"),
            (1001, "alpha beta gamma delta epsilon eta"),
            (1002, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(same.unionByName(near), max_band_df=50).collect()
    # the 400-doc bucket is dropped (cap 50); only the small docs may pair
    assert len(pairs) <= 3 * 2, f"degenerate bucket leaked {len(pairs)} pairs"
    for r in pairs:
        assert r.doc_a >= 1000 and r.doc_b >= 1000
    # the near-duplicate pair among the small docs IS found
    assert any(r.doc_a == 1000 and r.doc_b == 1001 for r in pairs)


def test_ann_bucket_cap_bounds_candidates(spark):
    """With max_bucket=1 each (table, bucket) contributes at most one index
    vector, so a query sees at most n_tables candidates."""
    from uncharted_ta1_pipeline_spark.operators.similarity import ann_lsh

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = ann_lsh(emb, n_queries=5, k=10, n_tables=4, max_bucket=1).toPandas()
    per_q = out.groupby("query_id").size()
    assert (per_q <= 4).all(), per_q.to_dict()


def test_ann_multi_table_beats_single_table_recall(spark):
    """OR-construction across 4 tables must recall at least as many true
    top-10 neighbours as one table (and be meaningfully better than guessing)."""
    from uncharted_ta1_pipeline_spark.operators.similarity import (
        ann_bruteforce,
        ann_lsh,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    truth = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce(emb, n_queries=5, k=10).collect()
    }

    def recall(n_tables: int) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann_lsh(emb, n_queries=5, k=10, n_tables=n_tables).collect()
        }
        return len(got & truth) / len(truth)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1, f"multi-table recall regressed: {r4} < {r1}"
    assert r4 >= 0.3, f"multi-table recall too low: {r4}"
