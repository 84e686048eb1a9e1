"""Behavioral contracts of the r5 semantic-dedup additions.

Parity vs the DuckDB twins is covered by the parametrized
tests/test_core_queries.py sweep; these tests pin the SEMANTICS that the
oracle alone can't distinguish from coincidence: the keep-smallest-id
survivor rule, the within-cluster-only pairing, the zero-span guard, and
the strictly-past multi-horizon frames.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from uncharted_ta1_pipeline_spark.operators.dedup import span_dedup
from uncharted_ta1_pipeline_spark.operators.similarity import semdedup
from uncharted_ta1_pipeline_spark.operators.windows import with_rolling_multi


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_keep_first_and_cluster_local(spark):
    """Three exact copies + one orthogonal vector: the smallest-id copy
    survives, the later copies are dups with the copy count as sources;
    the orthogonal vector is untouched even when co-clustered."""
    dim = 64
    a = [1.0] + [0.0] * (dim - 1)
    b = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = [(0, a), (1, a), (2, a), (3, b)]
    out = semdedup(_emb_df(spark, rows), n_centroids=1).orderBy("vec_id")
    got = {r["vec_id"]: r.asDict() for r in out.collect()}
    assert got[0]["is_dup"] == 0  # smallest id survives
    assert got[1]["is_dup"] == 1 and got[1]["n_dup_sources"] == 1
    assert got[2]["is_dup"] == 1 and got[2]["n_dup_sources"] == 2
    assert got[1]["max_sim_earlier"] == 1.0
    assert got[3]["is_dup"] == 0  # orthogonal: cosine 0 < threshold
    assert out.count() == 4  # one row per vector, always


def test_semdedup_max_earlier_stop_list(spark):
    """Only the first ``max_earlier`` cluster members act as dedup
    sources: with max_earlier=1, vec 2 is deduped only against vec 0."""
    dim = 64
    a = [1.0] + [0.0] * (dim - 1)
    rows = [(0, a), (1, a), (2, a)]
    out = semdedup(_emb_df(spark, rows), n_centroids=1, max_earlier=1)
    got = {r["vec_id"]: r.asDict() for r in out.collect()}
    assert got[2]["n_dup_sources"] == 1  # vec 1 excluded from the source set


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_dedup_zero_span_and_share(spark):
    """Docs shorter than k words report n_spans=0 / NULL share; a k-word
    span shared verbatim by two docs is flagged in both; a span repeated
    only WITHIN one doc is not (df counts distinct docs)."""
    shared = "a b c d"  # k=4 span shared across docs 1 and 2
    rows = [
        (0, "tiny doc"),  # 2 words < k -> zero spans
        (1, f"{shared} tail one"),
        (2, f"lead {shared} other"),
        (3, "x y z w x y z w"),  # in-doc repeat only: 'x y z w' df=1
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in span_dedup(_docs_df(spark, rows), k=4).collect()
    }
    assert out[0]["n_spans"] == 0 and out[0]["dup_span_share"] is None
    assert out[1]["n_spans"] == 3 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_spans"] == 3 and out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0  # cross-doc only
    assert out[1]["dup_span_share"] == round(1 / 3, 6)


def test_rolling_multi_strictly_past_frames(spark):
    """Every horizon's frame ends at -1: row i never sees its own signal,
    and the 25/125 horizons degrade to the full strict past on a short
    conversation (identical to turns_so_far semantics)."""
    rows = [
        ("c", i, "user", "t", None, f"2024-01-01 00:{i:02d}:00", float(i))
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts string, signal double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = (
        with_rolling_multi(df, widths=(5, 25))
        .orderBy("turn_idx")
        .collect()
    )
    # turn 0: empty frames everywhere
    assert out[0]["rolling_turns_5"] == 0 and out[0]["rolling_turns_25"] == 0
    assert out[0]["rolling_signal_mean_5"] is None
    # turn 9 @ width 5: mean of signals 4..8 (strictly past), not 5..9
    assert out[9]["rolling_turns_5"] == 5
    assert out[9]["rolling_signal_mean_5"] == 6.0
    # width 25 on a 10-turn conv == full strict past
    assert out[9]["rolling_turns_25"] == 9
    assert out[9]["rolling_signal_mean_25"] == 4.0
