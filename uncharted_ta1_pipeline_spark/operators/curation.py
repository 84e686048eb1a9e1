"""End-to-end curation funnel: the training-data DAG's per-stage survivor
counts as one oracle-checkable table.

Composes the four curation operators exactly as the capstone pipeline test
(tests/test_curation_pipeline.py) chains them through the manifest layer —
quality filter → exact dedup → benchmark decontamination → hash split —
and reports how many documents survive each stage plus the final split
sizes.  This is the funnel report every data-curation run publishes next
to its output (what fraction did dedup remove? how much did
decontamination cost?), and it gives the COMPOSITION itself a driver-
checkable correctness row rather than only per-operator ones.

Reference analog: the per-stage output counts the reference pipeline logs
as each task commits to the blackboard
(/root/reference/tasks/common/pipeline.py:156-199).

Scale: each stage count is a map-side-combined aggregate over the chained
plan; nothing here adds a shuffle beyond the operators' own (the md5
groupBy of dedup, the shingle inverted index of contamination).  The
funnel output is seven rows regardless of corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from uncharted_ta1_pipeline_spark.functions.docf import quality_features
from uncharted_ta1_pipeline_spark.operators.dedup import (
    _word_shingles,
    benchmark_flag,
)
from uncharted_ta1_pipeline_spark.operators.sampling import hash_split


def curation_funnel(
    docs: DataFrame,
    quality_min: float = 0.3,
    contam_threshold: float = 0.9,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "split-v1",
) -> DataFrame:
    """(stage_idx, stage, n_docs) — survivors after each curation stage.

    Stages: input → quality (score ≥ ``quality_min``) → dedup (exact,
    min-doc_id survivor) → decontam (non-benchmark docs whose rounded
    bigram overlap with the benchmark subset is < ``contam_threshold``;
    benchmark docs themselves are dropped) → split_train/val/test.

    Physical shape (r6): ONE flagged pass instead of one sub-plan per
    stage count.  The old form re-evaluated quality_features for every
    stage and the whole quality→dedup chain again inside the
    contamination branch (~15 scans of the corpus at sf1.0); here every
    row carries stage-membership flags — ``_q`` (quality), ``_d``
    (survivor: min q-pass doc_id over the md5(text) group, via one
    window ≡ dedup_exact's groupBy), ``_c`` (decontaminated: the same
    broadcast benchmark-shingle join contamination() runs, but only
    once) — and one conditional aggregate emits all seven counts.  The
    corpus subtree is evaluated 3x (flag pass + the two shingle
    branches), down from ~15x; stage values are identical because the
    flags replicate each operator's exact predicate (same md5 grouping,
    same round(overlap, 6) < threshold test, same hash_split variate).
    Split rows still appear only for non-empty splits, mirroring the
    oracle's GROUP BY split.
    """
    flags = (
        quality_features(docs)
        .withColumn("_q", F.col("quality_score") >= quality_min)
        .withColumn(
            "_minq",
            F.min(F.when(F.col("_q"), F.col("doc_id"))).over(
                Window.partitionBy(F.md5(F.col("text")))
            ),
        )
        .withColumn("_d", F.col("_q") & (F.col("doc_id") == F.col("_minq")))
    )
    marked = flags.filter(F.col("_d")).withColumn(
        "_bench", benchmark_flag(F.col("doc_id"))
    )
    bench_sh = (
        marked.filter(F.col("_bench"))
        .select(F.explode(_word_shingles(F.col("text"))).alias("_sh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    cand_sh = (
        marked.filter(~F.col("_bench"))
        .select("doc_id", F.explode(_word_shingles(F.col("text"))).alias("_sh"))
        .distinct()
    )
    hits = (
        cand_sh.join(F.broadcast(bench_sh), on="_sh", how="left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
        )
    )
    keep = (
        hits.withColumn(
            "overlap_frac",
            F.round(
                F.when(
                    F.col("n_shingles") > 0, F.col("n_hits") / F.col("n_shingles")
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .filter(F.col("overlap_frac") < contam_threshold)
        .select("doc_id", F.lit(True).alias("_k"))
    )
    final = hash_split(
        flags.join(keep, on="doc_id", how="left").withColumn(
            "_c", F.col("_d") & F.coalesce(F.col("_k"), F.lit(False))
        ),
        key_col="doc_id",
        train=train,
        val=val,
        salt=salt,
    )
    counts = final.agg(
        F.count(F.lit(1)).cast("long").alias("_n0"),
        F.sum(F.col("_q").cast("long")).cast("long").alias("_n1"),
        F.sum(F.col("_d").cast("long")).cast("long").alias("_n2"),
        F.sum(F.col("_c").cast("long")).cast("long").alias("_n3"),
        *[
            F.coalesce(
                F.sum((F.col("_c") & (F.col("split") == s)).cast("long")), F.lit(0)
            ).cast("long").alias(f"_n{i + 4}")
            for i, s in enumerate(("train", "val", "test"))
        ],
    )
    stages = [
        (0, "input"), (1, "quality"), (2, "dedup"), (3, "decontam"),
        (4, "split_train"), (5, "split_val"), (6, "split_test"),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col(f"_n{i}").alias("n_docs"),
            )
            for i, name in stages
        ]
    )
    return (
        counts.select(F.explode(rows).alias("_r"))
        .select("_r.stage_idx", "_r.stage", "_r.n_docs")
        # the old per-stage union always emitted stages 0-3 but split rows
        # only for splits the groupBy saw — keep that contract exactly
        .filter((F.col("stage_idx") <= 3) | (F.col("n_docs") > 0))
    )
