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
from pyspark.sql import DataFrame

from uncharted_ta1_pipeline_spark.functions.docf import quality_features
from uncharted_ta1_pipeline_spark.operators.dedup import (
    contamination,
    dedup_exact,
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
    """
    q = quality_features(docs).filter(F.col("quality_score") >= quality_min)
    surv = dedup_exact(q).select(F.col("survivor_doc_id").alias("doc_id"))
    d = q.join(surv, on="doc_id", how="inner")
    keep = (
        contamination(d, threshold=contam_threshold)
        .filter(F.col("contaminated") == 0)
        .select("doc_id")
    )
    c = d.join(keep, on="doc_id", how="inner")
    s = hash_split(c, key_col="doc_id", train=train, val=val, salt=salt)

    def one(idx: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).select(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_docs",
        )

    splits = (
        s.groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            (
                F.when(F.col("split") == "train", F.lit(4))
                .when(F.col("split") == "val", F.lit(5))
                .otherwise(F.lit(6))
            )
            .cast("int")
            .alias("stage_idx"),
            F.concat(F.lit("split_"), F.col("split")).alias("stage"),
            "n_docs",
        )
    )
    return (
        one(0, "input", docs)
        .unionByName(one(1, "quality", q))
        .unionByName(one(2, "dedup", d))
        .unionByName(one(3, "decontam", c))
        .unionByName(splits)
    )
