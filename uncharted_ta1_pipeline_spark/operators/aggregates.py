"""Aggregation operators (SURVEY.md §2.4/§2.6)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def confidence_product(df: DataFrame) -> DataFrame:
    """Per-conversation product of confidences with a 1.1 boost per
    observation beyond 2, clamped to 1 (≈ `_calculate_confidence`,
    /root/reference/tasks/geo_referencing/georeference.py:198-226).
    Product via exp(sum(log)) — a single partial-aggregable pass."""
    conf = F.greatest(F.least(F.col("signal") / 100.0, F.lit(1.0)), F.lit(0.01))
    return (
        df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.log(conf)).alias("_logsum"),
        )
        .select(
            "conv_id",
            "n_obs",
            F.round(
                F.least(
                    F.exp(
                        F.col("_logsum")
                        + F.greatest(F.col("n_obs") - 2, F.lit(0)) * F.log(F.lit(1.1))
                    ),
                    F.lit(1.0),
                ),
                6,
            ).alias("confidence"),
        )
    )


def source_histogram(df: DataFrame) -> DataFrame:
    """Count per (conversation, source) (≈ `_count_keypoints`,
    georeference.py:187-196)."""
    return df.groupBy("conv_id", "role").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.when(F.col("tool") != "", F.col("tool"))).alias(
            "n_distinct_tools"
        ),
    )


def rmse_score(df: DataFrame) -> DataFrame:
    """Per-conversation RMSE of signal around a predicted value (≈
    `_score_query_points` RMSE of geodesic errors, georeference.py:431-479).
    Prediction here = per-conv mean (the order-1 fit's central value)."""
    w = Window.partitionBy("conv_id")
    err = F.col("signal") - F.avg("signal").over(w)
    return (
        df.withColumn("_err", err)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sqrt(F.avg(F.pow(F.col("_err"), 2))), 6).alias("rmse"),
        )
    )


def weighted_centroid(df: DataFrame) -> DataFrame:
    """Global weighted mean where each conversation's rows weigh
    1/(rows in conv) — the two-phase partial+final aggregation pattern
    (≈ `_rank_duplicates` weighted centroid with weight 1/#results,
    /root/reference/tasks/geo_referencing/point_geocoder.py:168-211)."""
    per_conv = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("signal").alias("_s")
    )
    return per_conv.agg(
        F.round(
            F.sum(F.col("_s") / F.col("_n")) / F.count(F.lit(1)), 6
        ).alias("weighted_centroid"),
        F.count(F.lit(1)).alias("n_convs"),
    )


def topk_with_ties(df: DataFrame, k: int = 4) -> DataFrame:
    """Per-conversation top-k by signal KEEPING ties at the k-th value —
    rank() not row_number() (≈ keypoint top-up that keeps ties at the
    k-th confidence, point_geocoder.py:268-292)."""
    w = Window.partitionBy("conv_id").orderBy(F.col("signal").desc())
    return (
        df.withColumn("_rk", F.rank().over(w))
        .filter(F.col("_rk") <= k)
        .select("conv_id", "turn_idx", F.round("signal", 6).alias("signal"),
                F.col("_rk").alias("rk"))
    )


def dedup_overlap(df: DataFrame, cell_s: int = 600) -> DataFrame:
    """Overlap-zone dedup: quantize the time axis into cells per
    (conversation, role); the LATEST row per cell wins (≈ Untiler
    overlap dedup keyed by quantized center, later tile wins,
    /root/reference/tasks/point_extraction/tiling.py:277-413)."""
    cell = F.floor(F.unix_micros(F.col("ts")) / F.lit(cell_s * 1_000_000))
    w = Window.partitionBy("conv_id", "role", "_cell").orderBy(
        F.col("turn_idx").desc()
    )
    return (
        df.withColumn("_cell", cell)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("conv_id", "turn_idx", "role", F.col("_cell").alias("cell"))
    )


def quadrant_coverage(df: DataFrame) -> DataFrame:
    """Per-conversation time-quadrant coverage with synthetic probes for
    empty quadrants (≈ check_gcp_map_quadrants: ensure >=1 probe per map
    quadrant else synthesize corner probes,
    /root/reference/tasks/geo_referencing/ground_control.py:202-239).

    Output: one row per (conv, quadrant 0..3) with covered flag and — for
    uncovered quadrants — a synthetic probe at the quadrant midpoint."""
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("conv_id")
    lo, hi = F.min(us).over(w), F.max(us).over(w)
    span = hi - lo
    quad = F.least(
        F.floor((us - lo) * 4 / F.when(span > 0, span).otherwise(F.lit(1))),
        F.lit(3),
    ).cast("int")
    covered = (
        df.withColumn("_q", quad)
        .groupBy("conv_id", "_q")
        .agg(F.count(F.lit(1)).alias("n_in_quadrant"))
    )
    bounds = df.groupBy("conv_id").agg(
        F.min(us).alias("_lo"), F.max(us).alias("_hi")
    )
    quads = bounds.select(
        "conv_id", "_lo", "_hi", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("_q")
    )
    return (
        quads.join(covered, on=["conv_id", "_q"], how="left")
        .select(
            "conv_id",
            F.col("_q").alias("quadrant"),
            F.coalesce("n_in_quadrant", F.lit(0)).alias("n_in_quadrant"),
            (F.coalesce("n_in_quadrant", F.lit(0)) > 0).alias("covered"),
            F.when(
                F.coalesce("n_in_quadrant", F.lit(0)) == 0,
                F.col("_lo")
                + F.floor(
                    (F.col("_q") * 2 + 1) * (F.col("_hi") - F.col("_lo")) / 8
                ).cast("long"),
            ).alias("synthetic_probe_us"),
        )
    )
