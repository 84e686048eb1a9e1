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


def color_level(df: DataFrame) -> DataFrame:
    """Variance-bucketed level per conversation (≈ `_compute_color_level`:
    classify the map image into low/mid/high color level from a pixel
    statistic, /root/reference/tasks/metadata_extraction/
    metadata_extraction.py:961-1004; `_compute_shape` :935-959 is the same
    aggregate-then-bucket shape).

    Signal is quantized to centi-units and accumulated as INTEGER sums
    (the repo's standard discipline, same as regression_state): integer
    accumulation is order-insensitive, so the variance — and crucially the
    categorical level at the 400/800 boundaries — is identical at any
    partitioning and in both engines.  Population variance is recovered in
    double at the end with the identical expression tree in the DuckDB
    oracle (one partial-aggregable pass, no window)."""
    yc = F.floor(F.col("signal") * 100 + F.lit(0.5)).cast("long")
    g = df.withColumn("_yc", yc).groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_yc").alias("_s"),
        F.sum(F.col("_yc") * F.col("_yc")).alias("_ss"),
    )
    n = F.col("n").cast("double")
    sd = F.col("_s").cast("double")
    ssd = F.col("_ss").cast("double")
    var = ssd / n / 10000.0 - (sd / n / 100.0) * (sd / n / 100.0)
    return g.select(
        "conv_id",
        "n",
        (F.round(var, 6) + F.lit(0.0)).alias("variance"),
        F.when(var < 400.0, F.lit("low"))
        .when(var < 800.0, F.lit("mid"))
        .otherwise(F.lit("high"))
        .alias("level"),
    )


def metadata_record(df: DataFrame) -> DataFrame:
    """Per-conversation metadata record assembly — the deterministic
    re-expression of the reference's LLM metadata extractor output
    (/root/reference/tasks/metadata_extraction/metadata_extraction.py:
    one pydantic record per map with title/scale/quadrangle...; here each
    field is a deterministic aggregate over the conversation's turns):

    - dominant_role: mode of role (argmax count, ties -> lexicographic);
    - first_text: the first turn's text (stable ordering invariant);
    - top_tool: most-used non-empty tool (ties -> lexicographic);
    - peak_signal / n_turns: plain aggregates.

    One groupBy pass using max_by over (count, negated-lexicographic)
    structs — partial-aggregable, no window."""
    role_counts = df.groupBy("conv_id", "role").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # argmax with deterministic ties: rank by (count desc, role asc)
    w_r = Window.partitionBy("conv_id").orderBy(
        F.col("_n").desc(), F.col("role").asc()
    )
    dom_role = (
        role_counts.withColumn("_rk", F.row_number().over(w_r))
        .filter(F.col("_rk") == 1)
        .select("conv_id", F.col("role").alias("dominant_role"))
    )
    tool_counts = (
        df.filter(F.col("tool").isNotNull() & (F.col("tool") != ""))
        .groupBy("conv_id", "tool")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w_t = Window.partitionBy("conv_id").orderBy(
        F.col("_n").desc(), F.col("tool").asc()
    )
    top_tool = (
        tool_counts.withColumn("_rk", F.row_number().over(w_t))
        .filter(F.col("_rk") == 1)
        .select("conv_id", F.col("tool").alias("top_tool"))
    )
    base = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.round(F.max("signal"), 6).alias("peak_signal"),
    )
    w_first = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    first_text = (
        df.withColumn("_rk", F.row_number().over(w_first))
        .filter(F.col("_rk") == 1)
        .select("conv_id", F.col("text").alias("first_text"))
    )
    return (
        base.join(first_text, on="conv_id", how="left")
        .join(dom_role, on="conv_id", how="left")
        .join(top_tool, on="conv_id", how="left")
        .select(
            "conv_id", "n_turns", "dominant_role", "top_tool",
            "first_text", "peak_signal",
        )
    )
