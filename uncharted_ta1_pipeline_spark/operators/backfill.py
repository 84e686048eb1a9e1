"""Row-synthesis / backfill operators (SURVEY.md §2.5): per-group
conditional synthetic rows derived strictly from existing observations,
unioned back — the reference's derived-keypoint pattern."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def inference_backfill(df: DataFrame) -> DataFrame:
    """If a conversation has NO tool observation but >=2 user turns,
    synthesize ONE derived observation from per-group aggregates:
    ts = last user ts + mean user gap, signal = mean user signal,
    source = 'INFERENCE', confidence factor 0.5 (≈
    InferenceCoordinateExtractor: derive a synthetic coordinate from
    min/max keypoints at confidence 0.5 / source INFERENCE,
    /root/reference/tasks/geo_referencing/inference.py:21-185).

    Output: all original rows (source='OBSERVED') plus synthetic rows."""
    us = F.unix_micros(F.col("ts"))
    base = df.select(
        "conv_id", "turn_idx", "role", us.alias("ts_us"),
        F.round("signal", 6).alias("signal"), F.lit("OBSERVED").alias("source"),
    )
    g = df.groupBy("conv_id").agg(
        F.sum((F.col("role") == "tool").cast("long")).alias("_n_tool"),
        F.sum((F.col("role") == "user").cast("long")).alias("_n_user"),
        F.max(F.when(F.col("role") == "user", us)).alias("_last_u"),
        F.min(F.when(F.col("role") == "user", us)).alias("_first_u"),
        F.avg(F.when(F.col("role") == "user", F.col("signal"))).alias("_avg_sig"),
        F.max("turn_idx").alias("_max_idx"),
    )
    synth = g.filter((F.col("_n_tool") == 0) & (F.col("_n_user") >= 2)).select(
        "conv_id",
        (F.col("_max_idx") + 1).cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        (
            F.col("_last_u")
            + F.floor(
                (F.col("_last_u") - F.col("_first_u")) / (F.col("_n_user") - 1)
            ).cast("long")
        ).alias("ts_us"),
        F.round(F.col("_avg_sig") * 0.5, 6).alias("signal"),
        F.lit("INFERENCE").alias("source"),
    )
    return base.unionByName(synth)


def anchor_fallback(df: DataFrame, min_turns: int = 60) -> DataFrame:
    """Conversations with fewer than ``min_turns`` turns get 4 anchor rows
    at the quarter points of their time span with signal 0 and confidence
    0 semantics (≈ FinalizeCoordinates fallback: 4 anchor keypoints at ROI
    corners from scale + geofence center, confidence 0,
    /root/reference/tasks/geo_referencing/finalize_coordinates.py:240-452).

    Output: conv_id, anchor_nr (0..3), anchor_ts_us for qualifying convs."""
    us = F.unix_micros(F.col("ts"))
    g = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(us).alias("_lo"),
        F.max(us).alias("_hi"),
    )
    small = g.filter(F.col("n") < min_turns)
    anchors = small.select(
        "conv_id",
        "n",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("anchor_nr"),
        "_lo",
        "_hi",
    )
    return anchors.select(
        "conv_id",
        F.col("n").alias("n_turns"),
        "anchor_nr",
        (
            F.col("_lo")
            + F.floor(F.col("anchor_nr") * (F.col("_hi") - F.col("_lo")) / 3).cast("long")
        ).alias("anchor_ts_us"),
    )


def colinear_thirdpoint(
    df: DataFrame, control_tool: str = "write", r2_min: float = 0.99
) -> DataFrame:
    """Colinearity check + polyfit third-point synthesis (≈
    FinalizeCoordinates: if the control points are colinear — always true
    with exactly 2 — a projection is degenerate, so fit a line and
    synthesize an extra point on it,
    /root/reference/tasks/geo_referencing/finalize_coordinates.py:96-238).

    Control points are the ``control_tool`` turns; x = whole seconds since
    the conversation's first control point, y = centi-quantized signal, so
    every statistic is an exact integer (identical at any parallelism and
    in the DuckDB twin).  Degenerate-variance cases:

    - den_x == 0 (all points at one second) -> cannot fit, not colinear;
    - den_y == 0 with den_x > 0 (horizontal line) -> perfectly colinear;
    - otherwise colinear iff n == 2 or r² > ``r2_min``.

    Output: every conversation with >= 2 control points, its r² and
    colinear flag, and (for colinear ones) the synthesized midpoint
    (synth_ts_us, synth_signal) on the fitted line."""
    us = F.unix_micros(F.col("ts"))
    pts = (
        df.filter(F.col("tool") == control_tool)
        .withColumn("_first_us", F.min(us).over(Window.partitionBy("conv_id")))
        .withColumn("_x", F.floor((us - F.col("_first_us")) / F.lit(1_000_000)).cast("long"))
        .withColumn("_yc", F.floor(F.col("signal") * 100 + F.lit(0.5)).cast("long"))
    )
    g = pts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.min("_first_us").alias("first_us"),
        F.sum("_x").alias("sx"),
        F.sum("_yc").alias("sy"),
        F.sum(F.col("_x") * F.col("_yc")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_yc") * F.col("_yc")).alias("syy"),
        F.min("_x").alias("min_x"),
        F.max("_x").alias("max_x"),
    ).filter(F.col("n_pts") >= 2)
    n = F.col("n_pts").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    r2 = F.when((den_x > 0) & (den_y > 0), num * num / (den_x * den_y))
    colinear = (den_x > 0) & (
        (F.col("n_pts") == 2) | (den_y == 0) | (r2 > F.lit(r2_min))
    )
    slope = num / den_x
    intercept = (sy - slope * sx) / n
    x_mid = F.floor((F.col("min_x") + F.col("max_x")) / 2).cast("long")
    y_mid = intercept + slope * x_mid.cast("double")
    return g.select(
        "conv_id",
        "n_pts",
        F.round(r2, 6).alias("r2"),
        colinear.alias("colinear"),
        F.when(colinear, F.col("first_us") + x_mid * F.lit(1_000_000)).alias(
            "synth_ts_us"
        ),
        F.round(F.when(colinear, y_mid / 100), 6).alias("synth_signal"),
    )
