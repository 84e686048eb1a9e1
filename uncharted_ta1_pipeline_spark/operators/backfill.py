"""Row-synthesis / backfill operators (SURVEY.md §2.5): per-group
conditional synthetic rows derived strictly from existing observations,
unioned back — the reference's derived-keypoint pattern."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


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


def anchor_fallback(df: DataFrame, min_turns: int = 40) -> DataFrame:
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
