"""Gap-based sessionization (batch).

Analog of the reference's tiling/segment grouping
(/root/reference/tasks/point_extraction/tiling.py:46-228) and the
merge-overlapping-polygons aggregation
(/root/reference/tasks/segmentation/segmenter_utils.py:70-89): a new session
starts when the gap to the previous turn exceeds ``gap_s``.

Implementation: ``lag(ts)`` + boundary flag + running sum — one window pass,
no shuffle beyond the conv_id partitioning shared with the other features.
All gap arithmetic is integer microseconds so Spark and the DuckDB oracle
agree bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from uncharted_ta1_pipeline_spark.operators.windows import turn_order

DEFAULT_GAP_S = 1800


def with_sessions(
    df: DataFrame, gap_s: int = DEFAULT_GAP_S, gap_us: int | None = None
) -> DataFrame:
    """Add ``session_id`` (0-based per conversation).

    A new session starts when the gap to the previous turn is strictly
    greater than the threshold.  ``gap_us`` overrides at microsecond
    precision (``gap_s * 1e6 - 1`` reproduces the half-open semantics of
    Structured Streaming's ``session_window``)."""
    w = turn_order()
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    threshold = gap_us if gap_us is not None else gap_s * 1_000_000
    is_new = (prev_us.isNull() | ((us - prev_us) > F.lit(threshold))).cast("long")
    return df.withColumn(
        "session_id",
        (
            F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.lit(1)
        ).cast("long"),
    )


def session_stats(
    df: DataFrame, gap_s: int = DEFAULT_GAP_S, gap_us: int | None = None
) -> DataFrame:
    """Per-session aggregate summary (count, span, tool usage, roles).

    Analog of the reference's per-segment stats / rank_segments inputs
    (segmenter_utils.py:20-37).
    """
    s = with_sessions(df, gap_s, gap_us)
    us = F.unix_micros(F.col("ts"))
    return s.groupBy("conv_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.round((F.max(us) - F.min(us)) / F.lit(1000000.0), 6).alias("duration_s"),
        F.sum(
            (F.col("tool").isNotNull() & (F.col("tool") != "")).cast("long")
        ).alias("n_tool_turns"),
        F.countDistinct("role").alias("n_roles"),
    )
