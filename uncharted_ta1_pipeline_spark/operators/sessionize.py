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


def denoise_segments(
    df: DataFrame, min_signal: float = 5.0, max_len_s: int = 1000
) -> DataFrame:
    """Threshold + merge-overlapping-intervals (≈ DenoiseSegments: drop
    low-confidence segments, union the overlapping survivors,
    /root/reference/tasks/segmentation/denoise_segments.py:18-80 with the
    polygon-union helper segmenter_utils.py:70-89).

    Transcript analog: each tool turn spans ``[ts, ts + floor(signal*100) *
    max_len_s * 10 µs]`` — i.e. the centi-quantized signal times
    ``max_len_s/100`` seconds (signal=10, max_len_s=1000 → a 10 s span; the
    quantization keeps the interval arithmetic integer-exact in both
    engines); turns below ``min_signal`` are noise.  NOTE: the default
    ``min_signal``/``max_len_s`` are frozen into the DuckDB oracle SQL —
    non-default calls are exercised by pytest only, not the parity gate.
    Overlapping
    surviving intervals merge via the classic gap-and-island pass: a new
    island starts where the interval's start exceeds the running max of all
    previous ends (one window, integer microseconds, exact in both
    engines).

    Output: one row per merged island with its span and segment count."""
    us = F.unix_micros(F.col("ts"))
    segs = df.filter(
        (F.col("role") == "tool") & (F.col("signal") >= min_signal)
    ).select(
        "conv_id",
        "turn_idx",
        us.alias("start_us"),
        (
            us
            + (F.floor(F.col("signal") * 100) * F.lit(max_len_s * 10)).cast("long")
        ).alias("end_us"),
    )
    w = Window.partitionBy("conv_id").orderBy("start_us", "end_us", "turn_idx")
    prev_max_end = F.max("end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = segs.withColumn(
        "_new",
        (prev_max_end.isNull() | (F.col("start_us") > prev_max_end)).cast("long"),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy("conv_id", "island_id").agg(
        F.min("start_us").alias("start_us"),
        F.max("end_us").alias("end_us"),
        F.count(F.lit(1)).alias("n_segments"),
    )


def text_with_segments(df: DataFrame, min_signal: float = 5.0) -> DataFrame:
    """Containment semi-join: which turns fall INSIDE a denoised segment
    interval (≈ TextWithSegments: attach OCR text whose bbox is contained
    in a segmentation polygon,
    /root/reference/tasks/segmentation/text_with_segments.py:22-80).

    Scale-safe containment: islands within a conversation are disjoint and
    sorted, so "which island contains ts" is an AS-OF lookup (latest island
    start <= ts) plus an end-bound check — reusing the engine's as-of
    machinery instead of a range cross-join.  The DuckDB oracle does the
    naive BETWEEN join; results must agree exactly."""
    from uncharted_ta1_pipeline_spark.operators.asof import asof_join

    islands = denoise_segments(df, min_signal=min_signal).withColumn(
        "start_ts", F.timestamp_micros(F.col("start_us"))
    )
    turns = df.select("conv_id", "turn_idx", "ts")
    joined = asof_join(
        turns,
        islands,
        key="conv_id",
        probe_ts="ts",
        state_ts="start_ts",
        state_cols=["island_id", "start_us", "end_us"],
        state_tiebreak="island_id",
    )
    us = F.unix_micros(F.col("ts"))
    return joined.filter(
        F.col("island_id").isNotNull() & (us <= F.col("end_us"))
    ).select("conv_id", "turn_idx", "island_id", "start_us", "end_us")


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


def session_carryover(
    df: DataFrame, gap_s: int = DEFAULT_GAP_S, gap_us: int | None = None
) -> DataFrame:
    """Per-session returning-user carryover features: what a model serving
    the FIRST turn of a session may know — all of it derived strictly from
    EARLIER sessions (the zero-leakage contract lifted from turns to
    sessions).

    Output per (conv_id, session_id): n_turns (this session — a label, not
    a feature), gap_since_prev_s (idle time between the previous session's
    last turn and this session's first; NULL for session 0),
    prev_session_turns (NULL for session 0), turns_before (total turns in
    all earlier sessions).

    Exactness: session boundaries and gaps are integer microseconds
    (sessionize contract); the reported gap rounds the integer-µs
    difference to a whole µs before the single /1e6 + round(6)
    (the gap_quantiles discipline).

    Scale: session_stats reduces the turn stream to one row per session
    (map-side combined on (conv_id, session_id), conv-local keys); the
    lag/cumsum windows then run over the SESSION stream — orders of
    magnitude smaller than the turn stream, partitioned by the same
    conv_id, so no new skew surface.  Reference analog re-expressed:
    per-segment rank context from earlier segments,
    /root/reference/tasks/segmentation/segmenter_utils.py:20-37 with the
    adjacent-pairing of geo_referencing/coordinates_extractor.py:509-539.

    NOTE (ADVICE r5): the ``gap_s=1800`` default is frozen into the
    registered oracle SQL; non-default calls bypass the driver parity gate
    and are pytest-only — the denoise_segments convention.
    """
    s = session_stats(df, gap_s, gap_us)
    w = Window.partitionBy("conv_id").orderBy("session_id")
    prev_end = F.lag("end_us").over(w)
    gap = F.round(
        F.round((F.col("start_us") - prev_end).cast("double"), 0)
        / 1_000_000.0,
        6,
    )
    return s.select(
        "conv_id",
        "session_id",
        "n_turns",
        gap.alias("gap_since_prev_s"),
        F.lag("n_turns").over(w).alias("prev_session_turns"),
        F.coalesce(
            F.sum("n_turns").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("turns_before"),
    )
