"""Named queries — the engine's public operator surface.

Each entry: ``(spark, sf_dir) -> DataFrame``, with an exact DuckDB oracle in
plans/oracles.py (same column names, same values after round(6) on doubles).
Keys mirror SURVEY.md §2's operator inventory.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from uncharted_ta1_pipeline_spark.operators import sessionize as sz
from uncharted_ta1_pipeline_spark.operators import windows as win
from uncharted_ta1_pipeline_spark.operators.asof import asof_join
from uncharted_ta1_pipeline_spark.sources.transcripts import (
    load_transcripts,
    make_probes,
)

US = 1_000_000.0


def _ts_us(col: str = "ts") -> F.Column:
    return F.unix_micros(F.col(col)).alias(f"{col}_us")


# ---------------------------------------------------------------------------
# sources / scans
# ---------------------------------------------------------------------------
def q_ingest_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered ingest scan — stable turn ordering + byte-identical text
    pass-through (≈ ImageFileInputIterator, reference tasks/common/io.py:34-145)."""
    t = load_transcripts(spark, sf_dir)
    return t.select("conv_id", "turn_idx", "role", "text", "tool", _ts_us())


# ---------------------------------------------------------------------------
# window features
# ---------------------------------------------------------------------------
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (≈ tiling/segment grouping, tiling.py:46-228)."""
    t = sz.with_sessions(load_transcripts(spark, sf_dir))
    return t.select("conv_id", "turn_idx", "session_id")


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead role-transition features (≈ adjacent-block deg+minsec
    pairing, coordinates_extractor.py:509-539)."""
    t = win.with_lag_lead(load_transcripts(spark, sf_dir))
    return t.select(
        "conv_id",
        "turn_idx",
        "prev_role",
        "next_role",
        "prev_tool",
        "role_transition",
        "secs_since_prev",
    )


def q_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-past cumulative counts (zero temporal leakage)."""
    t = win.with_cumulative(load_transcripts(spark, sf_dir))
    return t.select(
        "conv_id", "turn_idx", "turns_so_far", "tools_so_far", "distinct_tools_so_far"
    )


def q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling strictly-past counts/means, frame rowsBetween(-5, -1)."""
    t = win.with_rolling(load_transcripts(spark, sf_dir), width=5)
    return t.select(
        "conv_id",
        "turn_idx",
        "rolling_turns_5",
        "rolling_tools_5",
        "rolling_signal_mean_5",
    )


def q_ffill_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill: last non-empty tool strictly before the current turn
    (≈ derived-keypoint inference, inference.py:21-185)."""
    t = win.with_ffill_tool(load_transcripts(spark, sf_dir))
    return t.select("conv_id", "turn_idx", "ffill_tool")


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregates (≈ per-segment stats, segmenter_utils.py:20-37)."""
    return sz.session_stats(load_transcripts(spark, sf_dir))


def q_conv_turn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation regression aggregates (≈ per-map polyfit,
    geo_projection.py:52-115): slope of turn_idx over time + simple rate."""
    t = load_transcripts(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    # regression x = seconds relative to the conv's first turn: keeps the
    # regressor small so the slope is numerically stable (identical result
    # at any partitioning, and matching the oracle after round(6)).
    w_conv = Window.partitionBy("conv_id")
    t = t.withColumn("us", us).withColumn(
        "ts_rel", (F.col("us") - F.min("us").over(w_conv)) / F.lit(US)
    )
    g = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.round((F.max("us") - F.min("us")) / F.lit(US), 6).alias("duration_s"),
        F.round(F.expr("regr_slope(turn_idx, ts_rel)"), 6).alias("turn_rate_slope"),
    )
    return g.select(
        "conv_id",
        "n_turns",
        "duration_s",
        "turn_rate_slope",
        F.round(
            F.when(F.col("duration_s") > 0, (F.col("n_turns") - 1) / F.col("duration_s")),
            6,
        ).alias("turn_rate"),
    )


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------
def asof_state(t: DataFrame) -> DataFrame:
    """Per-turn state-as-of-that-turn (inclusive): what a probe landing at or
    after this turn's ts should observe."""
    w = win.turn_order()
    incl = w.rowsBetween(Window.unboundedPreceding, 0)
    tool_used = (F.col("tool").isNotNull() & (F.col("tool") != "")).cast("long")
    s = sz.with_sessions(t)
    return s.select(
        "conv_id",
        "ts",
        "turn_idx",
        F.col("role").alias("last_role"),
        F.row_number().over(w).cast("long").alias("turns_incl"),
        F.sum(tool_used).over(incl).alias("tools_incl"),
        F.col("session_id").alias("last_session_id"),
    )


def q_asof_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature lookup at probe timestamps (≈ predict at query
    points, georeference.py:80-340).  Left as-of: pre-first-turn probes keep
    NULL state."""
    t = load_transcripts(spark, sf_dir)
    probes = make_probes(t)
    state = asof_state(t)
    out = asof_join(
        probes,
        state,
        key="conv_id",
        probe_ts="probe_ts",
        state_ts="ts",
        state_cols=["turn_idx", "last_role", "turns_incl", "tools_incl", "last_session_id"],
        state_tiebreak="turn_idx",
    )
    return out.select(
        "probe_id",
        "conv_id",
        F.unix_micros(F.col("probe_ts")).alias("probe_ts_us"),
        F.col("turn_idx").alias("matched_turn_idx"),
        "last_role",
        "turns_incl",
        "tools_incl",
        "last_session_id",
    )


def q_asof_fit_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-constrained fit-predict-at-probe: per-conversation OLS of
    signal over time fit ONLY on turns with ts <= probe_ts, evaluated at the
    probe (≈ fit on keypoints / predict at query points,
    geo_projection.py:52-115 + georeference.py:80-340).  Running integer
    sufficient statistics carried through the as-of join — no extra
    shuffle, no per-probe refit."""
    from uncharted_ta1_pipeline_spark.operators.asof import fit_predict_at_probes

    t = load_transcripts(spark, sf_dir)
    return fit_predict_at_probes(make_probes(t), t)


def q_asof_fit_predict_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of ``asof_fit_predict``: chunk-bounded sufficient
    statistics (regression_state_bucketed — the salt.py offset pattern)
    chained into the time-bucketed as-of join.  NO whole-key window in the
    plan; identical output (tests/test_asof_equivalence.py)."""
    from uncharted_ta1_pipeline_spark.operators.asof import fit_predict_at_probes

    t = load_transcripts(spark, sf_dir)
    return fit_predict_at_probes(make_probes(t), t, strategy="bucketed")


def q_role_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation role-transition concentration profile (dominant
    transition, Simpson/HHI concentration, effective transition count) —
    the conversation-level aggregate of the north-star's role-transition
    features (rational statistics only; see operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import (
        role_transition_profile,
    )

    return role_transition_profile(load_transcripts(spark, sf_dir))


def q_gap_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation inter-turn-gap quantiles (exact interpolated
    p25/p50/p75), IQR, and Tukey-fence outlier share — burstiness features
    for timing-aware curation."""
    from uncharted_ta1_pipeline_spark.operators.convstats import (
        gap_quantile_features,
    )

    return gap_quantile_features(load_transcripts(spark, sf_dir))


def _feature_views(t: DataFrame):
    turn_view = t.select(
        "conv_id", "ts", "turn_idx", F.col("role").alias("last_role")
    )
    tool_view = t.filter(
        F.col("tool").isNotNull() & (F.col("tool") != "")
    ).select("conv_id", "ts", "turn_idx", F.col("tool").alias("last_tool"))
    return [
        ("turn", turn_view, "ts", ["last_role"]),
        ("tool", tool_view, "ts", ["last_tool"]),
    ]


def _training_set(spark: SparkSession, sf_dir: str, strategy: str) -> DataFrame:
    from uncharted_ta1_pipeline_spark.operators.feature_store import training_set

    t = load_transcripts(spark, sf_dir)
    out = training_set(
        make_probes(t),
        _feature_views(t),
        key="conv_id",
        label_ts="probe_ts",
        strategy=strategy,
    )
    return out.select(
        "probe_id",
        "conv_id",
        F.unix_micros(F.col("probe_ts")).alias("probe_ts_us"),
        "last_role",
        "turn_ts_us",
        "last_tool",
        "tool_ts_us",
        "max_feature_ts_us",
        "leak_ok",
    )


def q_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time training set: two feature views as-of
    joined onto probe labels, with a per-row leakage audit column
    (max_feature_ts_us / leak_ok).  See operators/feature_store.py."""
    return _training_set(spark, sf_dir, "plain")


def q_training_set_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of ``training_set``: every view joined through the
    hot-key-safe time-bucketed as-of (same oracle text)."""
    return _training_set(spark, sf_dir, "bucketed")


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free bucketed target encoding of role against signal
    (strictly-earlier-bucket statistics + m-estimate smoothing)."""
    from uncharted_ta1_pipeline_spark.operators.feature_store import (
        target_encode_bucketed,
    )

    return target_encode_bucketed(load_transcripts(spark, sf_dir))


QUERIES = {
    "ingest_ordered": q_ingest_ordered,
    "asof_fit_predict": q_asof_fit_predict,
    "asof_fit_predict_bucketed": q_asof_fit_predict_bucketed,
    "sessionize": q_sessionize,
    "lag_lead": q_lag_lead,
    "cumulative": q_cumulative,
    "rolling": q_rolling,
    "ffill_tool": q_ffill_tool,
    "session_stats": q_session_stats,
    "conv_turn_rate": q_conv_turn_rate,
    "asof_features": q_asof_features,
    "role_entropy": q_role_entropy,
    "gap_quantiles": q_gap_quantiles,
    "training_set": q_training_set,
    "training_set_bucketed": q_training_set_bucketed,
    "target_encode": q_target_encode,
}


def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/embargo/test split over global event time plus the
    conversation-straddle contamination flag (operators/sampling.py)."""
    from uncharted_ta1_pipeline_spark.operators.sampling import temporal_split

    return temporal_split(load_transcripts(spark, sf_dir))


QUERIES["temporal_split"] = q_temporal_split


def q_rolling_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon rolling features (5/25/125 strictly-past turns) in one
    window pass — one sort+exchange serves every horizon."""
    t = win.with_rolling_multi(load_transcripts(spark, sf_dir), widths=(5, 25, 125))
    cols = ["conv_id", "turn_idx"]
    for width in (5, 25, 125):
        cols += [
            f"rolling_turns_{width}",
            f"rolling_tools_{width}",
            f"rolling_signal_mean_{width}",
        ]
    return t.select(*cols)


QUERIES["rolling_multi"] = q_rolling_multi


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn signal winsorized to per-conversation Tukey fences over
    µ-quantized integers (exact cross-engine; operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import winsorize_signal

    return winsorize_signal(load_transcripts(spark, sf_dir))


QUERIES["winsorize"] = q_winsorize


def q_tool_chain_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 consecutive tool-invocation bigrams across the corpus
    (operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import tool_chain_ngrams

    return tool_chain_ngrams(load_transcripts(spark, sf_dir))


QUERIES["tool_chain_ngrams"] = q_tool_chain_ngrams


def q_tool_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation same-tool run features (operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import tool_loops

    return tool_loops(load_transcripts(spark, sf_dir))


QUERIES["tool_loops"] = q_tool_loops


def q_assistant_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation user->assistant response-latency profile
    (operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import (
        assistant_latency,
    )

    return assistant_latency(load_transcripts(spark, sf_dir))


QUERIES["assistant_latency"] = q_assistant_latency


def q_conv_digest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level exact dedup by ordered turn digest
    (operators/dedup.py)."""
    from uncharted_ta1_pipeline_spark.operators.dedup import conv_digest_dedup

    return conv_digest_dedup(load_transcripts(spark, sf_dir))


QUERIES["conv_digest_dedup"] = q_conv_digest_dedup


def q_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-conversation k-turn cap by seeded hash order
    (operators/sampling.py)."""
    from uncharted_ta1_pipeline_spark.operators.sampling import per_group_sample

    return per_group_sample(load_transcripts(spark, sf_dir), k=5)


QUERIES["per_group_sample"] = q_per_group_sample

def q_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn strictly-past training context under a token budget
    (operators/context.py) — bounded-frame window, no joins."""
    from uncharted_ta1_pipeline_spark.operators.context import context_window

    return context_window(load_transcripts(spark, sf_dir))


QUERIES["context_window"] = q_context_window


def q_turn_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn word-bigram novelty vs strictly-past turns
    (operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import turn_novelty

    return turn_novelty(load_transcripts(spark, sf_dir))


QUERIES["turn_novelty"] = q_turn_novelty


def q_first_message_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census of normalized first-user-message templates, top-k with ties
    (operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import (
        first_message_templates,
    )

    return first_message_templates(load_transcripts(spark, sf_dir))


QUERIES["first_message_templates"] = q_first_message_templates

def q_session_carryover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session returning-user carryover features derived strictly from
    earlier sessions (operators/sessionize.py)."""
    from uncharted_ta1_pipeline_spark.operators.sessionize import (
        session_carryover,
    )

    return session_carryover(load_transcripts(spark, sf_dir))


QUERIES["session_carryover"] = q_session_carryover


def q_tool_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool next-turn-gap latency census (operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import tool_latency

    return tool_latency(load_transcripts(spark, sf_dir))


QUERIES["tool_latency"] = q_tool_latency


def q_conv_outcome(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation terminal-state / abandonment features: last role,
    last tool, unanswered-ending flag, trailing-user run length, idle tail
    vs corpus end (operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import conv_outcome

    return conv_outcome(load_transcripts(spark, sf_dir))


QUERIES["conv_outcome"] = q_conv_outcome


def q_echo_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per assistant turn, share of its distinct word bigrams echoed from
    the immediately preceding user turn (operators/convstats.py)."""
    from uncharted_ta1_pipeline_spark.operators.convstats import echo_rate

    return echo_rate(load_transcripts(spark, sf_dir))


QUERIES["echo_rate"] = q_echo_rate
