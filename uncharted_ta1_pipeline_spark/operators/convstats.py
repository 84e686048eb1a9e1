"""Conversation-level profile features: role-transition concentration and
inter-turn gap quantiles.

The north-star names "role-transition features" as a first-class output of
the feature factory; `windows.with_lag_lead` emits the per-TURN transition
label (the analog of the reference's adjacent-block pairing,
/root/reference/tasks/geo_referencing/coordinates_extractor.py:509-539).
This module adds the per-CONVERSATION aggregate profile over those labels —
the summary a corpus-curation / model-analysis pass consumes (mix of
user->assistant vs tool-loop traffic, burstiness of turn timing).

Determinism contract (shared with every oracle-checked operator here):
no transcendental functions.  JVM ``Math.log`` and DuckDB's libm ``ln``
are not correctly rounded and can disagree in the last ulp, so instead of
Shannon entropy we report the Simpson concentration (HHI) and its inverse
("effective number of transitions") — rational in the transition counts,
hence bit-identical across engines after round(6).  Same reasoning as the
linear-idf variants in functions/docf.py (tfidf/bm25).

Scale notes: the lag window partitions by conversation — same shape as
``with_lag_lead``; conversations above the hot threshold should be routed
through the chunked machinery in operators/salt.py exactly as
featurize_hybrid does.  Everything after the lag is a two-level groupBy
with map-side combine on bounded keys (≤ |roles|² = 9 transitions per
conversation), so the aggregate stages carry no skew regardless of
conversation length.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_ORD = ("ts", "turn_idx")


def role_transition_profile(df: DataFrame) -> DataFrame:
    """Per-conversation role-transition profile.

    Output: conv_id, n_transitions, n_distinct, dominant_transition
    (max count, ties broken lexicographically smallest), dominant_share,
    hhi = Σ(c/N)² (Simpson concentration), eff_transitions = 1/hhi.
    Conversations with a single turn have no transitions and are excluded
    (matches the oracle's inner join on the transition stream).
    """
    w = Window.partitionBy("conv_id").orderBy(*_ORD)
    tr = (
        df.withColumn("_prev_role", F.lag("role").over(w))
        .filter(F.col("_prev_role").isNotNull())
        .select(
            "conv_id",
            F.concat_ws(">", "_prev_role", "role").alias("transition"),
        )
    )
    cnt = tr.groupBy("conv_id", "transition").agg(
        F.count(F.lit(1)).alias("c")
    )
    # min over struct(-count, transition) == (count DESC, transition ASC)
    dom = F.min(
        F.struct((-F.col("c")).alias("nc"), F.col("transition").alias("t"))
    )
    n = F.col("n_transitions")
    return (
        cnt.groupBy("conv_id")
        .agg(
            F.sum("c").cast("long").alias("n_transitions"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            dom.alias("_dom"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("_ss"),
        )
        .select(
            "conv_id",
            "n_transitions",
            "n_distinct",
            F.col("_dom.t").alias("dominant_transition"),
            F.round((-F.col("_dom.nc")).cast("double") / n, 6).alias(
                "dominant_share"
            ),
            F.round(F.col("_ss").cast("double") / (n * n), 6).alias("hhi"),
            F.round((n * n).cast("double") / F.col("_ss"), 6).alias(
                "eff_transitions"
            ),
        )
    )


def gap_quantile_features(df: DataFrame, fence_k: float = 1.5) -> DataFrame:
    """Per-conversation inter-turn-gap quantiles + Tukey-fence outlier share.

    gap_s = seconds between consecutive turns (stable (ts, turn_idx) order).
    Output: conv_id, n_gaps, p25/p50/p75 (exact linearly-interpolated
    percentiles — Spark ``percentile`` and DuckDB ``quantile_cont`` share
    the h = (n-1)p formula), iqr, and outlier_share = fraction of gaps
    above p75 + ``fence_k``·iqr (the classic boxplot fence; flags bursty
    conversations whose timing features need winsorizing downstream).

    Two aggregation passes over the gap stream (quantiles, then the share
    against the per-conv fence) — the fence join shuffles on conv_id, the
    same key the gaps were grouped on, so AQE coalesces it into the
    existing exchange.  Single-turn conversations have no gaps and are
    excluded.

    Exactness contract (why everything below is INTEGER microseconds):
    computing ``gap_s = (us - prev_us)/1e6`` first and interpolating over
    the resulting non-representable doubles left Spark ``percentile`` and
    DuckDB ``quantile_cont`` one ulp apart, which round(6) amplified to a
    visible digit (the r4 driver's one hash-red row).  Instead the
    percentiles run over the integer microsecond gaps: the h=(n-1)p
    interpolation with p ∈ {.25,.5,.75} over int64 inputs is exact in
    double in BOTH engines (result = multiple of 0.25 µs), the Tukey
    fence stays in exact micros (multiple of 0.125 µs), and each reported
    percentile is rounded to a WHOLE microsecond before the single /1e6 —
    so the final round(6) never lands on a decimal half-boundary where
    Spark's BigDecimal HALF_UP and DuckDB's multiply-round could split.

    Scale note: integer gaps also give the percentile's per-GROUP
    value->count map a quantization lever — coarsen the unit (ms, s) and
    the map is bounded by the gap RANGE instead of conversation length,
    exactly as temporal_split quantizes event time to minutes.
    """
    w = Window.partitionBy("conv_id").orderBy(*_ORD)
    g = (
        df.withColumn("_us", F.unix_micros("ts"))
        .withColumn("_prev", F.lag("_us").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            "conv_id",
            (F.col("_us") - F.col("_prev")).cast("long").alias("gap_us"),
        )
    )
    q = g.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.expr("percentile(gap_us, 0.25)").alias("_p25u"),
        F.expr("percentile(gap_us, 0.5)").alias("_p50u"),
        F.expr("percentile(gap_us, 0.75)").alias("_p75u"),
    )
    # fence in raw (quarter-µs-exact) percentile micros; the comparison is
    # integer-vs-eighth-µs-multiple, so strict > cannot flip on an ulp
    fence = F.col("_p75u") + fence_k * (F.col("_p75u") - F.col("_p25u"))
    out = (
        g.join(q, on="conv_id")
        .groupBy("conv_id")
        .agg(
            F.max("n_gaps").alias("n_gaps"),
            F.max("_p25u").alias("_p25u"),
            F.max("_p50u").alias("_p50u"),
            F.max("_p75u").alias("_p75u"),
            F.sum((F.col("gap_us") > fence).cast("long")).alias("_n_out"),
        )
    )

    def _secs(cu):  # whole-µs round (HALF_UP == DuckDB's half-away for >0)
        return F.round(F.round(cu, 0) / 1_000_000.0, 6)

    return out.select(
        "conv_id",
        "n_gaps",
        _secs(F.col("_p25u")).alias("p25_gap_s"),
        _secs(F.col("_p50u")).alias("p50_gap_s"),
        _secs(F.col("_p75u")).alias("p75_gap_s"),
        F.round(
            (F.round(F.col("_p75u"), 0) - F.round(F.col("_p25u"), 0))
            / 1_000_000.0,
            6,
        ).alias("iqr_gap_s"),
        F.round(F.col("_n_out").cast("double") / F.col("n_gaps"), 6).alias(
            "outlier_share"
        ),
    )


def winsorize_signal(df: DataFrame, fence_k: float = 1.5) -> DataFrame:
    """Per-turn winsorized signal: clamp each turn's ``signal`` to its
    conversation's Tukey fences (p25/p75 ± ``fence_k``·iqr) — the
    downstream consumer `gap_quantile_features` exists to feed ("bursty
    conversations whose timing features need winsorizing downstream").

    Output: conv_id, turn_idx, signal_winsorized, was_clipped (0/1).

    Exactness contract (inherited from gap_quantile_features verbatim):
    the percentiles run over µ-quantized int64 signal, so the h=(n-1)p
    interpolation at p ∈ {.25,.75} is exact in double in both engines;
    the fences are rounded to WHOLE µ before the clamp, so the integer
    vs whole-µ comparisons cannot flip on an ulp and the single /1e6 +
    round(6) never lands on a decimal half-boundary.

    Scale: one bounded groupBy (two percentiles over the µ-quantized
    value->count map — bounded by the signal RANGE, not conversation
    length) and one join back on conv_id, the same key — AQE coalesces it
    into the existing exchange, exactly as gap_quantile_features.
    Reference analog re-expressed: observation clamping to the geofence's
    valid range, /root/reference/tasks/geo_referencing/geofence.py with
    the MAD pre-pass of util.py:76-96.
    """
    qsig = F.floor(F.col("signal") * F.lit(1000000.0)).cast("long")
    g = df.select("conv_id", "turn_idx", qsig.alias("_q"))
    pct = g.groupBy("conv_id").agg(
        F.expr("percentile(_q, 0.25)").alias("_p25"),
        F.expr("percentile(_q, 0.75)").alias("_p75"),
    )
    iqr = F.col("_p75") - F.col("_p25")
    lo = F.round(F.col("_p25") - fence_k * iqr, 0)
    hi = F.round(F.col("_p75") + fence_k * iqr, 0)
    return (
        g.join(pct, on="conv_id")
        .select(
            "conv_id",
            "turn_idx",
            F.round(
                F.least(F.greatest(F.col("_q").cast("double"), lo), hi)
                / 1_000_000.0,
                6,
            ).alias("signal_winsorized"),
            ((F.col("_q") < lo) | (F.col("_q") > hi)).cast("long").alias(
                "was_clipped"
            ),
        )
    )


def tool_loops(df: DataFrame, loop_min: int = 3) -> DataFrame:
    """Per-conversation same-tool run features — the loop detector the
    tool-transition census (`tool_chain_ngrams`) exists to feed: an agent
    stuck calling the same tool repeatedly is the classic curation reject.

    Over each conversation's stream of CONSECUTIVE tool invocations
    (non-tool turns skipped, same stream as tool_chain_ngrams), maximal
    runs of the same tool are found by the gaps-and-islands pattern
    (lag -> break flag -> running sum; same construction as
    runs.best_monotone_run).  Output per conversation with ≥1 tool turn:
    n_tool_turns, n_runs, max_run_len, max_run_tool (longest run's tool,
    ties -> earliest run), loop_share = fraction of tool turns inside
    runs of length ≥ ``loop_min``, rounded(6).

    Scale: one lag window + one running-sum window, both on the conv_id
    partitioning every per-conversation op shares; the two groupBys
    reduce on (conv_id, run) then conv_id with map-side combine, so
    nothing is quadratic in conversation length and the only shuffle key
    is conv_id throughout (AQE coalesces the chain into one exchange).
    Reference analog re-expressed: greedy monotone coordinate grouping,
    keep-the-largest-group, /root/reference/tasks/geo_referencing/
    coordinates_extractor.py:621-688.
    """
    w = Window.partitionBy("conv_id").orderBy(*_ORD)
    incl = w.rowsBetween(Window.unboundedPreceding, 0)
    t = df.filter(F.col("tool").isNotNull() & (F.col("tool") != "")).select(
        "conv_id", "ts", "turn_idx", "tool"
    )
    prev = F.lag("tool").over(w)
    runs = (
        t.withColumn(
            "_brk", (prev.isNull() | (F.col("tool") != prev)).cast("long")
        )
        .withColumn("_run", F.sum("_brk").over(incl))
        .groupBy("conv_id", "_run")
        .agg(
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.first("tool").alias("tool"),
        )
    )
    # min over struct(-run_len, run_id) == (run_len DESC, run_id ASC)
    best = F.min(
        F.struct(
            (-F.col("run_len")).alias("nl"),
            F.col("_run").alias("r"),
            F.col("tool").alias("t"),
        )
    )
    return (
        runs.groupBy("conv_id")
        .agg(
            F.sum("run_len").cast("long").alias("n_tool_turns"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            best.alias("_best"),
            F.sum(
                F.when(F.col("run_len") >= loop_min, F.col("run_len")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("_loop_turns"),
        )
        .select(
            "conv_id",
            "n_tool_turns",
            "n_runs",
            (-F.col("_best.nl")).cast("long").alias("max_run_len"),
            F.col("_best.t").alias("max_run_tool"),
            F.round(
                F.col("_loop_turns").cast("double") / F.col("n_tool_turns"), 6
            ).alias("loop_share"),
        )
    )


def assistant_latency(df: DataFrame) -> DataFrame:
    """Per-conversation assistant response-latency profile: over pairs of
    CONSECUTIVE turns where a user turn is immediately followed by an
    assistant turn, the latency distribution — the responsiveness feature
    a quality/engagement model consumes alongside gap_quantile_features'
    all-pairs burstiness.

    Output per conversation with ≥1 user->assistant adjacency:
    n_responses, mean_latency_s, p50_latency_s, max_latency_s (seconds,
    round(6)).

    Exactness contract (inherited from gap_quantile_features verbatim):
    latencies stay INTEGER microseconds through the aggregate — the
    h=(n-1)p percentile interpolation at p=.5 over int64 is exact in
    double in both engines, mean is one int64-sum / int64-count IEEE
    division (identical in both), and each statistic is rounded to a
    WHOLE microsecond before the single /1e6 + round(6).

    Scale: one lag window on the conv_id partitioning, then a single
    bounded groupBy; the percentile's value->count map quantizes with the
    same unit-coarsening lever documented on gap_quantile_features.
    Reference analog re-expressed: per-pair pixel/geo offset statistics of
    /root/reference/tasks/geo_referencing/util.py:76-96, conditioned on
    pair type.
    """
    w = Window.partitionBy("conv_id").orderBy(*_ORD)
    g = (
        df.withColumn("_us", F.unix_micros("ts"))
        .withColumn("_prev_role", F.lag("role").over(w))
        .withColumn("_prev_us", F.lag("_us").over(w))
        .filter(
            (F.col("_prev_role") == "user") & (F.col("role") == "assistant")
        )
        .select(
            "conv_id",
            (F.col("_us") - F.col("_prev_us")).cast("long").alias("lat_us"),
        )
    )

    def _secs(cu):  # whole-µs round first; single /1e6 then round(6)
        return F.round(F.round(cu, 0) / 1_000_000.0, 6)

    return g.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_responses"),
        _secs(
            F.sum("lat_us").cast("double") / F.count(F.lit(1))
        ).alias("mean_latency_s"),
        _secs(F.expr("percentile(lat_us, 0.5)")).alias("p50_latency_s"),
        _secs(F.max("lat_us").cast("double")).alias("max_latency_s"),
    )


def conv_outcome(df: DataFrame) -> DataFrame:
    """Per-conversation terminal-state features: how (and when) each
    conversation ended — the abandonment/completion signal a curation pass
    and an engagement model consume alongside the burstiness profile.

    Output per conversation: n_turns, last_role, last_tool (tool of the
    last tool-bearing turn, null if none), ends_unanswered (1 iff the
    final turn is a user turn — the user was left hanging),
    n_trailing_user (length of the trailing run of user turns; equals
    n_turns when no non-user turn exists), idle_tail_s (seconds between
    the conversation's last turn and the corpus' latest timestamp — the
    "how stale is this thread" recency feature, round 6).

    Exactness contract: positions come from row_number over the stable
    (ts, turn_idx) order (unique, so max_by/arg_max ties are impossible);
    idle_tail stays INTEGER microseconds until one IEEE /1e6 + round(6),
    identical in both engines (the lag_lead secs_since_prev convention).

    Scale: one row_number window on the canonical conv_id partitioning,
    one map-side-combined groupBy on the same key (AQE coalesces the pair
    into a single exchange), and one crossJoin against a broadcast
    1-row corpus-max aggregate — the approved broadcast-scalar shape
    (sampling.py domain_mix, docf.py oov_rate).  Nothing is quadratic in
    conversation length and no whole-corpus window exists.
    Reference analog re-expressed: terminal run-status classification
    (CoordStatus OK / OUTSIDE_GEOFENCE and the unanswered-query fallback)
    that the reference attaches to each extraction run,
    /root/reference/tasks/geo_referencing/coordinates_extractor.py and
    georeference.py's final status summarization.
    """
    w = Window.partitionBy("conv_id").orderBy(*_ORD)
    t = (
        df.withColumn("_us", F.unix_micros("ts"))
        .withColumn("_rn", F.row_number().over(w))
        .select("conv_id", "_us", "_rn", "role", "tool")
    )
    is_tool = F.col("tool").isNotNull() & (F.col("tool") != "")
    per = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.max_by("role", "_rn").alias("last_role"),
        F.max("_us").alias("_last_us"),
        F.max(F.when(F.col("role") != "user", F.col("_rn"))).alias(
            "_last_nonuser"
        ),
        F.max(
            F.when(
                is_tool,
                F.struct(F.col("_rn").alias("rn"), F.col("tool").alias("t")),
            )
        ).alias("_lt"),
    )
    corpus = df.agg(F.max(F.unix_micros("ts")).alias("_corpus_us"))
    return (
        per.crossJoin(F.broadcast(corpus))
        .select(
            "conv_id",
            "n_turns",
            "last_role",
            F.col("_lt.t").alias("last_tool"),
            (F.col("last_role") == "user").cast("long").alias(
                "ends_unanswered"
            ),
            (
                F.col("n_turns")
                - F.coalesce(F.col("_last_nonuser"), F.lit(0))
            )
            .cast("long")
            .alias("n_trailing_user"),
            F.round(
                (F.col("_corpus_us") - F.col("_last_us")) / 1_000_000.0, 6
            ).alias("idle_tail_s"),
        )
    )


def tool_chain_ngrams(df: DataFrame, top_k: int = 20) -> DataFrame:
    """Corpus-level tool-transition census: the top-k bigrams of
    CONSECUTIVE tool invocations (non-tool turns skipped) across all
    conversations — the "which tool follows which" profile that drives
    tool-loop detection and agent-behavior features.

    Output: bigram ("a>b"), n_occurrences, n_convs (distinct conversations
    containing it), share of all transitions, rk (rank() — ties share a
    rank, same convention as topk_with_ties).

    Scale: the lag runs over the FILTERED tool stream (one window on the
    same conv_id partitioning as every other per-conversation op); the
    census groupBy is bounded by |tool vocab|² keys, so the global
    share/rank window at the end orders a bounded histogram, never the
    corpus (the approved global-window shape — see curriculum/eval_deciles).
    Reference analog re-expressed: per-source keypoint histograms,
    /root/reference/tasks/geo_referencing/coordinates_extractor.py:186-204.
    """
    t = df.filter(F.col("tool").isNotNull() & (F.col("tool") != "")).select(
        "conv_id", "ts", "turn_idx", "tool"
    )
    w = Window.partitionBy("conv_id").orderBy(*_ORD)
    big = (
        t.withColumn("_prev", F.lag("tool").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            "conv_id",
            F.concat_ws(">", "_prev", "tool").alias("bigram"),
        )
    )
    c = big.groupBy("bigram").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
    )
    wg = Window.orderBy(F.col("n_occurrences").desc(), F.col("bigram").asc())
    return (
        c.withColumn(
            "share",
            F.round(
                F.col("n_occurrences")
                / F.sum("n_occurrences").over(
                    Window.partitionBy(F.lit(1))
                ),
                6,
            ),
        )
        .withColumn("rk", F.rank().over(wg).cast("long"))
        .filter(F.col("rk") <= top_k)
        .select("bigram", "n_occurrences", "n_convs", "share", "rk")
    )


def turn_novelty(df: DataFrame) -> DataFrame:
    """Per-turn word-bigram novelty vs the conversation's strictly-past
    turns — the self-repetition signal a curation pass uses to down-weight
    turns that merely restate earlier content (the within-conversation
    analog of the corpus-level `repetition` Gopher signals in
    functions/docf.py).

    A turn's DISTINCT word bigrams (split on single space, empty tokens
    dropped — the docf tokenization convention; pairs built by zipping two
    slices, the lm_score pattern) are marked novel iff their first
    occurrence in the conversation is this turn.  Because ``turn_idx`` IS
    the stable (ts, turn_idx) order position (sources/transcripts.py), the
    first occurrence is ``min(turn_idx)`` per (conv_id, bigram) — a turn
    never competes with itself, so "first occurrence here" == "absent from
    all strictly-past turns" (zero temporal leakage by construction).

    Output per turn with >= 1 bigram: conv_id, turn_idx, n_bigrams
    (distinct), n_novel, novelty_share (round 6).

    Scale: one explode of per-turn distinct bigrams (no self-join), one
    window min over (conv_id, bigram) — conversation-local keys, so the
    shuffle is conv-sized, never corpus-sized — then a map-side-combined
    groupBy back to (conv_id, turn_idx).  Hot-conversation skew is bounded
    by the per-turn distinct-bigram count, not conversation length.
    Reference analog re-expressed: duplicate-keypoint suppression keyed on
    first extraction, /root/reference/tasks/geo_referencing/
    coordinates_extractor.py:186-204 with the overlap dedup of
    tasks/point_extraction/tiling.py:277-413.
    """
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    t = df.select("conv_id", "turn_idx", toks.alias("_toks"))
    n = F.size("_toks")
    lead = F.greatest(n - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("_toks", 1, lead),
        F.slice("_toks", 2, lead),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    bg = t.select(
        "conv_id",
        "turn_idx",
        F.explode(F.array_distinct(pairs)).alias("bigram"),
    )
    wfirst = Window.partitionBy("conv_id", "bigram")
    flagged = bg.withColumn("_first", F.min("turn_idx").over(wfirst))
    return (
        flagged.groupBy("conv_id", "turn_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum((F.col("_first") == F.col("turn_idx")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "n_bigrams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_bigrams"), 6
            ).alias("novelty_share"),
        )
    )


def echo_rate(df: DataFrame) -> DataFrame:
    """Per assistant turn, the share of its distinct word bigrams that
    already appeared in the IMMEDIATELY PRECEDING user turn — the
    parroting/echo signal a curation pass uses to down-weight assistant
    turns that merely restate the question (the adjacent-pair cousin of
    `turn_novelty`, which scores against ALL strictly-past turns).

    Only adjacencies where a user turn is immediately followed by an
    assistant turn are scored (the assistant_latency pairing convention);
    assistant turns with zero bigrams are excluded (no 0/0).  Output:
    conv_id, turn_idx, n_bigrams (distinct, this turn), n_echoed
    (intersection with the previous user turn's distinct bigrams),
    echo_share (round 6 — one int/int IEEE division, identical in both
    engines).

    Tokenization is the docf convention (split on single space, empty
    tokens dropped); bigrams are built by zipping two slices (the
    turn_novelty/lm_score pattern) and deduplicated per turn, so the
    intersection semantics are set-vs-set in both engines
    (array_intersect / list_intersect both return distinct elements).

    Scale: one lag window on the canonical conv_id partitioning carrying
    the per-turn distinct-bigram ARRAY (bounded by turn length, never
    conversation length) — no explode, no self-join, no whole-corpus
    state.  Reference analog re-expressed: suppression of extractions
    that duplicate the immediately preceding tile's keypoints,
    /root/reference/tasks/point_extraction/tiling.py:277-413.

    NULL-text hardening (ADVICE r5): tokenization coalesces to an empty
    array so a NULL previous turn yields n_echoed = 0 (the oracle's
    greatest(len(NULL),1) path), not legacy size(NULL) = -1 — unreachable
    with load_transcripts (text is concat-derived) but latent for other
    sources such as synth_transcripts.
    """
    toks = F.coalesce(
        F.filter(F.split(F.col("text"), " "), lambda t: t != ""),
        F.array().cast("array<string>"),
    )
    t = df.select("conv_id", "ts", "turn_idx", "role", toks.alias("_toks"))
    n = F.size("_toks")
    lead_n = F.greatest(n - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("_toks", 1, lead_n),
        F.slice("_toks", 2, lead_n),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    t = t.select(
        "conv_id",
        "ts",
        "turn_idx",
        "role",
        F.array_distinct(pairs).alias("_bg"),
    )
    w = Window.partitionBy("conv_id").orderBy(*_ORD)
    p = (
        t.withColumn("_prev_role", F.lag("role").over(w))
        .withColumn("_prev_bg", F.lag("_bg").over(w))
        .filter(
            (F.col("role") == "assistant")
            & (F.col("_prev_role") == "user")
            & (F.size("_bg") >= 1)
        )
    )
    n_bg = F.size("_bg").cast("long")
    n_echo = F.size(F.array_intersect("_bg", "_prev_bg")).cast("long")
    return p.select(
        "conv_id",
        "turn_idx",
        n_bg.alias("n_bigrams"),
        n_echo.alias("n_echoed"),
        F.round(n_echo.cast("double") / n_bg, 6).alias("echo_share"),
    )


def first_message_templates(df: DataFrame, top_k: int = 20) -> DataFrame:
    """Corpus-level template census over each conversation's FIRST user
    turn: normalize (lowercase, digit runs -> '#'), count conversations per
    template, top-k with ties — the boilerplate/template detector a
    curation pass runs to find scripted or duplicated conversation openers
    (the conversation-level cousin of line_dedup's boilerplate removal).

    Output: template, n_convs, share (of conversations that have a user
    turn), rk (rank() — ties share a rank), example_conv_id (smallest
    conv_id bearing the template, the canonical exemplar).

    Scale: the first-user-turn extraction is one window row_number on the
    canonical conv_id partitioning; the census groupBy is bounded by the
    template vocabulary (tiny vs corpus), so the global share/rank window
    orders a bounded histogram — the approved global-window shape
    (curriculum/eval_deciles/tool_chain_ngrams).  Reference analog
    re-expressed: per-source keypoint histograms + canonical-exemplar
    dedup rank, /root/reference/tasks/geo_referencing/
    coordinates_extractor.py:186-204.

    NOTE (ADVICE r5): the ``top_k=20`` default is frozen into the
    registered oracle SQL; non-default calls bypass the driver parity gate
    and are pytest-only — the denoise_segments convention.
    """
    w = Window.partitionBy("conv_id").orderBy(*_ORD)
    fm = (
        df.filter(F.col("role") == "user")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "conv_id",
            F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "#").alias(
                "template"
            ),
        )
    )
    c = fm.groupBy("template").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.min("conv_id").alias("example_conv_id"),
    )
    wg = Window.orderBy(F.col("n_convs").desc(), F.col("template").asc())
    return (
        c.withColumn(
            "share",
            F.round(
                F.col("n_convs")
                / F.sum("n_convs").over(Window.partitionBy(F.lit(1))),
                6,
            ),
        )
        .withColumn("rk", F.rank().over(wg).cast("long"))
        .filter(F.col("rk") <= top_k)
        .select("template", "n_convs", "share", "rk", "example_conv_id")
    )


def tool_latency(df: DataFrame) -> DataFrame:
    """Corpus-level per-tool latency census: for every tool invocation that
    has a following turn in the same conversation, the gap to that next
    turn — the execution-latency proxy an agent-performance dashboard and
    a tool-cost model consume (which tools stall conversations).

    Output per tool: n_calls, mean_next_gap_s, p50_next_gap_s,
    max_next_gap_s (seconds, round 6).  Conversations' last turns have no
    next turn and are excluded.

    Exactness contract (inherited from assistant_latency verbatim): gaps
    stay INTEGER microseconds through the aggregate; mean is one
    int64-sum / int64-count IEEE division; the p50 h=(n-1)p interpolation
    over int64 is exact in double in both engines; every statistic rounds
    to a WHOLE microsecond before the single /1e6 + round(6).

    Scale: one lead window on the canonical conv_id partitioning, then a
    groupBy on the BOUNDED tool vocabulary (map-side combined; the
    percentile's per-tool value->count map carries the same unit-coarsening
    quantization lever documented on gap_quantile_features).  Reference
    analog re-expressed: per-source keypoint histograms + pair offset
    statistics, /root/reference/tasks/geo_referencing/
    coordinates_extractor.py:186-204, util.py:76-96.
    """
    w = Window.partitionBy("conv_id").orderBy(*_ORD)
    us = F.unix_micros("ts")
    g = (
        df.withColumn("_gap", (F.lead(us).over(w) - us).cast("long"))
        .filter(
            F.col("tool").isNotNull()
            & (F.col("tool") != "")
            & F.col("_gap").isNotNull()
        )
        .select("tool", "_gap")
    )

    def _secs(cu):  # whole-µs round first; single /1e6 then round(6)
        return F.round(F.round(cu, 0) / 1_000_000.0, 6)

    return g.groupBy("tool").agg(
        F.count(F.lit(1)).cast("long").alias("n_calls"),
        _secs(F.sum("_gap").cast("double") / F.count(F.lit(1))).alias(
            "mean_next_gap_s"
        ),
        _secs(F.expr("percentile(_gap, 0.5)")).alias("p50_next_gap_s"),
        _secs(F.max("_gap").cast("double")).alias("max_next_gap_s"),
    )
