"""Edge-case tests for the conversation-profile and LM-fluency operators
(oracle parity at sf0.001 is covered by test_core_queries' parametrize)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from uncharted_ta1_pipeline_spark.functions.docf import lm_score
from uncharted_ta1_pipeline_spark.operators.convstats import (
    gap_quantile_features,
    role_transition_profile,
)


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )


TS0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(s: float) -> dt.datetime:
    return TS0 + dt.timedelta(seconds=s)


def test_role_profile_dominant_tie_break_and_exclusion(spark):
    # c1: u>a and a>u once each -> tie broken lexicographically ('a>u' wins);
    # c2: single turn -> no transitions -> excluded entirely.
    rows = [
        ("c1", 0, "user", _ts(0)),
        ("c1", 1, "assistant", _ts(1)),
        ("c1", 2, "user", _ts(2)),
        ("c2", 0, "user", _ts(0)),
    ]
    out = role_transition_profile(_t(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.conv_id == "c1"
    assert r.n_transitions == 2 and r.n_distinct == 2
    assert r.dominant_transition == "assistant>user"
    assert r.dominant_share == 0.5
    assert r.hhi == 0.5 and r.eff_transitions == 2.0


def test_role_profile_single_transition_concentration(spark):
    rows = [
        ("c1", 0, "user", _ts(0)),
        ("c1", 1, "tool", _ts(1)),
        ("c1", 2, "tool", _ts(2)),
    ]
    # transitions: user>tool, tool>tool -> hhi = (1/2)^2 * 2 = 0.5
    r = role_transition_profile(_t(spark, rows)).collect()[0]
    assert r.n_transitions == 2 and r.hhi == 0.5


def test_gap_quantiles_fence(spark):
    # gaps 1, 1, 1, 100 -> p25=1, p75 = 1+0.75*99... exact interpolation:
    # sorted [1,1,1,100], h=(n-1)p: p25 h=0.75 -> 1; p75 h=2.25 -> 1+0.25*99
    rows = [
        ("c1", 0, "user", _ts(0)),
        ("c1", 1, "user", _ts(1)),
        ("c1", 2, "user", _ts(2)),
        ("c1", 3, "user", _ts(3)),
        ("c1", 4, "user", _ts(103)),
    ]
    r = gap_quantile_features(_t(spark, rows)).collect()[0]
    assert r.n_gaps == 4
    assert r.p25_gap_s == 1.0
    assert r.p75_gap_s == 25.75
    assert r.iqr_gap_s == 24.75
    # fence = 25.75 + 1.5*24.75 = 62.875 -> only the 100s gap exceeds
    assert r.outlier_share == 0.25


def test_lm_score_excludes_token_poor_docs_and_scores_fluency(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat sat"),
            (3, "zq"),            # single token -> no bigrams -> excluded
            (4, ""),              # empty -> excluded
            (5, "cat the zz"),    # rare bigrams -> less fluent
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_score(docs).collect()}
    assert set(out) == {1, 2, 5}
    assert out[1].n_bigrams == 2
    # identical docs score identically; the rare-bigram doc is less fluent
    assert out[1].mean_inv_prob == out[2].mean_inv_prob
    assert out[5].mean_inv_prob > out[1].mean_inv_prob
    assert out[5].mean_cond_prob < out[1].mean_cond_prob


def test_lm_score_plan_has_no_cartesian_and_broadcasts_scalar(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    plan = lm_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_winsorize_clamps_to_fences(spark):
    """A single outlier turn is clamped to the upper Tukey fence and
    flagged; in-fence turns pass through unchanged (µ-exact round trip)."""
    import pyspark.sql.functions as F

    from uncharted_ta1_pipeline_spark.operators.convstats import winsorize_signal

    rows = [("c", i, f"2024-01-01 00:{i:02d}:00", float(v))
            for i, v in enumerate([1, 2, 3, 4, 1000])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, signal double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["turn_idx"]: r.asDict()
           for r in winsorize_signal(df).collect()}
    assert out[0]["signal_winsorized"] == 1.0 and out[0]["was_clipped"] == 0
    assert out[3]["signal_winsorized"] == 4.0 and out[3]["was_clipped"] == 0
    # quartiles of [1,2,3,4,1000]e6 µ: p25=2e6, p75=4e6, hi fence=7e6 -> 7.0
    assert out[4]["was_clipped"] == 1
    assert out[4]["signal_winsorized"] == 7.0


def test_tool_chain_ngrams_skips_non_tool_turns(spark):
    """Transitions pair CONSECUTIVE tool invocations, skipping non-tool
    turns in between; ties get rank() semantics."""
    import pyspark.sql.functions as F

    from uncharted_ta1_pipeline_spark.operators.convstats import (
        tool_chain_ngrams,
    )

    rows = [
        ("c1", 0, "2024-01-01 00:00:00", "search"),
        ("c1", 1, "2024-01-01 00:01:00", None),      # skipped
        ("c1", 2, "2024-01-01 00:02:00", "fetch"),   # search>fetch
        ("c1", 3, "2024-01-01 00:03:00", ""),        # skipped
        ("c1", 4, "2024-01-01 00:04:00", "fetch"),   # fetch>fetch
        ("c2", 0, "2024-01-01 00:00:00", "search"),
        ("c2", 1, "2024-01-01 00:01:00", "fetch"),   # search>fetch
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, tool string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["bigram"]: r.asDict() for r in tool_chain_ngrams(df).collect()}
    assert out["search>fetch"]["n_occurrences"] == 2
    assert out["search>fetch"]["n_convs"] == 2
    assert out["search>fetch"]["rk"] == 1
    assert out["fetch>fetch"]["n_occurrences"] == 1
    assert out["fetch>fetch"]["n_convs"] == 1
    assert out["fetch>fetch"]["rk"] == 2
    assert out["search>fetch"]["share"] == round(2 / 3, 6)
    assert len(out) == 2  # no None/empty-tool bigrams anywhere


def test_tool_loops_runs_and_tiebreak(spark):
    """Runs are maximal same-tool stretches over the FILTERED tool stream
    (non-tool turns don't break a run); longest-run ties go to the
    earliest run."""
    import pyspark.sql.functions as F

    from uncharted_ta1_pipeline_spark.operators.convstats import tool_loops

    rows = [
        # c1: search search | fetch | search search -> runs 2,1,2; tie -> search(run1)
        ("c1", 0, "2024-01-01 00:00:00", "search"),
        ("c1", 1, "2024-01-01 00:01:00", None),  # does not break the run
        ("c1", 2, "2024-01-01 00:02:00", "search"),
        ("c1", 3, "2024-01-01 00:03:00", "fetch"),
        ("c1", 4, "2024-01-01 00:04:00", "search"),
        ("c1", 5, "2024-01-01 00:05:00", "search"),
        # c2: bash x3 + read -> loop_share = 3/4
        ("c2", 0, "2024-01-01 00:00:00", "bash"),
        ("c2", 1, "2024-01-01 00:01:00", "bash"),
        ("c2", 2, "2024-01-01 00:02:00", "bash"),
        ("c2", 3, "2024-01-01 00:03:00", "read"),
        # c3: no tool turns -> excluded
        ("c3", 0, "2024-01-01 00:00:00", ""),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, tool string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["conv_id"]: r.asDict() for r in tool_loops(df).collect()}
    assert set(out) == {"c1", "c2"}
    c1 = out["c1"]
    assert (c1["n_tool_turns"], c1["n_runs"]) == (5, 3)
    assert (c1["max_run_len"], c1["max_run_tool"]) == (2, "search")
    assert c1["loop_share"] == 0.0
    c2 = out["c2"]
    assert (c2["n_tool_turns"], c2["n_runs"]) == (4, 2)
    assert (c2["max_run_len"], c2["max_run_tool"]) == (3, "bash")
    assert c2["loop_share"] == 0.75


def test_assistant_latency_adjacent_pairs_only(spark):
    """Only immediate user->assistant adjacencies count; an intervening
    tool turn breaks the pair."""
    import pyspark.sql.functions as F

    from uncharted_ta1_pipeline_spark.operators.convstats import (
        assistant_latency,
    )

    rows = [
        ("c1", 0, "2024-01-01 00:00:00", "user"),
        ("c1", 1, "2024-01-01 00:00:02", "assistant"),   # 2 s
        ("c1", 2, "2024-01-01 00:00:10", "user"),
        ("c1", 3, "2024-01-01 00:00:11", "tool"),        # breaks adjacency
        ("c1", 4, "2024-01-01 00:00:20", "assistant"),
        ("c1", 5, "2024-01-01 00:01:00", "user"),
        ("c1", 6, "2024-01-01 00:01:06", "assistant"),   # 6 s
        ("c2", 0, "2024-01-01 00:00:00", "assistant"),   # no pair -> excluded
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts string, role string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["conv_id"]: r.asDict() for r in assistant_latency(df).collect()}
    assert set(out) == {"c1"}
    c1 = out["c1"]
    assert c1["n_responses"] == 2
    assert c1["mean_latency_s"] == 4.0
    assert c1["p50_latency_s"] == 4.0
    assert c1["max_latency_s"] == 6.0


def test_session_carryover_gap_and_cumulative(spark):
    from uncharted_ta1_pipeline_spark.operators.sessionize import (
        session_carryover,
    )

    # three sessions: turns at 0/10s, 3600s, 9000/9010s (gap threshold 1800s)
    rows = [
        ("c1", 0, "user", _ts(0)),
        ("c1", 1, "assistant", _ts(10)),
        ("c1", 2, "user", _ts(3600)),
        ("c1", 3, "user", _ts(9000)),
        ("c1", 4, "assistant", _ts(9010)),
    ]
    df = _t(spark, rows).withColumn("tool", F.lit(None).cast("string"))
    out = {r.session_id: r for r in session_carryover(df).collect()}
    assert set(out) == {0, 1, 2}
    s0, s1, s2 = out[0], out[1], out[2]
    assert s0.n_turns == 2 and s0.gap_since_prev_s is None
    assert s0.prev_session_turns is None and s0.turns_before == 0
    assert s1.n_turns == 1 and s1.gap_since_prev_s == 3590.0
    assert s1.prev_session_turns == 2 and s1.turns_before == 2
    assert s2.n_turns == 2 and s2.gap_since_prev_s == 5400.0
    assert s2.prev_session_turns == 1 and s2.turns_before == 3


def test_tool_latency_excludes_last_turn_and_groups_by_tool(spark):
    from uncharted_ta1_pipeline_spark.operators.convstats import tool_latency

    rows = [
        ("c1", 0, "tool", _ts(0)),    # bash, next at +5s
        ("c1", 1, "tool", _ts(5)),    # bash, next at +15s
        ("c1", 2, "user", _ts(20)),   # not a tool turn
        ("c1", 3, "tool", _ts(30)),   # search, LAST turn -> excluded
        ("c2", 0, "tool", _ts(0)),    # search, next at +7s
        ("c2", 1, "user", _ts(7)),
    ]
    df = _t(spark, rows).withColumn(
        "tool",
        F.when(F.col("role") != "tool", F.lit(None).cast("string")).otherwise(
            F.when(
                (F.col("conv_id") == "c1") & (F.col("turn_idx") < 2), "bash"
            ).otherwise("search")
        ),
    )
    out = {r.tool: r for r in tool_latency(df).collect()}
    assert set(out) == {"bash", "search"}
    assert out["bash"].n_calls == 2
    assert out["bash"].mean_next_gap_s == 10.0
    assert out["bash"].p50_next_gap_s == 10.0
    assert out["bash"].max_next_gap_s == 15.0
    assert out["search"].n_calls == 1  # c1's last turn contributed nothing
    assert out["search"].mean_next_gap_s == 7.0


def test_conv_outcome_trailing_run_and_idle_tail(spark):
    from uncharted_ta1_pipeline_spark.operators.convstats import conv_outcome

    # c1 ends on two trailing user turns (abandoned); c2 ends answered by
    # a tool turn; c3 is all-user (trailing run == n_turns, no last_tool).
    rows = [
        ("c1", 0, "user", _ts(0)),
        ("c1", 1, "assistant", _ts(10)),
        ("c1", 2, "user", _ts(20)),
        ("c1", 3, "user", _ts(30)),
        ("c2", 0, "user", _ts(0)),
        ("c2", 1, "tool", _ts(40)),   # corpus max ts
        ("c3", 0, "user", _ts(5)),
    ]
    df = _t(spark, rows).withColumn(
        "tool",
        F.when(F.col("role") == "tool", F.lit("bash")).otherwise(
            F.lit(None).cast("string")
        ),
    )
    out = {r.conv_id: r for r in conv_outcome(df).collect()}
    c1, c2, c3 = out["c1"], out["c2"], out["c3"]
    assert c1.n_turns == 4 and c1.last_role == "user"
    assert c1.ends_unanswered == 1 and c1.n_trailing_user == 2
    assert c1.last_tool is None
    assert c1.idle_tail_s == 10.0  # corpus max (t=40) - c1 last (t=30)
    assert c2.ends_unanswered == 0 and c2.n_trailing_user == 0
    assert c2.last_tool == "bash" and c2.idle_tail_s == 0.0
    assert c3.n_turns == 1 and c3.n_trailing_user == 1
    assert c3.ends_unanswered == 1 and c3.idle_tail_s == 35.0


def test_echo_rate_adjacent_user_assistant_only(spark):
    from uncharted_ta1_pipeline_spark.operators.convstats import echo_rate

    # turn1 echoes 'list the files' bigrams from turn0; turn3 follows a
    # TOOL turn so it is not scored; turn4 follows a user turn but shares
    # nothing.  Single-word assistant text has zero bigrams -> excluded.
    rows = [
        ("c1", 0, "user", _ts(0), "please list the files now"),
        ("c1", 1, "assistant", _ts(1), "i will list the files"),
        ("c1", 2, "tool", _ts(2), "ls -la output"),
        ("c1", 3, "assistant", _ts(3), "list the files again"),
        ("c2", 0, "user", _ts(0), "hello there friend"),
        ("c2", 1, "assistant", _ts(1), "completely different reply"),
        ("c3", 0, "user", _ts(0), "short question"),
        ("c3", 1, "assistant", _ts(1), "ok"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, ts timestamp, text string",
    )
    out = {(r.conv_id, r.turn_idx): r for r in echo_rate(df).collect()}
    # scored: only (c1,1) and (c2,1)
    assert set(out) == {("c1", 1), ("c2", 1)}
    r = out[("c1", 1)]
    # bigrams: 'i will','will list','list the','the files' -> 4;
    # echoed from turn0 ('please list','list the','the files','files now'):
    # 'list the','the files' -> 2
    assert r.n_bigrams == 4 and r.n_echoed == 2 and r.echo_share == 0.5
    r2 = out[("c2", 1)]
    assert r2.n_bigrams == 2 and r2.n_echoed == 0 and r2.echo_share == 0.0
