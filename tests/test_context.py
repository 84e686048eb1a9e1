"""Edge-case tests for context_window, turn_novelty, and
first_message_templates (oracle parity at sf0.001 is covered by
test_core_queries' parametrize)."""

from __future__ import annotations

import datetime as dt
import hashlib

from uncharted_ta1_pipeline_spark.operators.context import context_window
from uncharted_ta1_pipeline_spark.operators.convstats import (
    first_message_templates,
    turn_novelty,
)

TS0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(s: float) -> dt.datetime:
    return TS0 + dt.timedelta(seconds=s)


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


def _md5(texts):
    return hashlib.md5("\u001f".join(texts).encode()).hexdigest()


def test_context_budget_keeps_most_recent_suffix(spark):
    # budget 5 tokens: turn 3 sees [t2 (2 toks), t1 (3 toks)] = 5 -> both
    # fit; turn 2 sees [t1 (3), t0 (3)] = 6 -> only t1 fits.
    rows = [
        ("c1", 0, "user", "a b c", _ts(0)),
        ("c1", 1, "assistant", "d e f", _ts(1)),
        ("c1", 2, "user", "g h", _ts(2)),
        ("c1", 3, "assistant", "i", _ts(3)),
    ]
    out = {
        r.turn_idx: r
        for r in context_window(
            _t(spark, rows), budget_tokens=5, max_turns=8
        ).collect()
    }
    assert out[0].ctx_n_turns == 0
    assert out[0].ctx_tokens == 0
    assert out[0].ctx_first_turn_idx is None
    assert out[0].ctx_digest == _md5([])
    assert out[2].ctx_n_turns == 1  # t0+t1 = 6 > 5, so only t1
    assert out[2].ctx_first_turn_idx == 1
    assert out[2].ctx_digest == _md5(["d e f"])
    assert out[3].ctx_n_turns == 2  # t1+t2 = 5 <= 5
    assert out[3].ctx_tokens == 5
    assert out[3].ctx_first_turn_idx == 1
    assert out[3].ctx_digest == _md5(["d e f", "g h"])


def test_context_oversized_previous_turn_empties_context(spark):
    rows = [
        ("c1", 0, "user", "w1 w2 w3 w4 w5 w6", _ts(0)),
        ("c1", 1, "assistant", "x", _ts(1)),
    ]
    out = {
        r.turn_idx: r
        for r in context_window(
            _t(spark, rows), budget_tokens=3, max_turns=8
        ).collect()
    }
    # the only past turn exceeds the budget alone -> empty context
    assert out[1].ctx_n_turns == 0 and out[1].ctx_tokens == 0
    assert out[1].ctx_digest == _md5([])


def test_context_max_turns_caps_lookback(spark):
    rows = [("c1", i, "user", "t", _ts(i)) for i in range(6)]
    out = {
        r.turn_idx: r
        for r in context_window(
            _t(spark, rows), budget_tokens=100, max_turns=2
        ).collect()
    }
    assert out[5].ctx_n_turns == 2  # frame cap, not budget
    assert out[5].ctx_first_turn_idx == 3


def test_turn_novelty_first_occurrence_and_distinct(spark):
    rows = [
        # t0: bigrams {a b, b a} (a b twice -> distinct once), all novel
        ("c1", 0, "user", "a b a b", _ts(0)),
        # t1: {a b} seen, {b c} novel -> 1/2
        ("c1", 1, "assistant", "a b c", _ts(1)),
        # t2: single token -> no bigrams -> excluded
        ("c1", 2, "user", "a", _ts(2)),
    ]
    out = {
        r.turn_idx: r for r in turn_novelty(_t(spark, rows)).collect()
    }
    assert set(out) == {0, 1}
    assert out[0].n_bigrams == 2 and out[0].n_novel == 2
    assert out[0].novelty_share == 1.0
    assert out[1].n_bigrams == 2 and out[1].n_novel == 1
    assert out[1].novelty_share == 0.5


def test_first_message_templates_normalization_and_ties(spark):
    rows = [
        ("c1", 0, "user", "Order 123 failed", _ts(0)),
        ("c2", 0, "user", "order 9 FAILED", _ts(0)),
        ("c3", 0, "tool", "noise", _ts(0)),
        ("c3", 1, "user", "hello there", _ts(1)),
        ("c4", 0, "assistant", "no user turn at all", _ts(0)),
    ]
    out = first_message_templates(_t(spark, rows), top_k=20).collect()
    by_tpl = {r.template: r for r in out}
    assert by_tpl["order # failed"].n_convs == 2
    assert by_tpl["order # failed"].example_conv_id == "c1"
    assert by_tpl["order # failed"].rk == 1
    # c3's first USER turn is turn 1 (the tool turn is skipped)
    assert by_tpl["hello there"].n_convs == 1
    assert by_tpl["hello there"].rk == 2
    # c4 has no user turn -> contributes nothing to the denominator
    assert by_tpl["order # failed"].share == round(2 / 3, 6)


def test_context_zero_leakage_under_future_poison(spark):
    """Mutating or appending FUTURE turns must not change any earlier
    turn's context columns (the featurize poison contract applied to
    context_window)."""
    import pandas as pd
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMOKE
    from uncharted_ta1_pipeline_spark.sources.transcripts import (
        load_transcripts,
    )

    t = load_transcripts(spark, SF_SMOKE)
    base = context_window(t).toPandas()

    # poison: mutate every conversation's LAST turn text AND append one
    # extra far-future turn per conversation
    mx = t.groupBy("conv_id").agg(F.max("turn_idx").alias("_mx"))
    is_last = F.col("turn_idx") == F.col("_mx")
    mutated = (
        t.join(mx, "conv_id")
        .withColumn(
            "text", F.when(is_last, F.lit("POISON x y z")).otherwise(F.col("text"))
        )
        .drop("_mx")
    )
    extra = (
        t.join(mx, "conv_id")
        .filter(is_last)
        .select(
            "conv_id",
            (F.col("turn_idx") + 1).cast("int").alias("turn_idx"),
            "role",
            F.lit("FUTURE poison turn").alias("text"),
            "tool",
            (F.col("ts") + F.expr("INTERVAL 999 SECOND")).alias("ts"),
            "signal",
        )
    )
    poisoned = context_window(mutated.unionByName(extra)).toPandas()

    key = ["conv_id", "turn_idx"]
    last = base.groupby("conv_id")["turn_idx"].transform("max")
    past = base[base["turn_idx"] < last].sort_values(key).reset_index(drop=True)
    got = (
        poisoned.merge(past[key], on=key)[past.columns]
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(past, got, check_like=True)
