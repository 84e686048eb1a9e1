"""featurize_salted is a physical strategy, not a semantic change: its
output must equal featurize() exactly — including at chunk sizes small
enough that every conversation spans many chunks."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _cmp(a: pd.DataFrame, b: pd.DataFrame, key=("conv_id", "turn_idx")):
    a = a.sort_values(list(key)).reset_index(drop=True)
    b = b.sort_values(list(key)).reset_index(drop=True)
    b = b[a.columns]
    pd.testing.assert_frame_equal(a, b, check_like=True)


@pytest.mark.parametrize("chunk_size", [7, 64, 100000])
def test_salted_equals_plain(spark, chunk_size):
    from uncharted_ta1_pipeline_spark.operators.salt import featurize_salted
    from uncharted_ta1_pipeline_spark.operators.windows import featurize
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, SF_SMOKE)
    plain = featurize(t).toPandas()
    salted = featurize_salted(t, chunk_size=chunk_size).toPandas()
    _cmp(plain, salted)


def test_salted_on_synthetic_hot_conv(spark):
    """A hot conversation spanning many chunks, with long gaps (session
    boundaries) landing on chunk edges."""
    from uncharted_ta1_pipeline_spark.operators.salt import featurize_salted
    from uncharted_ta1_pipeline_spark.operators.windows import featurize
    from uncharted_ta1_pipeline_spark.sources.transcripts import synth_transcripts

    t = synth_transcripts(
        spark, n_convs=20, mean_turns=30, hot_convs=2, hot_turns=3000, seed=7
    )
    plain = featurize(t).toPandas()
    salted = featurize_salted(t, chunk_size=256).toPandas()
    _cmp(plain, salted)


def test_hybrid_narrow_equals_plain(spark):
    """The narrow path (text dropped before the windows, re-joined after)
    is a physical strategy too: output equals featurize() exactly,
    byte-identical text included."""
    from uncharted_ta1_pipeline_spark.operators.salt import featurize_hybrid
    from uncharted_ta1_pipeline_spark.operators.windows import featurize
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, SF_SMOKE)
    plain = featurize(t).toPandas()
    narrow = featurize_hybrid(t, narrow=True).toPandas()
    _cmp(plain, narrow)


def test_hybrid_narrow_routes_hot_convs(spark):
    """narrow + hot routing together (a hot conv above the threshold)."""
    from uncharted_ta1_pipeline_spark.operators.salt import featurize_hybrid
    from uncharted_ta1_pipeline_spark.operators.windows import featurize
    from uncharted_ta1_pipeline_spark.sources.transcripts import synth_transcripts

    t = synth_transcripts(
        spark, n_convs=10, mean_turns=30, hot_convs=1, hot_turns=2000, seed=11
    )
    plain = featurize(t).toPandas()
    hybrid = featurize_hybrid(
        t, hot_threshold=1000, chunk_size=256, narrow=True
    ).toPandas()
    _cmp(plain, hybrid)


def test_single_pass_routing_equals_plain(spark):
    """The single-pass routed path (hot flag inside one salted pass — the
    default) is frame-equal to featurize() in every routing regime: mixed
    hot/cold, all-cold (empty hot dim), all-hot."""
    from uncharted_ta1_pipeline_spark.operators.salt import featurize_hybrid
    from uncharted_ta1_pipeline_spark.operators.windows import featurize
    from uncharted_ta1_pipeline_spark.sources.transcripts import synth_transcripts

    t = synth_transcripts(
        spark, n_convs=10, mean_turns=30, hot_convs=1, hot_turns=2000, seed=13
    )
    plain = featurize(t).toPandas()
    for thr in (1000, 10**9, 1):  # mixed, all-cold, all-hot
        routed = featurize_hybrid(
            t, hot_threshold=thr, chunk_size=256, single_pass=True
        ).toPandas()
        _cmp(plain, routed)


def test_single_pass_scans_input_once(spark):
    """The routed plan reads the full-width input ONCE (plus the
    column-pruned conv_id scan for the hot dim) — the branched path reads
    it once per branch."""
    from uncharted_ta1_pipeline_spark.operators.salt import featurize_hybrid
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, SF_SMOKE)
    plan = featurize_hybrid(t, single_pass=True)._jdf.queryExecution().executedPlan().toString()
    # transcripts derive text from events.props (sources/transcripts.py), so a
    # full-width scan is one whose parquet ReadSchema includes props; column
    # pruning must confine props to exactly ONE scan (the offsets branch and
    # the hot dim re-scan only narrow columns)
    scans = [l for l in plan.splitlines() if "Scan parquet" in l]
    n_wide = sum(1 for l in scans if "props" in l)
    assert n_wide == 1, f"expected 1 full-width scan, saw {n_wide}:\n" + "\n".join(scans)


def test_chunk_size_guard(spark):
    """chunk_size <= rolling_width would silently corrupt boundary frames;
    it must raise instead."""
    import pytest

    from uncharted_ta1_pipeline_spark.operators.salt import featurize_salted
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, SF_SMOKE)
    with pytest.raises(ValueError, match="chunk_size"):
        featurize_salted(t, chunk_size=5, rolling_width=5)


def test_ingest_invariant_turn_idx_unique(spark):
    """The first-use equality-to-min flag (salt.py) relies on (ts, turn_idx)
    being unique per conversation; turn_idx alone is the dense 0-based
    stable order, so uniqueness must hold on every ingest path.  Pins the
    invariant the operator documents (ADVICE r3)."""
    import pyspark.sql.functions as F

    from uncharted_ta1_pipeline_spark.sources.transcripts import (
        load_transcripts,
        synth_transcripts,
    )

    for t in (
        load_transcripts(spark, SF_SMOKE),
        synth_transcripts(spark, n_convs=10, mean_turns=30, hot_convs=1,
                          hot_turns=500, seed=3),
    ):
        dupes = (
            t.groupBy("conv_id", "turn_idx")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )
        assert dupes.isEmpty(), dupes.limit(5).toPandas()


def test_firsts_join_shuffle_equals_broadcast(spark):
    """firsts_join='shuffle' (the beyond-broadcast-budget escape hatch for
    the |hot| x vocabulary dim) is a physical strategy only: output equals
    the broadcast default exactly, and the plan actually shuffles the dim
    (no BroadcastExchange feeding that join)."""
    from uncharted_ta1_pipeline_spark.operators.salt import featurize_salted
    from uncharted_ta1_pipeline_spark.operators.windows import featurize
    from uncharted_ta1_pipeline_spark.sources.transcripts import synth_transcripts

    t = synth_transcripts(
        spark, n_convs=10, mean_turns=30, hot_convs=1, hot_turns=2000, seed=17
    )
    plain = featurize(t).toPandas()
    shuffled = featurize_salted(t, chunk_size=256, firsts_join="shuffle")
    _cmp(plain, shuffled.toPandas())
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan[:2000]
