"""Edge-case + leakage tests for the feature-store composition operators
(oracle parity at sf0.001/0.01 is covered by the parametrized driver-sim)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE
from uncharted_ta1_pipeline_spark.operators.feature_store import (
    target_encode_bucketed,
    training_set,
)

TS0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(s: float) -> dt.datetime:
    return TS0 + dt.timedelta(seconds=s)


def _labels(spark, rows):
    return spark.createDataFrame(
        rows, "probe_id string, conv_id string, label_ts timestamp"
    )


def _view(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, ts timestamp, turn_idx int, val string"
    )


def test_training_set_rejects_column_clash(spark):
    labels = _labels(spark, [("p1", "c1", _ts(10))])
    view = _view(spark, [("c1", _ts(1), 0, "x")])
    with pytest.raises(ValueError, match="column clash"):
        training_set(
            labels,
            [("a", view, "ts", ["val"]), ("b", view, "ts", ["val"])],
        )


def test_training_set_audit_and_null_safety(spark):
    labels = _labels(
        spark, [("p_pre", "c1", _ts(0)), ("p_mid", "c1", _ts(15))]
    )
    view_a = _view(spark, [("c1", _ts(5), 0, "a0"), ("c1", _ts(12), 1, "a1")])
    view_b = _view(
        spark, [("c1", _ts(9), 0, "b0")]
    ).withColumnRenamed("val", "bval")
    out = {
        r.probe_id: r
        for r in training_set(
            labels,
            [("a", view_a, "ts", ["val"]), ("b", view_b, "ts", ["bval"])],
        ).collect()
    }
    pre, mid = out["p_pre"], out["p_mid"]
    # before any event: all features NULL, leak_ok vacuously true
    assert pre.val is None and pre.bval is None
    assert pre.max_feature_ts_us is None and pre.leak_ok is True
    # mid probe: latest of each view as of t=15; audit = max of matched ts
    assert mid.val == "a1" and mid.bval == "b0"
    assert mid.max_feature_ts_us == mid.a_ts_us
    assert mid.leak_ok is True


def test_training_set_bucketed_strategy_equivalent(spark):
    """Physical-strategy equivalence on real data: tiny bucket to force
    many cross-bucket carries; identical pandas frames."""
    import __spark_entry__ as e

    plain = (
        e.queries()["training_set"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    bucketed = (
        e.queries()["training_set_bucketed"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    assert plain.equals(bucketed)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, signal double, ts timestamp"
    )


def test_target_encode_strictly_past_buckets(spark):
    # bucket_s=10: rows at t in [0,10) are bucket 0, [10,20) bucket 1, ...
    rows = [
        ("c1", 0, "user", 10.0, _ts(0)),   # bucket 0
        ("c1", 1, "user", 20.0, _ts(5)),   # bucket 0
        ("c1", 2, "user", 99.0, _ts(15)),  # bucket 1
        ("c1", 3, "tool", 50.0, _ts(15)),  # bucket 1, other category
    ]
    out = {
        (r.category, r.bucket): r
        for r in target_encode_bucketed(
            _turns(spark, rows), bucket_s=10, smoothing=10.0
        ).collect()
    }
    b0 = out[("user", TS0.timestamp() // 10)]
    # first bucket: no history at all -> NULL mean, NULL smooth, count 0
    assert b0.te_count == 0 and b0.te_mean is None and b0.te_smooth is None
    b1 = out[("user", TS0.timestamp() // 10 + 1)]
    assert b1.te_count == 2 and b1.te_mean == 15.0
    # global prior from bucket 0 = 15.0; smooth = (30 + 10*15)/(2+10) = 15.0
    assert b1.te_smooth == 15.0
    # a category with NO history in earlier buckets: falls back to prior only
    t1 = out[("tool", TS0.timestamp() // 10 + 1)]
    assert t1.te_count == 0 and t1.te_mean is None
    assert t1.te_smooth == 15.0  # (0 + 10*15)/(0+10)


def test_target_encode_no_peek_perturbation(spark):
    """Leakage probe: changing targets in a LATER bucket must not change
    any earlier row's encoding."""
    base = [
        ("c1", 0, "user", 10.0, _ts(0)),
        ("c1", 1, "user", 30.0, _ts(15)),
        ("c1", 2, "user", 70.0, _ts(25)),
    ]
    pert = [r[:3] + (999.0, r[4]) if r[1] == 2 else r for r in base]
    enc_a = {
        r.turn_idx: (r.te_count, r.te_mean, r.te_smooth)
        for r in target_encode_bucketed(_turns(spark, base), bucket_s=10).collect()
    }
    enc_b = {
        r.turn_idx: (r.te_count, r.te_mean, r.te_smooth)
        for r in target_encode_bucketed(_turns(spark, pert), bucket_s=10).collect()
    }
    assert enc_a[0] == enc_b[0]
    assert enc_a[1] == enc_b[1]


def test_target_encode_join_back_is_not_windowed_on_rows(spark):
    """Plan guard: the raw turn stream must reach the output through a
    JOIN on (category, bucket), never through a window over raw rows."""
    import __spark_entry__ as e

    plan = (
        e.queries()["target_encode"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # windows exist only over the bucket aggregates; the executed plan's
    # window operators must sit below an Aggregate, which manifests as no
    # Window directly over the parquet scan columns (signal) — cheap
    # textual proxy: the window sort keys are bucket columns, not ts.
    assert "Window" in plan
    assert "rowsBetween" not in plan  # sanity: physical plan text form


def test_training_set_no_future_perturbation(spark):
    """Leakage probe (the featurize perturbation applied to training_set):
    appending FUTURE events to a view must not change any existing probe's
    joined features or audit."""
    labels = _labels(
        spark, [("p1", "c1", _ts(10)), ("p2", "c1", _ts(20))]
    )
    base_view = _view(
        spark, [("c1", _ts(5), 0, "v0"), ("c1", _ts(15), 1, "v1")]
    )
    future_view = base_view.union(
        _view(spark, [("c1", _ts(25), 2, "vFUTURE"), ("c1", _ts(30), 3, "vLATE")])
    )

    def run(view):
        return {
            r.probe_id: (r.val, r.a_ts_us, r.max_feature_ts_us, r.leak_ok)
            for r in training_set(
                labels, [("a", view, "ts", ["val"])]
            ).collect()
        }

    assert run(base_view) == run(future_view)
