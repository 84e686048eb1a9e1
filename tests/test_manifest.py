"""Checkpoint/manifest/resume semantics (SURVEY.md §4 stage-cache row;
FIXTURES.md §4 fixture test)."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd
import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def _load(spark):
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    return load_transcripts(spark, SF_SMOKE)


def test_write_read_roundtrip(spark, tmp_path):
    from uncharted_ta1_pipeline_spark.plans import manifest as mf

    t = _load(spark)
    out = str(tmp_path / "stage1")
    res = mf.write_stage(t, out, "ingest", {"v": 1}, n_buckets=8)
    assert res.buckets_computed == 8 and res.buckets_skipped == 0
    back = mf.read_stage(spark, out, "ingest", {"v": 1}, n_buckets=8)
    assert back.count() == t.count()
    assert sorted(back.columns) == sorted(t.columns)
    assert mf.verify_stage(out, res.config_hash, spark)


def test_resume_skips_committed_buckets(spark, tmp_path):
    from uncharted_ta1_pipeline_spark.plans import manifest as mf

    t = _load(spark)
    out = str(tmp_path / "stage2")
    mf.write_stage(t, out, "feat", {"v": 1}, n_buckets=8)

    # simulate a mid-run kill: drop 3 manifests (data may or may not
    # remain — both must be handled; here we also corrupt one bucket dir)
    manifests = sorted(glob.glob(os.path.join(out, "_manifest", "bucket-*.json")))
    killed = [manifests[1], manifests[4], manifests[6]]
    killed_buckets = []
    for m in killed:
        with open(m) as f:
            killed_buckets.append(json.load(f)["bucket"])
        os.remove(m)
    shutil.rmtree(os.path.join(out, f"bucket={killed_buckets[0]}"), ignore_errors=True)

    res2 = mf.write_stage(t, out, "feat", {"v": 1}, n_buckets=8)
    assert res2.buckets_skipped == 5
    assert res2.buckets_computed == 3

    back = mf.read_stage(spark, out, "feat", {"v": 1}, n_buckets=8)
    assert back.count() == t.count()
    assert mf.verify_stage(out, res2.config_hash, spark)


def test_config_change_invalidates(spark, tmp_path):
    from uncharted_ta1_pipeline_spark.plans import manifest as mf

    t = _load(spark)
    out = str(tmp_path / "stage3")
    mf.write_stage(t, out, "feat", {"v": 1}, n_buckets=4)
    res = mf.write_stage(t, out, "feat", {"v": 2}, n_buckets=4)
    assert res.buckets_computed == 4  # full recompute on config change


def test_retry_poison_pill(spark, tmp_path):
    """Queue retry / poison-pill semantics (≈ quorum-queue x-delivery-limit 3,
    /root/reference/tasks/common/request_client.py:253-262): a stage whose
    failure is confined to one bucket retries that bucket ``max_attempts``
    times, quarantines it with its error, and the run COMPLETES; a later run
    retries only the poisoned bucket and clears the record on success."""
    from pyspark.sql.functions import pandas_udf

    from uncharted_ta1_pipeline_spark.plans import manifest as mf

    t = _load(spark)
    n_buckets = 8
    # pick a victim conversation and find its manifest bucket
    victim, victim_bucket = (
        t.select("conv_id")
        .distinct()
        .withColumn("b", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int"))
        .limit(1)
        .collect()[0]
    )
    flag = str(tmp_path / "fail_flag")
    open(flag, "w").write("x")

    @pandas_udf("int")
    def poison_udf(conv: pd.Series) -> pd.Series:
        import os as _os

        if _os.path.exists(flag) and (conv == victim).any():
            raise RuntimeError(f"poisoned conversation {victim}")
        return pd.Series([1] * len(conv))

    def stage_df():
        return t.withColumn("flagged", poison_udf(F.col("conv_id")))

    out = str(tmp_path / "stage_poison")
    res = mf.write_stage_resilient(
        stage_df, out, "poisoned", {"v": 1}, n_buckets=n_buckets, max_attempts=3
    )
    # run completed: every healthy bucket committed, the victim quarantined
    assert res.buckets_poisoned == 1
    assert res.buckets_computed == n_buckets - 1
    poison = mf.poisoned_buckets(out, res.config_hash)
    assert list(poison) == [victim_bucket]
    assert poison[victim_bucket]["attempts"] == 3
    assert "poisoned conversation" in poison[victim_bucket]["error"]
    # committed data excludes only the poisoned bucket
    back = mf.read_stage(
        spark, out, "poisoned", {"v": 1}, n_buckets=n_buckets, require_complete=False
    )
    expected_missing = t.filter(F.col("conv_id") == victim).count()
    assert back.count() < t.count()  # victim bucket absent

    # heal the stage; resume retries ONLY the poisoned bucket
    os.remove(flag)
    res2 = mf.write_stage_resilient(
        stage_df, out, "poisoned", {"v": 1}, n_buckets=n_buckets, max_attempts=3
    )
    assert res2.buckets_skipped == n_buckets - 1
    assert res2.buckets_computed == 1
    assert res2.buckets_poisoned == 0
    assert mf.poisoned_buckets(out, res2.config_hash) == {}
    back2 = mf.read_stage(spark, out, "poisoned", {"v": 1}, n_buckets=n_buckets)
    assert back2.count() == t.count()
    assert expected_missing > 0


def test_pipeline_end_to_end_with_halt_and_resume(spark, tmp_path):
    from uncharted_ta1_pipeline_spark.operators.sessionize import with_sessions
    from uncharted_ta1_pipeline_spark.operators.windows import with_cumulative
    from uncharted_ta1_pipeline_spark.plans import manifest as mf
    from uncharted_ta1_pipeline_spark.plans.pipeline import Pipeline, Stage

    t = _load(spark)
    wd = str(tmp_path / "wd")
    stages = [
        Stage("sessionize", with_sessions, {"gap_s": 1800}),
        Stage("cumulative", with_cumulative, {}),
    ]
    p = Pipeline(stages, wd, n_buckets=8)
    out1 = p.run(spark, t, run_id="r1").toPandas()

    # wipe one downstream manifest and re-run: only that bucket recomputes
    m = sorted(glob.glob(os.path.join(wd, "cumulative", "_manifest", "*.json")))[0]
    os.remove(m)
    out2 = p.run(spark, t, run_id="r2").toPandas()

    key = ["conv_id", "turn_idx"]
    a = out1.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)[out1.columns]
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_like=True)

    metrics = [
        json.loads(line)
        for line in open(os.path.join(wd, "metrics.jsonl"))
    ]
    r2 = [m for m in metrics if m["run_id"] == "r2"]
    by_stage = {m["stage_id"]: m for m in r2}
    assert by_stage["sessionize"]["buckets_computed"] == 0  # fully cached
    assert by_stage["cumulative"]["buckets_computed"] == 1  # only the wiped one


def test_empty_stage_output_roundtrip(spark, tmp_path):
    """A stage that legitimately produces ZERO rows commits row_count=0
    manifests and reads back as an empty frame with the original schema
    (from the per-config-hash schema sidecar); downstream stages consume
    the empty input and the pipeline completes — and resumes — cleanly."""
    from uncharted_ta1_pipeline_spark.plans.pipeline import Pipeline, Stage

    t = _load(spark)
    wd = str(tmp_path / "wd")
    stages = [
        Stage("drop_all", lambda d: d.filter(F.lit(False)), {}),
        Stage("count_by_conv", lambda d: d.groupBy("conv_id").count(), {}),
    ]
    p = Pipeline(stages, wd, n_buckets=4)
    out1 = p.run(spark, t, run_id="r1")
    assert out1.count() == 0
    assert out1.columns == ["conv_id", "count"]

    out2 = p.run(spark, t, run_id="r2")  # resume over the empty checkpoints
    assert out2.count() == 0
    metrics = [
        json.loads(line) for line in open(os.path.join(wd, "metrics.jsonl"))
    ]
    r2 = {m["stage_id"]: m for m in metrics if m["run_id"] == "r2"}
    assert r2["drop_all"]["buckets_computed"] == 0  # fully cached
    assert r2["count_by_conv"]["buckets_computed"] == 0
