"""Streaming variants: file-source micro-batch run compared against the
batch sessionizer on the same data."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def _write_input(spark, tmp_path):
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    src = str(tmp_path / "stream_src")
    load_transcripts(spark, SF_SMOKE).coalesce(4).write.parquet(src)
    return src


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from uncharted_ta1_pipeline_spark.operators.sessionize import session_stats
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts
    from uncharted_ta1_pipeline_spark.streaming.sessions import stream_sessionize

    src = _write_input(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    # watermark wider than the data span + complete mode: availableNow may
    # run several micro-batches, and rows arriving out of event-time order
    # in a later batch would (correctly) be dropped by a tight watermark —
    # that late-data behavior is probed separately below.  Complete mode
    # emits all sessions regardless of watermark progress.
    q = (
        stream_sessionize(stream, gap_s=1800, watermark_s=90 * 24 * 3600)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select conv_id, n_turns, n_tool_turns from sessions_out"
    ).toPandas()

    # session_window treats a gap of EXACTLY the threshold as a new session
    # (half-open [start, start+gap) windows); gap_us = gap*1e6 - 1 gives the
    # batch sessionizer identical semantics.
    want = (
        session_stats(
            load_transcripts(spark, SF_SMOKE), gap_us=1800 * 1_000_000 - 1
        )
        .select("conv_id", "n_turns", "n_tool_turns")
        .toPandas()
    )
    key = ["conv_id", "n_turns", "n_tool_turns"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    assert got_s.equals(want_s)


def test_stream_late_data_dropped(spark, tmp_path):
    """With a tight watermark and multiple micro-batches, rows older than
    the watermark are dropped — the bounded-lateness discipline (the
    streaming analog of the reference's bounded redelivery)."""
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts
    from uncharted_ta1_pipeline_spark.streaming.sessions import stream_sessionize

    src = str(tmp_path / "late_src")
    t = load_transcripts(spark, SF_SMOKE)
    n_in = t.count()
    t.coalesce(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force several micro-batches
        .parquet(src)
    )
    q = (
        stream_sessionize(stream, gap_s=1800, watermark_s=3600)
        .writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .start()
    )
    q.awaitTermination(120)
    n_out = spark.sql("select sum(n_turns) s from late_out").collect()[0].s
    assert n_out < n_in  # some late rows were (correctly) dropped
    assert n_out > n_in * 0.5  # but not wholesale


def test_stream_running_features(spark, tmp_path):
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts
    from uncharted_ta1_pipeline_spark.streaming.sessions import (
        stream_running_features,
    )

    src = _write_input(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_running_features(stream)
        .writeStream.format("memory")
        .queryName("running_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select conv_id, max(turns_so_far) turns, max(tools_so_far) tools "
        "from running_out group by conv_id"
    ).toPandas()

    t = load_transcripts(spark, SF_SMOKE)
    want = (
        t.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(
                (F.col("tool").isNotNull() & (F.col("tool") != "")).cast("long")
            ).alias("tools"),
        )
        .toPandas()
    )
    key = ["conv_id"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)[got_s.columns]
    assert got_s.equals(want_s)


def test_running_update_timeout_removes_state():
    """The GroupState-timeout branch must remove idle state and emit
    nothing — never re-arm the timer or emit a spurious row."""
    import pandas as pd

    from uncharted_ta1_pipeline_spark.streaming.sessions import running_update

    class FakeState:
        def __init__(self):
            self.hasTimedOut = True
            self.exists = True
            self.get = (5, 2)
            self.removed = False
            self.updated = None
            self.timeout_set = False

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_set = True

    st = FakeState()
    out = list(running_update(("c1",), iter([]), st))
    assert out == []
    assert st.removed and st.updated is None and not st.timeout_set

    # normal path still accumulates and re-arms
    st2 = FakeState()
    st2.hasTimedOut = False
    pdf = pd.DataFrame({"tool": ["search", None, ""]})
    out2 = list(running_update(("c1",), iter([pdf]), st2))
    assert len(out2) == 1
    assert st2.updated == (8, 3) and st2.timeout_set


def test_stream_dedup_drops_repeats(spark, tmp_path):
    """stream_dedup: a source containing every turn TWICE (the at-least-
    once queue residue) yields each turn exactly once; genuinely distinct
    turns all survive."""
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts
    from uncharted_ta1_pipeline_spark.streaming.sessions import stream_dedup

    import pyspark.sql.functions as F

    base0 = load_transcripts(spark, SF_SMOKE).limit(500)
    # adversarial rows: same (conv_id, role, text, tool) at a LATER ts —
    # genuinely distinct turns (a user sending the same "ok" twice) that a
    # content-only digest would wrongly collapse (ADVICE r3).  They carry
    # fresh turn_idx values so the expected-set comparison stays exact.
    repeats = base0.limit(20).withColumn(
        "ts", F.col("ts") + F.expr("interval 5 minutes")
    ).withColumn("turn_idx", F.col("turn_idx") + F.lit(1_000_000))
    base = base0.unionAll(repeats)
    src = str(tmp_path / "dup_src")
    base.unionAll(base).coalesce(2).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_dedup(stream, watermark_s=90 * 24 * 3600)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select conv_id, turn_idx from dedup_out order by conv_id, turn_idx"
    ).toPandas()
    want = base.select("conv_id", "turn_idx").toPandas().sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    assert len(got) == len(want), (len(got), len(want))
    assert got.reset_index(drop=True).equals(want)


def test_stream_asof_matches_batch(spark, tmp_path):
    """Streaming point-in-time attach == the batch as-of join on the same
    tagged union, fed as ONE micro-batch (single file + availableNow) so
    event order is restored inside the batch."""
    import __spark_entry__ as e
    from uncharted_ta1_pipeline_spark.sources.transcripts import (
        load_transcripts,
        make_probes,
    )
    from uncharted_ta1_pipeline_spark.streaming.sessions import stream_asof

    t = load_transcripts(spark, SF_SMOKE)
    probes = make_probes(t)
    turns = t.select(
        "conv_id",
        F.lit("turn").alias("kind"),
        F.lit(None).cast("string").alias("probe_id"),
        "turn_idx",
        "role",
        "tool",
        F.unix_micros("ts").alias("ts_us"),
    )
    ps = probes.select(
        "conv_id",
        F.lit("probe").alias("kind"),
        "probe_id",
        F.lit(None).cast("int").alias("turn_idx"),
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("tool"),
        F.unix_micros("probe_ts").alias("ts_us"),
    )
    src = str(tmp_path / "asof_src")
    turns.union(ps).coalesce(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1000"
    ).parquet(src)
    q = (
        stream_asof(stream)
        .writeStream.format("memory")
        .queryName("asof_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_asof"))
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from asof_out")
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    want = (
        e.queries()["asof_features"](spark, SF_SMOKE)
        .select(
            "probe_id", "conv_id", "probe_ts_us", "matched_turn_idx",
            "last_role", "turns_incl", "tools_incl",
        )
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    assert len(got) == len(want)
    for c in want.columns:
        for i, (a, b) in enumerate(zip(got[c], want[c])):
            if pd.isna(a) and pd.isna(b):
                continue
            assert a == b, f"column {c} row {i}: {a!r} != {b!r}"
