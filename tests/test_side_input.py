"""Legend-style two-phase side-input stage: pre-dim -> broadcast main ->
post-refreshed dim, all manifest-committed and resumable."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def _fns():
    def pre(df):
        # "legend analysis": per-tool expected signal level
        return (
            df.filter(F.col("tool").isNotNull() & (F.col("tool") != ""))
            .groupBy("tool")
            .agg(F.round(F.avg("signal"), 6).alias("expected"))
        )

    def main(df, side):
        # big stage consumes the broadcast dim: flag turns far off expected
        return (
            df.join(side, on="tool", how="left")
            .select(
                "conv_id",
                "turn_idx",
                "tool",
                F.round("signal", 6).alias("signal"),
                (
                    F.col("expected").isNotNull()
                    & (F.abs(F.col("signal") - F.col("expected")) > 25.0)
                ).alias("off_legend"),
            )
        )

    def post(out, side):
        # refine: per-tool off-legend rate appended to the dim
        rates = (
            out.filter(F.col("tool").isNotNull() & (F.col("tool") != ""))
            .groupBy("tool")
            .agg(F.round(F.avg(F.col("off_legend").cast("double")), 6).alias("off_rate"))
        )
        return side.join(rates, on="tool", how="left")

    return pre, main, post


def test_side_input_stage_runs_and_refreshes(spark, tmp_path):
    from uncharted_ta1_pipeline_spark.plans.pipeline import run_side_input_stage
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, SF_SMOKE)
    pre, main, post = _fns()
    out, refreshed = run_side_input_stage(
        spark, t, str(tmp_path / "wd"), "legend", pre, main, post
    )
    assert out.count() == t.count()
    ref = {r.tool: r for r in refreshed.collect()}
    assert set(ref) == {"search", "bash", "read", "write", "edit"}
    # the refreshed dim carries BOTH the pre field and the post field
    assert all(r.expected is not None and r.off_rate is not None for r in ref.values())


def test_side_input_stage_resumes(spark, tmp_path):
    """A second identical run recomputes nothing: every phase's buckets are
    already committed (metrics-free check via manifest counts)."""
    from uncharted_ta1_pipeline_spark.plans import manifest as mf
    from uncharted_ta1_pipeline_spark.plans.pipeline import run_side_input_stage
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, SF_SMOKE)
    pre, main, post = _fns()
    wd = str(tmp_path / "wd")
    out1, ref1 = run_side_input_stage(spark, t, wd, "legend", pre, main, post)
    r1 = ref1.toPandas().sort_values("tool").reset_index(drop=True)

    res = mf.write_stage(
        pre(t), f"{wd}/legend_side_pre", "legend_side_pre", {}, n_buckets=1
    )
    assert res.buckets_computed == 0 and res.buckets_skipped == 1

    out2, ref2 = run_side_input_stage(spark, t, wd, "legend", pre, main, post)
    r2 = ref2.toPandas().sort_values("tool").reset_index(drop=True)
    assert r1.equals(r2)
