"""Capstone: the LLM training-data CURATION DAG composed through the
resumable Pipeline (quality filter → exact dedup → benchmark
decontamination → hash split → sequence packing), keyed on doc_id.

Each curation operator is oracle-checked individually elsewhere; this test
proves they COMPOSE under the manifest/resume machinery — the reference's
staged blackboard pipeline shape (/root/reference/tasks/common/
pipeline.py:138-199) applied to the documents table instead of
conversations — and that a doc-keyed halt predicate quarantines
unprocessable rows exactly like the conversation-shaped default
(EvaluateHalt/HaltPipeline, /root/reference/tasks/common/task.py:215-254).
"""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE

EMPTY_DOC_ID = 999_999


def _docs(spark):
    df = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    extra = spark.createDataFrame(
        [(EMPTY_DOC_ID, "   ", "en", "webforum", 3)], schema=df.schema
    )
    return df.unionByName(extra)


def _doc_halt(df):
    """Documents with no usable text are unprocessable (≈ map_missing)."""
    return df.filter(
        F.col("text").isNull() | (F.trim(F.col("text")) == "")
    ).select("doc_id", F.lit("empty_text").alias("halt_reason"))


def _stage_quality(df):
    from uncharted_ta1_pipeline_spark.functions.docf import quality_features

    return quality_features(df).filter(F.col("quality_score") >= 0.3)


def _stage_dedup(df):
    from uncharted_ta1_pipeline_spark.operators.dedup import dedup_exact

    surv = dedup_exact(df).select(F.col("survivor_doc_id").alias("doc_id"))
    return df.join(surv, on="doc_id", how="inner")


def _stage_decontam(df):
    from uncharted_ta1_pipeline_spark.operators.dedup import contamination

    # the synthetic corpus is template-generated, so baseline bigram
    # overlap with the benchmark subset is high (median ~0.8 at sf0.001);
    # 0.9 drops the worst tail while keeping the stage discriminating
    keep = (
        contamination(df, threshold=0.9)
        .filter(F.col("contaminated") == 0)
        .select("doc_id")
    )
    # inner join also drops the benchmark docs themselves (they get no
    # contamination row) — benchmark text never enters the training set
    return df.join(keep, on="doc_id", how="inner")


def _stage_split(df):
    from uncharted_ta1_pipeline_spark.operators.sampling import hash_split

    return hash_split(df)


def _stage_pack(df):
    from uncharted_ta1_pipeline_spark.operators.sampling import pack_sequences

    return pack_sequences(
        df.filter(F.col("split") == "train"), budget=256, n_shards=2
    )


def _stages():
    from uncharted_ta1_pipeline_spark.plans.pipeline import Stage

    return [
        Stage("quality", _stage_quality, {"min_score": 0.3}),
        Stage("dedup", _stage_dedup, {}),
        Stage("decontam", _stage_decontam, {"threshold": 0.9}),
        Stage("split", _stage_split, {"salt": "split-v1"}),
        Stage("pack", _stage_pack, {"budget": 256, "n_shards": 2}),
    ]


def _key_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values("doc_id").reset_index(drop=True)


def test_curation_dag_matches_direct_composition(spark, tmp_path):
    """Pipeline-composed output == applying the stage functions directly
    (the manifest layer is transparent), and the halted doc is quarantined
    out of every stage."""
    from uncharted_ta1_pipeline_spark.plans.pipeline import Pipeline

    docs = _docs(spark)
    wd = str(tmp_path / "wd")
    p = Pipeline(_stages(), wd, n_buckets=8)
    out = p.run(
        spark, docs, run_id="r1", halt_fn=_doc_halt, key="doc_id"
    ).toPandas()

    live = docs.join(_doc_halt(docs).select("doc_id"), "doc_id", "left_anti")
    direct = _stage_pack(
        _stage_split(_stage_decontam(_stage_dedup(_stage_quality(live))))
    ).toPandas()
    pd.testing.assert_frame_equal(
        _key_sorted(out)[sorted(out.columns)],
        _key_sorted(direct)[sorted(out.columns)],
        check_like=True,
    )
    assert EMPTY_DOC_ID not in set(out["doc_id"])

    q = pd.read_parquet(os.path.join(wd, "quarantine"))
    assert set(zip(q["doc_id"], q["halt_reason"])) == {
        (EMPTY_DOC_ID, "empty_text")
    }


def test_curation_dag_resume_recomputes_only_wiped_bucket(spark, tmp_path):
    """Wiping one committed bucket of a MID-DAG stage recomputes exactly
    that bucket; stages before it stay fully cached and the final output is
    unchanged."""
    from uncharted_ta1_pipeline_spark.plans.pipeline import Pipeline

    docs = _docs(spark)
    wd = str(tmp_path / "wd")
    p = Pipeline(_stages(), wd, n_buckets=8)
    out1 = p.run(spark, docs, run_id="r1", halt_fn=_doc_halt, key="doc_id")
    out1 = out1.toPandas()

    wiped = sorted(
        glob.glob(os.path.join(wd, "decontam", "_manifest", "*.json"))
    )[0]
    os.remove(wiped)
    out2 = p.run(spark, docs, run_id="r2", halt_fn=_doc_halt, key="doc_id")
    out2 = out2.toPandas()

    pd.testing.assert_frame_equal(
        _key_sorted(out1), _key_sorted(out2)[out1.columns], check_like=True
    )
    metrics = [
        json.loads(line)
        for line in open(os.path.join(wd, "metrics.jsonl"))
    ]
    by_stage = {
        m["stage_id"]: m for m in metrics if m["run_id"] == "r2"
    }
    assert by_stage["quality"]["buckets_computed"] == 0
    assert by_stage["dedup"]["buckets_computed"] == 0
    assert by_stage["decontam"]["buckets_computed"] == 1
    assert by_stage["decontam"]["buckets_skipped"] == 7
    # downstream stages' own manifests are intact → content-addressed skip
    assert by_stage["split"]["buckets_computed"] == 0
    assert by_stage["pack"]["buckets_computed"] == 0
