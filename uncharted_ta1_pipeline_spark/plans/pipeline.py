"""Stage DAG with checkpoint-resume, halt propagation, and metrics.

Re-expresses the reference's ``Pipeline.run`` blackboard loop
(/root/reference/tasks/common/pipeline.py:138-199) and the chained
RabbitMQ stage sequencing (cdr/chaining_result_subscriber.py:117-137) as
sequential Spark stages over manifest-committed parquet checkpoints:
"next request only after result lands" = stage barrier = job boundary.

- Each stage is a pure ``fn(DataFrame) -> DataFrame``.
- Output goes through plans.manifest.write_stage, so a killed run resumes
  from the last committed bucket.
- Per-stage metrics rows (rows out, wall ms, buckets computed/skipped) are
  appended to ``<workdir>/metrics.jsonl`` (≈ params_used provenance +
  timing, task.py:75-85, request_client.py:397-417).
- Halt: a per-conversation predicate computed once; failing conversations
  are anti-joined out of downstream stages and logged to a quarantine
  table, mirroring EvaluateHalt/HaltPipeline (task.py:215-254) where the
  pipeline still emits empty outputs for halted documents
  (pipeline.py:207-211).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from uncharted_ta1_pipeline_spark.plans import manifest as mf


@dataclass
class Stage:
    stage_id: str
    fn: Callable[[DataFrame], DataFrame]
    config: dict = field(default_factory=dict)


def halt_predicate(df: DataFrame, min_turns: int = 2) -> DataFrame:
    """Conversations that cannot be processed (≈ map_missing,
    segmenter_utils.py:133-153): fewer than ``min_turns`` turns or no
    'user' turn.  Returns (conv_id, halt_reason)."""
    g = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("role") == "user").cast("int")).alias("n_user"),
    )
    return g.filter((F.col("n") < min_turns) | (F.col("n_user") == 0)).select(
        "conv_id",
        F.when(F.col("n") < min_turns, F.lit("too_few_turns"))
        .otherwise(F.lit("no_user_turns"))
        .alias("halt_reason"),
    )


def run_side_input_stage(
    spark: SparkSession,
    df: DataFrame,
    workdir: str,
    stage_id: str,
    pre_fn: Callable[[DataFrame], DataFrame],
    main_fn: Callable[[DataFrame, DataFrame], DataFrame],
    post_fn: Callable[[DataFrame, DataFrame], DataFrame],
    config: dict | None = None,
    n_buckets: int = mf.DEFAULT_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Two-phase side-input stage — the reference's legend pre/post pattern
    (/root/reference/tasks/point_extraction/legend_analyzer.py:29-311: analyze
    the legend BEFORE point extraction, broadcast the result into it, then
    REFINE the legend from the extraction output):

    1. pre:  a small dim computed from the input, manifest-committed;
    2. main: the big stage consuming the dim as an explicit broadcast;
    3. post: the dim refreshed from the main output, committed as a new
       version (never mutated in place — later runs read the refreshed
       side deterministically).

    All three land through the manifest layer, so a killed run resumes at
    whichever phase was uncommitted.  Returns (main output, refreshed dim).
    """
    cfg = dict(config or {})
    pre_dir = os.path.join(workdir, f"{stage_id}_side_pre")
    mf.write_stage(pre_fn(df), pre_dir, f"{stage_id}_side_pre", cfg, n_buckets=1)
    side = mf.read_stage(spark, pre_dir, f"{stage_id}_side_pre", cfg, 1)

    out_dir = os.path.join(workdir, stage_id)
    mf.write_stage(
        main_fn(df, F.broadcast(side)), out_dir, stage_id, cfg, n_buckets
    )
    out = mf.read_stage(spark, out_dir, stage_id, cfg, n_buckets)

    post_dir = os.path.join(workdir, f"{stage_id}_side_post")
    mf.write_stage(post_fn(out, side), post_dir, f"{stage_id}_side_post", cfg, 1)
    refreshed = mf.read_stage(spark, post_dir, f"{stage_id}_side_post", cfg, 1)
    return out, refreshed


# metrics.jsonl row schema — the CDR writer's metrics-table half
# (/root/reference/cdr_writer/write_result_subscriber.py:68-398 pushes
# results + metrics; request_client.py:397-417 POSTs per-request timings).
METRICS_SCHEMA = (
    "run_id string, stage_id string, rows_out long, wall_ms long, "
    "buckets_computed int, buckets_skipped int, buckets_poisoned int, "
    "config_hash string, committed_at string"
)


def metrics_table(spark: SparkSession, workdir: str) -> DataFrame:
    """The metrics sink as a queryable TABLE: per-(run, stage) provenance
    rows with an explicit schema (no inference — stable even on an empty
    file)."""
    return spark.read.schema(METRICS_SCHEMA).json(
        os.path.join(workdir, "metrics.jsonl")
    )


def write_feature_table(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    """Final typed feature-table write (the CDR writer's result half):
    schema-stable parquet, partitioned by the declared columns so
    downstream reads prune on them.  At cluster scale this is the
    ``writeTo(...).append()`` Iceberg commit; parquet overwrite is the
    sandbox equivalent (plans/manifest.py:22-24)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


class Pipeline:
    def __init__(
        self,
        stages: list[Stage],
        workdir: str,
        n_buckets: int = 32,
        max_attempts: int = 3,
    ):
        self.stages = stages
        self.workdir = workdir
        self.n_buckets = n_buckets
        self.max_attempts = max_attempts

    def _log_metrics(self, run_id: str, stage_id: str, res: mf.StageResult) -> None:
        os.makedirs(self.workdir, exist_ok=True)
        row = {
            "run_id": run_id,
            "stage_id": stage_id,
            "rows_out": res.rows_out,
            "wall_ms": res.wall_ms,
            "buckets_computed": res.buckets_computed,
            "buckets_skipped": res.buckets_skipped,
            "buckets_poisoned": res.buckets_poisoned,
            "config_hash": res.config_hash,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(os.path.join(self.workdir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def run(
        self,
        spark: SparkSession,
        input_df: DataFrame,
        run_id: str = "run",
        halt_min_turns: int = 2,
        halt_fn: Callable[[DataFrame], DataFrame] | None = None,
        key: str = "conv_id",
    ) -> DataFrame:
        """Execute all stages with checkpoint-resume; returns the final
        stage's committed output.

        ``halt_fn(df) -> (key, halt_reason)`` lets non-conversation DAGs
        (e.g. document-curation over the documents table, keyed on doc_id)
        supply their own unprocessability predicate; the default is the
        conversation-shaped ``halt_predicate``.  ``key`` names the entity
        column the halt quarantines on (and the anti-join key).
        """
        # halt once, up front (computed cheaply; quarantined entities skip
        # every downstream stage but are recorded)
        if halt_fn is None:
            halted = halt_predicate(input_df, min_turns=halt_min_turns)
            halt_cfg: dict = {"min_turns": halt_min_turns}
        else:
            halted = halt_fn(input_df)
            halt_cfg = {"halt_fn": getattr(halt_fn, "__name__", "custom")}
        hdir = os.path.join(self.workdir, "quarantine")
        mf.write_stage(halted, hdir, "quarantine", halt_cfg, n_buckets=1)
        live = input_df.join(halted.select(key), on=key, how="left_anti")

        cur = live
        for st in self.stages:
            out_dir = os.path.join(self.workdir, st.stage_id)
            # resilient write: zero-overhead fast path; on failure, per-bucket
            # retry with delivery-limit-3 poison-pill quarantine (manifest.py)
            src = cur
            res = mf.write_stage_resilient(
                lambda s=st, d=src: s.fn(d),
                out_dir,
                st.stage_id,
                st.config,
                self.n_buckets,
                max_attempts=self.max_attempts,
            )
            self._log_metrics(run_id, st.stage_id, res)
            cur = mf.read_stage(
                spark,
                out_dir,
                st.stage_id,
                st.config,
                self.n_buckets,
                require_complete=res.buckets_poisoned == 0,
            )
        return cur
