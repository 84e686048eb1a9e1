"""spark-submit entry point: end-to-end feature materialization.

≈ the reference's CLI batch driver (/root/reference/pipelines/
geo_referencing/run_pipeline.py:49-247: parse args, build pipeline once,
iterate inputs, write outputs + summary).  Here: one Spark job DAG over the
whole table, written through the manifest/resume layer.

Usage (multi-executor cluster or local):

    spark-submit --py-files uncharted_ta1_pipeline_spark.zip \
        -m uncharted_ta1_pipeline_spark.cli \
        --input /data/transcripts.parquet --workdir /data/out \
        [--format parquet|json] [--gap-s 1800] [--buckets 32] [--resume]

or:  python -m uncharted_ta1_pipeline_spark.cli --input ... --workdir ...
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(prog="uncharted-ta1-pipeline-spark")
    ap.add_argument("--input", required=True, help="transcript table path")
    ap.add_argument("--workdir", required=True, help="checkpoint/output dir")
    ap.add_argument("--format", default="parquet", choices=["parquet", "json", "csv"])
    ap.add_argument("--gap-s", type=int, default=1800)
    ap.add_argument("--rolling-width", type=int, default=5)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--halt-min-turns", type=int, default=2)
    ap.add_argument("--run-id", default="cli")
    args = ap.parse_args(argv)

    from uncharted_ta1_pipeline_spark.operators.salt import featurize_hybrid
    from uncharted_ta1_pipeline_spark.plans.pipeline import Pipeline, Stage
    from uncharted_ta1_pipeline_spark.session import get_spark
    from uncharted_ta1_pipeline_spark.sources.readers import (
        densify_turn_idx,
        read_transcripts,
    )

    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="uncharted-ta1-pipeline-spark-cli")
    t = densify_turn_idx(read_transcripts(spark, args.input, args.format))

    stages = [
        Stage(
            "features",
            lambda df: featurize_hybrid(
                df, rolling_width=args.rolling_width, gap_s=args.gap_s
            ),
            {"gap_s": args.gap_s, "rolling_width": args.rolling_width},
        ),
    ]
    p = Pipeline(stages, args.workdir, n_buckets=args.buckets)
    out = p.run(spark, t, run_id=args.run_id, halt_min_turns=args.halt_min_turns)
    n = out.count()
    print(json.dumps({"run_id": args.run_id, "rows_out": n, "workdir": args.workdir}))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
