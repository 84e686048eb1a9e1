"""Run the driver-style DuckDB parity check for a set of queries at a given
SF dir (default sf0.01, the driver's correctness scale).  Usage:

    python scripts/parity_sweep.py --sf-dir /root/testdata/sf0.01 --names a,b,c
    python scripts/parity_sweep.py --docs      # every QUERIES_DOCS entry
    python scripts/parity_sweep.py --all
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default="")
    ap.add_argument("--docs", action="store_true")
    ap.add_argument("--ops", action="store_true")
    ap.add_argument("--core", action="store_true")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as e
    from tests.oracle_check import check
    from uncharted_ta1_pipeline_spark.session import get_spark

    names: list[str] = [n for n in args.names.split(",") if n.strip()]
    if args.docs or args.all:
        from uncharted_ta1_pipeline_spark.plans.queries_docs import QUERIES_DOCS

        names += list(QUERIES_DOCS)
    if args.ops or args.all:
        from uncharted_ta1_pipeline_spark.plans.queries_ops import QUERIES_OPS

        names += list(QUERIES_OPS)
    if args.core or args.all:
        from uncharted_ta1_pipeline_spark.plans.queries import QUERIES

        names += list(QUERIES)
    oracles = e.oracle_sql()
    names = [n for n in dict.fromkeys(names) if n in oracles]

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    failed = []
    for n in names:
        try:
            check(spark, n, args.sf_dir)
            print(f"OK   {n}", flush=True)
        except Exception as ex:  # noqa: BLE001
            failed.append(n)
            print(f"FAIL {n}: {ex}", flush=True)
            traceback.print_exc(limit=2)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed; failed: {failed}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
