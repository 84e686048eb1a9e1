"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end feature materialization at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins, run by the driver at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full leakage-free per-turn feature materialization
    (sessionize + lag/lead + cumulative + rolling + ffill) at sf0.001."""
    import pyspark.sql.functions as F

    from uncharted_ta1_pipeline_spark.operators.salt import featurize_hybrid
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, "/root/testdata/sf0.001")
    out = featurize_hybrid(t)
    return out.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_micros("ts").alias("ts_us"),
        "session_id",
        "prev_role",
        "next_role",
        "role_transition",
        "secs_since_prev",
        "turns_so_far",
        "tools_so_far",
        "distinct_tools_so_far",
        "rolling_turns_5",
        "rolling_tools_5",
        "rolling_signal_mean_5",
        "ffill_tool",
    )


# Driver-cap rotation policy: CORRECTNESS_r02 recorded exactly the FIRST 50
# entries of this dict (insertion order), so with >50 registered queries the
# tail gets no driver row.  Ordering rule: (1) operators added or rewritten
# this round first, (2) operators missing a row last round next, (3) the
# rest, with the longest-green (r01+r02 double-green AND pytest-covered)
# queries at the tail.  Rotate tier 3 each round so every operator family
# keeps fresh driver evidence.
_PRIORITY = [
    # tier 1 — new or changed this round
    "asof_fit_predict",     # -0.0 sign-normalization fix (the only red r02 row)
    "eval_deciles",         # distributed histogram-ntile rewrite
    "color_level",          # integer-quantized variance rewrite
    "featurize_full",       # single-pass hot/cold routing
    "simhash_pairs",        # NEW: bit-band hamming pairs
    "geodesic_scale",       # NEW: scalar pandas_udf surface
    "median_mad",           # NEW: grouped-agg pandas_udf surface
    "point_geocoder",       # NEW: composed prune+centroid-rank+topk
    "datum_shift",          # NEW: scalar pandas_udf after a join
    "scoring_output",       # NEW: ScoringOutput creator (extended fields)
    "summary_output",       # NEW: SummaryOutput creator (per-source strings)
    "ivf_assign",           # NEW r3b: IVF coarse-quantizer assignment
    "ivf_topk",             # NEW r3b: IVF nprobe top-k search
    "ivf_cluster_stats",    # NEW r3b: IVF codebook occupancy telemetry
    "ann_lsh",              # rewritten after r01; n_planes 4 -> 8 this round
    # tier 2 — no CORRECTNESS_r02 row (driver cap), re-evidence now
    "simhash",
    "embedding_cosine_pairs",
    "ann_bruteforce",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
]
# tier 3 tail — double-green in r01+r02, unchanged, pytest-covered
_TAIL = [
    "ingest_ordered", "sessionize", "lag_lead", "cumulative", "rolling",
    "ffill_tool", "session_stats", "conv_turn_rate", "text_filter",
    "argmax_source_filter", "range_filter_readd", "token_budget_filter",
]


def _ordered(merged: dict) -> dict:
    mid = [k for k in merged if k not in _PRIORITY and k not in _TAIL]
    out = {}
    for k in _PRIORITY + mid + _TAIL:
        if k in merged:
            out[k] = merged[k]
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from uncharted_ta1_pipeline_spark.plans.queries import QUERIES
    from uncharted_ta1_pipeline_spark.plans.queries_docs import QUERIES_DOCS
    from uncharted_ta1_pipeline_spark.plans.queries_ops import QUERIES_OPS

    return _ordered({**QUERIES, **QUERIES_OPS, **QUERIES_DOCS})


def oracle_sql() -> dict[str, str]:
    from uncharted_ta1_pipeline_spark.plans.oracles import ORACLES
    from uncharted_ta1_pipeline_spark.plans.oracles_docs import ORACLES_DOCS
    from uncharted_ta1_pipeline_spark.plans.oracles_ops import ORACLES_OPS

    return {**ORACLES, **ORACLES_OPS, **ORACLES_DOCS}
