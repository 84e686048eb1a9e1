"""Greedy monotone-run grouping and rank-then-suppress — the reference's
two remaining per-group sequence patterns (SURVEY.md §2.5).

- ``best_monotone_run``: split each conversation's signal sequence into
  maximal strictly-increasing runs (lag + break-flag + cumulative sum) and
  keep the best run (longest, earliest on ties) — the transcript analog of
  `_remove_outlier_pts`' greedy monotone coordinate grouping
  (/root/reference/tasks/geo_referencing/coordinates_extractor.py:621-688:
  group by monotone consistency, keep the largest group).

- ``rank_suppress``: rank candidates per conversation, cap at ``cap``, then
  greedily keep candidates no closer than ``min_gap_s`` to any
  already-kept one (/root/reference/tasks/geo_referencing/
  ground_control.py:116-144: cap GCPs at 8, suppress candidates within 30px
  of a kept one).  The greedy scan is sequential BUT bounded by ``cap``
  rows per group, so it folds as a pure-Catalyst ``F.aggregate`` over a
  collected ``cap``-element array — no UDF, no per-row Python, and the
  per-task memory is O(cap), independent of conversation size (the cap
  ranking itself is a plain window).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def best_monotone_run(df: DataFrame, value_col: str = "signal") -> DataFrame:
    """Rows of each conversation's longest strictly-increasing run.

    Output: conv_id, turn_idx, signal, run_id (1-based break cumsum),
    run_len."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    incl = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag(value_col).over(w)
    d = (
        df.withColumn(
            "_brk", (prev.isNull() | (F.col(value_col) <= prev)).cast("long")
        )
        .withColumn("_run", F.sum("_brk").over(incl))
        .select("conv_id", "turn_idx", value_col, "_run")
    )
    runs = d.groupBy("conv_id", "_run").agg(F.count(F.lit(1)).alias("run_len"))
    w_best = Window.partitionBy("conv_id").orderBy(
        F.col("run_len").desc(), F.col("_run").asc()
    )
    best = (
        runs.withColumn("_bk", F.row_number().over(w_best))
        .filter(F.col("_bk") == 1)
        .select("conv_id", "_run", "run_len")
    )
    return d.join(best, on=["conv_id", "_run"]).select(
        "conv_id",
        "turn_idx",
        F.round(value_col, 6).alias(value_col),
        F.col("_run").alias("run_id"),
        "run_len",
    )


def rank_suppress(
    df: DataFrame,
    value_col: str = "signal",
    cap: int = 8,
    min_gap_s: int = 24 * 3600,
) -> DataFrame:
    """Top-``cap`` rows per conversation by value, greedily suppressing any
    candidate within ``min_gap_s`` of an already-kept (better-ranked) one.

    Output: conv_id, turn_idx, signal, cand_rank (pre-suppression rank),
    keep_nr (0-based keep order)."""
    gap_us = min_gap_s * 1_000_000
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("conv_id").orderBy(
        F.col(value_col).desc(), F.col("turn_idx").asc()
    )
    ranked = (
        df.withColumn("_us", us)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
    )
    packed = ranked.groupBy("conv_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_rk").alias("rk"),
                    F.col("turn_idx").alias("turn_idx"),
                    F.col("_us").alias("us"),
                    F.col(value_col).alias("v"),
                )
            )
        ).alias("_cands")
    )
    acc_t = "array<struct<rk:int,turn_idx:int,us:bigint,v:double>>"
    kept = F.aggregate(
        F.col("_cands"),
        F.expr(f"CAST(array() AS {acc_t})"),
        lambda acc, c: F.when(
            F.exists(acc, lambda k: F.abs(k["us"] - c["us"]) < F.lit(gap_us)), acc
        ).otherwise(F.concat(acc, F.array(c))),
    )
    return packed.select("conv_id", F.posexplode(kept).alias("keep_nr", "_c")).select(
        "conv_id",
        F.col("_c.turn_idx").alias("turn_idx"),
        F.round("_c.v", 6).alias(value_col),
        F.col("_c.rk").alias("cand_rank"),
        F.col("keep_nr").cast("int").alias("keep_nr"),
    )
