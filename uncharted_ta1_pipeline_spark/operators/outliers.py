"""Robust outlier filtering (SURVEY.md §2.5 OutlierFilter).

Two passes, mirroring /root/reference/tasks/geo_referencing/
outlier_filter.py:34-293:

1. ``mad_outliers`` — the cheap SQL pass: MAD (median absolute deviation)
   residual threshold (:246-261 `_remove_outliers_simple`).  Pure
   Catalyst: exact ``percentile`` aggregates, no UDF.
2. ``ransac_slope`` — the grouped-model pass: a seeded RANSAC line fit
   value~time per conversation (:163-231, seed 911 :191), implemented as
   ``applyInPandas`` with numpy only.  Groups are capped by confidence
   rank like the reference caps GCPs (MAX_GCPS=8, ground_control.py:17),
   so a hot conversation cannot blow up a single task.

Statuses flip to OUTLIER instead of rows being deleted
(CoordStatus, entities.py:91-95)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def mad_outliers(df: DataFrame, k: float = 3.0, value_col: str = "signal") -> DataFrame:
    """Flag rows whose value deviates from the conversation median by more
    than ``k`` * MAD (+epsilon).  Exact medians via SQL ``percentile``."""
    med = df.groupBy("conv_id").agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    dev = df.join(med, on="conv_id").withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy("conv_id").agg(F.expr("percentile(_adev, 0.5)").alias("_mad"))
    return (
        dev.join(mad, on="conv_id")
        .select(
            "conv_id",
            "turn_idx",
            F.round(value_col, 6).alias(value_col),
            F.round("_med", 6).alias("median"),
            F.round("_mad", 6).alias("mad"),
            F.when(
                F.col("_adev") > k * F.col("_mad") + F.lit(1e-9), F.lit("OUTLIER")
            )
            .otherwise(F.lit("OK"))
            .alias("status"),
        )
    )


RANSAC_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("slope", DoubleType()),
        StructField("intercept", DoubleType()),
        StructField("n_inliers", IntegerType()),
        StructField("n_obs", IntegerType()),
    ]
)


def ransac_slope(
    df: DataFrame,
    value_col: str = "signal",
    max_obs_per_group: int = 512,
    n_iter: int = 32,
    seed: int = 911,
) -> DataFrame:
    """Per-conversation robust line fit value ~ seconds-since-first-turn.

    Vectorized Arrow path (`applyInPandas`); numpy-only RANSAC with the
    reference's seed 911 (outlier_filter.py:191).  Observations per group
    are capped by recency to bound task size (the reference caps at
    MAX_GCPS=8; we keep more because the fit is cheap)."""
    import numpy as np
    import pandas as pd

    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("conv_id").orderBy(F.col("ts").desc(), F.col("turn_idx").desc())
    capped = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_obs_per_group)
        .withColumn("_us", us)
        .select("conv_id", "_us", F.col(value_col).alias("_v"))
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = (pdf["_us"].to_numpy() - pdf["_us"].min()) / 1e6
        y = pdf["_v"].to_numpy().astype("float64")
        n = len(x)
        if n < 2:
            return pd.DataFrame(
                [[pdf["conv_id"].iloc[0], None, None, 0, n]],
                columns=["conv_id", "slope", "intercept", "n_inliers", "n_obs"],
            )
        order = np.argsort(x, kind="stable")
        x, y = x[order], y[order]
        rng = np.random.RandomState(seed)
        resid_thresh = max(np.median(np.abs(y - np.median(y))) * 3.0, 1e-9)
        best = (-1, 0.0, 0.0)
        for _ in range(n_iter):
            i, j = rng.randint(0, n), rng.randint(0, n)
            if x[i] == x[j]:
                continue
            m = (y[j] - y[i]) / (x[j] - x[i])
            b = y[i] - m * x[i]
            inl = int(np.sum(np.abs(y - (m * x + b)) <= resid_thresh))
            if inl > best[0]:
                best = (inl, m, b)
        inliers = np.abs(y - (best[1] * x + best[2])) <= resid_thresh
        if inliers.sum() >= 2:
            m, b = np.polyfit(x[inliers], y[inliers], 1)
        else:
            m, b = best[1], best[2]
        return pd.DataFrame(
            [[pdf["conv_id"].iloc[0], round(float(m), 6), round(float(b), 6),
              int(inliers.sum()), n]],
            columns=["conv_id", "slope", "intercept", "n_inliers", "n_obs"],
        )

    return capped.groupBy("conv_id").applyInPandas(fit, RANSAC_SCHEMA)
