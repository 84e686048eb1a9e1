"""Deterministic sampling / split assignment for training-data pipelines.

Both operators derive a uniform [0, 1) variate from md5(salt | key) — pure
Catalyst, engine-portable (DuckDB md5 produces the same hex), seeded by a
salt string so re-runs and both engines agree bit-for-bit, and stable under
any repartitioning (the classic requirement for train/val/test splits:
membership must never depend on execution order).  At 100 TB both are
embarrassingly parallel scans: no shuffle, no state, the rate dim
broadcasts.

Reference analog: the deterministic per-document task caching keys
(/root/reference/tasks/common/task.py:188-212) — content-hash determinism
re-purposed as sampling, the standard construction in large corpus
pipelines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

HASH_DENOM = float(1 << 32)


def _uniform(key: F.Column, salt: str) -> F.Column:
    """md5-derived uniform [0, 1): first 8 hex chars as a 32-bit int."""
    h = F.md5(F.concat_ws("|", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(HASH_DENOM)


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign each row to train/val/test by hashed key: u < train → train,
    u < train + val → val, else test.  Changing ``salt`` reshuffles the
    assignment; adding rows never moves existing ones between splits."""
    u = _uniform(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(u < F.lit(train), F.lit("train"))
        .when(u < F.lit(train + val), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Per-stratum downsampling: keep a row iff its hashed-key uniform is
    below the stratum's rate.  ``rates`` is a (strata_col, rate:double)
    dim — tiny by construction (one row per corpus source), broadcast.
    Strata missing from the dim default to rate 0 (dropped), the safe
    default for an allowlist-style sampling config."""
    u = _uniform(F.col(key_col), salt)
    return (
        df.join(F.broadcast(rates), on=strata_col, how="left")
        .filter(u < F.coalesce(F.col("rate"), F.lit(0.0)))
    )
