"""Slowly-growing broadcast dimension with miss-append — geocoder-cache
semantics (SURVEY.md §2.3/§2.8).

Re-expresses /root/reference/tasks/metadata_extraction/geocoding_service.py
:120-159 (cache lookup before geocoding) and :222-281 (geocode misses, write
them back so later runs hit the enlarged cache) as a Spark pattern:

- the dimension is a small keyed table, broadcast-joined against the fact
  side (no shuffle of the big side);
- keys that miss are enriched by a deterministic compute function (the
  "geocoder" — here a pure md5-derived value so the DuckDB oracle can
  reproduce it; in production an external service behind mapInPandas);
- computed misses are APPENDED to the dimension store, so the next run's
  broadcast dim contains them and the service is never re-queried
  (verified by tests/test_enrich.py's two-run pytest).

The stateless core (`geocode_enrich`) is oracle-checked; the stateful
append loop (`lookup_with_miss_append`) composes it with plain parquet
append (Iceberg MERGE in production).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DIM_SCHEMA = "key string, value double"


def fake_geocode(key: F.Column) -> F.Column:
    """Deterministic stand-in for the external geocoder: a longitude-ish
    value derived from the key's md5 (engine-portable, see dedup.py's h32)."""
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return F.round(F.pmod(h, 36_000_000) / 100_000.0 - 180.0, 6)


def distinct_keys(df: DataFrame, key_col: str = "tool") -> DataFrame:
    return (
        df.filter(F.col(key_col).isNotNull() & (F.col(key_col) != ""))
        .select(F.col(key_col).alias("key"))
        .distinct()
    )


def geocode_enrich(df: DataFrame, dim: DataFrame, key_col: str = "tool") -> DataFrame:
    """Broadcast-dim lookup with inline miss computation (one run's view of
    the cache protocol): every distinct key resolves to the cached value if
    the dim has it, else to the freshly computed one, tagged with its source.
    """
    keys = distinct_keys(df, key_col)
    joined = keys.join(F.broadcast(dim), on="key", how="left")
    return joined.select(
        "key",
        F.round(F.coalesce(F.col("value"), fake_geocode(F.col("key"))), 6).alias(
            "value"
        ),
        F.when(F.col("value").isNotNull(), F.lit("cache"))
        .otherwise(F.lit("computed"))
        .alias("src"),
    )


def read_dim(spark: SparkSession, dim_dir: str) -> DataFrame:
    if os.path.isdir(dim_dir) and any(
        n.endswith(".parquet") for n in os.listdir(dim_dir)
    ):
        return spark.read.schema(DIM_SCHEMA).parquet(dim_dir)
    return spark.createDataFrame([], DIM_SCHEMA)


def lookup_with_miss_append(
    df: DataFrame, dim_dir: str, key_col: str = "tool"
) -> tuple[DataFrame, int]:
    """The full cache protocol: enrich against the stored dim, compute
    misses, append them to the store (so the NEXT run broadcasts the
    enlarged dim), and return (enriched keys, n_misses).

    The append is tiny by construction — only never-seen keys — mirroring
    the reference's cache-put per new place name
    (geocoding_service.py:148-159)."""
    spark = df.sparkSession
    dim = read_dim(spark, dim_dir)
    enriched = geocode_enrich(df, dim, key_col)
    misses = enriched.filter(F.col("src") == "computed").select("key", "value")
    n_misses = misses.count()
    if n_misses:
        misses.coalesce(1).write.mode("append").parquet(dim_dir)
    return enriched, n_misses
