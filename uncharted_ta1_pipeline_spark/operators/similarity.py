"""Similarity search over embedding columns.

- ``ann_bruteforce``: exact cosine top-k — the correctness baseline; JVM-
  side only (F.aggregate over zipped arrays — no Python in the hot path).
- ``ann_lsh``: random-hyperplane LSH bucketing as the scale path: queries
  only score candidates sharing a bucket, so the join is bucket-local
  instead of |Q| x |N|.  Hyperplanes are deterministic functions of the
  dimension index (seeded via md5 nibbles), so results are reproducible
  across engines and parallelism levels.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity of two array<double> columns, evaluated in array
    order (deterministic, engine-portable)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def ann_bruteforce(
    emb: DataFrame, n_queries: int = 5, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k cosine neighbours for the first ``n_queries`` vectors.

    Ranking is on the ROUNDED score with an id tiebreak so ordering is
    identical at any parallelism (and in the DuckDB oracle)."""
    v = emb.select(F.col(id_col), F.col("embedding").cast("array<double>").alias("_v"))
    q = v.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_q")
    )
    scored = q.join(v, on=[F.col(id_col) != F.col("query_id")]).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("_q"), F.col("_v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rk"))
    )


def _hyperplane_sign(v: F.Column, plane: int) -> F.Column:
    """Sign of <v, h_plane> where h_plane[d] = ±1 derived from
    md5(plane|d) — deterministic pseudo-random hyperplane."""
    dim = F.size(v)
    idx = F.sequence(F.lit(0), dim - 1)
    signs = F.transform(
        idx,
        lambda d: F.when(
            F.position(
                F.substring(F.md5(F.concat_ws("|", F.lit(str(plane)), d.cast("string"))), 1, 1),
                F.lit("0123456789abcdef"),
            )
            <= 8,
            F.lit(-1.0),
        ).otherwise(F.lit(1.0)),
    )
    dot = F.aggregate(
        F.zip_with(v, signs, lambda x, s: x * s), F.lit(0.0), lambda acc, x: acc + x
    )
    return (dot >= 0).cast("int")


def ann_lsh(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's
    random-hyperplane bucket (2^n_planes buckets).  Recall is traded for a
    |bucket|-local join — the 100 TB path."""
    v = emb.select(F.col(id_col), F.col("embedding").cast("array<double>").alias("_v"))
    bucket = None
    for p in range(n_planes):
        term = _hyperplane_sign(F.col("_v"), p) * (2**p)
        bucket = term if bucket is None else bucket + term
    vb = v.withColumn("_bkt", bucket)
    q = vb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_q"), F.col("_bkt")
    )
    scored = q.join(
        vb, on=["_bkt"]
    ).filter(F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("_q"), F.col("_v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rk"))
    )
