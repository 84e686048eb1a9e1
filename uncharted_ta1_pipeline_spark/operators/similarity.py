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

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# multi-table LSH defaults, shared with the DuckDB oracle generator.
# planes ~ log2(N / target_bucket_size): 5 planes -> 32 buckets/table puts
# ~16 of the sf0.01 corpus's 500 vectors in a bucket; 8 tables of
# OR-construction recover the recall sharper buckets give up.  Retuned from
# 8x4 after the ann_recall query measured recall@10 = 0.02 there (256
# buckets over 500 vectors left ~2 per bucket); 5x8 measures 0.40 on the
# same corpus.  At 100 TB the bucket count must track corpus size — that
# retune is exactly what ann_recall + ann_bucket_stats exist to drive.
ANN_TABLES = 8
ANN_PLANES = 5
ANN_MAX_BUCKET = 256
EMB_DIM = 64  # embeddings.parquet dimension (constant across SFs)


def plane_sign_vector(plane: int, dim: int = EMB_DIM) -> list[float]:
    """The ±1 hyperplane for ``plane``, derived from md5(plane|d) exactly
    like the in-engine expression used to — but CONSTANT-FOLDED in Python
    (hashlib md5 == both engines' md5), so the per-row work is one dot
    product against a literal array instead of dim md5 calls.  First hex
    nibble <= 7 -> -1.0 (same rule as strpos(HEX, c) <= 8)."""
    return [
        -1.0
        if int(hashlib.md5(f"{plane}|{d}".encode()).hexdigest()[0], 16) <= 7
        else 1.0
        for d in range(dim)
    ]


def dot_seq(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-order dot product of two array<double> columns — the same
    left-to-right evaluation DuckDB's list functions use, so rounded
    outputs agree bit-exact across engines.

    Deliberately the higher-order fold, NOT an unrolled 64-term expression
    tree: the unrolled form was A/B'd at sf1.0 and blew Janino's 64 KB
    method limit ("Code grows beyond 64 KB"), killing whole-stage codegen
    for every stage it appeared in — ann_lsh 3.2s -> 20.9s, semdedup
    28.7s -> 68.9s.  The fold is a CodegenFallback leaf, so the REST of
    the stage keeps codegen and only the dot itself is interpreted.
    Chained-partial columns can't rescue the unroll either: CollapseProject
    re-inlines single-use aliases back into one giant tree."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_seq(a: F.Column) -> F.Column:
    """sqrt of the sequential sum of squares (fold form — see dot_seq)."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity of two array<double> columns, evaluated in array
    order (deterministic, engine-portable)."""
    return dot_seq(a, b) / (norm_seq(a) * norm_seq(b))


def ann_bruteforce(
    emb: DataFrame, n_queries: int = 5, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k cosine neighbours for the first ``n_queries`` vectors.

    Ranking is on the ROUNDED score with an id tiebreak so ordering is
    identical at any parallelism (and in the DuckDB oracle)."""
    # norms hoisted out of the pair loop: one interpreted fold per VECTOR
    # (and per query) instead of three per PAIR — same doubles in the same
    # op order (dot / (norm_q * norm_v), exactly ``cosine``), so rounded
    # outputs are unchanged
    v = emb.select(
        F.col(id_col), F.col("embedding").cast("array<double>").alias("_v")
    ).withColumn("_vn", norm_seq(F.col("_v")))
    q = v.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_q"),
        F.col("_vn").alias("_qn"),
    )
    scored = q.join(v, on=[F.col(id_col) != F.col("query_id")]).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot_seq(F.col("_q"), F.col("_v")) / (F.col("_qn") * F.col("_vn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rk"))
    )


def _hyperplane_sign(v: F.Column, plane: int, dim: int = EMB_DIM) -> F.Column:
    """Sign of <v, h_plane> where h_plane[d] = ±1 derived from
    md5(plane|d) — deterministic pseudo-random hyperplane, constant-folded
    to a literal array (see plane_sign_vector)."""
    signs = F.array(*[F.lit(s) for s in plane_sign_vector(plane, dim)])
    dot = F.aggregate(
        F.zip_with(v, signs, lambda x, s: x * s), F.lit(0.0), lambda acc, x: acc + x
    )
    return (dot >= 0).cast("int")


def _bucket_expr(v: F.Column, table: int, n_planes: int) -> F.Column:
    """2^n_planes bucket id for one hash table; plane ids are namespaced by
    table so every table uses an independent hyperplane set."""
    bucket = None
    for p in range(n_planes):
        term = _hyperplane_sign(v, table * 1000 + p) * (2**p)
        bucket = term if bucket is None else bucket + term
    return bucket


def _bucketize(
    v: DataFrame, n_planes: int, n_tables: int, id_col: str = "vec_id"
) -> DataFrame:
    """(id, table, bucket) rows across all hash tables; ``v`` must carry the
    vector as ``_v``.

    One explode of an ``n_tables``-element struct array — NOT an
    n_tables-way union, which made Catalyst evaluate the ``v`` subtree
    (scan + spread exchange) once per table (the minhash_bands lesson,
    re-learned here in r6: the union form cost 8 scans per reference)."""
    entries = [
        F.struct(
            F.lit(t).alias("_tbl"),
            _bucket_expr(F.col("_v"), t, n_planes).alias("_bkt"),
        )
        for t in range(n_tables)
    ]
    return v.select(id_col, F.explode(F.array(*entries)).alias("_e")).select(
        id_col, F.col("_e._tbl").alias("_tbl"), F.col("_e._bkt").alias("_bkt")
    )


def ann_bucket_stats(
    emb: DataFrame,
    n_planes: int = ANN_PLANES,
    n_tables: int = ANN_TABLES,
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-table bucket-occupancy summary for tuning ``n_planes``: buckets
    used (of 2^n_planes), and min/avg/max vectors per occupied bucket.  A
    max far above avg means a degenerate bucket (the per-bucket cap's
    target); buckets_used << 2^n_planes means the planes are too many for
    the corpus."""
    v = emb.select(F.col(id_col), F.col("embedding").cast("array<double>").alias("_v"))
    occ = _bucketize(v, n_planes, n_tables, id_col).groupBy("_tbl", "_bkt").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return occ.groupBy("_tbl").agg(
        F.count(F.lit(1)).alias("buckets_used"),
        F.lit(2**n_planes).alias("buckets_total"),
        F.min("_n").alias("min_occupancy"),
        F.round(F.avg("_n"), 2).alias("avg_occupancy"),
        F.max("_n").alias("max_occupancy"),
    ).withColumnRenamed("_tbl", "table")


# IVF (inverted-file) coarse quantizer defaults, shared with the DuckDB
# oracle generator.  At 100 TB the centroid count tracks corpus size
# (k ~ sqrt(N)); nprobe trades recall for candidate volume.
IVF_CENTROIDS = 16
IVF_NPROBE = 4
IVF_MAX_CLUSTER = 256
IVF_QUANT = 1_000_000


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-order dot product of two array<double> columns — the same
    left-to-right evaluation DuckDB's list_inner_product uses, so rounded
    outputs agree bit-exact across engines.  Unrolled via :func:`dot_seq`
    (identical float-op order, whole-stage-codegen friendly)."""
    return dot_seq(a, b)


def _dist2(x: F.Column, c: F.Column) -> F.Column:
    """Rounded squared L2 via the expanded dot form — ||x||^2 - 2<x,c> +
    ||c||^2 — written identically in the oracle so both engines share one
    expression tree (oracle-parity rule: same formula, then round)."""
    return F.round(_dot(x, x) - 2 * _dot(x, c) + _dot(c, c), 6)


def _cross_dist(v: DataFrame, cents: DataFrame) -> DataFrame:
    """Vectors x broadcast codebook with ``_d`` = rounded squared L2,
    norms hoisted: ||x||² is computed once per VECTOR and ||c||² once per
    CENTROID before the crossJoin, instead of once per (vector, centroid)
    pair inside it — the aggregate-fold dot product is the expensive part,
    and the naive form runs 3 of them per pair where one suffices.  The
    arithmetic (xx - 2·<x,c> + cc, then round) is term-for-term the same
    doubles as ``_dist2``, so oracle parity is unaffected."""
    vv = v.withColumn("_xx", _dot(F.col("_v"), F.col("_v")))
    cc = cents.withColumn("_cc", _dot(F.col("_c"), F.col("_c")))
    return vv.crossJoin(F.broadcast(cc)).withColumn(
        "_d",
        F.round(
            F.col("_xx") - 2 * _dot(F.col("_v"), F.col("_c")) + F.col("_cc"), 6
        ),
    )


def _ivf_centroids(
    v: DataFrame, n_centroids: int, id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic IVF codebook: seed with the ``n_centroids`` vectors of
    smallest (md5(id), id) — an engine-portable pseudo-random sample — then
    ONE Lloyd refinement whose per-dimension means are computed from
    integer-quantized sums (floor(x * 1e6) as bigint), so the centroids are
    bit-identical at any partitioning/parallelism (float accumulation order
    never crosses rows).  Returns (cluster, _c: array<double>).

    The reference's analog is the tile-grid coarse index used to restrict
    template matching to nearby candidates (/root/reference/tasks/
    point_extraction/template_match_point_extractor.py) — here re-expressed
    as a learned coarse quantizer over the embedding space."""
    seeds = (
        v.withColumn("_h", F.md5(F.col(id_col).cast("string").cast("binary")))
        .orderBy("_h", id_col)
        .limit(n_centroids)
    )
    c0 = seeds.select(
        (F.row_number().over(Window.orderBy("_h", id_col)) - 1).alias("cluster"),
        F.col("_v").alias("_c"),
    )
    # initial assignment against the seed codebook (16 tiny rows: broadcast).
    # argmin via min_by partial aggregation, NOT a row_number window: the
    # window would shuffle all N x k expanded rows on vec_id; min_by
    # map-side-combines them down to one row per vector before any exchange
    # (tie-break identical: lexicographic (dist, cluster)).  (VERDICT r3 #4)
    _best0 = F.min_by(
        F.struct(F.col("cluster"), F.col("_v")), F.struct(F.col("_d"), F.col("cluster"))
    )
    a0 = (
        _cross_dist(v, c0)
        .groupBy(id_col)
        .agg(_best0.alias("_b"))
        .select(id_col, F.col("_b.cluster").alias("cluster"), F.col("_b._v").alias("_v"))
    )
    # Lloyd step: exact integer per-dimension sums -> deterministic means.
    # One groupBy(cluster) with EMB_DIM column aggregates instead of the
    # old posexplode -> groupBy(cluster, dim) shape: same quantized sums
    # (order-independent longs) and the same dim-ordered mean array, but no
    # dim x N row blowup and no collect_list/array_sort reassembly — the
    # map side combines straight to one row per cluster.
    sums = a0.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.floor(F.element_at(F.col("_v"), d + 1) * IVF_QUANT).cast("long")
            ).alias(f"_s{d}")
            for d in range(EMB_DIM)
        ],
    )
    return sums.select(
        "cluster",
        F.array(
            *[
                F.col(f"_s{d}") / (F.lit(float(IVF_QUANT)) * F.col("_n"))
                for d in range(EMB_DIM)
            ]
        ).alias("_c"),
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    id_col: str = "vec_id",
) -> DataFrame:
    """Final IVF assignment: every vector's nearest refined centroid —
    (vec_id, cluster, dist2).  One broadcast join against the k-row
    codebook; no shuffle of the fact side beyond the Lloyd aggregation, so
    the plan holds at 10^9+ vectors."""
    v = emb.select(F.col(id_col), F.col("embedding").cast("array<double>").alias("_v"))
    cents = _ivf_centroids(v, n_centroids, id_col)
    # argmin via min_by (map-side partial aggregation) — no window shuffle
    # of the N x k expanded rows (VERDICT r3 #4)
    best = F.min_by(
        F.struct(F.col("cluster"), F.col("_d")), F.struct(F.col("_d"), F.col("cluster"))
    )
    return (
        _cross_dist(v, cents)
        .groupBy(id_col)
        .agg(best.alias("_b"))
        .select(id_col, F.col("_b.cluster").alias("cluster"), F.col("_b._d").alias("dist2"))
    )


def ivf_cluster_stats(
    emb: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    id_col: str = "vec_id",
) -> DataFrame:
    """Occupancy per IVF cluster — the codebook-tuning telemetry (empty or
    degenerate clusters mean k is wrong for the corpus)."""
    return (
        ivf_assign(emb, n_centroids, id_col)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min(id_col).alias("min_vec_id"),
            F.max(id_col).alias("max_vec_id"),
        )
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    max_cluster: int = IVF_MAX_CLUSTER,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k cosine via the IVF index: each query probes its
    ``nprobe`` nearest clusters and scores ONLY their members — candidate
    volume is ~nprobe/n_centroids of the corpus instead of all of it.

    Scale guards mirror ann_lsh: the INDEX side of each cluster is capped at
    ``max_cluster`` members (deterministic by id) so one degenerate cluster
    cannot go quadratic; queries always probe uncapped."""
    v = emb.select(F.col(id_col), F.col("embedding").cast("array<double>").alias("_v"))
    cents = _ivf_centroids(v, n_centroids, id_col)
    # argmin via min_by (map-side partial aggregation, VERDICT r3 #4); the
    # probes side below keeps its window — top-nprobe is a rank, not an
    # argmin, and ranks only n_queries x k tiny rows
    assigned = (
        _cross_dist(v, cents)
        .groupBy(id_col)
        .agg(
            F.min_by(F.col("cluster"), F.struct(F.col("_d"), F.col("cluster"))).alias(
                "cluster"
            )
        )
    )
    index = (
        assigned.withColumn(
            "_rn", F.row_number().over(Window.partitionBy("cluster").orderBy(id_col))
        )
        .filter(F.col("_rn") <= max_cluster)
        .select(F.col(id_col).alias("neighbor_id"), "cluster")
    )
    # each query ranks ALL centroids and keeps its nprobe nearest
    probes = (
        _cross_dist(v.filter(F.col(id_col) < n_queries), cents)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("_d", "cluster")
            ),
        )
        .filter(F.col("_rk") <= nprobe)
        .select(F.col(id_col).alias("query_id"), "cluster")
    )
    cand = (
        probes.join(index, on="cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    # norms hoisted (see ann_bruteforce): one fold per vector, not three
    # per candidate pair — identical doubles, identical op order
    qv = v.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_q"),
        norm_seq(F.col("_v")).alias("_qn"),
    )
    nv = v.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_v").alias("_n"),
        norm_seq(F.col("_v")).alias("_nn"),
    )
    scored = (
        cand.join(F.broadcast(qv), on="query_id")
        .join(nv, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_seq(F.col("_q"), F.col("_n")) / (F.col("_qn") * F.col("_nn")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rk"))
    )


def ann_lsh(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = ANN_PLANES,
    n_tables: int = ANN_TABLES,
    max_bucket: int = ANN_MAX_BUCKET,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH — the
    100 TB path.

    OR-construction across ``n_tables`` independent hash tables recovers the
    recall a single table loses to unlucky hyperplanes; within each table
    the join is bucket-local (2^n_planes buckets).  Two skew/scale guards:

    - per-bucket cap: the INDEX side of each (table, bucket) keeps at most
      ``max_bucket`` vectors (deterministic by vec_id), so one degenerate
      bucket — e.g. a mass of zero-ish embeddings — cannot go quadratic;
      queries always probe their bucket uncapped;
    - candidates are deduped across tables BEFORE vectors are re-fetched and
      scored, so each (query, neighbor) pair pays one cosine regardless of
      how many tables propose it."""
    v = emb.select(F.col(id_col), F.col("embedding").cast("array<double>").alias("_v"))
    allb = _bucketize(v, n_planes, n_tables, id_col)
    w_cap = Window.partitionBy("_tbl", "_bkt").orderBy(id_col)
    capped = (
        allb.withColumn("_rn", F.row_number().over(w_cap))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    q = allb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), "_tbl", "_bkt"
    )
    cand = (
        q.join(capped, on=["_tbl", "_bkt"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"))
        .distinct()
    )
    # norms hoisted (see ann_bruteforce): identical doubles, one fold/vector
    qv = v.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_q"),
        norm_seq(F.col("_v")).alias("_qn"),
    )
    nv = v.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_v").alias("_n"),
        norm_seq(F.col("_v")).alias("_nn"),
    )
    scored = (
        cand.join(F.broadcast(qv), on="query_id")
        .join(nv, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_seq(F.col("_q"), F.col("_n")) / (F.col("_qn") * F.col("_nn")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rk"))
    )


def ann_recall(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of each approximate index (``ann_lsh``, ``ivf_topk``)
    against the exact ``ann_bruteforce`` baseline on the shared query set —
    the number a user tuning tables/planes/nprobe actually needs (the
    quality-of-approximation report of the reference's eval harness,
    /root/reference/eval/18month_eval/fe_metrics_utils.py:18-104).

    Output: (method, query_id, n_truth, n_hit, recall_at_k) — one row per
    (index, query).  Deterministic by construction: all three top-k lists
    are themselves oracle-exact (rounded-cosine ranking with id tiebreaks),
    so the intersection counts are too; recall_at_k = n_hit / n_truth is a
    small-integer ratio, safe under round(6).

    Scale: the truth/approx lists are bounded at n_queries x k rows, so
    every join here is trivially broadcast-able; the cost is the three
    sub-operators, each already shaped for scale (bucket-local LSH probe,
    nprobe-bounded IVF scan, and the brute-force baseline bounded by its
    explicit query set)."""
    truth = ann_bruteforce(emb, n_queries, k, id_col).select(
        "query_id", "neighbor_id"
    )
    # ONE evaluation of the brute-force truth subtree (was two: a per-query
    # count plus a hits join; at sf1.0 each evaluation is ~3 s).  Every
    # truth row is replicated across the 2-row method dim (broadcast
    # crossJoin), left-joined against the union-tagged approx lists with a
    # hit marker, and ONE (method, query) aggregate counts both n_truth
    # (all rows) and n_hit (marker present).  Value-preserving because the
    # (query, neighbor) pairs within a method's approx list are unique by
    # construction — ann_lsh dedups candidates across tables before
    # scoring, and ivf_topk's index maps each vector to exactly one
    # cluster — so the left join is at most 1:1 and never multiplies truth
    # rows; zero-hit (method, query) groups survive exactly as before
    # because the truth rows themselves anchor the group (the old shape's
    # per_q x mdim scaffold with a coalesce-0 fill).
    methods = ("ann_lsh", "ivf_topk")
    approx = None
    for method, adf in (
        (methods[0], ann_lsh(emb, n_queries, k, id_col=id_col)),
        (methods[1], ivf_topk(emb, n_queries, k, id_col=id_col)),
    ):
        tagged = adf.select(
            F.lit(method).alias("method"), "query_id", "neighbor_id"
        )
        approx = tagged if approx is None else approx.unionByName(tagged)
    mdim = emb.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(m) for m in methods])).alias("method")
    )
    return (
        truth.crossJoin(F.broadcast(mdim))
        .join(
            approx.withColumn("_hit", F.lit(1)),
            on=["method", "query_id", "neighbor_id"],
            how="left",
        )
        .groupBy("method", "query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_truth"),
            F.count("_hit").cast("long").alias("n_hit"),
        )
        .select(
            "method",
            "query_id",
            "n_truth",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_truth"), 6
            ).alias("recall_at_k"),
        )
    )


# SemDeDup guards, shared with the DuckDB oracle generator: a vector is a
# semantic duplicate when an EARLIER (smaller-id) member of its IVF cluster
# sits within the cosine threshold; only the first SEMDEDUP_MAX_EARLIER
# members of a cluster (by id) act as dedup sources, so one degenerate
# cluster cannot go quadratic — the same deterministic stop-list shape as
# IVF_MAX_CLUSTER / the LSH bucket cap.  The 0.35 default is tuned to the
# synthetic corpus's near-orthogonal embedding geometry (within-cluster
# cosine mass tops out near 0.5); production corpora with genuinely
# semantic embeddings run this at 0.9+ — the threshold is the user dial.
SEMDEDUP_THRESHOLD = 0.35
SEMDEDUP_MAX_EARLIER = 256
SEMDEDUP_CHUNK = 4096  # members per scored task group (bounds task memory)


def _round_ge_boundary(threshold: float, nd: int = 6) -> float:
    """Smallest double x with round(x, nd) >= threshold under Spark's
    round semantics (BigDecimal.valueOf = shortest-decimal-repr, HALF_UP).

    Lets a vectorized scorer test RAW similarities while reproducing the
    engine's ``round(sim, 6) >= threshold`` decision exactly: round is
    monotone, so the predicate is equivalent to ``x >= x_min`` for the
    boundary double computed here.  k_min is the smallest 10^-nd grid
    index whose double value passes the engine comparison; the boundary
    is then the smallest double whose shortest-repr decimal rounds
    (HALF_UP) to at least k_min.
    """
    import math
    from decimal import Decimal

    q = Decimal(10) ** nd
    k = math.ceil(threshold * (10**nd)) + 2
    while float(Decimal(k - 1) / q) >= threshold:
        k -= 1
    b = Decimal(k) / q - Decimal(1) / (2 * q)  # exact decimal midpoint
    d = float(b)
    while Decimal(str(d)) < b:
        d = math.nextafter(d, math.inf)
    while Decimal(str(math.nextafter(d, -math.inf))) >= b:
        d = math.nextafter(d, -math.inf)
    return d


def semdedup(
    emb: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    n_centroids: int = IVF_CENTROIDS,
    max_earlier: int = SEMDEDUP_MAX_EARLIER,
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): coarse
    k-means (the shared IVF quantizer) partitions the corpus, then pairwise
    cosine runs ONLY within a cluster — the quadratic step is bounded by
    cluster occupancy instead of corpus size.  The keep rule is
    deterministic and engine-portable: the smallest-id member of any
    within-threshold neighborhood survives; a vector is flagged ``is_dup``
    iff some earlier same-cluster vector has round(cosine, 6) >= threshold.

    Output: (vec_id, cluster, is_dup, n_dup_sources, max_sim_earlier) — one
    row per vector, so downstream curation can `filter(is_dup = 0)` without
    a second join.  Rounded-cosine comparison keeps the threshold test
    bit-identical across engines (same convention as
    ``embedding_cosine_pairs``).

    Scale: one IVF assignment (broadcast codebook), one cluster-local
    self-join whose left side is capped at ``max_earlier`` rows per cluster
    (deterministic by id), one bounded aggregate.  No corpus x corpus
    shuffle anywhere; cluster count should track corpus size exactly as the
    ann_recall/ann_bucket_stats telemetry drives for LSH.  Reference analog
    re-expressed: duplicate-point suppression after tiling,
    /root/reference/tasks/point_extraction/tiling.py:277-413 (keep-first
    dedup inside an overlap neighborhood).
    """
    from collections.abc import Iterator

    v = emb.select(
        F.col(id_col), F.col("embedding").cast("array<double>").alias("_v")
    )
    m = (
        ivf_assign(emb, n_centroids, id_col)
        .select(id_col, F.col("cluster").cast("long").alias("cluster"))
        .join(v, on=id_col)
    )
    # Pair scoring as BOUNDED pack rows + one vectorized numpy pass
    # (guide §4.2: hand whole batches to native code) instead of the old
    # cluster-local self-join whose per-pair cosine was an interpreted
    # 64-element Catalyst fold (the dominant cost at sf1.0: ~5M pairs x
    # 64 lambda frames).  Members are packed ``SEMDEDUP_CHUNK`` per row
    # (task memory stays O(chunk x dim + max_earlier x dim) — no
    # unbounded per-key state), sources ride one pack row per cluster.
    #
    # Exactness contract, unchanged: the numpy accumulation loops over
    # DIMENSIONS in order (acc += x_d * y_d from a zero start), which is
    # float-op-identical to the fold's 0.0-seeded left-to-right sum, so
    # every raw dot/norm double is bit-equal to the Catalyst/DuckDB
    # evaluation.  max_sim is rounded in SPARK (round is monotone, so
    # max(round(s)) == round(max(s)) over the qualifying set); the only
    # Python-side decision is the threshold test, taken on raw sims
    # against the exact round-boundary double (_round_ge_boundary), which
    # reproduces ``round(sim, 6) >= threshold`` verbatim.
    w = Window.partitionBy("cluster").orderBy(id_col)
    ranked = m.withColumn("_rn", F.row_number().over(w))
    pack = F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("_v").alias("v")))
    src_pack = (
        ranked.filter(F.col("_rn") <= max_earlier)
        .groupBy("cluster")
        .agg(pack.alias("_src"))
    )
    mem_pack = (
        ranked.withColumn(
            "_ck", F.floor((F.col("_rn") - 1) / F.lit(SEMDEDUP_CHUNK))
        )
        .groupBy("cluster", "_ck")
        .agg(pack.alias("_mem"))
    )
    bound = _round_ge_boundary(float(threshold))

    def score(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_i, out_n, out_mx = [], [], []
            for mem, src in zip(pdf["_mem"], pdf["_src"]):
                mids = np.array([r["i"] for r in mem], dtype=np.int64)
                mv = np.array([list(r["v"]) for r in mem], dtype=np.float64)
                sids = np.array([r["i"] for r in src], dtype=np.int64)
                sv = np.array([list(r["v"]) for r in src], dtype=np.float64)
                dim = mv.shape[1]
                dot = np.zeros((len(mids), len(sids)))
                nm = np.zeros(len(mids))
                ns = np.zeros(len(sids))
                for d in range(dim):  # dim-sequential: fold-exact order
                    dot += mv[:, d : d + 1] * sv[:, d].reshape(1, -1)
                    nm += mv[:, d] * mv[:, d]
                    ns += sv[:, d] * sv[:, d]
                sim = dot / (np.sqrt(ns).reshape(1, -1) * np.sqrt(nm).reshape(-1, 1))
                mask = (sids.reshape(1, -1) < mids.reshape(-1, 1)) & (sim >= bound)
                n = mask.sum(axis=1)
                keep = n > 0
                if keep.any():
                    out_i.append(mids[keep])
                    out_n.append(n[keep].astype(np.int64))
                    out_mx.append(
                        np.max(np.where(mask, sim, -np.inf), axis=1)[keep]
                    )
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(out_i)
                    if out_i
                    else np.array([], dtype=np.int64),
                    "_n_src": np.concatenate(out_n)
                    if out_n
                    else np.array([], dtype=np.int64),
                    "_max_raw": np.concatenate(out_mx)
                    if out_mx
                    else np.array([], dtype=np.float64),
                }
            )

    hits = (
        mem_pack.join(src_pack, on="cluster")
        .select("_mem", "_src")
        .mapInPandas(score, f"{id_col} long, _n_src long, _max_raw double")
    )
    # output base re-derived through the SAME ranked subtree as the packs
    # (not the pre-window ``m``): all three references then share one
    # canonical cluster exchange — the scan + IVF assignment below it runs
    # once and is reused, instead of three independent evaluations
    base = ranked.select(id_col, "cluster")
    return base.join(hits, on=id_col, how="left").select(
        id_col,
        "cluster",
        F.coalesce((F.col("_n_src") > 0).cast("long"), F.lit(0)).alias("is_dup"),
        F.coalesce(F.col("_n_src"), F.lit(0)).cast("long").alias("n_dup_sources"),
        F.coalesce(F.round(F.col("_max_raw"), 6), F.lit(0.0)).alias(
            "max_sim_earlier"
        ),
    )
