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


def domain_mix_rates(
    df: DataFrame, targets: DataFrame, strata_col: str = "source"
) -> DataFrame:
    """Solve per-stratum sampling rates that rebalance the corpus to a
    target domain mix — the planning step ahead of
    :func:`stratified_sample` in every published LM data recipe (e.g. the
    Pile / LLaMA domain weights).

    Without upsampling, the largest corpus consistent with the target
    shares keeps ``T = min_s(n_s / share_s)`` documents in total, so
    ``rate_s = share_s * T / n_s`` (the binding stratum gets rate 1.0,
    everything else is downsampled proportionally).  ``targets`` is a
    (strata_col, target_share:double) dim, one row per corpus source.

    Scale: the per-stratum counts are a map-side-combinable groupBy; all
    later joins are against broadcast singleton/strata-sized frames — no
    shuffle of the corpus beyond the one count aggregation."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("_total"))
    j = counts.join(F.broadcast(targets), on=strata_col).crossJoin(
        F.broadcast(total)
    )
    t_cap = j.agg(
        F.min(F.col("n_docs") / F.col("target_share")).alias("_t")
    )
    return j.crossJoin(F.broadcast(t_cap)).select(
        strata_col,
        "n_docs",
        F.round(F.col("n_docs") / F.col("_total"), 6).alias("natural_share"),
        F.round("target_share", 6).alias("target_share"),
        F.round(
            F.col("target_share") * F.col("_t") / F.col("n_docs"), 6
        ).alias("rate"),
        F.floor(F.col("target_share") * F.col("_t")).cast("long").alias(
            "expected_docs"
        ),
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    n_shards: int = 4,
    strata_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack-v1",
) -> DataFrame:
    """GPT-style concat-then-chunk sequence-packing assignment: within each
    (stratum, shard), documents are laid end-to-end in key order and the
    token stream is cut every ``budget`` tokens; each document learns its
    byte-exact ``start_offset``, its ``pack_id`` (the chunk containing its
    first token), and whether it straddles a chunk boundary.

    Sharding is the md5-uniform hash of the key — deterministic, stable
    under repartitioning — so the running-sum window is bounded per
    (stratum, shard) instead of per stratum: at corpus scale ``n_shards``
    is sized so each shard's token stream fits one task (the same bounded-
    window discipline as the chunked featurize path in operators/salt.py).
    """
    from pyspark.sql import Window

    shard = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(n_shards),
    )
    base = df.select(
        key_col,
        strata_col,
        shard.alias("shard"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(strata_col, "shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        base.withColumn("start_offset", (cum - F.col("n_tokens")).cast("long"))
        .withColumn(
            "pack_id",
            F.floor(F.col("start_offset") / F.lit(float(budget))).cast("long"),
        )
        .withColumn(
            "spans_boundary",
            (
                F.floor(
                    (F.col("start_offset") + F.col("n_tokens") - 1)
                    / F.lit(float(budget))
                )
                != F.floor(F.col("start_offset") / F.lit(float(budget)))
            ).cast("long"),
        )
    )


def curriculum_buckets(
    df: DataFrame, n_buckets: int = 10, text_col: str = "text"
) -> DataFrame:
    """Curriculum bucket (1..n_buckets, easy→hard by quality score) per
    document — the assignment pass of curriculum-ordered training
    (Bengio et al. 2009): schedule high-quality documents first and anneal
    toward the noisy tail.

    Tie-coherent ntile, distributed: a global ``ntile(n)`` window would
    funnel the whole corpus through one task AND split equal-score
    documents across buckets by arbitrary position.  Instead the exact
    per-value histogram (scores are round(6), so ≤ 1e6+1 distinct
    micro-unit atoms regardless of corpus size) is built with one bounded
    groupBy; each atom's rank range follows from a cumulative sum over the
    histogram (bounded window); the atom's bucket is the ntile bucket of
    its FIRST rank, computed closed-form from ntile boundary arithmetic
    (first ``n_total % n`` buckets get one extra row); and the bucket maps
    back to documents with a join on the quantized score.  All equal-score
    documents land in the same bucket — the property a curriculum wants.

    Same machinery as eval_f1_deciles (operators/evalm.py), applied as a
    per-ROW assignment rather than per-bucket aggregates.
    """
    from pyspark.sql import Window

    from uncharted_ta1_pipeline_spark.functions.docf import quality_features

    scored = quality_features(df, text_col).select(
        "doc_id",
        "quality_score",
        F.floor(F.col("quality_score") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("_qc"),
    )
    hist = scored.groupBy("_qc").agg(F.count(F.lit(1)).alias("_cnt"))
    w_cum = Window.orderBy("_qc").rowsBetween(Window.unboundedPreceding, 0)
    hist = hist.withColumn("_hi", F.sum("_cnt").over(w_cum)).withColumn(
        "_lo", F.col("_hi") - F.col("_cnt")
    )
    # corpus total as max cumulative count over the SAME bounded histogram
    # window pass (first_message_templates precedent) — the old
    # agg + crossJoin re-evaluated the whole scored->hist chain a second
    # time just to produce this one scalar
    h = hist.withColumn("_n", F.max("_hi").over(Window.partitionBy(F.lit(1))))
    nb = F.lit(n_buckets)
    base = F.floor(F.col("_n") / nb)  # rows per small bucket
    rem = F.col("_n") % nb            # first `rem` buckets get base+1
    r = F.col("_lo") + 1              # the atom's first global rank
    b1 = base + 1
    # rank -> ntile bucket, closed form (floor of exact double division;
    # the otherwise-branch denominator is guarded for the n < n_buckets
    # case where base = 0 — that branch is then never selected)
    bucket = F.when(
        r <= b1 * rem, F.floor((r - 1) / b1) + 1
    ).otherwise(
        rem + F.floor((r - 1 - b1 * rem) / F.greatest(base, F.lit(1))) + 1
    )
    buckets = h.select("_qc", bucket.cast("long").alias("bucket"))
    return scored.join(buckets, on="_qc").select(
        "doc_id", "quality_score", "bucket"
    )


def temporal_split(
    df: DataFrame,
    train_frac: float = 0.8,
    embargo_s: int = 3600,
    ts_col: str = "ts",
) -> DataFrame:
    """Time-based train/test split with an embargo gap and a
    conversation-straddle contamination flag — the split discipline
    leakage-sensitive pipelines use (an embargo absorbs features whose
    windows reach across the boundary; cf. combinatorial purged CV,
    de Prado 2018).

    cutoff = the exact ``train_frac`` percentile of MINUTE-quantized event
    time (linearly interpolated, mapped back to micros); rows at or before
    it are ``train``, rows inside (cutoff, cutoff + embargo] are
    ``embargo`` (excluded from both sides), later rows are ``test``.  Each
    row also carries ``conv_straddles`` — whether its conversation has
    turns on BOTH sides of the embargo — the per-entity contamination
    diagnostic (a straddling conversation leaks conversation-level state
    into test unless the consumer drops or re-splits it).

    The minute quantization is the scale guard: Spark's exact
    ``percentile`` keeps a value->count map whose size is the number of
    DISTINCT inputs — corpus-sized over raw microsecond timestamps at
    10^12 turns, but bounded by the corpus TIME RANGE over minutes
    (~5M entries per decade) regardless of row count.  A split boundary
    is a calendar artifact; minute resolution loses nothing.

    Plan: one bounded global percentile aggregate (single broadcast row),
    a map-side projection for the split label, and one per-conversation
    flag aggregate joined back on the key — no window anywhere.
    """
    us = F.unix_micros(F.col(ts_col))
    cut = df.agg(
        (
            F.expr(
                f"percentile(floor(unix_micros({ts_col}) / 60000000.0),"
                f" {train_frac})"
            )
            * 60_000_000.0
        ).alias("_cut")
    )
    rows = df.crossJoin(F.broadcast(cut)).withColumn(
        "_split",
        F.when(us <= F.col("_cut"), F.lit("train"))
        .when(us <= F.col("_cut") + embargo_s * 1_000_000.0, F.lit("embargo"))
        .otherwise(F.lit("test")),
    )
    flags = rows.groupBy("conv_id").agg(
        F.max((F.col("_split") == "train").cast("int")).alias("_has_train"),
        F.max((F.col("_split") == "test").cast("int")).alias("_has_test"),
    )
    return (
        rows.join(flags, on="conv_id")
        .select(
            "conv_id",
            "turn_idx",
            F.col("_split").alias("split"),
            ((F.col("_has_train") + F.col("_has_test")) == 2).alias(
                "conv_straddles"
            ),
        )
    )


def per_group_sample(
    df: DataFrame,
    group_col: str = "conv_id",
    key_col: str = "turn_idx",
    k: int = 5,
    salt: str = "pgs-v1",
) -> DataFrame:
    """Deterministic per-group cap: keep each group's ``k`` rows with the
    smallest md5(salt | group | key) — a seeded reservoir-sample analog
    with the module's determinism contract (membership is a pure function
    of (salt, group, key): stable under repartitioning, re-runs, and row
    additions OUTSIDE the group; the classic per-domain / per-conversation
    cap used to stop a mega-source from dominating a training mix).

    Output: group_col, key_col, samp_rank (1-based hash-order rank).

    Scale: one row_number window partitioned by the group key — identical
    shape to every per-conversation window here; no global ordering, no
    collect.  Hot groups route through the same chunked machinery as
    featurize_hybrid if a single group exceeds the per-task threshold.
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat_ws(
            "|",
            F.lit(salt),
            F.col(group_col).cast("string"),
            F.col(key_col).cast("string"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    return (
        df.select(group_col, key_col, h.alias("_h"))
        .withColumn("samp_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("samp_rank") <= k)
        .select(group_col, key_col, "samp_rank")
    )
