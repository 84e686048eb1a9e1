"""Feature-store composition operators: multi-view point-in-time training
sets and leakage-free target encoding.

The north-star frames the engine as a "multi-stage as-of/windowed feature
factory"; this module adds the two compositions a training pipeline runs on
top of the as-of primitive (operators/asof.py):

1. ``training_set`` — the canonical feature-store operation (Feast/Tecton
   call it the point-in-time / row-level join): given a labels table
   (entity, label_ts, ...) and several feature VIEWS (each an event table
   keyed on the same entity with its own timestamp), attach to every label
   row each view's latest feature values as of label_ts, plus a leakage
   audit column proving no joined value postdates its label.
   Reference analog: the blackboard accumulating each task's outputs keyed
   by doc (/root/reference/tasks/common/pipeline.py:156-199) — here the
   accumulation is across feature views at an exact point in time.

2. ``target_encode_bucketed`` — leakage-free categorical target encoding:
   each row's category is encoded with the mean target of STRICTLY EARLIER
   time buckets (plus an m-estimate smoothed variant against the global
   prior).  Encoding from the running past is the classic leakage trap;
   bucket-lagged statistics make the no-peek guarantee structural rather
   than per-row, and make the plan scale-safe: per-category cumulative
   windows run over the BUCKET stream (rows = #buckets, bounded by the
   corpus time range / bucket_s — e.g. ~9k rows for a decade of hourly
   buckets), never over the raw turns.

Determinism: all statistics are sums/counts finished by one division and
round(6) — no transcendentals (see functions/docf.py for the rationale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window



def training_set(
    labels: DataFrame,
    feature_views: list[tuple[str, DataFrame, str, list[str]]],
    key: str = "conv_id",
    label_ts: str = "label_ts",
    strategy: str = "plain",
    bucket_s: int = 86_400,
    state_tiebreak: str | None = "turn_idx",
    audit: bool = True,
) -> DataFrame:
    """Point-in-time training set: sequential as-of joins of each feature
    view onto the labels table.

    ``feature_views``: list of (name, view_df, view_ts_col, feature_cols).
    Each view contributes its feature_cols plus an automatic
    ``{name}_ts_us`` (the matched event time, for the audit).  Feature
    column names must be distinct across views — the same contract every
    feature store imposes on a joined feature vector.

    ``strategy='bucketed'`` routes every join through the hot-key-safe
    time-bucketed as-of (explicit salting; see asof_join_bucketed).

    Scale: each view adds one union-window as-of join shuffled on the SAME
    entity key, so the exchanges are co-partitioned; N views = N bounded
    passes, never a per-label loop.  The audit is a pure projection.
    """
    seen: set[str] = set(labels.columns)
    for name, _, _, cols in feature_views:
        clash = (set(cols) | {f"{name}_ts_us"}) & seen
        if clash:
            raise ValueError(f"feature view {name!r}: column clash {sorted(clash)}")
        seen |= set(cols) | {f"{name}_ts_us"}
    if strategy not in ("plain", "bucketed"):
        raise ValueError(f"strategy must be plain|bucketed: {strategy}")

    # ONE tagged union + ONE window pass carrying every view's state in
    # its own packed column, instead of sequentially chaining one as-of
    # join per view.  The sequential form nested each join's two
    # stream references, so with V views the labels/view subtrees were
    # re-evaluated O(2^V) times (14 source scans for V=2 bucketed at r5);
    # here each input enters the union once and the whole plan holds
    # 2 stream references (output + bucket-closes), independent of V.
    # Results are identical: per-view carries are independent columns over
    # the same (ts, tag, tiebreak) total order the sequential joins used,
    # and extra buckets contributed by OTHER views to the bucket chain
    # carry NULL closes for this view, which last(ignorenulls) skips.
    ts_cols = [f"{name}_ts_us" for name, _, _, _ in feature_views]
    packed, types = [], []
    for i, (name, view, view_ts, cols) in enumerate(feature_views):
        view = view.withColumn(f"{name}_ts_us", F.unix_micros(F.col(view_ts)))
        st_cols = list(cols) + [f"{name}_ts_us"]
        tb = (
            F.col(state_tiebreak).cast("long")
            if state_tiebreak is not None and state_tiebreak in view.columns
            else F.lit(0).cast("long")
        )
        f = view.select(
            F.col(key).alias("_k"),
            F.col(view_ts).alias("_ts"),
            F.lit(0).alias("_tag"),
            tb.alias("_tb"),
            F.struct(*[F.col(c) for c in st_cols]).alias(f"_s{i}"),
        )
        packed.append(f)
        types.append((f.schema[f"_s{i}"].dataType, st_cols))
    probe_cols = list(labels.columns)
    probed = labels.select(
        F.col(key).alias("_k"),
        F.col(label_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(0).cast("long").alias("_tb"),
        F.struct(*[F.col(c) for c in probe_cols]).alias("_probe"),
    )
    probe_t = probed.schema["_probe"].dataType
    frames = []
    for i, f in enumerate(packed):
        for j, (t, _) in enumerate(types):
            if j != i:
                f = f.withColumn(f"_s{j}", F.lit(None).cast(t))
        frames.append(f.withColumn("_probe", F.lit(None).cast(probe_t)))
    pr = probed
    for j, (t, _) in enumerate(types):
        pr = pr.withColumn(f"_s{j}", F.lit(None).cast(t))
    unioned = frames[0]
    for f in frames[1:] + [pr]:
        unioned = unioned.unionByName(f)

    if strategy == "plain":
        w = (
            Window.partitionBy("_k")
            .orderBy("_ts", "_tag", "_tb")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        joined = unioned
        for i in range(len(types)):
            joined = joined.withColumn(
                f"_c{i}", F.last(f"_s{i}", ignorenulls=True).over(w)
            )
    else:
        unioned = unioned.withColumn(
            "_bkt",
            F.floor(F.unix_micros(F.col("_ts")) / F.lit(bucket_s * 1_000_000)),
        )
        w_in = (
            Window.partitionBy("_k", "_bkt")
            .orderBy("_ts", "_tag", "_tb")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        leveled = unioned
        for i in range(len(types)):
            leveled = leveled.withColumn(
                f"_in{i}", F.last(f"_s{i}", ignorenulls=True).over(w_in)
            )
        w_bkts = (
            Window.partitionBy("_k")
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        closes = unioned.groupBy("_k", "_bkt").agg(
            *[
                F.max_by(
                    f"_s{i}",
                    F.when(F.col(f"_s{i}").isNotNull(), F.struct("_ts", "_tb")),
                ).alias(f"_close{i}")
                for i in range(len(types))
            ]
        )
        carry_prev = closes.select(
            "_k",
            "_bkt",
            *[
                F.last(f"_close{i}", ignorenulls=True)
                .over(w_bkts)
                .alias(f"_prev{i}")
                for i in range(len(types))
            ],
        )
        joined = leveled.join(carry_prev, on=["_k", "_bkt"], how="left")
        for i in range(len(types)):
            joined = joined.withColumn(
                f"_c{i}", F.coalesce(f"_in{i}", f"_prev{i}")
            )

    out = joined.filter(F.col("_tag") == 1).select(
        *[F.col(f"_probe.{c}").alias(c) for c in probe_cols],
        *[
            F.col(f"_c{i}.{c}").alias(c)
            for i, (_, st_cols) in enumerate(types)
            for c in st_cols
        ],
    )
    if audit:
        mx = (
            F.greatest(*ts_cols) if len(ts_cols) > 1 else F.col(ts_cols[0])
        )
        out = out.withColumn("max_feature_ts_us", mx).withColumn(
            "leak_ok",
            F.coalesce(
                F.col("max_feature_ts_us") <= F.unix_micros(F.col(label_ts)),
                F.lit(True),  # no matched feature at all — vacuously safe
            ),
        )
    return out


def target_encode_bucketed(
    df: DataFrame,
    category_col: str = "role",
    target_col: str = "signal",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    smoothing: float = 10.0,
) -> DataFrame:
    """Leakage-free target encoding from strictly-earlier time buckets.

    Per row: te_count = number of target observations for this row's
    category in buckets before the row's bucket; te_mean = their mean
    (NULL with no history); te_smooth = m-estimate
    (prior_sum + m·global_prior_mean) / (prior_count + m), where the
    global prior mean is itself computed only from strictly earlier
    buckets (NULL in the corpus's first bucket).

    Plan: one map-side-combinable groupBy to (category, bucket) sums; the
    per-category and global cumulative windows then run over that bucket
    stream — |categories|·|buckets| rows, bounded by the corpus time range
    regardless of row count — and the encoded stats broadcast-or-shuffle
    join back to rows on (category, bucket).  The raw turn stream is never
    windowed.
    """
    cat, tgt = F.col(category_col), F.col(target_col)
    bucket = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bucket_s * 1_000_000))
    rows = df.withColumn("_bucket", bucket)
    # Quantize the target to 1e-6 units and sum as integers: double sums
    # accumulate in engine-specific order, and a cumulative double sum can
    # land on the opposite side of a round(6) boundary in Spark vs DuckDB
    # (observed: 58.998438 vs 58.998437).  Integer sufficient statistics
    # are exact in any order — the same fix as color_level / the as-of
    # regression states.
    tgt_q = F.floor(tgt * 1_000_000 + F.lit(0.5)).cast("long")
    per = rows.groupBy(category_col, "_bucket").agg(
        F.sum(tgt_q).alias("_s"), F.count(tgt).alias("_c")
    )
    w_cat = (
        Window.partitionBy(category_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per = per.withColumn("_ps", F.sum("_s").over(w_cat)).withColumn(
        "_pc", F.sum("_c").over(w_cat)
    )
    glob = per.groupBy("_bucket").agg(
        F.sum("_s").alias("_gs"), F.sum("_c").alias("_gc")
    )
    # global window over the bucket stream only: rows = #buckets (bounded)
    w_all = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    glob = glob.withColumn("_gps", F.sum("_gs").over(w_all)).withColumn(
        "_gpc", F.sum("_gc").over(w_all)
    )
    enc = per.join(glob.select("_bucket", "_gps", "_gpc"), on="_bucket")
    m = F.lit(float(smoothing))
    us = F.lit(1_000_000.0)
    g_mean = F.col("_gps") / (F.col("_gpc") * us)
    enc = enc.select(
        category_col,
        "_bucket",
        F.coalesce(F.col("_pc"), F.lit(0)).cast("long").alias("te_count"),
        F.round(F.col("_ps") / (F.col("_pc") * us), 6).alias("te_mean"),
        F.round(
            (F.coalesce(F.col("_ps"), F.lit(0)) / us + m * g_mean)
            / (F.coalesce(F.col("_pc"), F.lit(0)) + m),
            6,
        ).alias("te_smooth"),
    )
    return (
        rows.join(enc, on=[category_col, "_bucket"], how="left")
        .select(
            "conv_id",
            "turn_idx",
            cat.alias("category"),
            F.col("_bucket").cast("long").alias("bucket"),
            F.coalesce("te_count", F.lit(0)).alias("te_count"),
            "te_mean",
            "te_smooth",
        )
    )
