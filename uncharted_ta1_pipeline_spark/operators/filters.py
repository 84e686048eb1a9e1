"""Filter/predicate operators (SURVEY.md §2.2).

Each mirrors a reference filter but over transcripts; all are pure
DataFrame transforms, Catalyst-friendly (no UDFs)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from uncharted_ta1_pipeline_spark.operators.windows import turn_order


def text_filter(
    df: DataFrame,
    include_roles: tuple[str, ...] = ("user", "assistant"),
    class_threshold: int = 4,
) -> DataFrame:
    """Include turns of given role classes, but only when the class has at
    least ``class_threshold`` turns in the conversation (≈ TextFilter's
    per-segment-class minimum-word guard,
    /root/reference/tasks/metadata_extraction/text_filter.py:24-127, and
    skip-small-segments logic :103-110)."""
    w = Window.partitionBy("conv_id", "role")
    return (
        df.withColumn("_class_n", F.count(F.lit(1)).over(w))
        .filter(F.col("role").isin(*include_roles) & (F.col("_class_n") >= class_threshold))
        .drop("_class_n")
    )


def argmax_source_filter(
    df: DataFrame, sources: tuple[str, str] = ("search", "bash")
) -> DataFrame:
    """If a conversation has observations from BOTH competing sources, drop
    the weaker source entirely — ranked by per-source count, tie-broken by
    max signal (≈ UTMStatePlaneFilter,
    /root/reference/tasks/geo_referencing/filter.py:60-140, `_get_score`
    :120-131).  Rows of other sources pass through untouched."""
    a, b = sources
    scores = (
        df.filter(F.col("tool").isin(a, b))
        .groupBy("conv_id", "tool")
        .agg(F.count(F.lit(1)).alias("_n"), F.max("signal").alias("_mx"))
    )
    # the loser source per conv (only where both present)
    w = Window.partitionBy("conv_id").orderBy(
        F.col("_n").desc(), F.col("_mx").desc(), F.col("tool").asc()
    )
    losers = (
        scores.withColumn("_rk", F.row_number().over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(Window.partitionBy("conv_id")))
        .filter((F.col("_cnt") == 2) & (F.col("_rk") == 2))
        .select("conv_id", F.col("tool").alias("_loser"))
    )
    return (
        df.join(F.broadcast(losers), on="conv_id", how="left")
        .filter(
            F.col("_loser").isNull()
            | F.col("tool").isNull()
            | (F.col("tool") != F.col("_loser"))
        )
        .drop("_loser")
    )


def range_filter_readd(
    df: DataFrame, margin: float = 0.1, min_keep: int = 2
) -> DataFrame:
    """Ring/range filter with conditional re-add (≈ ROIFilter,
    /root/reference/tasks/geo_referencing/filter.py:143-287: drop
    observations outside the ring, but if fewer than 2 distinct survive,
    re-add the best-confidence dropped ones at half confidence :200-237).

    Transcript analog: a turn is OK when its ts lies inside the
    conversation's trimmed time range [first + margin*span, last -
    margin*span]; statuses flip instead of rows being deleted
    (CoordStatus semantics, entities.py:91-95)."""
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("conv_id")
    span = F.max(us).over(w) - F.min(us).over(w)
    lo = F.min(us).over(w) + F.floor(F.lit(margin) * span).cast("long")
    hi = F.max(us).over(w) - F.floor(F.lit(margin) * span).cast("long")
    flagged = df.withColumn(
        "status", F.when(us.between(lo, hi), F.lit("OK")).otherwise(F.lit("OUTSIDE"))
    )
    n_ok = F.sum((F.col("status") == "OK").cast("long")).over(w)
    rk = F.row_number().over(
        Window.partitionBy("conv_id", "status").orderBy(
            F.col("signal").desc(), F.col("turn_idx").asc()
        )
    )
    return (
        flagged.withColumn("_n_ok", n_ok)
        .withColumn("_rk", rk)
        .withColumn(
            "status",
            F.when(
                (F.col("status") == "OUTSIDE")
                & (F.col("_n_ok") < min_keep)
                & (F.col("_rk") <= min_keep - F.col("_n_ok")),
                F.lit("READDED"),
            ).otherwise(F.col("status")),
        )
        .withColumn(
            "adj_signal",
            F.round(
                F.when(F.col("status") == "READDED", F.col("signal") * 0.5).otherwise(
                    F.col("signal")
                ),
                6,
            ),
        )
        .drop("_n_ok", "_rk")
    )


def token_budget_filter(
    df: DataFrame,
    min_len: int = 4,
    max_len: int = 200,
    min_words: int = 2,
    budget: int = 50,
) -> DataFrame:
    """Pre-filter + running token-budget cutoff (≈ metadata text
    pre-filter, /root/reference/tasks/metadata_extraction/
    metadata_extraction.py:877-899, and the TOKEN_LIMIT shrink loop
    :509-527): keep qualifying turns until the conversation's cumulative
    token count exceeds the budget."""
    words = F.size(F.split(F.col("text"), " "))
    qualified = df.filter(
        F.length("text").between(min_len, max_len) & (words >= min_words)
    )
    w = turn_order().rowsBetween(Window.unboundedPreceding, 0)
    return (
        qualified.withColumn("_tok", words)
        .withColumn("_cum", F.sum("_tok").over(w))
        .filter(F.col("_cum") <= budget)
        .drop("_tok", "_cum")
    )


def finalize_left_join(df: DataFrame) -> DataFrame:
    """Finalize: every tool observation LEFT JOINs its conversation's
    (sparse) enrichment; rows without one get defaults and a flag instead of
    being dropped (≈ FinalizePointExtractions: points left-join legend
    info, missing legend -> defaults,
    /root/reference/tasks/point_extraction/finalize_point_extractions.py).

    Output: one row per tool turn with the enrichment value or the default.
    """
    enr = conditional_enrich(df).filter(F.col("enriched")).select(
        "conv_id", "enrich_value"
    )
    obs = df.filter(F.col("role") == "tool").select("conv_id", "turn_idx")
    return obs.join(F.broadcast(enr), on="conv_id", how="left").select(
        "conv_id",
        "turn_idx",
        F.round(F.coalesce(F.col("enrich_value"), F.lit(0.0)), 6).alias(
            "legend_value"
        ),
        F.col("enrich_value").isNotNull().alias("has_legend"),
    )


def conditional_enrich(df: DataFrame, max_distinct_tools: int = 2) -> DataFrame:
    """Run expensive enrichment only for under-covered conversations
    (≈ `_should_run` conditional stage skipping,
    /root/reference/tasks/geo_referencing/coordinates_extractor.py:138-146,
    geocoder.py:63-66): conversations that already have >=
    ``max_distinct_tools`` distinct tools skip enrichment (enriched=NULL)."""
    non_empty = F.when(F.col("tool") != "", F.col("tool"))
    cov = df.groupBy("conv_id").agg(
        F.countDistinct(non_empty).alias("_n_tools")
    )
    needy = cov.filter(F.col("_n_tools") < max_distinct_tools).select("conv_id")
    enriched = (
        df.join(needy, on="conv_id", how="left_semi")
        .groupBy("conv_id")
        .agg(F.round(F.avg("signal"), 6).alias("enrich_value"))
    )
    return cov.join(enriched, on="conv_id", how="left").select(
        "conv_id",
        F.col("_n_tools").alias("n_distinct_tools"),
        (F.col("_n_tools") < max_distinct_tools).alias("enriched"),
        "enrich_value",
    )
