"""Strictly-past training-context assembly.

`context_window` builds, for every turn, the prompt context a training
example for that turn would see: the most recent strictly-past turns of the
same conversation whose combined token count fits a budget, capped at a
fixed turn lookback.  This is the point-in-time discipline of the as-of
stage applied to TEXT: the context can never contain the turn itself or any
later turn (zero temporal leakage), mirroring how the reference derives
each query point's value strictly from previously extracted keypoints
(/root/reference/tasks/geo_referencing/geo_projection.py:52-115) — here the
"fit set" is the token-budgeted suffix of past turns instead of keypoints.

Scale design: ONE window sort on the canonical (conv_id)/(ts, turn_idx)
partitioning shared by every per-conversation operator, with a BOUNDED frame
(``max_turns`` preceding rows) — the collected array and every higher-order
expression over it are O(max_turns) per row regardless of conversation
length, so a 10^8-turn hot conversation carries no unbounded window state
(contrast with collect_list over an unbounded frame, which this module
exists to avoid).  No joins, no second shuffle; the budget trim is a pure
Catalyst higher-order filter over the bounded array.

Determinism contract: token counts are exact integers (split on single
space, empty tokens dropped — the functions/docf.py convention), cumulative
sums are int64, and the context digest is md5 over the texts joined with the
0x1F unit separator in frame order — all bit-identical across Spark and
DuckDB (the conv_digest_dedup precedent).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from uncharted_ta1_pipeline_spark.operators.windows import PAST, turn_order

_US = "\u001f"  # unit separator; cannot appear in the token stream


def context_window(
    df: DataFrame, budget_tokens: int = 24, max_turns: int = 8
) -> DataFrame:
    """Per-turn strictly-past context under a token budget.

    For turn i, the context is the maximal contiguous run of turns
    j ∈ [i - max_turns, i - 1] (stable (ts, turn_idx) order) ending at
    i - 1 whose total token count ≤ ``budget_tokens`` — i.e. the most
    recent past turns that fit, the standard greedy context-packing rule
    of an LLM training-example builder.  A turn whose own tokens exceed
    the remaining budget evicts everything older (contiguity from i-1
    backwards is preserved by construction: the filter keeps exactly the
    suffix of the frame whose backward-cumulative tokens fit).

    Output: conv_id, turn_idx, turn_tokens, ctx_n_turns, ctx_tokens,
    ctx_first_turn_idx (oldest turn included; NULL when no context fits),
    ctx_digest (md5 of included texts joined oldest→newest with 0x1F).

    NOTE (ADVICE r5): the ``budget_tokens=24`` / ``max_turns=8`` defaults
    are frozen into the registered oracle SQL (8 PRECEDING, <= 24);
    non-default calls bypass the driver parity gate and are pytest-only —
    the denoise_segments convention.  Tokenization coalesces NULL text to
    an empty array so the operator is source-agnostic (a NULL turn counts
    0 tokens instead of poisoning the cumulative sum).
    """
    w = turn_order()
    toks = F.coalesce(
        F.filter(F.split(F.col("text"), " "), lambda t: t != ""),
        F.array().cast("array<string>"),
    )
    tok_n = F.size(toks).cast("long")
    base = df.select(
        "conv_id",
        "turn_idx",
        "ts",
        "text",
        tok_n.alias("_tok"),
    ).withColumn("_cum", F.sum("_tok").over(w.rowsBetween(PAST, 0)))
    # frame of the last max_turns strictly-past turns, oldest -> newest
    arr = F.collect_list(
        F.struct(
            F.col("_cum").alias("cum"),
            F.col("_tok").alias("tok"),
            F.col("turn_idx").cast("long").alias("ti"),
            F.col("text").alias("txt"),
        )
    ).over(turn_order().rowsBetween(-max_turns, -1))
    g = base.withColumn("_arr", arr).withColumn(
        "_cum_prev", F.col("_cum") - F.col("_tok")
    )
    # keep turn j iff tokens(j .. i-1) = cum_prev - (cum_j - tok_j) <= budget;
    # (cum_j - tok_j) increases along the frame, so this keeps a suffix
    kept = F.filter(
        F.col("_arr"),
        lambda s: (F.col("_cum_prev") - (s["cum"] - s["tok"]))
        <= F.lit(budget_tokens),
    )
    texts = F.transform(kept, lambda s: s["txt"])
    return g.select(
        "conv_id",
        "turn_idx",
        F.col("_tok").alias("turn_tokens"),
        F.size(kept).cast("long").alias("ctx_n_turns"),
        F.aggregate(
            kept, F.lit(0).cast("long"), lambda acc, s: acc + s["tok"]
        ).alias("ctx_tokens"),
        F.get(F.transform(kept, lambda s: s["ti"]), 0).alias(
            "ctx_first_turn_idx"
        ),
        F.md5(F.array_join(texts, _US)).alias("ctx_digest"),
    )
