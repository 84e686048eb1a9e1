"""Evaluation-metrics harness (SURVEY.md §2.4): predictions↔truth
nearest-match within a radius, per-class precision/recall/F1, and a decile
summary over per-conversation scores.

Re-expresses the reference's feature-extraction scoring
(/root/reference/eval/18month_eval/fe_metrics_utils.py:18-142: per-class
bipartite nearest matching within a pixel radius → P/R/F1;
points_extraction_calc_metrics.py:120-144: aggregation across maps) on the
transcripts derivation:

- predictions = tool turns (predicted class = tool name, time = ts);
- truth       = every 3rd user turn with a deterministic class label;
- a prediction matches a truth point of the same (conversation, class)
  within ``radius_s`` seconds; conflicts resolve mutual-nearest (each
  prediction takes its nearest truth, each truth keeps its nearest
  claiming prediction) — the same deterministic greedy the corner join
  uses, fully expressible in SQL for the oracle.

Everything is pure Catalyst (joins + windows): one shuffle per ranking,
bounded candidate sets (radius-limited within (conv, class)), no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

CLASSES = ["search", "bash", "read", "write", "edit"]
RADIUS_S = 300


def predictions(df: DataFrame) -> DataFrame:
    """Predicted events: tool turns, class = tool name."""
    return df.filter(
        (F.col("role") == "tool") & F.col("tool").isin(CLASSES)
    ).select(
        "conv_id",
        F.col("tool").alias("class"),
        F.col("turn_idx").alias("pred_idx"),
        F.unix_micros("ts").alias("pred_us"),
    )


def truths(df: DataFrame) -> DataFrame:
    """Ground-truth events: every 3rd user turn, deterministic class."""
    cls = F.element_at(
        F.array(*[F.lit(c) for c in CLASSES]),
        (F.floor(F.col("turn_idx") / 3) % 5 + 1).cast("int"),
    )
    return df.filter((F.col("role") == "user") & (F.col("turn_idx") % 3 == 0)).select(
        "conv_id",
        cls.alias("class"),
        F.col("turn_idx").alias("truth_idx"),
        F.unix_micros("ts").alias("truth_us"),
    )


def _tagged_events(df: DataFrame) -> DataFrame:
    """One pass over the transcript tagging prediction vs truth events
    (their row conditions are role-disjoint): (conv_id, class, _p) with
    _p = 1 for predictions, 0 for truths.  Lets the per-class / per-conv
    count aggregates run over a single source evaluation instead of one
    filtered aggregate per side."""
    is_pred = (F.col("role") == "tool") & F.col("tool").isin(CLASSES)
    is_truth = (F.col("role") == "user") & (F.col("turn_idx") % 3 == 0)
    truth_cls = F.element_at(
        F.array(*[F.lit(c) for c in CLASSES]),
        (F.floor(F.col("turn_idx") / 3) % 5 + 1).cast("int"),
    )
    return df.filter(is_pred | is_truth).select(
        "conv_id",
        F.when(is_pred, F.col("tool")).otherwise(truth_cls).alias("class"),
        is_pred.cast("long").alias("_p"),
    )


def match_pairs(pred: DataFrame, truth: DataFrame, radius_s: int = RADIUS_S) -> DataFrame:
    """Mutual-nearest one-to-one matches within the radius.

    Candidates are radius-limited within (conv_id, class) — never a free
    cross join; the two rankings are windows over the candidate set."""
    cand = pred.join(truth, on=["conv_id", "class"]).withColumn(
        "dist_us", F.abs(F.col("pred_us") - F.col("truth_us"))
    ).filter(F.col("dist_us") <= radius_s * 1_000_000)
    w1 = Window.partitionBy("conv_id", "class", "pred_idx").orderBy(
        "dist_us", "truth_idx"
    )
    w2 = Window.partitionBy("conv_id", "class", "truth_idx").orderBy(
        "dist_us", "pred_idx"
    )
    return (
        cand.withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") == 1)
        .withColumn("_rk2", F.row_number().over(w2))
        .filter(F.col("_rk2") == 1)
        .select("conv_id", "class", "pred_idx", "truth_idx", "dist_us")
    )


def eval_f1_per_class(df: DataFrame, radius_s: int = RADIUS_S) -> DataFrame:
    """Per-class precision / recall / F1 across the whole corpus
    (fe_metrics_utils.py:18-142 semantics)."""
    pred, truth = predictions(df), truths(df)
    tp = match_pairs(pred, truth, radius_s).groupBy("class").agg(
        F.count(F.lit(1)).alias("tp")
    )
    # n_pred/n_truth from ONE tagged pass (pred/truth row conditions are
    # role-disjoint) instead of two filtered aggregates full-joined back:
    # same (class, counts) rows — a class appears iff it has >= 1 pred or
    # truth event, and the missing side's conditional sum is 0 exactly
    # like the old full-join coalesce — with the source subtree evaluated
    # once here instead of twice.
    g = (
        _tagged_events(df)
        .groupBy("class")
        .agg(
            F.sum("_p").alias("n_pred"),
            F.sum(F.lit(1) - F.col("_p")).alias("n_truth"),
        )
        .join(tp, on="class", how="left")
        .select(
            "class",
            "n_pred",
            "n_truth",
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred"))
    rec = F.when(F.col("n_truth") > 0, F.col("tp") / F.col("n_truth"))
    return g.select(
        "class",
        "n_pred",
        "n_truth",
        "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(
                F.col("n_pred") + F.col("n_truth") > 0,
                2.0 * F.col("tp") / (F.col("n_pred") + F.col("n_truth")),
            ),
            6,
        ).alias("f1"),
    )


def _first_turn_pairs(df: DataFrame) -> DataFrame:
    """(conv_id, field, _cand_text, _ref_text): each conversation's first
    assistant/tool turn text paired with its first user turn text — the
    shared pairing of the METEOR/BLEU/ROUGE field scorers.

    ONE map-side-combinable ``min_by`` aggregate instead of the old
    row_number window + role filters + self-join (which re-evaluated the
    scan+sort subtree once per side): ``min_by`` with a conditional
    ordering key ignores rows of other roles (NULL key), so the struct
    minimum over (ts, turn_idx) IS the first turn of that role — ties are
    impossible because (ts, turn_idx) is unique per conversation.  The
    first turn is wrapped in a struct so a conversation whose first turn
    of a role exists is distinguishable from one with no such role even
    if its text were NULL (same row set as the old inner join).  Roles
    are the transcript vocabulary {user, assistant, tool} (the
    load_transcripts contract)."""

    def first_turn(role: str):
        c = F.col("role") == role
        return F.min_by(
            F.when(c, F.struct(F.col("text").alias("t"))),
            F.when(c, F.struct("ts", "turn_idx")),
        )

    agg = df.groupBy("conv_id").agg(
        first_turn("user").alias("_u"),
        first_turn("assistant").alias("_a"),
        first_turn("tool").alias("_t"),
    )
    fields = F.array(
        F.struct(F.lit("assistant").alias("field"), F.col("_a").alias("s")),
        F.struct(F.lit("tool").alias("field"), F.col("_t").alias("s")),
    )
    return (
        agg.filter(F.col("_u").isNotNull())
        .select(
            "conv_id",
            F.col("_u.t").alias("_ref_text"),
            F.explode(fields).alias("_f"),
        )
        .filter(F.col("_f.s").isNotNull())
        .select(
            "conv_id",
            F.col("_f.field").alias("field"),
            F.col("_f.s.t").alias("_cand_text"),
            "_ref_text",
        )
    )


def _greedy_align(cand: F.Column, ref: F.Column) -> F.Column:
    """METEOR's exact-match stage: align each candidate token (left to
    right) to the smallest UNUSED reference position holding the same token.
    Returns the ordered array<struct<ci,rj>> of matches.  Pure Catalyst
    fold — O(|cand|·|ref|) per pair, fine for short metadata fields."""
    acc_t = (
        "named_struct('used', CAST(array() AS array<int>), "
        "'pairs', CAST(array() AS array<struct<ci:int,rj:int>>))"
    )

    def step(acc, ci):
        tok = F.element_at(cand, ci)
        options = F.filter(
            F.sequence(F.lit(1), F.size(ref)),
            lambda j: (F.element_at(ref, j) == tok)
            & ~F.array_contains(acc["used"], j),
        )
        nxt = F.get(options, 0)  # NULL when no unused match (ANSI-safe)
        return F.when(nxt.isNull(), acc).otherwise(
            F.struct(
                F.concat(acc["used"], F.array(nxt)).alias("used"),
                F.concat(
                    acc["pairs"],
                    F.array(F.struct(ci.alias("ci"), nxt.alias("rj"))),
                ).alias("pairs"),
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.size(cand)), F.expr(acc_t), step
    )["pairs"]


def meteor_per_field(df: DataFrame) -> DataFrame:
    """METEOR-style per-field scoring (exact-match unigram stage):
    candidate = each conversation's first assistant/tool turn text,
    reference = its first user turn text — ≈ the reference's per-field
    metadata scorer (/root/reference/pipelines/metadata_extraction/
    scorer.py:97-200: METEOR per extracted field, averaged).

    Score = Fmean · (1 − penalty) with Fmean = 10PR/(R+9P),
    penalty = 0.5·(chunks/matches)³ — the standard METEOR formula over the
    greedy alignment; 0 when nothing matches."""
    prs = _first_turn_pairs(df).select(
        "conv_id",
        "field",
        F.split("_cand_text", " ").alias("_cand"),
        F.split("_ref_text", " ").alias("_ref"),
    )
    pairs = _greedy_align(F.col("_cand"), F.col("_ref"))
    d = prs.withColumn("_pairs", pairs).select(
        "conv_id",
        "field",
        F.size("_cand").alias("n_cand"),
        F.size("_ref").alias("n_ref"),
        F.size("_pairs").alias("matches"),
        F.when(F.size("_pairs") <= 1, F.size("_pairs")).otherwise(
            1
            + F.aggregate(
                F.sequence(F.lit(2), F.size("_pairs")),
                F.lit(0),
                lambda a, i: a
                + F.when(
                    (
                        F.element_at(F.col("_pairs"), i)["ci"]
                        == F.element_at(F.col("_pairs"), i - 1)["ci"] + 1
                    )
                    & (
                        F.element_at(F.col("_pairs"), i)["rj"]
                        == F.element_at(F.col("_pairs"), i - 1)["rj"] + 1
                    ),
                    F.lit(0),
                ).otherwise(F.lit(1)),
            )
        ).alias("chunks"),
    )
    m = F.col("matches").cast("double")
    p = m / F.col("n_cand")
    r = m / F.col("n_ref")
    fmean = 10.0 * p * r / (r + 9.0 * p)
    frag = F.col("chunks").cast("double") / m
    penalty = 0.5 * frag * frag * frag
    return d.select(
        "conv_id",
        "field",
        "n_cand",
        "n_ref",
        "matches",
        "chunks",
        F.round(F.when(F.col("matches") > 0, p).otherwise(F.lit(0.0)), 6).alias(
            "m_precision"
        ),
        F.round(F.when(F.col("matches") > 0, r).otherwise(F.lit(0.0)), 6).alias(
            "m_recall"
        ),
        F.round(
            F.when(F.col("matches") > 0, fmean * (1.0 - penalty)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("meteor"),
    )


def eval_f1_deciles(df: DataFrame, radius_s: int = RADIUS_S) -> DataFrame:
    """Decile summary of per-conversation micro-F1
    (points_extraction_calc_metrics.py:120-144: bucketed score summary).

    Micro-F1 per conversation = 2·tp / (n_pred + n_truth); conversations
    with neither predictions nor truths are excluded.

    Distributed exact ntile: instead of a global ``ntile(10)`` window (one
    task holding every conversation — a scale-killer at 10^7-10^8 convs),
    the decile AGGREGATES are recovered from the exact histogram of scores.
    Key observation: ntile over (f1, conv_id) assigns equal-f1 rows to
    contiguous ranks, and the output (count / avg / min / max of f1 per
    decile) does not depend on WHICH conv of an equal-f1 atom lands in which
    decile — only on how many.  So:

      1. quantize f1 to exact micro-units (f1 is round(x,6) in [0,1], so
         f1c = floor(f1·1e6 + 0.5) is lossless) and build the per-value
         histogram with one distributed groupBy — atoms collapse to one row;
      2. cumulative counts over the histogram give each value's rank range
         [lo+1, hi].  This window is global but PROVABLY BOUNDED: ≤ 1e6+1
         distinct micro-unit values regardless of input size;
      3. intersect each value's rank range with each decile's rank range
         (standard SQL ntile semantics: first N mod 10 buckets get the
         extra row) and aggregate overlap counts + integer f1c sums.

    Integer sums make avg_f1 exact (no accumulation-order sensitivity);
    the DuckDB oracle keeps a literal ntile(10) — an independent semantics
    check — with the same integer finish."""
    pred, truth = predictions(df), truths(df)
    tp = match_pairs(pred, truth, radius_s).groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("tp")
    )
    # one tagged pass for the per-conv counts (see _tagged_events /
    # eval_f1_per_class) — identical row set and sums as the old
    # full-join of two filtered aggregates
    per_conv = (
        _tagged_events(df)
        .groupBy("conv_id")
        .agg(
            F.sum("_p").alias("n_pred"),
            F.sum(F.lit(1) - F.col("_p")).alias("n_truth"),
        )
        .join(tp, on="conv_id", how="left")
        .select(
            "conv_id",
            F.round(
                2.0
                * F.coalesce("tp", F.lit(0))
                / (F.col("n_pred") + F.col("n_truth")),
                6,
            ).alias("f1"),
        )
    )
    f1c = F.floor(F.col("f1") * 1_000_000 + F.lit(0.5)).cast("long")
    hist = per_conv.select(f1c.alias("f1c")).groupBy("f1c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = Window.orderBy("f1c").rowsBetween(Window.unboundedPreceding, 0)
    hist = hist.withColumn("hi", F.sum("cnt").over(w_cum)).withColumn(
        "lo", F.col("hi") - F.col("cnt")
    )
    # corpus total = max cumulative count over the SAME bounded histogram
    # window (the curriculum pattern) — the old agg + crossJoin evaluated
    # the whole per_conv -> hist chain a second time for one scalar
    h = hist.withColumn(
        "n_total", F.max("hi").over(Window.partitionBy(F.lit(1)))
    ).withColumn("decile", F.explode(F.sequence(F.lit(1), F.lit(10))))
    base = F.floor(F.col("n_total") / 10)
    rem = F.col("n_total") % 10
    d = F.col("decile").cast("long")
    start = (d - 1) * base + F.least(d - 1, rem) + 1
    end = d * base + F.least(d, rem)
    ov = F.least(F.col("hi"), end) - F.greatest(F.col("lo") + 1, start) + 1
    h = h.withColumn("_ov", ov).filter(F.col("_ov") > 0)
    return h.groupBy("decile").agg(
        F.sum("_ov").alias("n_convs"),
        F.round(
            F.sum(F.col("f1c") * F.col("_ov")).cast("double")
            / (F.sum("_ov") * 1_000_000.0),
            6,
        ).alias("avg_f1"),
        (F.min("f1c").cast("double") / 1_000_000.0).alias("min_f1"),
        (F.max("f1c").cast("double") / 1_000_000.0).alias("max_f1"),
    )


def bleu_precisions(df: DataFrame) -> DataFrame:
    """BLEU modified n-gram precisions (n=1,2) per field: candidate = each
    conversation's first assistant/tool turn text, reference = its first
    user turn text — the same pairing as :func:`meteor_per_field`, giving
    the eval harness the second standard MT-style metric (Papineni et al.
    2002).  Emits the clipped-count rationals (p1, p2) plus the raw
    lengths; the brevity penalty's ``exp`` is left to consumers because
    transcendentals are not bit-portable across engines (same policy as
    the linear-idf tf-idf/BM25 variants in functions/docf.py).

    Construction is the distributed one — explode n-grams, count per
    (pair, gram) (map-side combinable), join candidate↔reference counts on
    the pair+gram key (co-partitioned, one shuffle), sum(min) — never a
    per-row quadratic multiset intersection, so a 10^5-token field costs
    O(tokens), not O(tokens²).
    """
    prs = _first_turn_pairs(df).select(
        "conv_id",
        "field",
        F.split("_cand_text", " ").alias("_cand"),
        F.split("_ref_text", " ").alias("_ref"),
    )

    def _bigrams(arr):
        n = F.size(arr)
        return F.zip_with(
            F.slice(arr, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )

    # ONE tagged explode + two aggregates instead of four separate
    # explode->count branches joined back onto a fifth pass (the old shape
    # evaluated the pair subtree — scan + first-turn window + join — five
    # times; this one evaluates it once).  Values are identical: cc/rc are
    # the same per-(pair, gram) occurrence counts, clip_n = sum of
    # min(cc, rc) over grams present on BOTH sides (the old inner join),
    # and n1/n2/ref_len fall out of the same counts (n1 = total candidate
    # unigrams = size(_cand), n2 = bigram count = greatest(size-1, 0),
    # ref_len = size(_ref) — split() never yields an empty array, so every
    # pair carries at least one unigram row and no row goes missing).
    def _tag(arr, n: int, side: int):
        return F.transform(
            arr,
            lambda t: F.struct(
                F.lit(n).alias("n"), F.lit(side).alias("side"), t.alias("g")
            ),
        )

    grams = F.concat(
        _tag(F.col("_cand"), 1, 0),
        _tag(_bigrams(F.col("_cand")), 2, 0),
        _tag(F.col("_ref"), 1, 1),
        _tag(_bigrams(F.col("_ref")), 2, 1),
    )
    counts = (
        prs.select("conv_id", "field", F.explode(grams).alias("_t"))
        .select("conv_id", "field", "_t.n", "_t.side", "_t.g")
        .groupBy("conv_id", "field", "n", "g")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("cc"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("rc"),
        )
    )
    is1, is2 = F.col("n") == 1, F.col("n") == 2
    both = (F.col("cc") > 0) & (F.col("rc") > 0)
    per = counts.groupBy("conv_id", "field").agg(
        F.sum(F.when(is1, F.col("cc")).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(is2, F.col("cc")).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(is1, F.col("rc")).otherwise(0)).cast("long").alias("ref_len"),
        F.sum(F.when(is1 & both, F.least("cc", "rc")).otherwise(0))
        .cast("long")
        .alias("clip1"),
        F.sum(F.when(is2 & both, F.least("cc", "rc")).otherwise(0))
        .cast("long")
        .alias("clip2"),
    )
    return per.select(
        "conv_id",
        "field",
        "n1",
        "n2",
        "ref_len",
        "clip1",
        "clip2",
        F.round(F.col("clip1") / F.col("n1"), 6).alias("p1"),
        F.when(
            F.col("n2") > 0, F.round(F.col("clip2") / F.col("n2"), 6)
        ).alias("p2"),
    )


def rouge_l(df: DataFrame, max_tokens: int = 64) -> DataFrame:
    """ROUGE-L per field (Lin 2004): longest-common-subsequence overlap
    between candidate (each conversation's first assistant/tool turn) and
    reference (its first user turn) — the third standard summarization/MT
    metric beside METEOR and BLEU above, same pairing (≈ the reference's
    per-field metadata scorer, /root/reference/pipelines/metadata_extraction/
    scorer.py:97-200, which scores extracted fields against ground truth).

    The LCS is the textbook DP computed entirely in Catalyst: an outer
    ``aggregate`` over candidate tokens carries the previous DP row as an
    array<int>; an inner ``aggregate`` over reference positions builds the
    next row (each cell needs the cell just built, so the inner loop is a
    sequential fold, not a ``transform``).  No UDF, no shuffle beyond the
    candidate↔reference pair join.  Both sides are truncated to
    ``max_tokens`` (default 64) so a pathological field costs a bounded
    O(max_tokens²) per pair — the same guard the reference applies to its
    scorer inputs (metadata fields are short).  The DuckDB oracle runs the
    identical DP via nested list_reduce.

    Emits the rational scores only (P = lcs/|cand|, R = lcs/|ref|,
    F1 = 2PR/(P+R)) — no transcendental, bit-portable across engines.
    """
    prs = _first_turn_pairs(df).select(
        "conv_id",
        "field",
        F.slice(F.split("_cand_text", " "), 1, max_tokens).alias("_cand"),
        F.slice(F.split("_ref_text", " "), 1, max_tokens).alias("_ref"),
    )

    # The DP itself runs as an integer numpy row sweep inside mapInPandas
    # (guide §4.2) instead of the old nested Catalyst aggregate: the inner
    # fold built each DP row by array-concat (O(m) per CELL -> O(m³) array
    # traffic per pair), all of it interpreted.  The numpy form is the
    # textbook row-max variant — dp[i][j] = max(dp[i-1][j], dp[i][j-1],
    # eq ? dp[i-1][j-1]+1 : 0), a cumulative max per row — which equals
    # the standard LCS recurrence because LCS increments by at most 1 per
    # step.  Every value is an int64: no float crosses Python, so the
    # engine-parity contract is untouched (P/R/F stay Catalyst-side).
    def lcs_batch(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n_c, n_r, lcs_v = [], [], []
            for cand_toks, ref_toks in zip(pdf["_cand"], pdf["_ref"]):
                c = np.asarray(cand_toks, dtype=object)
                r = np.asarray(ref_toks, dtype=object)
                n_c.append(len(c))
                n_r.append(len(r))
                eq = c[:, None] == r[None, :]
                prev = np.zeros(len(r) + 1, dtype=np.int64)
                for i in range(len(c)):
                    t = np.where(eq[i], prev[:-1] + 1, 0)
                    cur = np.maximum.accumulate(np.maximum(prev[1:], t))
                    prev = np.concatenate(([0], cur))
                lcs_v.append(int(prev[-1]))
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "field": pdf["field"],
                    "n_cand": pd.Series(n_c, dtype="int64"),
                    "n_ref": pd.Series(n_r, dtype="int64"),
                    "lcs": pd.Series(lcs_v, dtype="int64"),
                }
            )

    out = prs.select("conv_id", "field", "_cand", "_ref").mapInPandas(
        lcs_batch, "conv_id string, field string, n_cand long, n_ref long, lcs long"
    )
    p = F.col("lcs") / F.col("n_cand")
    r = F.col("lcs") / F.col("n_ref")
    return out.select(
        "conv_id",
        "field",
        "n_cand",
        "n_ref",
        "lcs",
        F.round(p, 6).alias("rouge_l_p"),
        F.round(r, 6).alias("rouge_l_r"),
        F.when(F.col("lcs") == 0, F.lit(0.0))
        .otherwise(F.round(2 * p * r / (p + r), 6))
        .alias("rouge_l_f"),
    )
