"""Hand-computed LCS cases for the pure-Catalyst ROUGE-L DP (oracle parity
at sf0.001/0.01 is covered by the parametrized driver-sim)."""

from __future__ import annotations

import datetime as dt

from uncharted_ta1_pipeline_spark.operators.evalm import rouge_l

TS0 = dt.datetime(2026, 1, 1)


def _conv(spark, conv_id, user_text, asst_text):
    rows = [
        (conv_id, 0, "user", user_text, TS0),
        (conv_id, 1, "assistant", asst_text, TS0 + dt.timedelta(seconds=1)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


def test_rouge_l_hand_cases(spark):
    df = (
        _conv(spark, "c1", "x a c d b", "a b c d")      # LCS(a c d) = 3
        .union(_conv(spark, "c2", "b", "a"))            # LCS = 0
        .union(_conv(spark, "c3", "same text here", "same text here"))
    )
    out = {r.conv_id: r for r in rouge_l(df).collect()}
    c1 = out["c1"]
    assert (c1.lcs, c1.n_cand, c1.n_ref) == (3, 4, 5)
    assert c1.rouge_l_p == 0.75 and c1.rouge_l_r == 0.6
    assert c1.rouge_l_f == round(2 * 0.75 * 0.6 / (0.75 + 0.6), 6)
    assert out["c2"].lcs == 0 and out["c2"].rouge_l_f == 0.0
    assert out["c3"].lcs == 3 and out["c3"].rouge_l_f == 1.0


def test_rouge_l_matches_numpy_dp(spark):
    """Property check vs an independent numpy LCS on deterministic strings."""
    import numpy as np

    def lcs_np(a, b):
        dp = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = (
                    dp[i - 1][j - 1] + 1
                    if a[i - 1] == b[j - 1]
                    else max(dp[i - 1][j], dp[i][j - 1])
                )
        return int(dp[len(a)][len(b)])

    vocab = ["t%d" % k for k in range(5)]
    df = None
    expect = {}
    for n in range(1, 12):
        # deterministic pseudo-random token sequences (no RNG)
        u = [vocab[(n * 7 + i * 3) % 5] for i in range(1 + (n * 5) % 9)]
        a = [vocab[(n * 11 + i * 2) % 5] for i in range(1 + (n * 3) % 9)]
        cid = f"c{n}"
        expect[cid] = lcs_np(a, u)
        d = _conv(spark, cid, " ".join(u), " ".join(a))
        df = d if df is None else df.union(d)
    got = {r.conv_id: r.lcs for r in rouge_l(df).collect()}
    assert got == expect
