"""Sampling/split invariants the oracle can't see: partitioning
invariance (membership never depends on execution layout), salt
sensitivity, split completeness, and the missing-stratum default."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_hash_split_partitioning_invariant_and_complete(spark):
    from uncharted_ta1_pipeline_spark.operators.sampling import hash_split

    d = _docs(spark)
    a = {r.doc_id: r.split for r in hash_split(d).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(d.repartition(13, "source")).collect()
    }
    assert a == b, "split assignment moved under repartitioning"
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == d.count()
    # roughly the requested proportions (hash-uniform; generous bounds)
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.6 * n < train < 0.95 * n

    # additivity: new rows never move existing assignments
    half = d.filter(F.col("doc_id") % 2 == 0)
    c = {r.doc_id: r.split for r in hash_split(half).collect()}
    assert all(a[k] == v for k, v in c.items())


def test_hash_split_salt_reshuffles(spark):
    from uncharted_ta1_pipeline_spark.operators.sampling import hash_split

    d = _docs(spark)
    a = {r.doc_id: r.split for r in hash_split(d, salt="split-v1").collect()}
    b = {r.doc_id: r.split for r in hash_split(d, salt="split-v2").collect()}
    assert a != b, "salt change must produce a different assignment"


def test_stratified_sample_missing_stratum_dropped(spark):
    from uncharted_ta1_pipeline_spark.operators.sampling import stratified_sample

    d = _docs(spark)
    rates = spark.createDataFrame(
        [("src0", 1.0), ("src1", 0.0)], "source string, rate double"
    )
    out = stratified_sample(d, rates).select("source").distinct().collect()
    assert {r.source for r in out} == {"src0"}  # rate 0 and missing -> dropped
    # rate 1.0 keeps every row of its stratum
    n_src0 = d.filter(F.col("source") == "src0").count()
    kept = stratified_sample(d, rates).count()
    assert kept == n_src0


def test_domain_mix_rates_known_solution(spark):
    """A(6 docs)/B(2 docs) rebalanced to 50/50: T = min(6/.5, 2/.5) = 4,
    so B (binding) keeps everything at rate 1.0 and A downsamples to
    0.5*4/6; expected kept counts are 2 and 2."""
    from uncharted_ta1_pipeline_spark.operators.sampling import domain_mix_rates

    d = spark.createDataFrame(
        [(i, "A" if i < 6 else "B") for i in range(8)],
        "doc_id long, source string",
    )
    targets = spark.createDataFrame(
        [("A", 0.5), ("B", 0.5)], "source string, target_share double"
    )
    rows = {r.source: r for r in domain_mix_rates(d, targets).collect()}
    assert rows["B"].rate == 1.0 and rows["B"].expected_docs == 2
    assert rows["A"].rate == 0.333333 and rows["A"].expected_docs == 2
    assert rows["A"].natural_share == 0.75 and rows["B"].natural_share == 0.25
    # rates are a feasible no-upsampling plan: every rate <= 1.0
    assert all(r.rate <= 1.0 for r in rows.values())


def test_temporal_split_embargo_and_straddle(spark):
    import datetime as dt

    from uncharted_ta1_pipeline_spark.operators.sampling import temporal_split

    t0 = dt.datetime(2026, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    # 5 rows: percentile(us, 0.8) lands on the 4th value (h = 3.2 between
    # rows 3 and 4 -> interpolated); embargo 3600s
    rows = [
        ("c1", 0, ts(0)),
        ("c1", 1, ts(100)),
        ("c1", 2, ts(200)),
        ("c2", 0, ts(300)),       # train cutoff interpolates past here
        ("c2", 1, ts(300 + 7200)),  # beyond cutoff + embargo -> test
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = {(r.conv_id, r.turn_idx): r for r in temporal_split(df).collect()}
    assert out[("c1", 0)].split == "train"
    assert out[("c2", 1)].split == "test"
    # c1 never reaches test -> no straddle; c2 has train(ish) + test rows
    assert out[("c1", 0)].conv_straddles is False
    c2_splits = {out[("c2", i)].split for i in (0, 1)}
    if {"train", "test"} <= c2_splits:
        assert out[("c2", 0)].conv_straddles is True


def test_temporal_split_embargo_rows_excluded_from_both(spark):
    import datetime as dt

    from uncharted_ta1_pipeline_spark.operators.sampling import temporal_split

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("c1", i, t0 + dt.timedelta(seconds=i)) for i in range(5)
    ] + [("c1", 5, t0 + dt.timedelta(seconds=1800)),
         ("c1", 6, t0 + dt.timedelta(seconds=7200))]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    out = {r.turn_idx: r.split for r in temporal_split(df).collect()}
    # cutoff = p80 of [0..4, 1800, 7200]s; the 1800s row falls inside
    # (cutoff, cutoff + 3600] -> embargo; the 7200s row is test
    assert out[5] == "embargo"
    assert out[6] == "test"


def test_per_group_sample_cap_and_group_stability(spark):
    """Each group keeps exactly min(k, |group|) rows; membership within a
    group is unchanged when OTHER groups are added (hash is a pure
    function of (salt, group, key))."""
    from uncharted_ta1_pipeline_spark.operators.sampling import (
        per_group_sample,
    )

    base = spark.createDataFrame(
        [("g1", i) for i in range(20)] + [("g2", i) for i in range(3)],
        "conv_id string, turn_idx int",
    )
    out = per_group_sample(base, k=5).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["conv_id"], []).append((r["samp_rank"], r["turn_idx"]))
    assert len(by_g["g1"]) == 5
    assert sorted(r for r, _ in by_g["g1"]) == [1, 2, 3, 4, 5]
    assert len(by_g["g2"]) == 3  # groups smaller than k keep everything

    more = base.union(
        spark.createDataFrame(
            [("g3", i) for i in range(10)], "conv_id string, turn_idx int"
        )
    )
    out2 = {
        (r["conv_id"], r["turn_idx"]): r["samp_rank"]
        for r in per_group_sample(more, k=5).collect()
        if r["conv_id"] == "g1"
    }
    assert out2 == {("g1", t): rk for rk, t in by_g["g1"]}
