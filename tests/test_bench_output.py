"""Guard the bench JSON contract: the driver tail-captures only the last
~2000 chars of stdout, so the single line bench.py prints must ALWAYS fit
(this is exactly how the r3 headline metric was lost — VERDICT r3 §wrong-1).
No Spark needed; this pins the serialization logic alone.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import compact_result  # noqa: E402


def _result(n_queries: int) -> dict:
    return {
        "metric": "turns_per_sec_featurize",
        "value": 123456.7,
        "unit": "turns/sec",
        "total_sec": 99.99,
        "queries": {
            f"q_some_rather_long_query_name_{i:03d}": round(0.001 * i, 3)
            for i in range(n_queries)
        },
        "sf": "/root/testdata/sf0.1",
        "n_turns": 6_000_000,
        "cpus": 32,
        "queries_file": "BENCH/bench_full_latest.json",
    }


def test_line_fits_budget_at_any_query_count():
    for n in (0, 5, 73, 200, 1000):
        line = compact_result(_result(n))
        assert len(line) <= 1800, (n, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == "turns_per_sec_featurize"
        assert parsed["value"] == 123456.7
        assert parsed["queries_total"] == n


def test_truncation_keeps_slowest_queries():
    parsed = json.loads(compact_result(_result(1000)))
    kept = parsed["queries"]
    assert 0 < len(kept) < 1000
    # slowest-first: the globally slowest query must survive truncation
    assert "q_some_rather_long_query_name_999" in kept


def test_small_result_is_untruncated():
    parsed = json.loads(compact_result(_result(10)))
    assert len(parsed["queries"]) == 10


def test_scaling_observation_log_merges_minima(tmp_path, monkeypatch):
    """The scaling headline must be the min per level across ALL recorded
    windows of a shape — a later run in a degraded host window must not
    clobber an earlier, better minimum (the r4 inter-session incident)."""
    import bench_scaling as bs

    monkeypatch.setattr(bs, "OBS_PATH", str(tmp_path / "obs.jsonl"))
    shape = {"exec_lo": 1, "exec_hi": 4, "cores": 4, "mem_mb": 8192,
             "java_opts": "-XX:+AlwaysPreTouch", "turns": 8_000_000}
    other = dict(shape, cores=1)
    # window 1: good; window 2: degraded; alien shape must not leak in
    bs.record_obs(shape, "lo", 55.29)
    bs.record_obs(shape, "hi", 18.38)
    bs.record_obs(other, "hi", 1.0)
    bs.record_obs(shape, "lo", 70.9)
    bs.record_obs(shape, "hi", 43.3)
    lo, hi = bs.load_obs(shape)
    assert lo == [55.29, 70.9] and hi == [18.38, 43.3]
    assert min(lo) == 55.29 and min(hi) == 18.38  # degraded window ignored
    # corrupt line is skipped, not fatal
    with open(bs.OBS_PATH, "a") as f:
        f.write("not json\n")
    assert bs.load_obs(shape) == ([55.29, 70.9], [18.38, 43.3])


def test_effective_java_opts_resolution(monkeypatch):
    """Explicit --java-opts wins; otherwise the session env default applies
    (so observations of the default and explicit-pretouch runs share one
    shape key)."""
    import bench_scaling as bs

    monkeypatch.delenv("SPARK_GRAFT_EXEC_JAVA_OPTS", raising=False)
    assert bs.effective_java_opts("") == "-XX:+AlwaysPreTouch"
    assert bs.effective_java_opts("-Xfoo") == "-Xfoo"
    monkeypatch.setenv("SPARK_GRAFT_EXEC_JAVA_OPTS", "-Xbar")
    assert bs.effective_java_opts("") == "-Xbar"
