"""Growing-dimension enrichment: run 2 must hit run 1's appended misses
(geocoding_service.py:120-159,222-281 cache semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_miss_append_grows_dim_across_runs(spark, tmp_path):
    from uncharted_ta1_pipeline_spark.operators.enrich import (
        lookup_with_miss_append,
        read_dim,
    )
    from uncharted_ta1_pipeline_spark.sources.transcripts import load_transcripts

    dim_dir = str(tmp_path / "geodim")
    t = load_transcripts(spark, SF_SMOKE)

    # run 1: cold cache — every distinct key misses and is appended
    out1, miss1 = lookup_with_miss_append(t, dim_dir)
    rows1 = {r.key: (r.value, r.src) for r in out1.collect()}
    assert miss1 == len(rows1) > 0
    assert all(src == "computed" for _, src in rows1.values())

    # run 2: warm cache — zero misses, identical values, all from cache
    out2, miss2 = lookup_with_miss_append(t, dim_dir)
    rows2 = {r.key: (r.value, r.src) for r in out2.collect()}
    assert miss2 == 0
    assert all(src == "cache" for _, src in rows2.values())
    assert {k: v for k, (v, _) in rows1.items()} == {
        k: v for k, (v, _) in rows2.items()
    }

    # the stored dim holds exactly the once-computed keys (no duplicates)
    dim = read_dim(spark, dim_dir)
    assert dim.count() == dim.select("key").distinct().count() == len(rows1)

    # run 3 with NEW keys: only the new ones are computed and appended
    extra = t.withColumn(
        "tool",
        F.when(F.col("tool") == "search", F.lit("brand_new_tool")).otherwise(
            F.col("tool")
        ),
    )
    out3, miss3 = lookup_with_miss_append(extra, dim_dir)
    srcs = {r.key: r.src for r in out3.collect()}
    assert miss3 == 1 and srcs["brand_new_tool"] == "computed"
    assert all(s == "cache" for k, s in srcs.items() if k != "brand_new_tool")
