"""Cluster resolution + decontamination: graph properties the sf0.01 oracle
can't isolate — multi-hop chains (pointer-jumping convergence), canonical
tie-breaks, benchmark-flag determinism, and the broadcast shape of the
contamination join."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_components_chain_and_islands(spark):
    """A 6-hop chain must collapse to one component (requires >1 propagation
    round — exercises the pointer-jumping acceleration), independent pairs
    stay separate, and the component id is the min doc_id."""
    from uncharted_ta1_pipeline_spark.operators.dedup import dedup_components

    chain = [(i, i + 1) for i in range(10, 16)]  # 10-11-...-16
    island = [(100, 200), (300, 301)]
    comp = {
        r.doc_id: r.cluster_id
        for r in dedup_components(_pairs(spark, chain + island)).collect()
    }
    assert all(comp[n] == 10 for n in range(10, 17))
    assert comp[100] == comp[200] == 100
    assert comp[300] == comp[301] == 300
    assert len(comp) == 7 + 4


def test_components_empty_pairs(spark):
    from uncharted_ta1_pipeline_spark.operators.dedup import dedup_components

    out = dedup_components(_pairs(spark, []))
    assert out.count() == 0
    assert out.columns == ["doc_id", "cluster_id"]


def test_clusters_canonical_keep_longest(spark):
    """Canonical = max n_chars, ties -> min doc_id; singletons are their own
    canonical cluster of size 1."""
    from uncharted_ta1_pipeline_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 30), (3, "z", 30), (4, "solo", 99)],
        "doc_id long, text string, n_chars long",
    )
    out = {
        r.doc_id: r
        for r in dedup_clusters(docs, _pairs(spark, [(1, 2), (2, 3)])).collect()
    }
    assert all(out[d].cluster_id == 1 for d in (1, 2, 3))
    assert all(out[d].cluster_size == 3 for d in (1, 2, 3))
    # docs 2 and 3 tie on n_chars=30; min doc_id 2 wins
    assert [out[d].is_canonical for d in (1, 2, 3)] == [0, 1, 0]
    assert (out[4].cluster_id, out[4].cluster_size, out[4].is_canonical) == (
        4, 1, 1,
    )


def _py_bench(doc_id: int) -> bool:
    return hashlib.md5(f"bench-v1|{doc_id}".encode()).hexdigest()[0] == "0"


def test_contamination_known_overlap(spark):
    """Hand-built benchmark/candidate overlap: the Spark-side md5 flag must
    agree with a Python recomputation, and a candidate sharing ALL its
    bigrams with a benchmark doc scores 1.0 while a disjoint one scores
    0.0."""
    from uncharted_ta1_pipeline_spark.operators.dedup import (
        benchmark_flag,
        contamination,
    )

    bench_id = next(i for i in range(1000) if _py_bench(i))
    cand_full = next(i for i in range(1000) if not _py_bench(i))
    cand_none = next(
        i for i in range(cand_full + 1, 1000) if not _py_bench(i)
    )
    docs = spark.createDataFrame(
        [
            (bench_id, "alpha beta gamma delta"),
            (cand_full, "alpha beta gamma"),  # bigrams all in benchmark
            (cand_none, "zz yy xx ww"),       # disjoint
        ],
        "doc_id long, text string",
    )
    flags = {
        r.doc_id: r.f
        for r in docs.select(
            "doc_id", benchmark_flag(F.col("doc_id")).alias("f")
        ).collect()
    }
    assert flags == {d: _py_bench(d) for d in flags}
    out = {r.doc_id: r for r in contamination(docs).collect()}
    assert bench_id not in out  # benchmark docs are not scored
    assert (out[cand_full].n_shingles, out[cand_full].n_hits) == (2, 2)
    assert out[cand_full].overlap_frac == 1.0
    assert out[cand_full].contaminated == 1
    assert out[cand_none].n_hits == 0
    assert out[cand_none].contaminated == 0


def test_contamination_broadcasts_benchmark_side(spark):
    """The benchmark shingle dim must reach the candidate stream as a
    broadcast join — a corpus-vs-corpus shuffle here would be the 100 TB
    bottleneck."""
    from uncharted_ta1_pipeline_spark.operators.dedup import contamination

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = contamination(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_tfidf_top_terms_known_and_ties(spark):
    """tf*(N+1)/(df+1) on a 2-doc corpus, rank ties broken by term asc."""
    from uncharted_ta1_pipeline_spark.functions.docf import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "dog bird bird")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.rank): r
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    # doc 1: cat tf=2 df=1 -> 2*3/2=3.0 ; dog tf=1 df=2 -> 1.0
    assert (rows[(1, 1)].word, rows[(1, 1)].tfidf) == ("cat", 3.0)
    assert (rows[(1, 2)].word, rows[(1, 2)].tfidf) == ("dog", 1.0)
    # doc 2: bird tf=2 df=1 -> 3.0 ; dog 1.0
    assert (rows[(2, 1)].word, rows[(2, 1)].tfidf) == ("bird", 3.0)
    assert (rows[(2, 2)].word, rows[(2, 2)].tfidf) == ("dog", 1.0)


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    """A line shared by 2+ docs is dropped everywhere; within-doc repeats
    count once toward df; order is preserved; an all-removed doc keeps a
    row with empty clean_text."""
    from uncharted_ta1_pipeline_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "keep one\nBOILER\nkeep two"),
            (2, "BOILER\nunique line"),
            (3, "BOILER"),                      # everything removed
            (4, "self\nself\ntail"),            # within-doc repeat survives
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert out[1].clean_text == "keep one\nkeep two"
    assert (out[1].n_lines, out[1].n_removed) == (3, 1)
    assert out[2].clean_text == "unique line"
    assert (out[3].clean_text, out[3].n_lines, out[3].n_removed) == ("", 1, 1)
    # 'self' appears twice in doc 4 only -> df=1 -> kept, order preserved
    assert out[4].clean_text == "self\nself\ntail"
    assert out[4].n_removed == 0


def test_pack_sequences_offsets_and_boundaries(spark):
    """Single shard, budget 10: token stream 4+4+4 -> offsets 0/4/8, the
    third doc straddles the first boundary; stream order is key order."""
    from uncharted_ta1_pipeline_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [
            (1, "w w w w", "s"),
            (2, "w w w w", "s"),
            (3, "w w w w", "s"),
            (4, "w w", "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, budget=10, n_shards=1).collect()
    }
    assert [out[d].start_offset for d in (1, 2, 3, 4)] == [0, 4, 8, 12]
    assert [out[d].pack_id for d in (1, 2, 3, 4)] == [0, 0, 0, 1]
    assert [out[d].spans_boundary for d in (1, 2, 3, 4)] == [0, 0, 1, 0]
    # assignment is repartition-stable (hash shard + key order, no
    # execution-order dependence)
    again = {
        r.doc_id: r
        for r in pack_sequences(
            docs.repartition(7), budget=10, n_shards=1
        ).collect()
    }
    assert all(
        (out[d].start_offset, out[d].pack_id) ==
        (again[d].start_offset, again[d].pack_id)
        for d in (1, 2, 3, 4)
    )
