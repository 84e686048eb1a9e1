"""DuckDB oracle SQL twins for plans/queries_docs.py.

The hash-heavy oracles (minhash, simhash) are generated programmatically so
the seed/band/bit structure provably matches the Spark side."""

from __future__ import annotations

from uncharted_ta1_pipeline_spark.operators.dedup import (
    BAND_ROWS,
    DEFAULT_MAX_BAND_DF,
    MINHASH_P,
    N_BANDS,
    N_PERMS,
    PERM_A,
    PERM_B,
)

HEX = "0123456789abcdef"

_SHINGLES = """
shingled AS (
  SELECT doc_id,
         list_transform(
           range(greatest(len(string_split(text, ' ')) - 1, 0)),
           i -> (string_split(text, ' '))[i + 1] || '_' || (string_split(text, ' '))[i + 2]
         ) AS shingles
  FROM documents
),
sh AS (
  SELECT doc_id, u.s AS sh FROM shingled, unnest(shingles) AS u(s)
)
""".strip()

ORACLES_DOCS: dict[str, str] = {}

ORACLES_DOCS["dedup_exact"] = """
SELECT min(doc_id) AS survivor_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

# 64 affine permutations over one 32-bit md5-derived hash per shingle —
# constants imported from operators.dedup so both engines provably share
# the family.
_sig_aggs = ",\n         ".join(
    f"CAST(min((h * {PERM_A[s]} + {PERM_B[s]}) % {MINHASH_P}) AS BIGINT) AS sig{s}"
    for s in range(N_PERMS)
)
_HASHED = f"""
hashed AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(sh), 1, 8)) AS BIGINT) AS h
  FROM sh
)
""".strip()
ORACLES_DOCS["minhash_signature"] = f"""
WITH {_SHINGLES},
{_HASHED}
SELECT doc_id,
         {_sig_aggs}
FROM hashed GROUP BY doc_id
"""

_band_selects = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band, "
    f"md5(concat_ws('#', {', '.join(f'CAST(sig{b * BAND_ROWS + i} AS VARCHAR)' for i in range(BAND_ROWS))})) AS band_key FROM sig"
    for b in range(N_BANDS)
)
# shared by minhash_lsh_pairs and the dedup_clusters component pass
_PAIR_CTES = f"""{_SHINGLES},
{_HASHED},
sig AS (
  SELECT doc_id,
         {_sig_aggs}
  FROM hashed GROUP BY doc_id
),
banded AS (
{_band_selects}
),
small AS (
  SELECT band, band_key FROM banded
  GROUP BY band, band_key HAVING count(*) <= {DEFAULT_MAX_BAND_DF}
),
kept AS (
  SELECT b.* FROM banded b JOIN small s
    ON b.band = s.band AND b.band_key = s.band_key
),
lsh_pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM kept l JOIN kept r
    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
)"""

ORACLES_DOCS["minhash_lsh_pairs"] = f"""
WITH {_PAIR_CTES}
SELECT doc_a, doc_b FROM lsh_pairs
"""

# Connected components via recursive min-label closure (reach enumerates,
# per node, every label reachable through the pair graph; min per node is
# the component id) — the declarative twin of the distributed hash-min
# propagation in operators/dedup.py:dedup_components.
ORACLES_DOCS["dedup_clusters"] = f"""
WITH RECURSIVE {_PAIR_CTES},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs
),
reach(node, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node
),
comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node),
allc AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
stats AS (
  SELECT cluster_id, count(*) AS cluster_size, max(n_chars) AS maxc
  FROM allc GROUP BY cluster_id
),
canon AS (
  SELECT a.cluster_id, min(a.doc_id) AS canonical
  FROM allc a JOIN stats s
    ON a.cluster_id = s.cluster_id AND a.n_chars = s.maxc
  GROUP BY a.cluster_id
)
SELECT a.doc_id, a.cluster_id, s.cluster_size,
       CAST(a.doc_id = c.canonical AS BIGINT) AS is_canonical
FROM allc a
JOIN stats s ON a.cluster_id = s.cluster_id
JOIN canon c ON a.cluster_id = c.cluster_id
"""

# Benchmark decontamination — constants shared with operators/dedup.py
# (BENCH_SALT, default threshold 0.2).
from uncharted_ta1_pipeline_spark.operators.dedup import BENCH_SALT  # noqa: E402

ORACLES_DOCS["contamination"] = f"""
WITH {_SHINGLES},
marked AS (
  SELECT doc_id,
         substr(md5('{BENCH_SALT}' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
           AS bench
  FROM documents
),
bench_sh AS (
  SELECT DISTINCT s.sh FROM sh s JOIN marked m ON s.doc_id = m.doc_id
  WHERE m.bench
),
cand_sh AS (
  SELECT DISTINCT s.doc_id, s.sh FROM sh s JOIN marked m ON s.doc_id = m.doc_id
  WHERE NOT m.bench
),
hits AS (
  SELECT c.doc_id,
         count(*) AS n_shingles,
         CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits
  FROM cand_sh c LEFT JOIN bench_sh b ON c.sh = b.sh
  GROUP BY c.doc_id
)
SELECT doc_id, n_shingles, n_hits,
       round(CASE WHEN n_shingles > 0
                  THEN n_hits / n_shingles ELSE 0.0 END, 6) AS overlap_frac,
       CAST(round(CASE WHEN n_shingles > 0
                       THEN n_hits / n_shingles ELSE 0.0 END, 6) >= 0.2
            AS BIGINT) AS contaminated
FROM hits
"""

ORACLES_DOCS["line_dedup"] = """
WITH lines AS (
  SELECT doc_id, u.i AS pos, ls[u.i + 1] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents) t,
       unnest(range(len(ls))) AS u(i)
),
dfc AS (
  SELECT line, count(*) AS dfn
  FROM (SELECT DISTINCT doc_id, line FROM lines)
  GROUP BY line
),
j AS (
  SELECT l.doc_id, l.pos, l.line, d.dfn <= 1 AS keep
  FROM lines l JOIN dfc d ON l.line = d.line
)
SELECT doc_id,
       coalesce(
         string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), ''
       ) AS clean_text,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
FROM j GROUP BY doc_id
"""

_U_PACK_SHARD = ("CAST(concat('0x', substr(md5('pack-v1' || '|' || "
                 "CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4")
ORACLES_DOCS["pack_sequences"] = f"""
WITH base AS (
  SELECT doc_id, source,
         {_U_PACK_SHARD} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         sum(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM base
)
SELECT doc_id, source, shard, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id,
       CAST(floor((cum - 1) / 512.0) != floor((cum - n_tokens) / 512.0)
            AS BIGINT) AS spans_boundary
FROM c
"""

ORACLES_DOCS["tfidf_top_terms"] = """
WITH words AS (
  SELECT doc_id, u.w AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
       unnest(ws) AS u(w)
  WHERE u.w <> ''
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word),
dfc AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.word, t.tf, d.df,
         round(t.tf * (n.n + 1) / (d.df + 1), 6) AS tfidf
  FROM tf t JOIN dfc d ON t.word = d.word, n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, word ASC) AS rank
  FROM scored
)
SELECT doc_id, word, tf, df, tfidf, rank FROM ranked WHERE rank <= 3
"""

ORACLES_DOCS["bm25_top_terms"] = """
WITH words AS (
  SELECT doc_id, u.w AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
       unnest(ws) AS u(w)
  WHERE u.w <> ''
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word),
dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
dfc AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
stats AS (SELECT count(*) AS n, sum(dl) AS tot FROM dl),
scored AS (
  SELECT t.doc_id, t.word, t.tf, l.dl, d.df,
         round((s.n - d.df + 0.5) / (d.df + 0.5)
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / (s.tot / s.n))),
               6) AS bm25
  FROM tf t
  JOIN dfc d ON t.word = d.word
  JOIN dl l ON t.doc_id = l.doc_id, stats s
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY bm25 DESC, word ASC) AS rank
  FROM scored
)
SELECT doc_id, word, tf, dl, df, bm25, rank FROM ranked WHERE rank <= 3
"""

ORACLES_DOCS["domain_mix"] = """
WITH w AS (
  SELECT source,
         1 + CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER) % 3 AS w
  FROM (SELECT DISTINCT source FROM documents)
),
targets AS (
  SELECT source, w / (SELECT sum(w) FROM w) AS target_share FROM w
),
counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
total AS (SELECT sum(n_docs) AS total FROM counts),
j AS (
  SELECT c.source, c.n_docs, t.target_share
  FROM counts c JOIN targets t USING (source)
),
cap AS (SELECT min(n_docs / target_share) AS t FROM j)
SELECT j.source, j.n_docs,
       round(j.n_docs / total.total, 6) AS natural_share,
       round(j.target_share, 6) AS target_share,
       round(j.target_share * cap.t / j.n_docs, 6) AS rate,
       CAST(floor(j.target_share * cap.t) AS BIGINT) AS expected_docs
FROM j, cap, total
"""

ORACLES_DOCS["ngram_jaccard_pairs"] = f"""
WITH {_SHINGLES},
dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
keep AS (
  SELECT sh FROM dsh GROUP BY sh HAVING count(*) <= 200
),
fsh AS (SELECT d.* FROM dsh d JOIN keep k ON d.sh = k.sh),
sizes AS (SELECT doc_id, count(*) AS n FROM fsh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM fsh a JOIN fsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(c.c / (sa.n + sb.n - c.c), 6) AS jaccard
FROM common c
JOIN sizes sa ON c.doc_a = sa.doc_id
JOIN sizes sb ON c.doc_b = sb.doc_id
WHERE round(c.c / (sa.n + sb.n - c.c), 6) >= 0.3
"""

# 64-bit SimHash (production width), 4 bands x 16 bits — generated from the
# SAME constants as operators/dedup.py so a width change re-parameterizes
# both engines together.  The signature is represented as 4 band INTs + a
# 16-hex-char string (not one BIGINT: bit 63 would need signed two's-
# complement handling that Spark ANSI and DuckDB disagree on).
from uncharted_ta1_pipeline_spark.operators.dedup import (  # noqa: E402
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_MAX_BAND_DF,
    SIMHASH_MAX_HAMMING,
)

_vote_terms = []
for i in range(SIMHASH_BITS):
    j = i // 4 + 1
    k = 3 - (i % 4)
    nib = f"(strpos('{HEX}', substr(hx, {j}, 1)) - 1)"
    bit = f"(CAST(floor({nib} / {2 ** k}) AS INTEGER) % 2)"
    _vote_terms.append(
        f"sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS v{i}"
    )
_votes_sql = ",\n         ".join(_vote_terms)
_band_sums = [
    " + ".join(
        f"CASE WHEN v{i} > 0 THEN {2 ** (i - b * SIMHASH_BAND_BITS)} ELSE 0 END"
        for i in range(b * SIMHASH_BAND_BITS, (b + 1) * SIMHASH_BAND_BITS)
    )
    for b in range(SIMHASH_BANDS)
]
_band_cols = ",\n         ".join(
    f"CAST({s} AS INTEGER) AS band{b}" for b, s in enumerate(_band_sums)
)
_hex_expr = " || ".join(
    f"lower(lpad(to_hex(band{b}), 4, '0'))"
    for b in range(SIMHASH_BANDS - 1, -1, -1)
)

_simhash_core = f"""
toks AS (
  SELECT doc_id, substr(md5(u.t), 1, {SIMHASH_BITS // 4}) AS hx
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
),
votes AS (
  SELECT doc_id,
         {_votes_sql}
  FROM toks GROUP BY doc_id
),
sim AS (
  SELECT doc_id,
         {_band_cols}
  FROM votes
)
""".strip()

ORACLES_DOCS["simhash"] = f"""
WITH {_simhash_core}
SELECT doc_id, {_hex_expr} AS simhash_hex
FROM sim
"""

_band_rows = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, band0, band1, band2, band3, {b} AS band, "
    f"band{b} AS band_val FROM sim"
    for b in range(SIMHASH_BANDS)
)
_ham = " + ".join(
    f"bit_count(xor(la{b}, rb{b}))" for b in range(SIMHASH_BANDS)
)
_pair_bands = ", ".join(
    f"l.band{b} AS la{b}, r.band{b} AS rb{b}" for b in range(SIMHASH_BANDS)
)
ORACLES_DOCS["simhash_pairs"] = f"""
WITH {_simhash_core},
banded AS (
{_band_rows}
),
small AS (
  SELECT band, band_val FROM banded
  GROUP BY band, band_val HAVING count(*) <= {SIMHASH_MAX_BAND_DF}
),
kept AS (
  SELECT b.* FROM banded b JOIN small s
    ON b.band = s.band AND b.band_val = s.band_val
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         {_pair_bands}
  FROM kept l JOIN kept r
    ON l.band = r.band AND l.band_val = r.band_val AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, CAST({_ham} AS INTEGER) AS hamming
FROM cand WHERE {_ham} <= {SIMHASH_MAX_HAMMING}
"""

ORACLES_DOCS["embedding_cosine_pairs"] = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.5
"""

ORACLES_DOCS["ann_bruteforce"] = """
WITH scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
  WHERE q.vec_id < 5
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 10
"""

# multi-table LSH: per table, 4 inline plane-sign terms sum to the bucket id;
# plane ids are namespaced table*1000+p, and the hyperplanes are the SAME
# constant-folded ±1 literal arrays the Spark side uses (hashlib md5 ==
# both engines' md5) — see operators/similarity.py:plane_sign_vector.
from uncharted_ta1_pipeline_spark.operators.similarity import (  # noqa: E402
    ANN_MAX_BUCKET,
    ANN_PLANES,
    ANN_TABLES,
    plane_sign_vector,
)


def _plane_sign_sql(pid: int) -> str:
    lits = ", ".join(str(s) for s in plane_sign_vector(pid))
    return (
        "CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"[{lits}]::DOUBLE[]) >= 0 THEN 1 ELSE 0 END"
    )


_tables_sql = ",\n".join(
    f"""bt{t} AS (
  SELECT vec_id, {t} AS tbl,
         {" + ".join(f"({_plane_sign_sql(t * 1000 + p)}) * {2 ** p}" for p in range(ANN_PLANES))} AS bkt
  FROM embeddings
)"""
    for t in range(ANN_TABLES)
)
_allb = " UNION ALL ".join(f"SELECT * FROM bt{t}" for t in range(ANN_TABLES))
ORACLES_DOCS["ann_lsh"] = f"""
WITH
{_tables_sql},
allb AS ({_allb}),
capped AS (
  SELECT vec_id, tbl, bkt FROM (
    SELECT *, row_number() OVER (PARTITION BY tbl, bkt ORDER BY vec_id) AS rn
    FROM allb
  ) WHERE rn <= {ANN_MAX_BUCKET}
),
q AS (SELECT vec_id AS query_id, tbl, bkt FROM allb WHERE vec_id < 5),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM q JOIN capped c ON q.tbl = c.tbl AND q.bkt = c.bkt
                      AND c.vec_id <> q.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS cosine
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ne ON ne.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 10
"""

_MARKERS = "('a', 'the', 'of', 'and', 'to', 'is')"
ORACLES_DOCS["lang_id"] = f"""
SELECT doc_id, lang,
       CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                 w -> w IN {_MARKERS}))
                 / len(string_split(lower(text), ' ')) > 0.02
            THEN 'en' ELSE 'other' END AS pred_lang
FROM documents
"""

ORACLES_DOCS["quality_score"] = f"""
WITH feat AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         round((length(text) - (len(string_split(text, ' ')) - 1))
               / len(string_split(text, ' ')), 6) AS avg_word_len,
         round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               / length(text), 6) AS punct_ratio,
         round(len(list_filter(string_split(lower(text), ' '),
                               w -> w IN {_MARKERS}))
               / len(string_split(lower(text), ' ')), 6) AS stop_ratio
  FROM documents
)
SELECT doc_id, n_chars, n_words, avg_word_len, punct_ratio, stop_ratio,
       round(least(n_words / 50.0, 1.0) * 0.5
             + (1 - least(punct_ratio * 10, 1.0)) * 0.3
             + least(stop_ratio * 10, 1.0) * 0.2, 6) AS quality_score
FROM feat
"""

ORACLES_DOCS["token_count"] = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS re_tokens,
       round(length(text) / len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')), 6) AS chars_per_token
FROM documents
"""

ORACLES_DOCS["doc_fingerprint"] = """
WITH sh AS (
  SELECT doc_id,
         list_transform(
           range(greatest(CAST(floor((length(text) - 8) / 4.0) AS INTEGER), 0) + 1),
           i -> substr(text, i * 4 + 1, 8)
         ) AS shingles
  FROM documents
)
SELECT doc_id,
       list_min(list_transform(shingles, s -> md5(s))) AS fingerprint,
       CAST(len(list_distinct(shingles)) AS BIGINT) AS n_distinct_shingles
FROM sh
"""

# IVF coarse quantizer (operators/similarity.py:_ivf_centroids): the whole
# codebook construction is replayed in SQL — md5-seeded sample, one Lloyd
# step over integer-quantized per-dimension sums (exact at any engine /
# parallelism), expanded-dot-form distances rounded to 6 — so every stage
# is bit-portable between Spark and DuckDB.
from uncharted_ta1_pipeline_spark.operators.similarity import (  # noqa: E402
    EMB_DIM,
    IVF_CENTROIDS,
    IVF_MAX_CLUSTER,
    IVF_NPROBE,
    IVF_QUANT,
)

_IVF_D2_C0 = (
    "round(list_inner_product(v.x, v.x) - 2 * list_inner_product(v.x, c0.c)"
    " + list_inner_product(c0.c, c0.c), 6)"
)
_IVF_D2_C1 = (
    "round(list_inner_product(v.x, v.x) - 2 * list_inner_product(v.x, c1.c)"
    " + list_inner_product(c1.c, c1.c), 6)"
)
_IVF_BASE = f"""
v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
seeds AS (
  SELECT vec_id, md5(CAST(vec_id AS VARCHAR)) AS h
  FROM embeddings ORDER BY h, vec_id LIMIT {IVF_CENTROIDS}
),
c0 AS (
  SELECT row_number() OVER (ORDER BY s.h, s.vec_id) - 1 AS cluster, v.x AS c
  FROM seeds s JOIN v ON v.vec_id = s.vec_id
),
a0 AS (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c0.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_IVF_D2_C0}, c0.cluster) AS rk
    FROM v CROSS JOIN c0
  ) WHERE rk = 1
),
sums AS (
  SELECT a0.cluster, d.dim,
         SUM(CAST(floor(v.x[d.dim] * {IVF_QUANT}) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM a0 JOIN v USING (vec_id)
  CROSS JOIN generate_series(1, {EMB_DIM}) AS d(dim)
  GROUP BY a0.cluster, d.dim
),
c1 AS (
  SELECT cluster, list(s / ({IVF_QUANT}.0 * n) ORDER BY dim) AS c
  FROM sums GROUP BY cluster
),
a1 AS (
  SELECT vec_id, cluster, dist2 FROM (
    SELECT v.vec_id, c1.cluster, {_IVF_D2_C1} AS dist2,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_IVF_D2_C1}, c1.cluster) AS rk
    FROM v CROSS JOIN c1
  ) WHERE rk = 1
)"""

ORACLES_DOCS["ivf_assign"] = f"""
WITH
{_IVF_BASE}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist2 FROM a1
"""

ORACLES_DOCS["ivf_cluster_stats"] = f"""
WITH
{_IVF_BASE}
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       MIN(vec_id) AS min_vec_id,
       MAX(vec_id) AS max_vec_id
FROM a1 GROUP BY cluster
"""

ORACLES_DOCS["ivf_topk"] = f"""
WITH
{_IVF_BASE},
idx AS (
  SELECT vec_id AS neighbor_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY cluster ORDER BY vec_id) AS rn
    FROM a1
  ) WHERE rn <= {IVF_MAX_CLUSTER}
),
probes AS (
  SELECT vec_id AS query_id, cluster FROM (
    SELECT v.vec_id, c1.cluster,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_IVF_D2_C1}, c1.cluster) AS rk
    FROM v CROSS JOIN c1 WHERE v.vec_id < 5
  ) WHERE rk <= {IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, i.neighbor_id
  FROM probes p JOIN idx i ON p.cluster = i.cluster
                          AND i.neighbor_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_cosine_similarity(qe.embedding::DOUBLE[], ne.embedding::DOUBLE[]), 6) AS cosine
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ne ON ne.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 10
"""

# Recall@k of each approximate index vs the exact baseline: composed from
# the three oracle statements above verbatim (DuckDB allows a WITH inside a
# derived-table subquery), so the recall oracle can never drift from the
# per-index oracles.  recall = n_hit / n_truth over bounded integer counts.
ORACLES_DOCS["ann_recall"] = f"""
WITH truth AS (SELECT * FROM ({ORACLES_DOCS["ann_bruteforce"]})),
lsh AS (SELECT * FROM ({ORACLES_DOCS["ann_lsh"]})),
ivf AS (SELECT * FROM ({ORACLES_DOCS["ivf_topk"]})),
per_q AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
  FROM truth GROUP BY query_id
),
hits AS (
  SELECT 'ann_lsh' AS method, t.query_id, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN lsh a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
  UNION ALL
  SELECT 'ivf_topk' AS method, t.query_id, CAST(count(*) AS BIGINT) AS n_hit
  FROM truth t JOIN ivf a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
  GROUP BY t.query_id
),
methods AS (SELECT 'ann_lsh' AS method UNION ALL SELECT 'ivf_topk')
SELECT m.method, p.query_id, p.n_truth,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(h.n_hit, 0) * 1.0 / p.n_truth, 6) AS recall_at_k
FROM methods m CROSS JOIN per_q p
LEFT JOIN hits h ON h.method = m.method AND h.query_id = p.query_id
"""

# Recall/precision of the MinHash-LSH candidate generator vs the exact
# shingle-Jaccard truth set, per threshold — composed verbatim from the two
# pair oracles above (same never-drifts rule as ann_recall).  The threshold
# grid must start at the truth query's own threshold (0.3).
ORACLES_DOCS["dedup_recall"] = f"""
WITH truth AS (SELECT * FROM ({ORACLES_DOCS["ngram_jaccard_pairs"]})),
cand AS (SELECT * FROM ({ORACLES_DOCS["minhash_lsh_pairs"]})),
flagged AS (
  SELECT t.doc_a, t.jaccard,
         CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM truth t LEFT JOIN cand c
    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
),
thr AS (SELECT CAST(pct AS BIGINT) AS threshold_pct, CAST(v AS DOUBLE) AS t
        FROM (VALUES (30, 0.3), (50, 0.5), (70, 0.7)) AS g(pct, v)),
per AS (
  SELECT thr.threshold_pct,
         CAST(count(f.doc_a) AS BIGINT) AS n_truth,
         CAST(coalesce(sum(f.hit), 0) AS BIGINT) AS n_hit
  FROM thr LEFT JOIN flagged f ON f.jaccard >= thr.t
  GROUP BY thr.threshold_pct
),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand)
SELECT p.threshold_pct, p.n_truth, p.n_hit, nc.n_cand,
       CASE WHEN p.n_truth > 0
            THEN round(p.n_hit * 1.0 / p.n_truth, 6) END AS recall_at_t,
       CASE WHEN nc.n_cand > 0
            THEN round(p.n_hit * 1.0 / nc.n_cand, 6) END AS precision_at_t
FROM per p CROSS JOIN nc
"""


# Gopher-style repetition signals: dup-word / dup-2gram fractions and the
# top-2gram share, per document — list-lambda twin of
# functions/docf.py:repetition_features.
ORACLES_DOCS["repetition"] = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
b AS (
  SELECT doc_id, words,
         list_transform(range(1, len(words)),
                        i -> words[i] || ' ' || words[i+1]) AS bigrams
  FROM w
)
SELECT doc_id,
  CAST(len(words) AS BIGINT) AS n_words,
  round(1 - len(list_distinct(words)) / len(words), 6) AS dup_word_frac,
  CASE WHEN len(bigrams) > 0 THEN
    round(1 - len(list_distinct(bigrams)) / len(bigrams), 6)
  END AS dup_2gram_frac,
  CASE WHEN len(bigrams) > 0 THEN
    round(list_max(list_transform(list_distinct(bigrams),
                   d -> len(list_filter(bigrams, x -> x = d))))
          / len(bigrams), 6)
  END AS top_2gram_share
FROM b
"""

# PII masking with the SAME deterministic injection as the Spark query
# (q_pii_mask).  Patterns are the RE2/Java common subset; DuckDB needs the
# explicit 'g' flag where Spark's regexp_replace is global by default.
from uncharted_ta1_pipeline_spark.functions.docf import (  # noqa: E402
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
)

ORACLES_DOCS["pii_mask"] = f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com at 10.0.' || CAST(doc_id % 200 AS VARCHAR)
              || '.7 or 555-867-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
),
m1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT)
           AS n_emails,
         regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t
  FROM injected
),
m2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t, '{PII_IPV4_RE}')) AS BIGINT) AS n_ips,
         regexp_replace(t, '{PII_IPV4_RE}', '<IP>', 'g') AS t
  FROM m1
)
SELECT doc_id,
       regexp_replace(t, '{PII_PHONE_RE}', '<PHONE>', 'g') AS masked_text,
       n_emails, n_ips,
       CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones
FROM m2
"""


# Deterministic hash sampling/splits — md5-uniform twin of
# operators/sampling.py (same salt, same first-8-hex-chars construction).
_U_SPLIT = ("CAST(concat('0x', substr(md5('split-v1' || '|' || "
            "CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0")
ORACLES_DOCS["hash_split"] = f"""
SELECT doc_id,
       CASE WHEN {_U_SPLIT} < 0.8 THEN 'train'
            WHEN {_U_SPLIT} < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

_U_SAMPLE = ("CAST(concat('0x', substr(md5('sample-v1' || '|' || "
             "CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0")
ORACLES_DOCS["stratified_sample"] = f"""
WITH rates AS (
  SELECT source,
         1.0 / (1 + CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER) % 4)
           AS rate
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT d.doc_id, d.source, r.rate
FROM documents d JOIN rates r USING (source)
WHERE {_U_SAMPLE} < r.rate
"""


from uncharted_ta1_pipeline_spark.functions.docf import (  # noqa: E402
    HOST_RE,
    URL_RE,
)

ORACLES_DOCS["url_filter"] = f"""
WITH injected AS (
  SELECT doc_id,
         text || ' see https://site' || CAST(doc_id % 50 AS VARCHAR)
              || '.example.com/p/' || CAST(doc_id AS VARCHAR)
              || ' and http://m' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.org/x' AS text
  FROM documents
),
block AS (
  SELECT 'site' || CAST(g AS VARCHAR) || '.example.com' AS host
  FROM generate_series(0, 45, 5) AS t(g)
  UNION ALL SELECT 'm0.example.org'
),
urls AS (
  SELECT doc_id, u.url AS url,
         lower(regexp_extract(u.url, '{HOST_RE}', 1)) AS host
  FROM injected, unnest(regexp_extract_all(text, '{URL_RE}')) AS u(url)
),
flagged AS (
  SELECT u.doc_id, u.url,
         CASE WHEN b.host IS NOT NULL THEN 1 END AS blocked
  FROM urls u LEFT JOIN block b ON u.host = b.host
)
SELECT doc_id, CAST(count(url) AS BIGINT) AS n_urls,
       CAST(count(blocked) AS BIGINT) AS n_blocked,
       count(blocked) = 0 AS keep
FROM flagged GROUP BY doc_id
"""

ORACLES_DOCS["oov_rate"] = """
WITH words AS (
  SELECT doc_id, u.w AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
       unnest(ws) AS u(w)
  WHERE u.w <> ''
),
wc AS (SELECT word, count(*) AS wc FROM words GROUP BY word),
vocab AS (
  SELECT word FROM (
    SELECT word, row_number() OVER (ORDER BY wc DESC, word ASC) AS rn
    FROM wc
  ) WHERE rn <= 100
)
SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) - count(v.word) AS BIGINT) AS n_oov,
       round((count(*) - count(v.word)) / count(*), 6) AS oov_rate
FROM words w LEFT JOIN vocab v ON w.word = v.word
GROUP BY w.doc_id
"""

ORACLES_DOCS["lm_score"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents
),
bg AS (
  -- consecutive token pairs via 1-based list indexing (this DuckDB build
  -- lacks UNNEST ... WITH ORDINALITY); range(1, len) is empty when len < 2
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM toks, unnest(range(1, len(ws))) AS r(i)
),
doc_bg AS (
  SELECT doc_id, w1, w2, count(*) AS k FROM bg GROUP BY doc_id, w1, w2
),
c2 AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c2 FROM doc_bg GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
v AS (SELECT count(DISTINCT w2) AS v FROM c2)
SELECT b.doc_id,
       CAST(sum(b.k) AS BIGINT) AS n_bigrams,
       round(sum(b.k * (c1.c1 + v.v) * 1.0 / (c2.c2 + 1)) / sum(b.k), 6)
         AS mean_inv_prob,
       round(sum(b.k * c2.c2 * 1.0 / c1.c1) / sum(b.k), 6) AS mean_cond_prob
FROM doc_bg b
JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
JOIN c1 ON b.w1 = c1.w1
CROSS JOIN v
GROUP BY b.doc_id
"""

ORACLES_DOCS["curriculum"] = f"""
WITH feat AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               / length(text), 6) AS punct_ratio,
         round(len(list_filter(string_split(lower(text), ' '),
                               w -> w IN {_MARKERS}))
               / len(string_split(lower(text), ' ')), 6) AS stop_ratio
  FROM documents
),
scoreq AS (
  SELECT doc_id,
         round(least(n_words / 50.0, 1.0) * 0.5
               + (1 - least(punct_ratio * 10, 1.0)) * 0.3
               + least(stop_ratio * 10, 1.0) * 0.2, 6) AS quality_score,
         CAST(floor(round(least(n_words / 50.0, 1.0) * 0.5
               + (1 - least(punct_ratio * 10, 1.0)) * 0.3
               + least(stop_ratio * 10, 1.0) * 0.2, 6) * 1000000 + 0.5)
              AS BIGINT) AS qc
  FROM feat
),
hist AS (SELECT qc, count(*) AS cnt FROM scoreq GROUP BY qc),
cum AS (
  SELECT qc, cnt,
         CAST(sum(cnt) OVER (ORDER BY qc
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi
  FROM hist
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scoreq),
buck AS (
  SELECT qc,
         CASE WHEN (hi - cnt + 1) <= (floor(n / 10) + 1) * (n % 10)
              THEN floor((hi - cnt) / (floor(n / 10) + 1)) + 1
              ELSE n % 10
                   + floor((hi - cnt - (floor(n / 10) + 1) * (n % 10))
                           / greatest(floor(n / 10), 1)) + 1 END AS bucket
  FROM cum CROSS JOIN tot
)
SELECT s.doc_id, s.quality_score, CAST(b.bucket AS BIGINT) AS bucket
FROM scoreq s JOIN buck b ON s.qc = b.qc
"""

ORACLES_DOCS["ann_bucket_stats"] = f"""
WITH
{_tables_sql},
allb AS ({_allb}),
occ AS (
  SELECT tbl, bkt, count(*) AS n FROM allb GROUP BY tbl, bkt
)
SELECT tbl AS table,
       CAST(count(*) AS BIGINT) AS buckets_used,
       {2 ** ANN_PLANES} AS buckets_total,
       CAST(min(n) AS BIGINT) AS min_occupancy,
       round(avg(n), 2) AS avg_occupancy,
       CAST(max(n) AS BIGINT) AS max_occupancy
FROM occ GROUP BY tbl
"""


# End-to-end curation funnel — the quality/dedup/contamination/split
# formulas above chained as CTEs with per-stage counts (the composition
# the capstone pipeline test runs through the manifest layer).
ORACLES_DOCS["curation_funnel"] = f"""
WITH feat AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
               / length(text), 6) AS punct_ratio,
         round(len(list_filter(string_split(lower(text), ' '),
                               w -> w IN {_MARKERS}))
               / len(string_split(lower(text), ' ')), 6) AS stop_ratio
  FROM documents
),
q AS (
  SELECT doc_id, text FROM feat
  WHERE round(least(n_words / 50.0, 1.0) * 0.5
              + (1 - least(punct_ratio * 10, 1.0)) * 0.3
              + least(stop_ratio * 10, 1.0) * 0.2, 6) >= 0.3
),
surv AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
d AS (SELECT q.doc_id, q.text FROM q JOIN surv USING (doc_id)),
shingled AS (
  SELECT doc_id,
         list_transform(
           range(greatest(len(string_split(text, ' ')) - 1, 0)),
           i -> (string_split(text, ' '))[i + 1] || '_' || (string_split(text, ' '))[i + 2]
         ) AS shingles
  FROM d
),
dsh AS (SELECT doc_id, u.s AS sh FROM shingled, unnest(shingles) AS u(s)),
marked AS (
  SELECT doc_id,
         substr(md5('{BENCH_SALT}' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
           AS bench
  FROM d
),
bench_sh AS (
  SELECT DISTINCT s.sh FROM dsh s JOIN marked m USING (doc_id) WHERE m.bench
),
cand_sh AS (
  SELECT DISTINCT s.doc_id, s.sh FROM dsh s JOIN marked m USING (doc_id)
  WHERE NOT m.bench
),
hits AS (
  SELECT c.doc_id, count(*) AS n_shingles,
         CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits
  FROM cand_sh c LEFT JOIN bench_sh b ON c.sh = b.sh
  GROUP BY c.doc_id
),
keepers AS (
  SELECT doc_id FROM hits
  WHERE round(CASE WHEN n_shingles > 0
                   THEN n_hits / n_shingles ELSE 0.0 END, 6) < 0.9
),
c AS (SELECT d.doc_id FROM d JOIN keepers USING (doc_id)),
s2 AS (
  SELECT doc_id,
         CASE WHEN {_U_SPLIT} < 0.8 THEN 'train'
              WHEN {_U_SPLIT} < 0.9 THEN 'val'
              ELSE 'test' END AS split
  FROM c
)
SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage,
       CAST(n_docs AS BIGINT) AS n_docs
FROM (
  SELECT 0 AS stage_idx, 'input' AS stage, count(*) AS n_docs FROM documents
  UNION ALL SELECT 1, 'quality', count(*) FROM q
  UNION ALL SELECT 2, 'dedup', count(*) FROM d
  UNION ALL SELECT 3, 'decontam', count(*) FROM c
  UNION ALL
  SELECT 3 + CASE split WHEN 'train' THEN 1 WHEN 'val' THEN 2 ELSE 3 END,
         'split_' || split, count(*)
  FROM s2 GROUP BY split
)
"""


# SemDeDup twin: replays the IVF codebook (shared _IVF_BASE), then the
# cluster-local earlier-id cosine test with the same rounded-compare
# convention as embedding_cosine_pairs.
from uncharted_ta1_pipeline_spark.operators.similarity import (  # noqa: E402
    SEMDEDUP_MAX_EARLIER,
    SEMDEDUP_THRESHOLD,
)

ORACLES_DOCS["semdedup"] = f"""
WITH
{_IVF_BASE},
m AS (
  SELECT a1.vec_id, CAST(a1.cluster AS BIGINT) AS cluster, v.x
  FROM a1 JOIN v USING (vec_id)
),
src AS (
  SELECT cluster, vec_id AS src_id, x AS src_x FROM (
    SELECT m.*, row_number() OVER (PARTITION BY cluster ORDER BY vec_id) AS rn
    FROM m
  ) WHERE rn <= {SEMDEDUP_MAX_EARLIER}
),
hits AS (
  SELECT m.vec_id,
         CAST(count(*) AS BIGINT) AS n_src,
         max(round(list_cosine_similarity(s.src_x, m.x), 6)) AS max_sim
  FROM m JOIN src s ON s.cluster = m.cluster AND s.src_id < m.vec_id
  WHERE round(list_cosine_similarity(s.src_x, m.x), 6) >= {SEMDEDUP_THRESHOLD}
  GROUP BY m.vec_id
)
SELECT m.vec_id, m.cluster,
       CAST(CASE WHEN h.n_src > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
       CAST(coalesce(h.n_src, 0) AS BIGINT) AS n_dup_sources,
       coalesce(h.max_sim, 0.0) AS max_sim_earlier
FROM m LEFT JOIN hits h USING (vec_id)
"""

# span_dedup twin: same md5(k-word-window) keys; DuckDB range(1, stop) is
# empty when stop <= 1, mirroring the Spark side's guarded sequence.
ORACLES_DOCS["span_dedup"] = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
sp AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(words) - 8 + 2),
                i -> md5(array_to_string(words[i:i+7], ' ')))) AS h
  FROM w
),
dfc AS (
  SELECT h, count(*) AS df
  FROM (SELECT DISTINCT doc_id, h FROM sp) GROUP BY h
),
perdoc AS (
  SELECT sp.doc_id,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_spans
  FROM sp JOIN dfc USING (h)
  GROUP BY sp.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_spans, CAST(0 AS BIGINT)) AS n_spans,
       coalesce(p.n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
       CASE WHEN p.n_spans > 0
            THEN round(p.n_dup_spans * 1.0 / p.n_spans, 6) END
         AS dup_span_share
FROM documents d LEFT JOIN perdoc p USING (doc_id)
"""
