"""DuckDB oracle SQL twins for plans/queries_docs.py.

The hash-heavy oracles (minhash, simhash) are generated programmatically so
the seed/band/bit structure provably matches the Spark side."""

from __future__ import annotations

N_SEEDS = 6
BAND_SIZE = 3
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

_sig_aggs = ",\n         ".join(
    f"min(md5('{s}|' || sh)) AS sig{s}" for s in range(N_SEEDS)
)
ORACLES_DOCS["minhash_signature"] = f"""
WITH {_SHINGLES}
SELECT doc_id,
         {_sig_aggs}
FROM sh GROUP BY doc_id
"""

_band_selects = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band, "
    f"md5(concat_ws('#', {', '.join(f'sig{b * BAND_SIZE + i}' for i in range(BAND_SIZE))})) AS band_key FROM sig"
    for b in range(N_SEEDS // BAND_SIZE)
)
ORACLES_DOCS["minhash_lsh_pairs"] = f"""
WITH {_SHINGLES},
sig AS (
  SELECT doc_id,
         {_sig_aggs}
  FROM sh GROUP BY doc_id
),
banded AS (
{_band_selects}
)
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
FROM banded l JOIN banded r
  ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
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

_vote_terms = []
for i in range(16):
    j = i // 4 + 1
    k = 3 - (i % 4)
    nib = f"(strpos('{HEX}', substr(h4, {j}, 1)) - 1)"
    bit = f"(CAST(floor({nib} / {2 ** k}) AS INTEGER) % 2)"
    _vote_terms.append(
        f"sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS v{i}"
    )
_sim_sum = " + ".join(f"CASE WHEN v{i} > 0 THEN {2 ** i} ELSE 0 END" for i in range(16))
_votes_sql = ",\n         ".join(_vote_terms)
ORACLES_DOCS["simhash"] = f"""
WITH toks AS (
  SELECT doc_id, substr(md5(u.t), 1, 4) AS h4
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
),
votes AS (
  SELECT doc_id,
         {_votes_sql}
  FROM toks GROUP BY doc_id
)
SELECT doc_id, CAST({_sim_sum} AS INTEGER) AS simhash
FROM votes
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

_planes = ",\n".join(
    f"""  p{p} AS (
    SELECT vec_id,
           CASE WHEN list_dot_product(
             embedding::DOUBLE[],
             list_transform(range(len(embedding)),
               d -> CASE WHEN strpos('{HEX}', substr(md5('{p}' || '|' || CAST(d AS VARCHAR)), 1, 1)) <= 8
                    THEN -1.0 ELSE 1.0 END)::DOUBLE[]
           ) >= 0 THEN 1 ELSE 0 END AS s{p}
    FROM embeddings
  )"""
    for p in range(4)
)
_bkt = " + ".join(f"p{p}.s{p} * {2 ** p}" for p in range(4))
_pjoin = " ".join(f"JOIN p{p} ON p{p}.vec_id = e.vec_id" for p in range(4))
ORACLES_DOCS["ann_lsh"] = f"""
WITH
{_planes},
bucketed AS (
  SELECT e.vec_id, e.embedding, {_bkt} AS bkt
  FROM embeddings e {_pjoin}
),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]), 6) AS cosine
  FROM bucketed q JOIN bucketed v ON q.bkt = v.bkt AND v.vec_id <> q.vec_id
  WHERE q.vec_id < 5
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
