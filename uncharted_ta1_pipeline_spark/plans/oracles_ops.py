"""DuckDB oracle SQL twins for plans/queries_ops.py."""

from __future__ import annotations

from uncharted_ta1_pipeline_spark.operators.outliers import (
    RANSAC_MULT_A,
    RANSAC_MULT_B,
    RANSAC_OFF_B,
)
from uncharted_ta1_pipeline_spark.sources.transcripts import TRANSCRIPTS_CTE

_T_REC = f"WITH RECURSIVE {TRANSCRIPTS_CTE}"

_T = f"WITH {TRANSCRIPTS_CTE}"
_ORD = "PARTITION BY conv_id ORDER BY ts, turn_idx"
US = "epoch_us(ts)"
_TOOL_USED = "CASE WHEN tool IS NOT NULL AND tool <> '' THEN 1 ELSE 0 END"

ORACLES_OPS: dict[str, str] = {}

ORACLES_OPS["text_filter"] = f"""
{_T},
counted AS (
  SELECT conv_id, turn_idx, role,
         count(*) OVER (PARTITION BY conv_id, role) AS class_n
  FROM transcripts
)
SELECT conv_id, turn_idx, role
FROM counted
WHERE role IN ('user', 'assistant') AND class_n >= 4
"""

ORACLES_OPS["argmax_source_filter"] = f"""
{_T},
scores AS (
  SELECT conv_id, tool, count(*) AS n, max(signal) AS mx
  FROM transcripts WHERE tool IN ('search', 'bash')
  GROUP BY conv_id, tool
),
ranked AS (
  SELECT conv_id, tool,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY n DESC, mx DESC, tool ASC) AS rk,
         count(*) OVER (PARTITION BY conv_id) AS cnt
  FROM scores
),
losers AS (
  SELECT conv_id, tool AS loser FROM ranked WHERE cnt = 2 AND rk = 2
)
SELECT t.conv_id, t.turn_idx, t.tool
FROM transcripts t LEFT JOIN losers l ON t.conv_id = l.conv_id
WHERE l.loser IS NULL OR t.tool IS NULL OR t.tool <> l.loser
"""

ORACLES_OPS["range_filter_readd"] = f"""
{_T},
flagged AS (
  SELECT conv_id, turn_idx, signal,
         CASE WHEN {US} BETWEEN
                min({US}) OVER (PARTITION BY conv_id)
                  + CAST(floor(0.1 * (max({US}) OVER (PARTITION BY conv_id)
                        - min({US}) OVER (PARTITION BY conv_id))) AS BIGINT)
              AND
                max({US}) OVER (PARTITION BY conv_id)
                  - CAST(floor(0.1 * (max({US}) OVER (PARTITION BY conv_id)
                        - min({US}) OVER (PARTITION BY conv_id))) AS BIGINT)
              THEN 'OK' ELSE 'OUTSIDE' END AS status
  FROM transcripts
),
ranked AS (
  SELECT *,
         CAST(sum(CASE WHEN status = 'OK' THEN 1 ELSE 0 END)
              OVER (PARTITION BY conv_id) AS BIGINT) AS n_ok,
         row_number() OVER (PARTITION BY conv_id, status
                            ORDER BY signal DESC, turn_idx ASC) AS rk
  FROM flagged
),
final AS (
  SELECT conv_id, turn_idx,
         CASE WHEN status = 'OUTSIDE' AND n_ok < 2 AND rk <= 2 - n_ok
              THEN 'READDED' ELSE status END AS status,
         signal
  FROM ranked
)
SELECT conv_id, turn_idx, status,
       round(CASE WHEN status = 'READDED' THEN signal * 0.5 ELSE signal END, 6)
         AS adj_signal
FROM final
"""

ORACLES_OPS["token_budget_filter"] = f"""
{_T},
qualified AS (
  SELECT conv_id, turn_idx, ts,
         len(string_split(text, ' ')) AS tok
  FROM transcripts
  WHERE length(text) BETWEEN 4 AND 200
    AND len(string_split(text, ' ')) >= 2
),
cum AS (
  SELECT conv_id, turn_idx,
         sum(tok) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM qualified
)
SELECT conv_id, turn_idx FROM cum WHERE c <= 50
"""

ORACLES_OPS["conditional_enrich"] = f"""
{_T},
cov AS (
  SELECT conv_id, count(DISTINCT nullif(tool, '')) AS n_distinct_tools
  FROM transcripts GROUP BY conv_id
),
enr AS (
  SELECT t.conv_id, round(avg(t.signal), 6) AS enrich_value
  FROM transcripts t
  JOIN cov c ON t.conv_id = c.conv_id AND c.n_distinct_tools < 2
  GROUP BY t.conv_id
)
SELECT c.conv_id, c.n_distinct_tools,
       c.n_distinct_tools < 2 AS enriched, e.enrich_value
FROM cov c LEFT JOIN enr e ON c.conv_id = e.conv_id
"""

ORACLES_OPS["finalize_left_join"] = f"""
{_T},
cov AS (
  SELECT conv_id, count(DISTINCT nullif(tool, '')) AS n_distinct_tools
  FROM transcripts GROUP BY conv_id
),
enr AS (
  SELECT t.conv_id, round(avg(t.signal), 6) AS enrich_value
  FROM transcripts t
  JOIN cov c ON t.conv_id = c.conv_id AND c.n_distinct_tools < 2
  GROUP BY t.conv_id
)
SELECT o.conv_id, o.turn_idx,
       round(coalesce(e.enrich_value, 0.0), 6) AS legend_value,
       e.enrich_value IS NOT NULL AS has_legend
FROM (SELECT conv_id, turn_idx FROM transcripts WHERE role = 'tool') o
LEFT JOIN enr e ON o.conv_id = e.conv_id
"""

ORACLES_OPS["coalesce_ladder"] = f"""
{_T},
conv_lvl AS (
  SELECT conv_id,
         CASE WHEN count(*) >= 50 THEN round(max(signal), 6) END AS conv_b
  FROM transcripts GROUP BY conv_id
),
role_lvl AS (
  SELECT conv_id,
         CASE WHEN count(*) >= 10 THEN round(max(signal), 6) END AS role_b
  FROM transcripts WHERE role = 'user' GROUP BY conv_id
)
SELECT c.conv_id,
       round(coalesce(c.conv_b, r.role_b, 100.0), 6) AS fence,
       CASE WHEN c.conv_b IS NOT NULL THEN 'conv'
            WHEN r.role_b IS NOT NULL THEN 'role'
            ELSE 'default' END AS fence_source
FROM conv_lvl c LEFT JOIN role_lvl r ON c.conv_id = r.conv_id
"""

ORACLES_OPS["corner_join"] = f"""
{_T},
u AS (SELECT conv_id, turn_idx AS u_idx, {US} AS u_us FROM transcripts WHERE role = 'user'),
t AS (SELECT conv_id, turn_idx AS t_idx, {US} AS t_us FROM transcripts WHERE role = 'tool'),
cand AS (
  SELECT u.conv_id, u.u_idx, t.t_idx, abs(u.u_us - t.t_us) AS dist
  FROM u JOIN t ON u.conv_id = t.conv_id
  WHERE abs(u.u_us - t.t_us) <= 60 * 1000000
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, u_idx
                               ORDER BY dist ASC, t_idx ASC) AS rk1
  FROM cand
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, t_idx
                               ORDER BY dist ASC, u_idx ASC) AS rk2
  FROM r1 WHERE rk1 = 1
)
SELECT conv_id, u_idx, t_idx, round(dist / 1000000.0, 6) AS gap_s
FROM r2 WHERE rk2 = 1
"""

ORACLES_OPS["corner_join_passthrough"] = f"""
{_T},
u AS (SELECT conv_id, turn_idx AS u_idx, {US} AS u_us FROM transcripts WHERE role = 'user'),
t AS (SELECT conv_id, turn_idx AS t_idx, {US} AS t_us FROM transcripts WHERE role = 'tool'),
cand AS (
  SELECT u.conv_id, u.u_idx, t.t_idx, abs(u.u_us - t.t_us) AS dist
  FROM u JOIN t ON u.conv_id = t.conv_id
  WHERE abs(u.u_us - t.t_us) <= 60 * 1000000
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, u_idx
                               ORDER BY dist ASC, t_idx ASC) AS rk1
  FROM cand
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, t_idx
                               ORDER BY dist ASC, u_idx ASC) AS rk2
  FROM r1 WHERE rk1 = 1
),
pairs AS (
  SELECT conv_id, u_idx, t_idx, round(dist / 1000000.0, 6) AS gap_s
  FROM r2 WHERE rk2 = 1
),
few AS (
  SELECT uc.conv_id
  FROM (SELECT DISTINCT conv_id FROM u) uc
  LEFT JOIN (SELECT conv_id, count(*) AS n_pairs FROM pairs GROUP BY conv_id) c
    ON uc.conv_id = c.conv_id
  WHERE coalesce(c.n_pairs, 0) < 4
),
unmatched AS (
  SELECT u.conv_id, u.u_idx FROM u
  LEFT JOIN pairs p ON u.conv_id = p.conv_id AND u.u_idx = p.u_idx
  WHERE p.u_idx IS NULL
)
SELECT conv_id, u_idx, t_idx, gap_s, TRUE AS matched FROM pairs
UNION ALL
SELECT m.conv_id, m.u_idx, CAST(NULL AS INTEGER) AS t_idx,
       CAST(NULL AS DOUBLE) AS gap_s, FALSE AS matched
FROM unmatched m JOIN few f ON m.conv_id = f.conv_id
"""

ORACLES_OPS["nearest_join"] = f"""
{_T},
nb AS (
  SELECT conv_id, turn_idx, role, {US} AS us,
         last_value(CASE WHEN role = 'user'
                         THEN struct_pack(turn_idx := turn_idx, us := {US}) END
                    IGNORE NULLS)
           OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
         first_value(CASE WHEN role = 'user'
                          THEN struct_pack(turn_idx := turn_idx, us := {US}) END
                     IGNORE NULLS)
           OVER ({_ORD} ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt
  FROM transcripts
)
SELECT conv_id, turn_idx AS tool_idx,
       CASE WHEN prev IS NULL THEN nxt.turn_idx
            WHEN nxt IS NULL THEN prev.turn_idx
            WHEN (nxt.us - us) < (us - prev.us) THEN nxt.turn_idx
            ELSE prev.turn_idx END AS nearest_user_idx,
       round(CASE WHEN prev IS NULL THEN nxt.us - us
                  WHEN nxt IS NULL THEN us - prev.us
                  ELSE least(us - prev.us, nxt.us - us) END / 1000000.0, 6)
         AS nearest_gap_s
FROM nb WHERE role = 'tool'
"""

ORACLES_OPS["confidence_product"] = f"""
{_T},
g AS (
  SELECT conv_id, count(*) AS n_obs,
         sum(ln(greatest(least(signal / 100.0, 1.0), 0.01))) AS logsum
  FROM transcripts GROUP BY conv_id
)
SELECT conv_id, n_obs,
       round(least(exp(logsum + greatest(n_obs - 2, 0) * ln(1.1)), 1.0), 6)
         AS confidence
FROM g
"""

ORACLES_OPS["source_histogram"] = f"""
{_T}
SELECT conv_id, role, count(*) AS n,
       count(DISTINCT nullif(tool, '')) AS n_distinct_tools
FROM transcripts GROUP BY conv_id, role
"""

ORACLES_OPS["rmse_score"] = f"""
{_T},
werr AS (
  SELECT conv_id,
         signal - avg(signal) OVER (PARTITION BY conv_id) AS err
  FROM transcripts
)
SELECT conv_id, count(*) AS n,
       round(sqrt(avg(err * err)), 6) AS rmse
FROM werr GROUP BY conv_id
"""

ORACLES_OPS["weighted_centroid"] = f"""
{_T},
per_conv AS (
  SELECT conv_id, count(*) AS n, sum(signal) AS s FROM transcripts GROUP BY conv_id
)
SELECT round(sum(s / n) / count(*), 6) AS weighted_centroid,
       count(*) AS n_convs
FROM per_conv
"""

ORACLES_OPS["topk_with_ties"] = f"""
{_T},
ranked AS (
  SELECT conv_id, turn_idx, signal,
         rank() OVER (PARTITION BY conv_id ORDER BY signal DESC) AS rk
  FROM transcripts
)
SELECT conv_id, turn_idx, round(signal, 6) AS signal, rk
FROM ranked WHERE rk <= 4
"""

ORACLES_OPS["dedup_overlap"] = f"""
{_T},
cells AS (
  SELECT conv_id, turn_idx, role,
         CAST(floor({US} / (600 * 1000000)) AS BIGINT) AS cell,
         row_number() OVER (PARTITION BY conv_id, role,
                            CAST(floor({US} / (600 * 1000000)) AS BIGINT)
                            ORDER BY turn_idx DESC) AS rn
  FROM transcripts
)
SELECT conv_id, turn_idx, role, cell FROM cells WHERE rn = 1
"""

ORACLES_OPS["quadrant_coverage"] = f"""
{_T},
qrows AS (
  SELECT conv_id,
         CAST(least(floor(({US} - min({US}) OVER (PARTITION BY conv_id)) * 4
               / (CASE WHEN max({US}) OVER (PARTITION BY conv_id)
                          - min({US}) OVER (PARTITION BY conv_id) > 0
                  THEN max({US}) OVER (PARTITION BY conv_id)
                       - min({US}) OVER (PARTITION BY conv_id)
                  ELSE 1 END)), 3) AS INTEGER) AS q
  FROM transcripts
),
covered AS (
  SELECT conv_id, q, count(*) AS n_in_quadrant FROM qrows GROUP BY conv_id, q
),
bounds AS (
  SELECT conv_id, min({US}) AS lo, max({US}) AS hi FROM transcripts GROUP BY conv_id
),
quads AS (
  SELECT b.conv_id, b.lo, b.hi, CAST(u.q AS INTEGER) AS q
  FROM bounds b, unnest([0, 1, 2, 3]) AS u(q)
)
SELECT q2.conv_id, q2.q AS quadrant,
       coalesce(c.n_in_quadrant, 0) AS n_in_quadrant,
       coalesce(c.n_in_quadrant, 0) > 0 AS covered,
       CASE WHEN coalesce(c.n_in_quadrant, 0) = 0
            THEN q2.lo + CAST(floor((q2.q * 2 + 1) * (q2.hi - q2.lo) / 8) AS BIGINT)
       END AS synthetic_probe_us
FROM quads q2 LEFT JOIN covered c ON q2.conv_id = c.conv_id AND q2.q = c.q
"""

ORACLES_OPS["inference_backfill"] = f"""
{_T},
base AS (
  SELECT conv_id, turn_idx, role, {US} AS ts_us,
         round(signal, 6) AS signal, 'OBSERVED' AS source
  FROM transcripts
),
g AS (
  SELECT conv_id,
         sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS n_tool,
         sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user,
         max(CASE WHEN role = 'user' THEN {US} END) AS last_u,
         min(CASE WHEN role = 'user' THEN {US} END) AS first_u,
         avg(CASE WHEN role = 'user' THEN signal END) AS avg_sig,
         max(turn_idx) AS max_idx
  FROM transcripts GROUP BY conv_id
),
synth AS (
  SELECT conv_id,
         CAST(max_idx + 1 AS INTEGER) AS turn_idx,
         'tool' AS role,
         last_u + CAST(floor((last_u - first_u) / (n_user - 1)) AS BIGINT) AS ts_us,
         round(avg_sig * 0.5, 6) AS signal,
         'INFERENCE' AS source
  FROM g WHERE n_tool = 0 AND n_user >= 2
)
SELECT * FROM base UNION ALL SELECT * FROM synth
"""

ORACLES_OPS["anchor_fallback"] = f"""
{_T},
g AS (
  SELECT conv_id, count(*) AS n, min({US}) AS lo, max({US}) AS hi
  FROM transcripts GROUP BY conv_id
),
small AS (SELECT * FROM g WHERE n < 60),
anchors AS (
  SELECT s.conv_id, s.n, s.lo, s.hi, CAST(u.a AS INTEGER) AS anchor_nr
  FROM small s, unnest([0, 1, 2, 3]) AS u(a)
)
SELECT conv_id, n AS n_turns, anchor_nr,
       lo + CAST(floor(anchor_nr * (hi - lo) / 3) AS BIGINT) AS anchor_ts_us
FROM anchors
"""

ORACLES_OPS["colinear_thirdpoint"] = f"""
{_T},
pts AS (
  SELECT conv_id, {US} AS us,
         min({US}) OVER (PARTITION BY conv_id) AS first_us,
         CAST(floor(({US} - min({US}) OVER (PARTITION BY conv_id)) / 1000000)
              AS BIGINT) AS x,
         CAST(floor(signal * 100 + 0.5) AS BIGINT) AS yc
  FROM transcripts WHERE tool = 'write'
),
g AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_pts, min(first_us) AS first_us,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
         CAST(sum(x * yc) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(yc * yc) AS BIGINT) AS syy,
         min(x) AS min_x, max(x) AS max_x
  FROM pts GROUP BY conv_id
  HAVING count(*) >= 2
),
d AS (
  SELECT *,
         CAST(n_pts AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
         CAST(n_pts AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den_x,
         CAST(n_pts AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS den_y,
         CAST(floor((min_x + max_x) / 2) AS BIGINT) AS x_mid
  FROM g
),
e AS (
  SELECT *,
         CASE WHEN den_x > 0 AND den_y > 0
              THEN num * num / (den_x * den_y) END AS r2,
         den_x > 0 AND (n_pts = 2 OR den_y = 0
                        OR (den_x > 0 AND den_y > 0
                            AND num * num / (den_x * den_y) > 0.99)) AS colinear,
         num / den_x AS slope
  FROM d
)
SELECT conv_id, n_pts,
       round(r2, 6) AS r2,
       colinear,
       CASE WHEN colinear THEN first_us + x_mid * 1000000 END AS synth_ts_us,
       round(CASE WHEN colinear THEN
                ((CAST(sy AS DOUBLE) - (num / den_x) * CAST(sx AS DOUBLE))
                 / CAST(n_pts AS DOUBLE)
                 + (num / den_x) * CAST(x_mid AS DOUBLE)) / 100 END, 6)
         AS synth_signal
FROM e
"""

# Integer-exact twin of operators/outliers.mad_outliers: centi-quantized
# signal, doubled-median trick so both percentiles interpolate over exact
# integers/half-integers identically in Spark and DuckDB, state bounded by
# value range.
ORACLES_OPS["mad_outliers"] = f"""
{_T},
base AS (
  SELECT conv_id, turn_idx, signal,
         CAST(floor(signal * 100 + 0.5) AS BIGINT) AS yc
  FROM transcripts
),
med AS (
  SELECT conv_id,
         CAST(round(quantile_cont(yc, 0.5) * 2) AS BIGINT) AS med2
  FROM base GROUP BY conv_id
),
dev AS (
  SELECT b.conv_id, b.turn_idx, b.signal, m.med2,
         abs(b.yc * 2 - m.med2) AS adev2
  FROM base b JOIN med m ON b.conv_id = m.conv_id
),
mad AS (
  SELECT conv_id, quantile_cont(adev2, 0.5) AS mad2 FROM dev GROUP BY conv_id
)
SELECT d.conv_id, d.turn_idx,
       round(d.signal, 6) AS signal,
       round(d.med2 / 200.0, 6) AS median,
       round(m.mad2 / 200.0, 6) AS mad,
       CASE WHEN CAST(d.adev2 AS DOUBLE) > 3.0 * m.mad2 + 1e-9
            THEN 'OUTLIER' ELSE 'OK' END AS status
FROM dev d JOIN mad m ON d.conv_id = m.conv_id
"""

# Deterministic RANSAC twin: candidate indices are affine functions of the
# iteration (same constants as operators/outliers.py), x/y quantized to
# integers so every statistic is exact in both engines.
ORACLES_OPS["ransac_slope"] = f"""
{_T},
capped AS (
  SELECT conv_id, ts, turn_idx, signal,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY ts DESC, turn_idx DESC) AS rn
  FROM transcripts
),
rows_ AS (
  SELECT conv_id, {US} AS us, turn_idx,
         CAST(floor(signal * 100 + 0.5) AS BIGINT) AS yc
  FROM capped WHERE rn <= 512
),
xs AS (
  SELECT conv_id,
         CAST(floor((us - min(us) OVER (PARTITION BY conv_id)) / 1000000)
              AS BIGINT) AS x,
         yc,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY us, turn_idx) - 1
              AS BIGINT) AS idx,
         CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n
  FROM rows_
),
med AS (SELECT conv_id, quantile_cont(yc, 0.5) AS m0 FROM xs GROUP BY conv_id),
thr AS (
  SELECT x.conv_id,
         greatest(3.0 * quantile_cont(abs(x.yc - m.m0), 0.5), 1e-9) AS thresh
  FROM xs x JOIN med m ON x.conv_id = m.conv_id
  GROUP BY x.conv_id
),
convs AS (SELECT DISTINCT conv_id, n FROM xs),
iters AS (SELECT conv_id, n, unnest(range(32)) AS it FROM convs),
cand AS (
  SELECT conv_id, it, m,
         CAST(ayc AS DOUBLE) - m * CAST(ax AS DOUBLE) AS b0
  FROM (
    SELECT i.conv_id, i.it, a.yc AS ayc, a.x AS ax,
           CAST(b.yc - a.yc AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS m
    FROM iters i
    JOIN xs a ON a.conv_id = i.conv_id
             AND a.idx = (i.it * {RANSAC_MULT_A} + 911) % i.n
    JOIN xs b ON b.conv_id = i.conv_id
             AND b.idx = (i.it * {RANSAC_MULT_B} + {RANSAC_OFF_B}) % i.n
    WHERE a.x <> b.x
  )
),
scored AS (
  SELECT c.conv_id, c.it, c.m, c.b0,
         CAST(sum(CASE WHEN abs(CAST(r.yc AS DOUBLE)
                           - (c.m * CAST(r.x AS DOUBLE) + c.b0)) <= t.thresh
                       THEN 1 ELSE 0 END) AS BIGINT) AS inl
  FROM cand c
  JOIN xs r ON r.conv_id = c.conv_id
  JOIN thr t ON t.conv_id = c.conv_id
  GROUP BY c.conv_id, c.it, c.m, c.b0
),
best AS (
  SELECT conv_id, m, b0 FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id
                                 ORDER BY inl DESC, it ASC) AS rk
    FROM scored
  ) WHERE rk = 1
),
bestd AS (
  SELECT c.conv_id, c.n, coalesce(b.m, 0.0) AS m, coalesce(b.b0, 0.0) AS b0
  FROM convs c LEFT JOIN best b ON c.conv_id = b.conv_id
),
inl_rows AS (
  SELECT r.conv_id, r.x, r.yc
  FROM xs r
  JOIN bestd b ON b.conv_id = r.conv_id
  JOIN thr t ON t.conv_id = r.conv_id
  WHERE abs(CAST(r.yc AS DOUBLE) - (b.m * CAST(r.x AS DOUBLE) + b.b0)) <= t.thresh
),
refit AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
         CAST(sum(x * yc) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM inl_rows GROUP BY conv_id
),
ols AS (
  SELECT b.conv_id, b.n, b.m AS m_best, b.b0 AS b_best,
         coalesce(r.k, 0) AS k, r.sx, r.sy,
         CASE WHEN coalesce(r.k, 0) >= 2
                   AND CAST(r.k AS DOUBLE) * CAST(r.sxx AS DOUBLE)
                       - CAST(r.sx AS DOUBLE) * CAST(r.sx AS DOUBLE) > 0
              THEN (CAST(r.k AS DOUBLE) * CAST(r.sxy AS DOUBLE)
                    - CAST(r.sx AS DOUBLE) * CAST(r.sy AS DOUBLE))
                   / (CAST(r.k AS DOUBLE) * CAST(r.sxx AS DOUBLE)
                      - CAST(r.sx AS DOUBLE) * CAST(r.sx AS DOUBLE))
         END AS m_ols
  FROM bestd b LEFT JOIN refit r ON b.conv_id = r.conv_id
)
SELECT conv_id,
       round(CASE WHEN n < 2 THEN NULL
                  WHEN m_ols IS NOT NULL THEN m_ols
                  ELSE m_best END / 100, 6) AS slope,
       round(CASE WHEN n < 2 THEN NULL
                  WHEN m_ols IS NOT NULL
                    THEN (CAST(sy AS DOUBLE) - m_ols * CAST(sx AS DOUBLE))
                         / CAST(k AS DOUBLE)
                  ELSE b_best END / 100, 6) AS intercept,
       CAST(CASE WHEN n < 2 THEN 0 ELSE k END AS INTEGER) AS n_inliers,
       CAST(n AS INTEGER) AS n_obs
FROM ols
"""

ORACLES_OPS["extract_ladder"] = f"""
{_T},
ex AS (
  SELECT conv_id, turn_idx, text,
         try_cast(nullif(regexp_extract(text, '"k":\\s*(\\d+)', 1), '') AS DOUBLE) AS kv,
         try_cast(nullif(regexp_extract(text, 'turn (\\d+)', 1), '') AS DOUBLE) AS turn,
         try_cast(nullif(regexp_extract(text, '(\\d+)', 1), '') AS DOUBLE) AS anynum
  FROM transcripts
)
SELECT conv_id, turn_idx,
       round(CASE WHEN kv IS NOT NULL AND turn IS NOT NULL THEN kv + turn / 60.0
                  WHEN kv IS NOT NULL THEN kv
                  WHEN turn IS NOT NULL THEN turn
                  ELSE anynum END, 6) AS extracted,
       trim(regexp_replace(regexp_replace(regexp_replace(text, '(?i)\\bturn\\b', '', 'g'),
                           '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g')) AS normalized
FROM ex
"""

ORACLES_OPS["denoise_segments"] = f"""
{_T},
segs AS (
  SELECT conv_id, turn_idx, {US} AS start_us,
         {US} + CAST(floor(signal * 100) AS BIGINT) * 10000 AS end_us
  FROM transcripts WHERE role = 'tool' AND signal >= 5.0
),
flagged AS (
  SELECT *,
         CASE WHEN max(end_us) OVER (PARTITION BY conv_id
                ORDER BY start_us, end_us, turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR start_us > max(end_us) OVER (PARTITION BY conv_id
                   ORDER BY start_us, end_us, turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new
  FROM segs
),
islands AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY conv_id
            ORDER BY start_us, end_us, turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS island_id
  FROM flagged
)
SELECT conv_id, island_id,
       min(start_us) AS start_us, max(end_us) AS end_us,
       count(*) AS n_segments
FROM islands GROUP BY conv_id, island_id
"""

# containment semi-join: the oracle does the naive BETWEEN range join; the
# engine's as-of implementation must agree exactly
ORACLES_OPS["text_with_segments"] = f"""
{_T},
segs AS (
  SELECT conv_id, turn_idx, {US} AS start_us,
         {US} + CAST(floor(signal * 100) AS BIGINT) * 10000 AS end_us
  FROM transcripts WHERE role = 'tool' AND signal >= 5.0
),
flagged AS (
  SELECT *,
         CASE WHEN max(end_us) OVER (PARTITION BY conv_id
                ORDER BY start_us, end_us, turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR start_us > max(end_us) OVER (PARTITION BY conv_id
                   ORDER BY start_us, end_us, turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new
  FROM segs
),
islands0 AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY conv_id
            ORDER BY start_us, end_us, turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS island_id
  FROM flagged
),
islands AS (
  SELECT conv_id, island_id,
         min(start_us) AS start_us, max(end_us) AS end_us
  FROM islands0 GROUP BY conv_id, island_id
)
SELECT t.conv_id, t.turn_idx, i.island_id, i.start_us, i.end_us
FROM transcripts t
JOIN islands i ON t.conv_id = i.conv_id
              AND {US.replace("ts", "t.ts")} BETWEEN i.start_us AND i.end_us
"""

ORACLES_OPS["metadata_record"] = f"""
{_T},
dom AS (
  SELECT conv_id, role AS dominant_role FROM (
    SELECT conv_id, role,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY count(*) DESC, role ASC) AS rk
    FROM transcripts GROUP BY conv_id, role
  ) WHERE rk = 1
),
tt AS (
  SELECT conv_id, tool AS top_tool FROM (
    SELECT conv_id, tool,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY count(*) DESC, tool ASC) AS rk
    FROM transcripts WHERE tool IS NOT NULL AND tool <> ''
    GROUP BY conv_id, tool
  ) WHERE rk = 1
),
base AS (
  SELECT conv_id, count(*) AS n_turns,
         round(max(signal), 6) AS peak_signal
  FROM transcripts GROUP BY conv_id
),
ft AS (
  SELECT conv_id, text AS first_text FROM (
    SELECT conv_id, text,
           row_number() OVER ({_ORD}) AS rk
    FROM transcripts
  ) WHERE rk = 1
)
SELECT b.conv_id, b.n_turns, d.dominant_role, t.top_tool,
       f.first_text, b.peak_signal
FROM base b
LEFT JOIN ft f ON b.conv_id = f.conv_id
LEFT JOIN dom d ON b.conv_id = d.conv_id
LEFT JOIN tt t ON b.conv_id = t.conv_id
"""

ORACLES_OPS["color_level"] = f"""
{_T},
q AS (
  SELECT conv_id, CAST(floor(signal * 100 + 0.5) AS BIGINT) AS yc
  FROM transcripts
),
g AS (
  SELECT conv_id, count(*) AS n,
         CAST(sum(yc) AS BIGINT) AS s, CAST(sum(yc * yc) AS BIGINT) AS ss
  FROM q GROUP BY conv_id
),
v AS (
  SELECT conv_id, n,
         CAST(ss AS DOUBLE) / n / 10000.0
           - (CAST(s AS DOUBLE) / n / 100.0) * (CAST(s AS DOUBLE) / n / 100.0) AS var
  FROM g
)
SELECT conv_id, n,
       round(var, 6) + 0 AS variance,
       CASE WHEN var < 400.0 THEN 'low'
            WHEN var < 800.0 THEN 'mid'
            ELSE 'high' END AS level
FROM v
"""

ORACLES_OPS["monotone_best_run"] = f"""
{_T},
l1 AS (
  SELECT conv_id, turn_idx, ts, signal,
         CASE WHEN lag(signal) OVER ({_ORD}) IS NULL
                OR signal <= lag(signal) OVER ({_ORD})
              THEN 1 ELSE 0 END AS brk
  FROM transcripts
),
l2 AS (
  SELECT conv_id, turn_idx, signal,
         CAST(sum(brk) OVER ({_ORD}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
  FROM l1
),
runs AS (SELECT conv_id, run_id, count(*) AS run_len FROM l2 GROUP BY conv_id, run_id),
best AS (
  SELECT conv_id, run_id, run_len FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id
                                 ORDER BY run_len DESC, run_id ASC) AS bk
    FROM runs
  ) WHERE bk = 1
)
SELECT l2.conv_id, l2.turn_idx, round(l2.signal, 6) AS signal,
       l2.run_id, CAST(b.run_len AS BIGINT) AS run_len
FROM l2 JOIN best b ON l2.conv_id = b.conv_id AND l2.run_id = b.run_id
"""

_SUP_GAP_US = 24 * 3600 * 1_000_000
_sup_levels = ",\n".join(
    f"""k{k} AS (
  SELECT k.conv_id,
         CASE WHEN r.conv_id IS NULL THEN k.kept
              WHEN len(list_filter(k.kept, x -> abs(x.us - r.us) < {_SUP_GAP_US})) = 0
                THEN list_append(k.kept, struct_pack(rk := r.rk,
                       turn_idx := r.turn_idx, us := r.us, v := r.signal))
              ELSE k.kept END AS kept
  FROM k{k - 1} k LEFT JOIN capped r ON r.conv_id = k.conv_id AND r.rk = {k}
)"""
    for k in range(2, 9)
)
ORACLES_OPS["rank_suppress"] = f"""
{_T},
ranked AS (
  SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, {US} AS us, signal,
         CAST(row_number() OVER (PARTITION BY conv_id
                                 ORDER BY signal DESC, turn_idx ASC) AS INTEGER) AS rk
  FROM transcripts
),
capped AS (SELECT * FROM ranked WHERE rk <= 8),
k1 AS (
  SELECT conv_id,
         [struct_pack(rk := rk, turn_idx := turn_idx, us := us, v := signal)] AS kept
  FROM capped WHERE rk = 1
),
{_sup_levels}
SELECT conv_id,
       kept[CAST(i + 1 AS INTEGER)].turn_idx AS turn_idx,
       round(kept[CAST(i + 1 AS INTEGER)].v, 6) AS signal,
       kept[CAST(i + 1 AS INTEGER)].rk AS cand_rank,
       CAST(i AS INTEGER) AS keep_nr
FROM k8, unnest(range(len(kept))) AS t(i)
"""

# METEOR exact-match stage: the greedy token alignment is a recursive CTE
# stepping one candidate position per iteration, carrying the used-reference
# set — the textual twin of evalm._greedy_align's Catalyst fold.
ORACLES_OPS["meteor_fields"] = f"""
{_T_REC},
firsts AS (
  SELECT conv_id, role, text FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, role
                                 ORDER BY ts, turn_idx) AS rn
    FROM transcripts
  ) WHERE rn = 1
),
prs AS (
  SELECT c.conv_id, c.role AS field,
         string_split(c.text, ' ') AS cand, string_split(r.text, ' ') AS ref
  FROM firsts c JOIN firsts r ON c.conv_id = r.conv_id AND r.role = 'user'
  WHERE c.role <> 'user'
),
m AS (
  SELECT conv_id, field, cand, ref, 0 AS ci,
         CAST([] AS BIGINT[]) AS used,
         CAST([] AS STRUCT(ci BIGINT, rj BIGINT)[]) AS pairs
  FROM prs
  UNION ALL
  SELECT conv_id, field, cand, ref, ci + 1,
         CASE WHEN nxt IS NULL THEN used ELSE list_append(used, nxt) END,
         CASE WHEN nxt IS NULL THEN pairs
              ELSE list_append(pairs, {{ci: ci + 1, rj: nxt}}) END
  FROM (
    SELECT *, (list_filter(range(1, len(ref) + 1),
               j -> ref[j] = cand[ci + 1] AND NOT list_contains(used, j)))[1] AS nxt
    FROM m WHERE ci < len(cand)
  )
),
fin AS (SELECT * FROM m WHERE ci = len(cand)),
scored AS (
  SELECT conv_id, field,
         CAST(len(cand) AS BIGINT) AS n_cand,
         CAST(len(ref) AS BIGINT) AS n_ref,
         CAST(len(pairs) AS BIGINT) AS matches,
         CAST(CASE WHEN len(pairs) <= 1 THEN len(pairs)
              ELSE 1 + list_sum(list_transform(range(2, len(pairs) + 1),
                   i -> CASE WHEN pairs[i].ci = pairs[i-1].ci + 1
                              AND pairs[i].rj = pairs[i-1].rj + 1
                        THEN 0 ELSE 1 END))
              END AS BIGINT) AS chunks
  FROM fin
)
SELECT conv_id, field, n_cand, n_ref, matches, chunks,
       round(CASE WHEN matches > 0
                  THEN CAST(matches AS DOUBLE) / n_cand ELSE 0.0 END, 6)
         AS m_precision,
       round(CASE WHEN matches > 0
                  THEN CAST(matches AS DOUBLE) / n_ref ELSE 0.0 END, 6)
         AS m_recall,
       round(CASE WHEN matches > 0 THEN
               (10.0 * (CAST(matches AS DOUBLE) / n_cand)
                     * (CAST(matches AS DOUBLE) / n_ref)
                / ((CAST(matches AS DOUBLE) / n_ref)
                   + 9.0 * (CAST(matches AS DOUBLE) / n_cand)))
               * (1.0 - 0.5 * (CAST(chunks AS DOUBLE) / matches)
                            * (CAST(chunks AS DOUBLE) / matches)
                            * (CAST(chunks AS DOUBLE) / matches))
             ELSE 0.0 END, 6) AS meteor
FROM scored
"""

ORACLES_OPS["geocode_enrich"] = f"""
{_T},
keys AS (
  SELECT DISTINCT tool AS key FROM transcripts
  WHERE tool IS NOT NULL AND tool <> ''
),
dim AS (SELECT * FROM (VALUES ('search', 12.5), ('bash', -44.25)) AS t(key, value)),
j AS (SELECT k.key, d.value FROM keys k LEFT JOIN dim d ON k.key = d.key)
SELECT key,
       round(coalesce(value,
             round((CAST(concat('0x', substr(md5(key), 1, 8)) AS BIGINT) % 36000000)
                   / 100000.0 - 180.0, 6)), 6) AS value,
       CASE WHEN value IS NOT NULL THEN 'cache' ELSE 'computed' END AS src
FROM j
"""

# shared match CTE for the eval harness (mutual-nearest within radius)
_EVAL_MATCH = f"""
pred AS (
  SELECT conv_id, tool AS class, turn_idx AS pred_idx, {US} AS pred_us
  FROM transcripts
  WHERE role = 'tool' AND tool IN ('search', 'bash', 'read', 'write', 'edit')
),
truth AS (
  SELECT conv_id,
         CASE CAST((turn_idx // 3) % 5 AS INTEGER)
              WHEN 0 THEN 'search' WHEN 1 THEN 'bash' WHEN 2 THEN 'read'
              WHEN 3 THEN 'write' ELSE 'edit' END AS class,
         turn_idx AS truth_idx, {US} AS truth_us
  FROM transcripts WHERE role = 'user' AND turn_idx % 3 = 0
),
cand AS (
  SELECT p.conv_id, p.class, p.pred_idx, t.truth_idx,
         abs(p.pred_us - t.truth_us) AS dist_us
  FROM pred p JOIN truth t ON p.conv_id = t.conv_id AND p.class = t.class
  WHERE abs(p.pred_us - t.truth_us) <= 300 * 1000000
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, class, pred_idx
                               ORDER BY dist_us, truth_idx) AS rk1
  FROM cand
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, class, truth_idx
                               ORDER BY dist_us, pred_idx) AS rk2
  FROM r1 WHERE rk1 = 1
),
matched AS (SELECT conv_id, class, pred_idx, truth_idx FROM r2 WHERE rk2 = 1)
""".strip()

ORACLES_OPS["eval_f1"] = f"""
{_T},
{_EVAL_MATCH},
np_ AS (SELECT class, count(*) AS n_pred FROM pred GROUP BY class),
nt AS (SELECT class, count(*) AS n_truth FROM truth GROUP BY class),
tpc AS (SELECT class, count(*) AS tp FROM matched GROUP BY class),
g AS (
  SELECT coalesce(np_.class, nt.class) AS class,
         CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred,
         CAST(coalesce(n_truth, 0) AS BIGINT) AS n_truth
  FROM np_ FULL JOIN nt ON np_.class = nt.class
)
SELECT g.class, g.n_pred, g.n_truth,
       CAST(coalesce(t.tp, 0) AS BIGINT) AS tp,
       round(CASE WHEN g.n_pred > 0 THEN coalesce(t.tp, 0) / g.n_pred END, 6)
         AS precision,
       round(CASE WHEN g.n_truth > 0 THEN coalesce(t.tp, 0) / g.n_truth END, 6)
         AS recall,
       round(CASE WHEN g.n_pred + g.n_truth > 0
                  THEN 2.0 * coalesce(t.tp, 0) / (g.n_pred + g.n_truth) END, 6)
         AS f1
FROM g LEFT JOIN tpc t ON g.class = t.class
"""

ORACLES_OPS["eval_deciles"] = f"""
{_T},
{_EVAL_MATCH},
npc AS (SELECT conv_id, count(*) AS n_pred FROM pred GROUP BY conv_id),
ntc AS (SELECT conv_id, count(*) AS n_truth FROM truth GROUP BY conv_id),
tpcv AS (SELECT conv_id, count(*) AS tp FROM matched GROUP BY conv_id),
per_conv AS (
  SELECT coalesce(npc.conv_id, ntc.conv_id) AS conv_id,
         round(2.0 * coalesce(t.tp, 0)
               / (coalesce(n_pred, 0) + coalesce(n_truth, 0)), 6) AS f1
  FROM npc FULL JOIN ntc ON npc.conv_id = ntc.conv_id
  LEFT JOIN tpcv t ON coalesce(npc.conv_id, ntc.conv_id) = t.conv_id
),
-- literal ntile(10): an independent check of the engine's distributed
-- histogram-decomposition ntile (operators/evalm.py).  Integer micro-unit
-- finish on both sides makes avg/min/max exact (accumulation-order-free).
tiled AS (
  SELECT CAST(floor(f1 * 1000000 + 0.5) AS BIGINT) AS f1c,
         ntile(10) OVER (ORDER BY f1, conv_id) AS decile
  FROM per_conv
)
SELECT decile, count(*) AS n_convs,
       round(CAST(sum(f1c) AS DOUBLE) / (count(*) * 1000000.0), 6) AS avg_f1,
       CAST(min(f1c) AS DOUBLE) / 1000000.0 AS min_f1,
       CAST(max(f1c) AS DOUBLE) / 1000000.0 AS max_f1
FROM tiled GROUP BY decile
"""

ORACLES_OPS["halt_predicate"] = f"""
{_T},
g AS (
  SELECT conv_id, count(*) AS n,
         sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user
  FROM transcripts GROUP BY conv_id
)
SELECT conv_id,
       CASE WHEN n < 50 THEN 'too_few_turns' ELSE 'no_user_turns' END AS halt_reason
FROM g WHERE n < 50 OR n_user = 0
"""


ORACLES_OPS["featurize_full"] = f"""
{_T},
l1 AS (
  SELECT conv_id, turn_idx, role, text, tool, signal,
         {US} AS us,
         lag(role)  OVER ({_ORD}) AS prev_role,
         lead(role) OVER ({_ORD}) AS next_role,
         lag({US})  OVER ({_ORD}) AS prev_us,
         CASE WHEN row_number() OVER (PARTITION BY conv_id, tool ORDER BY ts, turn_idx) = 1
                   AND tool IS NOT NULL AND tool <> '' THEN 1 ELSE 0 END AS first_tool_use,
         coalesce(count(*) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS turns_so_far,
         CAST(coalesce(sum({_TOOL_USED}) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tools_so_far,
         coalesce(count(*) OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 0) AS rolling_turns_5,
         CAST(coalesce(sum({_TOOL_USED}) OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rolling_tools_5,
         round(avg(signal) OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 6) AS rolling_signal_mean_5,
         last_value(CASE WHEN tool IS NOT NULL AND tool <> '' THEN tool END IGNORE NULLS)
           OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ffill_tool,
         ts
  FROM transcripts
),
l2 AS (
  SELECT *,
         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM l1
)
SELECT conv_id, turn_idx, role, text, tool, us AS ts_us,
       CAST(sum(is_new) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id,
       prev_role, next_role,
       concat(coalesce(prev_role, 'START'), '->', role) AS role_transition,
       round((us - prev_us) / 1000000.0, 6) AS secs_since_prev,
       turns_so_far, tools_so_far,
       CAST(coalesce(sum(first_tool_use) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS distinct_tools_so_far,
       rolling_turns_5, rolling_tools_5, rolling_signal_mean_5, ffill_tool
FROM l2
"""


# the bucketed physical path must satisfy the identical specification
def _link_bucketed():
    from uncharted_ta1_pipeline_spark.plans.oracles import ORACLES

    ORACLES_OPS["asof_features_bucketed"] = ORACLES["asof_features"]


_link_bucketed()


# --- pandas-UDF surface twins (functions/geof.py) ---------------------------
# the latitude -> km/deg table is the SAME Python-constant-folded literal the
# scalar pandas UDF reads, embedded here as a SQL array so both engines use
# bit-identical doubles.
from uncharted_ta1_pipeline_spark.functions.geof import KM_PER_DEG_LON  # noqa: E402

_KM_TABLE = "[" + ", ".join(repr(v) for v in KM_PER_DEG_LON) + "]"

ORACLES_OPS["geodesic_scale"] = f"""
{_T},
q AS (
  SELECT conv_id, turn_idx,
         least(greatest(CAST(floor(signal) AS BIGINT), 0), 89) AS lat_q,
         CAST(sign(signal - 50.0) AS INTEGER) AS hemi_sign
  FROM transcripts
)
SELECT conv_id, turn_idx, lat_q, hemi_sign,
       CASE WHEN hemi_sign >= 0 THEN 'N' ELSE 'S' END AS hemisphere,
       ({_KM_TABLE})[CAST(lat_q AS INTEGER) + 1] AS km_per_deg,
       round(10.0 / ({_KM_TABLE})[CAST(lat_q AS INTEGER) + 1], 6) AS deg_for_10km
FROM q
"""

ORACLES_OPS["median_mad"] = f"""
{_T},
q AS (
  SELECT conv_id, CAST(floor(signal * 100 + 0.5) AS BIGINT) AS yc
  FROM transcripts
)
SELECT conv_id, count(*) AS n,
       round(median(yc) / 100.0, 6) AS median_signal,
       round(mad(yc) / 100.0, 6) AS mad_signal
FROM q GROUP BY conv_id
"""

ORACLES_OPS["point_geocoder"] = f"""
{_T},
bounds AS (
  SELECT conv_id, min({US}) AS lo0, max({US}) AS hi0
  FROM transcripts GROUP BY conv_id
),
cand AS (
  SELECT conv_id, turn_idx, tool, {US} AS us,
         CAST(floor(signal * 100 + 0.5) AS BIGINT) AS yc
  FROM transcripts
  WHERE role = 'tool' AND tool IS NOT NULL AND tool <> ''
),
fenced AS (
  SELECT c.* FROM cand c JOIN bounds b ON c.conv_id = b.conv_id
  WHERE c.us BETWEEN b.lo0 + CAST(floor(0.1 * (b.hi0 - b.lo0)) AS BIGINT)
                 AND b.hi0 - CAST(floor(0.1 * (b.hi0 - b.lo0)) AS BIGINT)
),
per_tool AS (
  SELECT conv_id, tool, count(*) AS n_t, CAST(sum(yc) AS BIGINT) AS sy_t
  FROM fenced GROUP BY conv_id, tool
),
centroid AS (
  SELECT conv_id, sum(CAST(sy_t AS DOUBLE) / n_t) / count(*) AS centroid_c
  FROM per_tool GROUP BY conv_id
),
scored AS (
  SELECT f.*, round(abs(f.yc - c.centroid_c) / 100.0, 6) AS dist
  FROM fenced f JOIN centroid c ON f.conv_id = c.conv_id
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, tool
                                 ORDER BY dist ASC, turn_idx ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
topk AS (
  SELECT *, rank() OVER (PARTITION BY conv_id ORDER BY yc DESC) AS rk
  FROM deduped
)
SELECT conv_id, tool, turn_idx, round(yc / 100.0, 6) AS signal, dist, rk
FROM topk WHERE rk <= 4
"""


# --- OutputCreator queries (plans/outputs.py) ------------------------------
# scoring_output wraps the asof_fit_predict oracle as a derived table: the
# fit columns are already rounded + sign-normalized there, so the error
# arithmetic differences identical doubles in both engines.
from uncharted_ta1_pipeline_spark.plans.oracles import ORACLES as _CORE_ORACLES

ORACLES_OPS["scoring_output"] = f"""
SELECT probe_id, conv_id, probe_ts_us, pred, n_obs,
       round(pred - intercept, 6) + 0 AS error,
       abs(round(pred - intercept, 6) + 0) AS abs_error,
       round(1 - 1.0 / (n_obs + 1), 6) AS confidence
FROM ({_CORE_ORACLES["asof_fit_predict"]})
"""

ORACLES_OPS["summary_output"] = f"""
{_T},
hist AS (
  SELECT conv_id, role, count(*) AS n,
         count(DISTINCT nullif(tool, '')) AS nd
  FROM transcripts GROUP BY conv_id, role
),
piv AS (
  SELECT conv_id,
    coalesce(max(CASE WHEN role = 'user'
      THEN CAST(n AS VARCHAR) || ';' || CAST(nd AS VARCHAR) END), '') AS user_src,
    coalesce(max(CASE WHEN role = 'assistant'
      THEN CAST(n AS VARCHAR) || ';' || CAST(nd AS VARCHAR) END), '') AS assistant_src,
    coalesce(max(CASE WHEN role = 'tool'
      THEN CAST(n AS VARCHAR) || ';' || CAST(nd AS VARCHAR) END), '') AS tool_src
  FROM hist GROUP BY conv_id
),
werr AS (
  SELECT conv_id, signal - avg(signal) OVER (PARTITION BY conv_id) AS err
  FROM transcripts
),
rmse AS (
  SELECT conv_id, round(sqrt(avg(err * err)), 6) AS rmse
  FROM werr GROUP BY conv_id
),
g AS (
  SELECT conv_id, count(*) AS n_obs,
         sum(ln(greatest(least(signal / 100.0, 1.0), 0.01))) AS logsum
  FROM transcripts GROUP BY conv_id
),
conf AS (
  SELECT conv_id,
         round(least(exp(logsum + greatest(n_obs - 2, 0) * ln(1.1)), 1.0), 6)
           AS confidence
  FROM g
)
SELECT p.conv_id, user_src, assistant_src, tool_src, rmse, confidence
FROM piv p
LEFT JOIN rmse USING (conv_id)
LEFT JOIN conf USING (conv_id)
"""


ORACLES_OPS["datum_shift"] = f"""
{_T},
nb AS (
  SELECT conv_id, turn_idx, role, signal, {US} AS us,
         last_value(CASE WHEN role = 'user'
                         THEN struct_pack(turn_idx := turn_idx, us := {US}) END
                    IGNORE NULLS)
           OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
         first_value(CASE WHEN role = 'user'
                          THEN struct_pack(turn_idx := turn_idx, us := {US}) END
                     IGNORE NULLS)
           OVER ({_ORD} ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt
  FROM transcripts
),
nj AS (
  SELECT conv_id, turn_idx AS tool_idx, signal AS sig_t,
         CASE WHEN prev IS NULL THEN nxt.turn_idx
              WHEN nxt IS NULL THEN prev.turn_idx
              WHEN (nxt.us - us) < (us - prev.us) THEN nxt.turn_idx
              ELSE prev.turn_idx END AS nearest_user_idx
  FROM nb WHERE role = 'tool'
)
SELECT n.conv_id, n.tool_idx, n.nearest_user_idx,
       round(CASE WHEN u.signal IS NULL THEN n.sig_t
                  ELSE n.sig_t
                       + ({_KM_TABLE})[CAST(least(greatest(
                             CAST(floor(u.signal) AS BIGINT), 0), 89)
                           AS INTEGER) + 1] / 111.32
                       - 1 END, 6) AS shifted_signal
FROM nj n
LEFT JOIN transcripts u
  ON u.conv_id = n.conv_id AND u.turn_idx = n.nearest_user_idx
"""


ORACLES_OPS["bleu_fields"] = f"""
{_T},
firsts AS (
  SELECT conv_id, role, text FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, role
                                 ORDER BY ts, turn_idx) AS rn
    FROM transcripts
  ) WHERE rn = 1
),
prs AS (
  SELECT c.conv_id, c.role AS field,
         string_split(c.text, ' ') AS cand, string_split(r.text, ' ') AS ref
  FROM firsts c JOIN firsts r ON c.conv_id = r.conv_id AND r.role = 'user'
  WHERE c.role <> 'user'
),
uc1 AS (
  SELECT conv_id, field, u.g AS g, count(*) AS cc
  FROM prs, unnest(cand) AS u(g) GROUP BY conv_id, field, u.g
),
ur1 AS (
  SELECT conv_id, field, u.g AS g, count(*) AS rc
  FROM prs, unnest(ref) AS u(g) GROUP BY conv_id, field, u.g
),
c1 AS (
  SELECT conv_id, field, CAST(sum(least(cc, rc)) AS BIGINT) AS clip1
  FROM uc1 JOIN ur1 USING (conv_id, field, g) GROUP BY conv_id, field
),
uc2 AS (
  SELECT conv_id, field, cand[t.i] || ' ' || cand[t.i + 1] AS g,
         count(*) AS cc
  FROM prs, unnest(generate_series(1, len(cand) - 1)) AS t(i)
  GROUP BY conv_id, field, g
),
ur2 AS (
  SELECT conv_id, field, ref[t.i] || ' ' || ref[t.i + 1] AS g,
         count(*) AS rc
  FROM prs, unnest(generate_series(1, len(ref) - 1)) AS t(i)
  GROUP BY conv_id, field, g
),
c2 AS (
  SELECT conv_id, field, CAST(sum(least(cc, rc)) AS BIGINT) AS clip2
  FROM uc2 JOIN ur2 USING (conv_id, field, g) GROUP BY conv_id, field
),
base AS (
  SELECT conv_id, field,
         CAST(len(cand) AS BIGINT) AS n1,
         CAST(greatest(len(cand) - 1, 0) AS BIGINT) AS n2,
         CAST(len(ref) AS BIGINT) AS ref_len
  FROM prs
)
SELECT b.conv_id, b.field, b.n1, b.n2, b.ref_len,
       coalesce(c1.clip1, 0) AS clip1,
       coalesce(c2.clip2, 0) AS clip2,
       round(coalesce(c1.clip1, 0) / b.n1, 6) AS p1,
       CASE WHEN b.n2 > 0 THEN round(coalesce(c2.clip2, 0) / b.n2, 6) END AS p2
FROM base b
LEFT JOIN c1 ON b.conv_id = c1.conv_id AND b.field = c1.field
LEFT JOIN c2 ON b.conv_id = c2.conv_id AND b.field = c2.field
"""

# ROUGE-L: the identical LCS DP via nested list_reduce — the outer fold's
# element list carries i in every slot so the inner lambda can see it.
ORACLES_OPS["rouge_l"] = f"""
{_T},
firsts AS (
  SELECT conv_id, role, text FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, role
                                 ORDER BY ts, turn_idx) AS rn
    FROM transcripts
  ) WHERE rn = 1
),
prs AS (
  SELECT c.conv_id, c.role AS field,
         string_split(c.text, ' ')[1:64] AS cand,
         string_split(r.text, ' ')[1:64] AS ref
  FROM firsts c JOIN firsts r ON c.conv_id = r.conv_id AND r.role = 'user'
  WHERE c.role <> 'user'
),
scored AS (
  SELECT conv_id, field,
         CAST(len(cand) AS BIGINT) AS n_cand,
         CAST(len(ref) AS BIGINT) AS n_ref,
         CAST(list_reduce(
           list_prepend(
             list_transform(range(0, len(ref) + 1), z -> 0),
             list_transform(range(1, len(cand) + 1),
                            i -> list_transform(range(0, len(ref) + 1), z -> i))
           ),
           (prev, irow) -> list_reduce(
             list_prepend([0], list_transform(range(1, len(ref) + 1),
                                              j -> [j, irow[1]])),
             (acc, x) -> list_append(acc,
                CASE WHEN cand[x[2]] = ref[x[1]]
                     THEN prev[x[1]] + 1
                     ELSE greatest(prev[x[1] + 1], acc[len(acc)]) END)
           )
         )[len(ref) + 1] AS BIGINT) AS lcs
  FROM prs
)
SELECT conv_id, field, n_cand, n_ref, lcs,
       round(lcs * 1.0 / n_cand, 6) AS rouge_l_p,
       round(lcs * 1.0 / n_ref, 6) AS rouge_l_r,
       CASE WHEN lcs = 0 THEN 0.0
            ELSE round(2.0 * (lcs * 1.0 / n_cand) * (lcs * 1.0 / n_ref)
                       / (lcs * 1.0 / n_cand + lcs * 1.0 / n_ref), 6) END
         AS rouge_l_f
FROM scored
"""
