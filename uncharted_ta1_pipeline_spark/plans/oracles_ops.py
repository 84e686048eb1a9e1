"""DuckDB oracle SQL twins for plans/queries_ops.py."""

from __future__ import annotations

from uncharted_ta1_pipeline_spark.sources.transcripts import TRANSCRIPTS_CTE

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
small AS (SELECT * FROM g WHERE n < 40),
anchors AS (
  SELECT s.conv_id, s.n, s.lo, s.hi, CAST(u.a AS INTEGER) AS anchor_nr
  FROM small s, unnest([0, 1, 2, 3]) AS u(a)
)
SELECT conv_id, n AS n_turns, anchor_nr,
       lo + CAST(floor(anchor_nr * (hi - lo) / 3) AS BIGINT) AS anchor_ts_us
FROM anchors
"""

ORACLES_OPS["mad_outliers"] = f"""
{_T},
med AS (
  SELECT conv_id, quantile_cont(signal, 0.5) AS med
  FROM transcripts GROUP BY conv_id
),
dev AS (
  SELECT t.conv_id, t.turn_idx, t.signal, m.med,
         abs(t.signal - m.med) AS adev
  FROM transcripts t JOIN med m ON t.conv_id = m.conv_id
),
mad AS (
  SELECT conv_id, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY conv_id
)
SELECT d.conv_id, d.turn_idx,
       round(d.signal, 6) AS signal,
       round(d.med, 6) AS median,
       round(m.mad, 6) AS mad,
       CASE WHEN d.adev > 3.0 * m.mad + 1e-9 THEN 'OUTLIER' ELSE 'OK' END AS status
FROM dev d JOIN mad m ON d.conv_id = m.conv_id
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
