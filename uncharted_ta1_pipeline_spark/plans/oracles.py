"""DuckDB oracle SQL — textual twins of plans/queries.py.

Every statement runs on the driver's pre-registered views (events, documents,
embeddings, ...).  Column names and double rounding (round(x, 6)) match the
Spark side exactly so the driver's order-insensitive value-hash agrees.
"""

from __future__ import annotations

from uncharted_ta1_pipeline_spark.sources.transcripts import (
    PROBES_CTE,
    TRANSCRIPTS_CTE,
)

_T = f"WITH {TRANSCRIPTS_CTE}"
_TP = f"WITH {TRANSCRIPTS_CTE},\n{PROBES_CTE}"

# canonical per-conversation ordering used by every window below
_ORD = "PARTITION BY conv_id ORDER BY ts, turn_idx"
_PAST = "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
_TOOL_USED = "CASE WHEN tool IS NOT NULL AND tool <> '' THEN 1 ELSE 0 END"

ORACLES: dict[str, str] = {}

ORACLES["ingest_ordered"] = f"""
{_T}
SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
FROM transcripts
"""

ORACLES["sessionize"] = f"""
{_T},
flagged AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN lag(epoch_us(ts)) OVER ({_ORD}) IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER ({_ORD}) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM transcripts
)
SELECT conv_id, turn_idx,
       CAST(sum(is_new) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
FROM flagged
"""

ORACLES["lag_lead"] = f"""
{_T}
SELECT conv_id, turn_idx,
       lag(role)  OVER ({_ORD}) AS prev_role,
       lead(role) OVER ({_ORD}) AS next_role,
       lag(tool)  OVER ({_ORD}) AS prev_tool,
       concat(coalesce(lag(role) OVER ({_ORD}), 'START'), '->', role) AS role_transition,
       round((epoch_us(ts) - lag(epoch_us(ts)) OVER ({_ORD})) / 1000000.0, 6) AS secs_since_prev
FROM transcripts
"""

ORACLES["cumulative"] = f"""
{_T},
flagged AS (
  SELECT *,
         CASE WHEN row_number() OVER (PARTITION BY conv_id, tool ORDER BY ts, turn_idx) = 1
                   AND tool IS NOT NULL AND tool <> ''
              THEN 1 ELSE 0 END AS first_tool_use
  FROM transcripts
)
SELECT conv_id, turn_idx,
       coalesce(count(*)              OVER ({_ORD} {_PAST}), 0) AS turns_so_far,
       CAST(coalesce(sum({_TOOL_USED})     OVER ({_ORD} {_PAST}), 0) AS BIGINT) AS tools_so_far,
       CAST(coalesce(sum(first_tool_use)   OVER ({_ORD} {_PAST}), 0) AS BIGINT) AS distinct_tools_so_far
FROM flagged
"""

ORACLES["rolling"] = f"""
{_T}
SELECT conv_id, turn_idx,
       coalesce(count(*)          OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 0) AS rolling_turns_5,
       CAST(coalesce(sum({_TOOL_USED}) OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rolling_tools_5,
       round(avg(signal)          OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 6) AS rolling_signal_mean_5
FROM transcripts
"""

ORACLES["ffill_tool"] = f"""
{_T}
SELECT conv_id, turn_idx,
       last_value(CASE WHEN tool IS NOT NULL AND tool <> '' THEN tool END IGNORE NULLS)
         OVER ({_ORD} {_PAST}) AS ffill_tool
FROM transcripts
"""

ORACLES["session_stats"] = f"""
{_T},
flagged AS (
  SELECT conv_id, turn_idx, ts, tool, role,
         CASE WHEN lag(epoch_us(ts)) OVER ({_ORD}) IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER ({_ORD}) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM transcripts
),
sess AS (
  SELECT *,
         CAST(sum(is_new) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
  FROM flagged
)
SELECT conv_id, session_id,
       count(*) AS n_turns,
       min(epoch_us(ts)) AS start_us,
       max(epoch_us(ts)) AS end_us,
       round((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0, 6) AS duration_s,
       CAST(sum({_TOOL_USED}) AS BIGINT) AS n_tool_turns,
       count(DISTINCT role) AS n_roles
FROM sess
GROUP BY conv_id, session_id
"""

ORACLES["conv_turn_rate"] = f"""
{_T},
rel AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS us,
         (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY conv_id)) / 1000000.0 AS ts_rel
  FROM transcripts
),
g AS (
  SELECT conv_id,
         count(*) AS n_turns,
         round((max(us) - min(us)) / 1000000.0, 6) AS duration_s,
         round(regr_slope(turn_idx, ts_rel), 6) AS turn_rate_slope
  FROM rel
  GROUP BY conv_id
)
SELECT conv_id, n_turns, duration_s, turn_rate_slope,
       round(CASE WHEN duration_s > 0 THEN (n_turns - 1) / duration_s END, 6) AS turn_rate
FROM g
"""

ORACLES["asof_features"] = f"""
{_TP},
flagged AS (
  SELECT conv_id, ts, turn_idx, role, tool,
         CASE WHEN lag(epoch_us(ts)) OVER ({_ORD}) IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER ({_ORD}) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM transcripts
),
state AS (
  SELECT conv_id, ts, turn_idx,
         role AS last_role,
         CAST(row_number() OVER ({_ORD}) AS BIGINT) AS turns_incl,
         CAST(sum({_TOOL_USED}) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tools_incl,
         CAST(sum(is_new) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS last_session_id
  FROM flagged
),
-- tie-explicit: ASOF JOIN on probe_ts >= ts is ambiguous when several state
-- rows share a ts; the engine deterministically keeps the LAST by turn_idx,
-- so pre-reduce state to one row per (conv_id, ts) the same way.
state_dedup AS (
  SELECT * EXCLUDE (_rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, ts
                                 ORDER BY turn_idx DESC) AS _rn
    FROM state
  ) WHERE _rn = 1
)
SELECT p.probe_id, p.conv_id,
       epoch_us(p.probe_ts) AS probe_ts_us,
       s.turn_idx AS matched_turn_idx,
       s.last_role, s.turns_incl, s.tools_incl, s.last_session_id
FROM probes p
ASOF LEFT JOIN state_dedup s
  ON p.conv_id = s.conv_id AND p.probe_ts >= s.ts
"""

# Fit-predict-at-probe: cumulative INTEGER sufficient statistics (exact in
# both engines regardless of accumulation order), as-of matched to the last
# observation at or before the probe, OLS recovered in double at the end.
ORACLES["asof_fit_predict"] = f"""
{_TP},
obs AS (
  SELECT conv_id, ts, turn_idx,
         min(epoch_us(ts)) OVER (PARTITION BY conv_id) AS first_us,
         CAST(floor((epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY conv_id))
              / 1000000) AS BIGINT) AS x,
         CAST(floor(signal * 100 + 0.5) AS BIGINT) AS yc
  FROM transcripts
),
stats AS (
  SELECT conv_id, ts, turn_idx, first_us,
         CAST(count(*) OVER w AS BIGINT) AS n_obs,
         CAST(sum(x)     OVER w AS BIGINT) AS sx,
         CAST(sum(yc)    OVER w AS BIGINT) AS sy,
         CAST(sum(x * yc) OVER w AS BIGINT) AS sxy,
         CAST(sum(x * x)  OVER w AS BIGINT) AS sxx
  FROM obs
  WINDOW w AS ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
stats_dedup AS (
  SELECT * EXCLUDE (_rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, ts
                                 ORDER BY turn_idx DESC) AS _rn
    FROM stats
  ) WHERE _rn = 1
),
joined AS (
  SELECT p.probe_id, p.conv_id, epoch_us(p.probe_ts) AS probe_ts_us,
         s.first_us, s.n_obs, s.sx, s.sy, s.sxy, s.sxx
  FROM probes p
  ASOF LEFT JOIN stats_dedup s
    ON p.conv_id = s.conv_id AND p.probe_ts >= s.ts
),
fit AS (
  SELECT probe_id, conv_id, probe_ts_us, n_obs,
         CAST(n_obs AS DOUBLE) AS n,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
         CAST(floor((probe_ts_us - first_us) / 1000000) AS DOUBLE) AS xp,
         CAST(n_obs AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denom
  FROM joined
),
final AS (
  SELECT probe_id, conv_id, probe_ts_us, n_obs,
         n_obs >= 2 AND denom > 0 AS can_fit,
         (n * sxyd - sxd * syd) / denom AS slope_c,
         (syd - ((n * sxyd - sxd * syd) / denom) * sxd) / n AS intercept_c,
         syd / n AS mean_c, xp
  FROM fit
)
-- "+ 0" sign-normalizes IEEE -0.0 to +0.0 (DuckDB round keeps the sign of a
-- tiny negative value; Spark's does not — the driver's value hash would see
-- 10 differing rows at sf0.01 otherwise).  NULL + 0 stays NULL.
SELECT probe_id, conv_id, probe_ts_us, n_obs,
       round(CASE WHEN can_fit THEN slope_c / 100 END, 6) + 0 AS slope,
       round(CASE WHEN can_fit THEN intercept_c / 100 ELSE mean_c / 100 END, 6) + 0 AS intercept,
       round(CASE WHEN can_fit THEN (intercept_c + slope_c * xp) / 100
                  ELSE mean_c / 100 END, 6) + 0 AS pred
FROM final
"""

# Same semantics, different Spark physical strategy — one oracle text.
ORACLES["asof_fit_predict_bucketed"] = ORACLES["asof_fit_predict"]

ORACLES["role_entropy"] = f"""
{_T},
tr AS (
  SELECT conv_id, concat(prev_role, '>', role) AS transition
  FROM (
    SELECT conv_id, role, lag(role) OVER ({_ORD}) AS prev_role
    FROM transcripts
  ) WHERE prev_role IS NOT NULL
),
cnt AS (
  SELECT conv_id, transition, count(*) AS c FROM tr GROUP BY conv_id, transition
),
dom AS (
  SELECT conv_id, transition, c,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY c DESC, transition ASC) AS rn
  FROM cnt
),
agg AS (
  SELECT conv_id, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(c * c) AS BIGINT) AS ss
  FROM cnt GROUP BY conv_id
)
SELECT a.conv_id,
       a.n AS n_transitions,
       a.k AS n_distinct,
       d.transition AS dominant_transition,
       round(d.c * 1.0 / a.n, 6) AS dominant_share,
       round(a.ss * 1.0 / (a.n * a.n), 6) AS hhi,
       round(a.n * a.n * 1.0 / a.ss, 6) AS eff_transitions
FROM agg a JOIN (SELECT * FROM dom WHERE rn = 1) d ON a.conv_id = d.conv_id
"""

# Exactness twin of operators/convstats.gap_quantile_features: percentiles
# over INTEGER microsecond gaps (h=(n-1)p interpolation over int64 is exact
# in double in both engines), fence in exact micros, each percentile rounded
# to a whole µs before the single /1e6 so round(6) never sits on a decimal
# half-boundary.
ORACLES["gap_quantiles"] = f"""
{_T},
g AS (
  SELECT conv_id, CAST(us - prev_us AS BIGINT) AS gap_us
  FROM (
    SELECT conv_id, epoch_us(ts) AS us,
           lag(epoch_us(ts)) OVER ({_ORD}) AS prev_us
    FROM transcripts
  ) WHERE prev_us IS NOT NULL
),
q AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_gaps,
         quantile_cont(gap_us, 0.25) AS p25u,
         quantile_cont(gap_us, 0.5)  AS p50u,
         quantile_cont(gap_us, 0.75) AS p75u
  FROM g GROUP BY conv_id
)
SELECT g.conv_id,
       max(q.n_gaps) AS n_gaps,
       round(round(max(q.p25u)) / 1000000.0, 6) AS p25_gap_s,
       round(round(max(q.p50u)) / 1000000.0, 6) AS p50_gap_s,
       round(round(max(q.p75u)) / 1000000.0, 6) AS p75_gap_s,
       round((round(max(q.p75u)) - round(max(q.p25u))) / 1000000.0, 6)
         AS iqr_gap_s,
       round(sum(CASE WHEN g.gap_us > q.p75u + 1.5 * (q.p75u - q.p25u)
                      THEN 1 ELSE 0 END) * 1.0 / max(q.n_gaps), 6)
         AS outlier_share
FROM g JOIN q ON g.conv_id = q.conv_id
GROUP BY g.conv_id
"""

ORACLES["training_set"] = f"""
{_TP},
turn_state AS (
  SELECT conv_id, ts, turn_idx, role AS last_role, epoch_us(ts) AS turn_ts_us
  FROM transcripts
),
-- ASOF JOIN on probe_ts >= ts is ambiguous when state rows share a ts; the
-- engine keeps the LAST by turn_idx, so pre-reduce each view the same way.
turn_dedup AS (
  SELECT * EXCLUDE (_rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, ts
                                 ORDER BY turn_idx DESC) AS _rn
    FROM turn_state
  ) WHERE _rn = 1
),
tool_state AS (
  SELECT conv_id, ts, turn_idx, tool AS last_tool, epoch_us(ts) AS tool_ts_us
  FROM transcripts WHERE tool IS NOT NULL AND tool <> ''
),
tool_dedup AS (
  SELECT * EXCLUDE (_rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, ts
                                 ORDER BY turn_idx DESC) AS _rn
    FROM tool_state
  ) WHERE _rn = 1
)
SELECT p.probe_id, p.conv_id,
       epoch_us(p.probe_ts) AS probe_ts_us,
       a.last_role, a.turn_ts_us, b.last_tool, b.tool_ts_us,
       -- null-skipping greatest, spelled out (Spark greatest skips NULLs)
       CASE WHEN a.turn_ts_us IS NULL THEN b.tool_ts_us
            WHEN b.tool_ts_us IS NULL THEN a.turn_ts_us
            WHEN a.turn_ts_us >= b.tool_ts_us THEN a.turn_ts_us
            ELSE b.tool_ts_us END AS max_feature_ts_us,
       coalesce(
         CASE WHEN a.turn_ts_us IS NULL THEN b.tool_ts_us
              WHEN b.tool_ts_us IS NULL THEN a.turn_ts_us
              WHEN a.turn_ts_us >= b.tool_ts_us THEN a.turn_ts_us
              ELSE b.tool_ts_us END <= epoch_us(p.probe_ts),
         TRUE) AS leak_ok
FROM probes p
ASOF LEFT JOIN turn_dedup a
  ON p.conv_id = a.conv_id AND p.probe_ts >= a.ts
ASOF LEFT JOIN tool_dedup b
  ON p.conv_id = b.conv_id AND p.probe_ts >= b.ts
"""

# Same semantics, bucketed physical strategy — one oracle text.
ORACLES["training_set_bucketed"] = ORACLES["training_set"]

ORACLES["target_encode"] = f"""
{_T},
rows AS (
  SELECT conv_id, turn_idx, role AS category, signal,
         -- target quantized to 1e-6: integer sums are exact in any
         -- accumulation order (double sums can split a round(6) boundary)
         CAST(floor(signal * 1000000 + 0.5) AS BIGINT) AS sig_q,
         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS bucket
  FROM transcripts
),
per AS (
  SELECT category, bucket, CAST(sum(sig_q) AS BIGINT) AS s,
         count(signal) AS c
  FROM rows GROUP BY category, bucket
),
perc AS (
  SELECT category, bucket,
         sum(s) OVER (PARTITION BY category ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ps,
         sum(c) OVER (PARTITION BY category ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc
  FROM per
),
gtot AS (SELECT bucket, sum(s) AS gs, sum(c) AS gc FROM per GROUP BY bucket),
globc AS (
  SELECT bucket,
         sum(gs) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS gps,
         sum(gc) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS gpc
  FROM gtot
)
SELECT r.conv_id, r.turn_idx, r.category, r.bucket,
       CAST(coalesce(p.pc, 0) AS BIGINT) AS te_count,
       round(p.ps / (p.pc * 1000000.0), 6) AS te_mean,
       round((coalesce(p.ps, 0) / 1000000.0 + 10.0 * (g.gps / (g.gpc * 1000000.0)))
             / (coalesce(p.pc, 0) + 10.0), 6) AS te_smooth
FROM rows r
JOIN perc p ON r.category = p.category AND r.bucket = p.bucket
JOIN globc g ON r.bucket = g.bucket
"""

ORACLES["temporal_split"] = f"""
{_T},
cut AS (
  -- minute-quantized percentile (bounded distinct-value map at any corpus
  -- size), mapped back to micros — mirrors operators/sampling.py
  SELECT quantile_cont(floor(epoch_us(ts) / 60000000.0), 0.8) * 60000000.0
           AS c
  FROM transcripts
),
rows_s AS (
  SELECT conv_id, turn_idx,
         CASE WHEN epoch_us(ts) <= c THEN 'train'
              WHEN epoch_us(ts) <= c + 3600 * 1000000.0 THEN 'embargo'
              ELSE 'test' END AS split
  FROM transcripts CROSS JOIN cut
),
flags AS (
  SELECT conv_id,
         max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train,
         max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS has_test
  FROM rows_s GROUP BY conv_id
)
SELECT r.conv_id, r.turn_idx, r.split,
       (f.has_train + f.has_test) = 2 AS conv_straddles
FROM rows_s r JOIN flags f ON r.conv_id = f.conv_id
"""


# multi-horizon twin of ORACLES["rolling"] — same frames at widths 5/25/125
ORACLES["rolling_multi"] = f"""
{_T}
SELECT conv_id, turn_idx,
       coalesce(count(*)          OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 0) AS rolling_turns_5,
       CAST(coalesce(sum({_TOOL_USED}) OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rolling_tools_5,
       round(sum(CAST(floor(signal * 1000000) AS BIGINT)) OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) / (1000000.0 * count(*) OVER ({_ORD} ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)), 6) AS rolling_signal_mean_5,
       coalesce(count(*)          OVER ({_ORD} ROWS BETWEEN 25 PRECEDING AND 1 PRECEDING), 0) AS rolling_turns_25,
       CAST(coalesce(sum({_TOOL_USED}) OVER ({_ORD} ROWS BETWEEN 25 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rolling_tools_25,
       round(sum(CAST(floor(signal * 1000000) AS BIGINT)) OVER ({_ORD} ROWS BETWEEN 25 PRECEDING AND 1 PRECEDING) / (1000000.0 * count(*) OVER ({_ORD} ROWS BETWEEN 25 PRECEDING AND 1 PRECEDING)), 6) AS rolling_signal_mean_25,
       coalesce(count(*)          OVER ({_ORD} ROWS BETWEEN 125 PRECEDING AND 1 PRECEDING), 0) AS rolling_turns_125,
       CAST(coalesce(sum({_TOOL_USED}) OVER ({_ORD} ROWS BETWEEN 125 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rolling_tools_125,
       round(sum(CAST(floor(signal * 1000000) AS BIGINT)) OVER ({_ORD} ROWS BETWEEN 125 PRECEDING AND 1 PRECEDING) / (1000000.0 * count(*) OVER ({_ORD} ROWS BETWEEN 125 PRECEDING AND 1 PRECEDING)), 6) AS rolling_signal_mean_125
FROM transcripts
"""


# winsorize twin: same integer-µ percentile + whole-µ fence discipline as
# gap_quantiles (quantile_cont over int64 is exact at p in {.25,.75})
ORACLES["winsorize"] = f"""
{_T},
g AS (
  SELECT conv_id, turn_idx,
         CAST(floor(signal * 1000000) AS BIGINT) AS q
  FROM transcripts
),
pct AS (
  SELECT conv_id,
         quantile_cont(q, 0.25) AS p25,
         quantile_cont(q, 0.75) AS p75
  FROM g GROUP BY conv_id
)
SELECT g.conv_id, g.turn_idx,
       round(least(greatest(g.q * 1.0,
                            round(p.p25 - 1.5 * (p.p75 - p.p25))),
                   round(p.p75 + 1.5 * (p.p75 - p.p25)))
             / 1000000.0, 6) AS signal_winsorized,
       CAST(CASE WHEN g.q < round(p.p25 - 1.5 * (p.p75 - p.p25))
                   OR g.q > round(p.p75 + 1.5 * (p.p75 - p.p25))
                 THEN 1 ELSE 0 END AS BIGINT) AS was_clipped
FROM g JOIN pct p ON g.conv_id = p.conv_id
"""


# tool-transition census twin: lag over the filtered tool stream, bounded
# bigram histogram, rank-with-ties top-k
ORACLES["tool_chain_ngrams"] = f"""
{_T},
t AS (
  SELECT conv_id, ts, turn_idx, tool FROM transcripts
  WHERE tool IS NOT NULL AND tool <> ''
),
b AS (
  SELECT conv_id, lag(tool) OVER ({_ORD}) AS prev, tool FROM t
),
big AS (
  SELECT conv_id, prev || '>' || tool AS bigram FROM b WHERE prev IS NOT NULL
),
c AS (
  SELECT bigram,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
  FROM big GROUP BY bigram
),
r AS (
  SELECT *,
         round(n_occurrences * 1.0 / sum(n_occurrences) OVER (), 6) AS share,
         CAST(rank() OVER (ORDER BY n_occurrences DESC, bigram) AS BIGINT) AS rk
  FROM c
)
SELECT bigram, n_occurrences, n_convs, share, rk FROM r WHERE rk <= 20
"""


# same-tool run census twin: gaps-and-islands in two window levels (DuckDB
# disallows nesting the lag inside the cumsum), QUALIFY for the best run
ORACLES["tool_loops"] = f"""
{_T},
t AS (
  SELECT conv_id, ts, turn_idx, tool FROM transcripts
  WHERE tool IS NOT NULL AND tool <> ''
),
flagged AS (
  SELECT conv_id, ts, turn_idx, tool,
         CASE WHEN lag(tool) OVER ({_ORD}) IS NULL
                OR tool <> lag(tool) OVER ({_ORD})
              THEN 1 ELSE 0 END AS brk
  FROM t
),
runs_raw AS (
  SELECT conv_id, tool,
         sum(brk) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM flagged
),
runs AS (
  SELECT conv_id, run, CAST(count(*) AS BIGINT) AS run_len, min(tool) AS tool
  FROM runs_raw GROUP BY conv_id, run
),
best AS (
  SELECT conv_id, run_len AS max_run_len, tool AS max_run_tool
  FROM runs
  QUALIFY row_number() OVER (PARTITION BY conv_id
                             ORDER BY run_len DESC, run ASC) = 1
),
agg AS (
  SELECT conv_id,
         CAST(sum(run_len) AS BIGINT) AS n_tool_turns,
         CAST(count(*) AS BIGINT) AS n_runs,
         CAST(sum(CASE WHEN run_len >= 3 THEN run_len ELSE 0 END) AS BIGINT)
           AS loop_turns
  FROM runs GROUP BY conv_id
)
SELECT a.conv_id, a.n_tool_turns, a.n_runs, b.max_run_len, b.max_run_tool,
       round(a.loop_turns * 1.0 / a.n_tool_turns, 6) AS loop_share
FROM agg a JOIN best b ON a.conv_id = b.conv_id
"""


# user->assistant adjacency latency twin: integer-µs statistics, whole-µs
# round before the single /1e6 (the gap_quantiles exactness contract)
ORACLES["assistant_latency"] = f"""
{_T},
g AS (
  SELECT conv_id,
         role, lag(role) OVER ({_ORD}) AS prev_role,
         epoch_us(ts) - lag(epoch_us(ts)) OVER ({_ORD}) AS lat_us
  FROM transcripts
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_responses,
       round(round(CAST(sum(lat_us) AS DOUBLE) / count(*), 0) / 1000000.0, 6)
         AS mean_latency_s,
       round(round(quantile_cont(lat_us, 0.5), 0) / 1000000.0, 6)
         AS p50_latency_s,
       round(round(CAST(max(lat_us) AS DOUBLE), 0) / 1000000.0, 6)
         AS max_latency_s
FROM g
WHERE prev_role = 'user' AND role = 'assistant'
GROUP BY conv_id
"""


# conversation digest dedup twin: string_agg ORDER BY == array_sort on
# (us, turn_idx) structs; chr(31) unit separator; md5 hex on both engines
ORACLES["conv_digest_dedup"] = f"""
{_T},
d AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         md5(string_agg(role || ':' || text, chr(31) ORDER BY ts, turn_idx))
           AS conv_digest
  FROM transcripts GROUP BY conv_id
),
c AS (
  SELECT conv_digest, min(conv_id) AS canonical_conv_id
  FROM d GROUP BY conv_digest
)
SELECT d.conv_id, d.n_turns, d.conv_digest, c.canonical_conv_id,
       CAST(CASE WHEN d.conv_id <> c.canonical_conv_id THEN 1 ELSE 0 END
            AS BIGINT) AS is_dup
FROM d JOIN c ON d.conv_digest = c.conv_digest
"""


# per-group seeded-hash cap twin
ORACLES["per_group_sample"] = f"""
{_T},
h AS (
  SELECT conv_id, turn_idx,
         md5('pgs-v1' || '|' || conv_id || '|' || CAST(turn_idx AS VARCHAR))
           AS hh
  FROM transcripts
),
r AS (
  SELECT conv_id, turn_idx,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY hh, turn_idx)
              AS BIGINT) AS samp_rank
  FROM h
)
SELECT conv_id, turn_idx, samp_rank FROM r WHERE samp_rank <= 5
"""


# context-window twin: bounded list() window frame (oldest->newest, same
# order as Spark's collect_list over the ordered frame), higher-order
# filter keeps the token-budget suffix; list() over an EMPTY frame is NULL
# in DuckDB where Spark's collect_list is [] -> coalesce every derived
# output.  md5-over-0x1F-joined texts = the conv_digest_dedup convention.
ORACLES["context_window"] = f"""
{_T},
b AS (
  SELECT conv_id, turn_idx, ts, text,
         CAST(length(list_filter(string_split(text, ' '), w -> w <> ''))
              AS BIGINT) AS tok
  FROM transcripts
),
c AS (
  SELECT conv_id, turn_idx, ts, text, tok,
         CAST(sum(tok) OVER ({_ORD} ROWS BETWEEN UNBOUNDED PRECEDING AND
                             CURRENT ROW) AS BIGINT) AS cum
  FROM b
),
d AS (
  SELECT conv_id, turn_idx, tok, cum,
         list(struct_pack(cum := cum, tok := tok,
                          ti := CAST(turn_idx AS BIGINT), txt := text))
           OVER ({_ORD} ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS arr
  FROM c
),
e AS (
  SELECT conv_id, turn_idx, tok,
         list_filter(arr, s -> (cum - tok) - (s.cum - s.tok) <= 24) AS kept
  FROM d
)
SELECT conv_id, turn_idx, tok AS turn_tokens,
       CAST(coalesce(length(kept), 0) AS BIGINT) AS ctx_n_turns,
       CAST(coalesce(list_aggregate(list_transform(kept, s -> s.tok), 'sum'),
                     0) AS BIGINT) AS ctx_tokens,
       list_transform(kept, s -> s.ti)[1] AS ctx_first_turn_idx,
       md5(coalesce(array_to_string(list_transform(kept, s -> s.txt),
                                    chr(31)), '')) AS ctx_digest
FROM e
"""


# per-turn bigram novelty twin: distinct within-turn bigrams via
# range-indexed slices, first occurrence = min(turn_idx) per (conv, bigram)
ORACLES["turn_novelty"] = f"""
{_T},
t AS (
  SELECT conv_id, turn_idx,
         list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM transcripts
),
b AS (
  SELECT conv_id, turn_idx,
         unnest(list_distinct(list_transform(
           range(1, greatest(length(toks), 1)),
           i -> toks[i] || ' ' || toks[i + 1]))) AS bigram
  FROM t
),
f AS (
  SELECT conv_id, turn_idx, bigram,
         min(turn_idx) OVER (PARTITION BY conv_id, bigram) AS first_turn
  FROM b
)
SELECT conv_id, turn_idx,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN first_turn = turn_idx THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(sum(CASE WHEN first_turn = turn_idx THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS novelty_share
FROM f
GROUP BY conv_id, turn_idx
"""


# first-user-message template census twin
ORACLES["first_message_templates"] = f"""
{_T},
fm AS (
  SELECT conv_id,
         regexp_replace(lower(text), '[0-9]+', '#', 'g') AS template
  FROM (SELECT conv_id, text, row_number() OVER ({_ORD}) AS rn
        FROM transcripts WHERE role = 'user')
  WHERE rn = 1
),
c AS (
  SELECT template, CAST(count(*) AS BIGINT) AS n_convs,
         min(conv_id) AS example_conv_id
  FROM fm GROUP BY template
),
r AS (
  SELECT *,
         round(n_convs * 1.0 / sum(n_convs) OVER (), 6) AS share,
         CAST(rank() OVER (ORDER BY n_convs DESC, template) AS BIGINT) AS rk
  FROM c
)
SELECT template, n_convs, share, rk, example_conv_id FROM r WHERE rk <= 20
"""


# session-carryover twin: the sessionize two-level CTE (flag, then cumsum),
# reduced to one row per session, then lag/cumsum over the session stream
ORACLES["session_carryover"] = f"""
{_T},
flagged AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER ({_ORD}) IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER ({_ORD}) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM transcripts
),
st AS (
  SELECT conv_id, us,
         CAST(sum(is_new) OVER (PARTITION BY conv_id ORDER BY us, turn_idx
                                ROWS BETWEEN UNBOUNDED PRECEDING AND
                                CURRENT ROW) - 1 AS BIGINT) AS session_id
  FROM flagged
),
sess AS (
  SELECT conv_id, session_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         min(us) AS start_us, max(us) AS end_us
  FROM st GROUP BY conv_id, session_id
)
SELECT conv_id, session_id, n_turns,
       round(round(CAST(start_us - lag(end_us) OVER (PARTITION BY conv_id
                        ORDER BY session_id) AS DOUBLE), 0) / 1000000.0, 6)
         AS gap_since_prev_s,
       lag(n_turns) OVER (PARTITION BY conv_id ORDER BY session_id)
         AS prev_session_turns,
       CAST(coalesce(sum(n_turns) OVER (PARTITION BY conv_id
                     ORDER BY session_id ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS BIGINT) AS turns_before
FROM sess
"""


# per-tool latency census twin: integer-µs statistics, whole-µs round
# before the single /1e6 (the assistant_latency exactness contract)
ORACLES["tool_latency"] = f"""
{_T},
g AS (
  SELECT tool,
         lead(epoch_us(ts)) OVER ({_ORD}) - epoch_us(ts) AS gap_us
  FROM transcripts
)
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       round(round(CAST(sum(gap_us) AS DOUBLE) / count(*), 0) / 1000000.0, 6)
         AS mean_next_gap_s,
       round(round(quantile_cont(gap_us, 0.5), 0) / 1000000.0, 6)
         AS p50_next_gap_s,
       round(round(CAST(max(gap_us) AS DOUBLE), 0) / 1000000.0, 6)
         AS max_next_gap_s
FROM g
WHERE tool IS NOT NULL AND tool <> '' AND gap_us IS NOT NULL
GROUP BY tool
"""


# terminal-state twin: unique row_number positions (arg_max ties
# impossible); idle tail stays integer µs until one /1e6 + round(6)
ORACLES["conv_outcome"] = f"""
{_T},
t AS (
  SELECT conv_id, role, tool, epoch_us(ts) AS us,
         row_number() OVER ({_ORD}) AS rn
  FROM transcripts
),
corpus AS (SELECT max(epoch_us(ts)) AS corpus_us FROM transcripts)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       max_by(role, rn) AS last_role,
       max_by(tool, rn) FILTER (WHERE tool IS NOT NULL AND tool <> '')
         AS last_tool,
       CAST(CASE WHEN max_by(role, rn) = 'user' THEN 1 ELSE 0 END AS BIGINT)
         AS ends_unanswered,
       CAST(count(*) - coalesce(max(CASE WHEN role <> 'user' THEN rn END), 0)
            AS BIGINT) AS n_trailing_user,
       round((max(corpus_us) - max(us)) / 1000000.0, 6) AS idle_tail_s
FROM t CROSS JOIN corpus
GROUP BY conv_id
"""


# echo-rate twin: distinct bigram sets via the turn_novelty slice pattern;
# list_intersect/array_intersect are both set-semantics, so n_echoed agrees
ORACLES["echo_rate"] = f"""
{_T},
t AS (
  SELECT conv_id, turn_idx, role, ts,
         list_distinct(list_transform(
           range(1, greatest(length(toks), 1)),
           i -> toks[i] || ' ' || toks[i + 1])) AS bigrams
  FROM (SELECT conv_id, turn_idx, role, ts,
               list_filter(string_split(text, ' '), w -> w <> '') AS toks
        FROM transcripts)
),
p AS (
  SELECT conv_id, turn_idx, role, bigrams,
         lag(role)    OVER ({_ORD}) AS prev_role,
         lag(bigrams) OVER ({_ORD}) AS prev_bigrams
  FROM t
)
SELECT conv_id, turn_idx,
       CAST(length(bigrams) AS BIGINT) AS n_bigrams,
       CAST(length(list_intersect(bigrams, prev_bigrams)) AS BIGINT)
         AS n_echoed,
       round(length(list_intersect(bigrams, prev_bigrams)) * 1.0
             / length(bigrams), 6) AS echo_share
FROM p
WHERE role = 'assistant' AND prev_role = 'user' AND length(bigrams) >= 1
"""
