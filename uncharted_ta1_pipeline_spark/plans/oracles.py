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
)
SELECT p.probe_id, p.conv_id,
       epoch_us(p.probe_ts) AS probe_ts_us,
       s.turn_idx AS matched_turn_idx,
       s.last_role, s.turns_incl, s.tools_incl, s.last_session_id
FROM probes p
ASOF LEFT JOIN state s
  ON p.conv_id = s.conv_id AND p.probe_ts >= s.ts
"""
