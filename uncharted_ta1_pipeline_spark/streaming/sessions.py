"""Structured Streaming variants of the engine's stateful stages.

The reference's streaming layer is queue-orchestration (RabbitMQ
at-least-once with bounded redelivery, /root/reference/tasks/common/
request_client.py:161-262) — no event-time semantics.  The engine's primary
mode is therefore batch + resumable manifests (SURVEY.md §2.10).  These
streaming variants exist for incremental ingestion of live transcript
feeds:

- ``stream_sessionize``: gap-based sessions via ``session_window`` +
  watermark (late turns beyond the watermark are dropped, mirroring the
  queue's bounded redelivery discipline);
- ``stream_running_features``: per-conversation running counters via
  ``applyInPandasWithState`` (GroupState timeout cleans up idle
  conversations).

Both read any streaming source with the canonical transcript schema
(file/kafka/rate); checkpointing is Spark's own streaming checkpoint.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, session_start timestamp, session_end timestamp, "
    "n_turns long, n_tool_turns long"
)

RUNNING_SCHEMA = "conv_id string, turns_so_far long, tools_so_far long"
STATE_SCHEMA = "turns long, tools long"


def stream_sessionize(
    stream: DataFrame, gap_s: int = 1800, watermark_s: int = 3600
) -> DataFrame:
    """Gap-based session aggregation over an event-time stream."""
    return (
        stream.withWatermark("ts", f"{watermark_s} seconds")
        .groupBy(
            F.col("conv_id"),
            F.session_window(F.col("ts"), f"{gap_s} seconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(
                (F.col("tool").isNotNull() & (F.col("tool") != "")).cast("long")
            ).alias("n_tool_turns"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
            "n_tool_turns",
        )
    )


def running_update(key, pdfs, state: GroupState):
    """GroupState update for stream_running_features (module-level so the
    timeout branch is unit-testable with a fake GroupState)."""
    import pandas as pd

    if state.hasTimedOut:
        # idle-conversation cleanup: drop the state, emit nothing, and
        # do NOT re-arm the timer (re-arming would keep idle state alive
        # forever and grow the store unboundedly).
        state.remove()
        return
    turns, tools = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        turns += len(pdf)
        tools += int(((pdf["tool"].notna()) & (pdf["tool"] != "")).sum())
    state.update((turns, tools))
    state.setTimeoutDuration(24 * 3600 * 1000)
    yield pd.DataFrame(
        {"conv_id": [key[0]], "turns_so_far": [turns], "tools_so_far": [tools]}
    )


def stream_dedup(stream: DataFrame, watermark_s: int = 3600) -> DataFrame:
    """Streaming exact dedup — the incremental twin of
    ``operators.dedup.dedup_exact``: drop turns whose (conv_id, content
    digest) was already seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps the dedup state bounded: keys
    older than the watermark are evicted, so state size tracks the event-
    time horizon instead of the stream's full history — the only dedup
    shape that survives an unbounded 10^12-turn feed.  (Exactly-once within
    the horizon; re-sends beyond it are the at-least-once residue the
    batch-layer digest dedup removes, mirroring the reference queue's
    bounded-redelivery discipline, request_client.py:253-262.)

    The digest includes the event time ``ts``: a queue redelivery replays
    the SAME event (same event time), while two genuinely distinct turns
    with identical (role, text, tool) — e.g. a user sending "ok" twice,
    minutes apart — differ in ``ts`` and must both survive.  Content-only
    digests would silently collapse the second "ok" (ADVICE r3)."""
    digest = F.sha2(
        F.concat_ws(
            "\x1f",
            F.col("conv_id"),
            F.unix_micros(F.col("ts")).cast("string"),
            F.coalesce(F.col("role"), F.lit("")),
            F.coalesce(F.col("text"), F.lit("")),
            F.coalesce(F.col("tool"), F.lit("")),
        ),
        256,
    )
    return (
        stream.withColumn("digest", digest)
        .withWatermark("ts", f"{watermark_s} seconds")
        .dropDuplicatesWithinWatermark(["conv_id", "digest"])
        .drop("digest")  # helper column; output schema == input schema
    )


def stream_running_features(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-conversation counters kept in
    GroupState across micro-batches (the streaming twin of
    operators.windows.with_cumulative)."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        running_update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
