"""Streaming analytics over event streams (beyond the reference's scope —
its streaming is incremental index upkeep, covered by incremental.py; this
module is the stream-processing surface a training-data pipeline needs,
built on Structured Streaming primitives).

Shapes, most-declarative first (per the Spark-first rule: built-in operators
unless semantics genuinely need custom state):

- :func:`windowed_rollup` — tumbling/sliding event-time windows + watermark
  for late data. Pure built-ins; state store bounded by the watermark.
- :func:`sessionized` — per-key session windows via the built-in
  ``session_window`` (gap-based), watermarked.
- :func:`running_user_stats` — the ONE custom stateful operator:
  ``applyInPandasWithState`` keeping a per-user running (count, value_sum,
  last_ts) that built-in aggs can't emit incrementally per batch with
  timeout-based finalization.

All take a streaming OR batch DataFrame of the events shape
(event_id, ts timestamp, user_id, event_type, value) — the TESTDATA events
table; watermarks are ignored on batch frames, so every operator is also
directly testable/oracle-able in batch mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed counts/sums per event_type. On a stream the
    watermark bounds state and drops events later than ``watermark``;
    emitted columns are (window_start, window_end, event_type, cnt,
    value_sum)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "value_sum",
        )
    )


def sessionized(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user sessions: consecutive events within ``gap`` collapse into one
    session row (session_start, session_end, n_events, value_sum). Built-in
    ``session_window`` — dynamic, gap-based event-time windows."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


# state schema: running count, value sum, last event ts (epoch seconds)
_STATE_SCHEMA = "cnt long, vsum double, last_ts long"
_OUT_SCHEMA = "user_id long, cnt long, vsum double, last_ts timestamp"


def running_user_stats(events: DataFrame, timeout_minutes: int = 60) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running event count + value sum, emitted every micro-batch an update
    arrives (built-in streaming aggs can't emit incremental per-key updates
    with idle-timeout finalization). State times out after
    ``timeout_minutes`` of processing-time inactivity — bounded state for
    unbounded key spaces, the 100 TB requirement."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        user_id = key[0]
        if state.hasTimedOut:
            cnt, vsum, last = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "cnt": [cnt], "vsum": [vsum],
                 "last_ts": [pd.Timestamp(last, unit="s")]}
            )
            return
        cnt, vsum, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            cnt += len(pdf)
            vsum += float(pdf["value"].fillna(0.0).sum())
            if len(pdf):
                last = max(last, int(pdf["ts"].max().timestamp()))
        state.update((cnt, vsum, last))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [user_id], "cnt": [cnt], "vsum": [vsum],
             "last_ts": [pd.Timestamp(last, unit="s")]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
