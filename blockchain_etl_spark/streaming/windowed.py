"""Event-time windowed aggregation + streaming dedup with watermarks.

The engine's exactly-once ledger handles LSN-ordered change streams;
these two operators cover the OTHER streaming shape the reference's
alert/track consumers imply (blockchainetl/streaming consumer loop):
wall-clock event-time analytics over a possibly-late, possibly-
duplicated stream.

- ``windowed_event_counts``: tumbling event-time window counts with a
  watermark — late rows beyond the watermark are dropped by Spark's
  state store, and in append mode a window only emits once it can no
  longer change. State size is bounded by (watermark horizon ×
  groups/window), independent of stream length — the property that
  matters at 10^10 events.

- ``dedup_within_watermark``: drop duplicate event ids that arrive
  within the watermark horizon (`dropDuplicatesWithinWatermark`), the
  streaming form of exact dedup: state holds only the horizon's keys
  instead of the full history that a plain ``dropDuplicates`` would
  accumulate forever.

Both are pure DataFrame declarations — they run on any streaming source
(file landing dir, the native changelog DataSource, Kafka once a broker
exists) and any sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    group_col: str = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window counts per group with late-data drop.

    Output: (window_start, window_end, <group_col>, n_events[,
    sum_value]) — ``sum_value`` only when ``value_col`` is given (pass
    None for count-only streams that carry no numeric payload).
    In append mode a row is final — downstream sinks never see a window
    twice (exactly-once friendly without a MERGE).
    """
    aggs = [F.count("*").alias("n_events")]
    out_cols = [
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        group_col,
        "n_events",
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
        out_cols.append(F.col("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(*aggs)
        .select(*out_cols)
    )


def session_window_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    watermark: str = "2 minutes",
    key_col: str = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """Streaming sessionization via Spark's native session windows: a
    key's consecutive events merge into one session while each arrives
    within ``gap`` of the session's end; the session closes (and, in
    append mode, emits exactly once) when the watermark passes its end.

    The streaming twin of the batch ``sessionize`` catalog row (lag +
    running-sum over a Window): same gaps-and-islands semantics, but
    state-store-backed so it runs unbounded — state holds only OPEN
    sessions inside the watermark horizon, independent of stream
    length, where the batch form needs the whole history per key.
    Session merging (a bridging late row joining two open sessions) is
    handled by the state store's session-merge path, which the lag
    formulation cannot express incrementally.

    Output: (key, session_start, session_end, n_events[, sum_value]).
    ``session_end`` is last-event-ts + gap (Spark's closed-session
    bound), so duration = end - start - gap.
    """
    aggs = [F.count("*").alias("n_events")]
    out_cols = [
        key_col,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
        out_cols.append(F.col("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(*aggs)
        .select(*out_cols)
    )


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Exactly-once-ish streaming dedup: duplicates of a key arriving
    within the watermark horizon are dropped; state is bounded by the
    horizon (keys expire), so this runs forever at constant memory."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
