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
