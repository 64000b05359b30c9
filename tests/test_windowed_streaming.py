"""Event-time watermark semantics: late-data drop in windowed aggs and
bounded-state streaming dedup.

Batch boundaries are made deterministic by running two availableNow
passes over the same checkpoint: the watermark advances at the end of
run 1 and is recovered from the checkpoint for run 2, so run 2's late
rows are genuinely behind a persisted watermark (the restart-safety
property, not just intra-run ordering)."""

import os
from datetime import datetime

from blockchain_etl_spark.streaming.windowed import (
    dedup_within_watermark,
    windowed_event_counts,
)

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _land(spark, d, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, name)
    )


def _t(mm, ss):
    return datetime(2026, 1, 1, 10, mm, ss)


def _run(spark, landing, ckpt, transform, sink_rows):
    stream = spark.readStream.schema(SCHEMA).parquet(os.path.join(landing, "*"))

    def collect(batch_df, _bid):
        sink_rows.extend(batch_df.collect())

    q = (
        transform(stream)
        .writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    got = []

    # run 1: three rows in window [10:00, 10:01) plus one at 10:04 that
    # advances the watermark to 10:02 (2 min delay) when the run ends.
    _land(spark, landing, "b0", [
        (1, _t(0, 10), "click", 1.0),
        (2, _t(0, 20), "click", 2.0),
        (3, _t(0, 40), "view", 1.5),
        (4, _t(4, 0), "click", 9.0),
    ])
    _run(spark, landing, ckpt, windowed_event_counts, got)

    # run 2 (checkpoint-recovered watermark = 10:02): a LATE row for the
    # closed 10:00 window — must be dropped, not re-emitted nor merged —
    # and a fresh row that closes the 10:04 window.
    _land(spark, landing, "b1", [
        (5, _t(0, 50), "click", 100.0),
        (6, _t(7, 0), "view", 1.0),
    ])
    _run(spark, landing, ckpt, windowed_event_counts, got)

    rows = {
        (r["window_start"].minute, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in got
    }
    # the 10:00 window emitted exactly once, WITHOUT the late row 5
    # (its 100.0 would show in sum_value)
    assert rows[(0, "click")] == (2, 3.0)
    assert rows[(0, "view")] == (1, 1.5)
    # the 10:04 window closed in run 2; 10:07 is still open in append mode
    assert rows[(4, "click")] == (1, 9.0)
    assert not any(m == 7 for m, _ in rows)
    assert len(got) == len(rows)  # every window emitted at most once


def test_dedup_within_watermark_bounded(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(landing)
    got = []

    _land(spark, landing, "b0", [
        (1, _t(0, 10), "click", 1.0),
        (1, _t(0, 11), "click", 1.0),   # in-batch duplicate id
        (2, _t(0, 30), "view", 2.0),
    ])
    _run(spark, landing, ckpt,
         lambda s: dedup_within_watermark(s, ["event_id"]), got)

    _land(spark, landing, "b1", [
        (1, _t(0, 40), "click", 1.0),   # cross-run duplicate, inside horizon
        (3, _t(1, 0), "click", 3.0),
    ])
    _run(spark, landing, ckpt,
         lambda s: dedup_within_watermark(s, ["event_id"]), got)

    assert sorted(r["event_id"] for r in got) == [1, 2, 3]
