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
    session_window_agg,
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


def test_session_window_merges_gaps_and_emits_once(spark, tmp_path):
    """Native session windows: events within the 1-min gap chain into
    one session per key; a quiet gap starts a new session; a session
    emits exactly once, after the checkpoint-recovered watermark passes
    its end. A same-run row that bridges two would-be sessions must
    merge them (the state-store session-merge path the batch lag
    formulation can't do incrementally)."""
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt3")
    os.makedirs(landing)
    got = []
    sess = lambda s: session_window_agg(
        s, gap="1 minute", watermark="1 minute", key_col="event_type"
    )

    # run 1 — "click": 10:00:10 and 10:02:00 are >1min apart (two open
    # sessions) until 10:01:05 arrives in the SAME batch and bridges
    # them into one session [10:00:10, 10:03:00). "view" at 10:00:30 is
    # its own session. Row at 10:05:00 advances the watermark to
    # 10:04:00 at run end, closing both earlier sessions.
    _land(spark, landing, "b0", [
        (1, _t(0, 10), "click", 1.0),
        (2, _t(2, 0), "click", 2.0),
        (3, _t(1, 5), "click", 4.0),
        (4, _t(0, 30), "view", 1.5),
        (5, _t(5, 0), "click", 8.0),
    ])
    _run(spark, landing, ckpt, sess, got)

    rows = {
        (r["event_type"], r["session_start"].strftime("%M:%S")):
            (r["n_events"], r["sum_value"], r["session_end"].strftime("%M:%S"))
        for r in got
    }
    # one merged click session: 3 events, ends at last-ts + gap
    assert rows[("click", "00:10")] == (3, 7.0, "03:00")
    assert rows[("view", "00:30")] == (1, 1.5, "01:30")
    # the 10:05 session is still open (watermark 10:04 < its end 10:06)
    assert not any(start == "05:00" for _, start in rows)

    # run 2 (recovered watermark 10:04): a LATE click at 10:00:50 falls
    # behind the watermark — dropped, not re-opening the closed session;
    # a fresh row at 10:09 closes the 10:05 session.
    _land(spark, landing, "b1", [
        (6, _t(0, 50), "click", 100.0),
        (7, _t(9, 0), "view", 1.0),
    ])
    _run(spark, landing, ckpt, sess, got)

    rows2 = {
        (r["event_type"], r["session_start"].strftime("%M:%S")):
            (r["n_events"], r["sum_value"])
        for r in got
    }
    assert rows2[("click", "05:00")] == (1, 8.0)
    # closed session not re-emitted / not merged with the late row
    assert rows2[("click", "00:10")] == (3, 7.0)
    assert len(got) == len(rows2)


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
