"""Historical backfill below the committed watermark: finalized
history loads into a live table through the ordinary merge semantics
(old rows lose to present keys, absent keys insert), the watermark
never moves, version-domain change consumers see the commit, and the
unsafe cases (policy tables, reorg markers) are refused loudly."""

import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA, TARGET_SCHEMA
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _old_events(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_backfill_fills_gap_without_moving_watermark(spark, tmp_path, mode):
    t = SnapshotTable.create(spark, str(tmp_path / mode), TARGET_SCHEMA, n_buckets=4)
    eng = CdcEngine(spark, t, mode=mode, collect_metrics=False)
    # live stream starts at lsn 100+
    live = generate_changelog(seed=7, n_epochs=2, p_reorg_epoch=0.0)
    shifted = [
        [{**e, "lsn": e["lsn"] + 100, "stream_pos": e["stream_pos"] + 100} for e in ep]
        for ep in live
    ]
    for i, ep in enumerate(shifted):
        eng.apply_epoch(events_to_df(spark, ep), i)
    wm_before = dict(t.manifest().watermark)
    live_keys = {r["doc_id"] for r in read_state(t).collect()}
    some_live = sorted(live_keys)[0]

    # history below the stream cursor: one brand-new key (must insert),
    # one old version of a live key (must lose as stale)
    # EVENT_SCHEMA order: stream_pos, lsn, seq, op, doc_id, tokens,
    # n_tok, source, rollback_to_lsn, epoch_hash
    old = [
        (0, 5, 0, "I", "backfill-only", [1, 2], 2, "srcH", None, "h1"),
        (1, 6, 0, "U", some_live, [9, 9, 9], 3, "srcH", None, "h2"),
    ]
    metrics = eng.backfill_epoch(_old_events(spark, old), epoch_id=900)
    assert metrics is not None  # applied (collect_metrics off → sparse dict)
    assert dict(t.manifest().watermark) == wm_before  # never regresses/moves

    st = {r["doc_id"]: r["source"] for r in read_state(t).collect()}
    assert st["backfill-only"] == "srcH"  # gap filled
    assert st[some_live] != "srcH"  # stale history lost to the live row

    # final state == oracle over the COMBINED history, any order
    flat = [e for ep in shifted for e in ep] + [
        dict(zip([f.name for f in EVENT_SCHEMA.fields], r)) for r in old
    ]
    assert len(st) == len(oracle_replay(flat))

    # exactly-once: redelivering the same backfill is a no-op
    assert eng.backfill_epoch(_old_events(spark, old), epoch_id=900) is None


def test_backfill_visible_by_version_not_by_wal_position(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    live = [
        (200, 200, 0, "I", "live-1", [1], 1, "srcL", None, "x"),
    ]
    eng.apply_epoch(_old_events(spark, live), 0)
    v0 = t.current_version()
    wm_lsn = t.manifest().watermark["lsn"]
    old = [(0, 5, 0, "I", "hist-1", [1], 1, "srcH", None, "y")]
    eng.backfill_epoch(_old_events(spark, old), epoch_id=901)
    # version-domain CDF sees the backfill as an insert
    changed = {
        (r["_change_type"], r["doc_id"])
        for r in t.read_changes(v0, t.current_version()).collect()
    }
    assert ("insert", "hist-1") in changed
    # WAL-position delta from the live watermark does NOT (lsn 5 < wm)
    assert t.read_since_lsn(wm_lsn).filter("doc_id = 'hist-1'").count() == 0


def test_backfill_refuses_policy_tables_and_reorg_markers(spark, tmp_path):
    import pyspark.sql.types as T

    pol_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    tp = SnapshotTable.create(
        spark, str(tmp_path / "pol"), pol_schema, n_buckets=2,
        policies={"n": "add"},
    )
    ep = CdcEngine(spark, tp, mode="mor", collect_metrics=False)
    ev = spark.createDataFrame(
        [(0, 1, 0, "I", None, "a", 1)],
        T.StructType([
            T.StructField("stream_pos", T.LongType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("op", T.StringType()),
            T.StructField("rollback_to_lsn", T.LongType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("n", T.LongType()),
        ]),
    )
    with pytest.raises(ValueError, match="policy table"):
        ep.backfill_epoch(ev, epoch_id=1)

    t = SnapshotTable.create(spark, str(tmp_path / "lw"), TARGET_SCHEMA, n_buckets=2)
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    marked = _old_events(
        spark, [(0, 5, 0, "R", "k", None, None, None, 3, None)]
    )
    with pytest.raises(ValueError, match="reorg markers"):
        eng.backfill_epoch(marked, epoch_id=2)
