"""Cascaded ingest: engine B tails engine A's table via read_changes →
changes_to_events, and converges to the same live state."""

import json

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.cascade import CascadeTailer, changes_to_events
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _live(table):
    return {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in read_state(SnapshotTable(table.spark, table.path)).collect()
    }


def _setup(spark, tmp_path, n_epochs=3, seed=91):
    epochs = generate_changelog(seed=seed, n_epochs=n_epochs, p_reorg_epoch=0.0)
    a = SnapshotTable.create(spark, str(tmp_path / "a"), TARGET_SCHEMA, n_buckets=8)
    b = SnapshotTable.create(spark, str(tmp_path / "b"), TARGET_SCHEMA, n_buckets=8)
    ea = CdcEngine(spark, a, collect_metrics=False)
    eb = CdcEngine(spark, b, collect_metrics=False)
    tailer = CascadeTailer(a, eb, str(tmp_path / "cursor.json"))
    return epochs, a, b, ea, tailer


def test_cascade_converges_per_hop(spark, tmp_path):
    epochs, a, b, ea, tailer = _setup(spark, tmp_path)
    for i, ep in enumerate(epochs):
        ea.apply_epoch(events_to_df(spark, ep), epoch_id=i)
        m = tailer.run_once()
        assert m is not None
        # B tracks A exactly after every hop — deletes included
        assert _live(b) == _live(a)
    # caught up → no-op
    assert tailer.run_once() is None


def test_cascade_catches_up_in_one_hop(spark, tmp_path):
    epochs, a, b, ea, tailer = _setup(spark, tmp_path, seed=92)
    for i, ep in enumerate(epochs):
        ea.apply_epoch(events_to_df(spark, ep), epoch_id=i)
    # one collapsed hop over the whole history: NET changes only
    tailer.run_once()
    assert _live(b) == _live(a)


def test_cascade_crash_redelivery_is_exactly_once(spark, tmp_path):
    epochs, a, b, ea, tailer = _setup(spark, tmp_path, seed=93)
    ea.apply_epoch(events_to_df(spark, epochs[0]), epoch_id=0)
    tailer.run_once()
    # crash between apply and cursor write: rewind the cursor file. The
    # FIRST recovery layer — the range stamped in b's manifest lineage —
    # makes this a clean no-op (no redelivery at all).
    with open(tailer.cursor_path, "w") as f:
        json.dump({"version": 0}, f)
    assert tailer._cursor() == a.current_version()
    assert tailer.run_once() is None
    # SECOND layer: if the ledger walk also missed (e.g. the stamp aged
    # out of the walk window), the redelivered range dedups against the
    # destination's epoch ledger — state stays intact either way.
    with open(tailer.cursor_path, "w") as f:
        json.dump({"version": 0}, f)
    tailer._ledger_cursor = lambda max_walk=64: 0
    m = tailer.run_once()
    assert m == {"deduped_range": [0, a.current_version()]}
    assert _live(b) == _live(a)


def test_cascade_across_upstream_reorg(spark, tmp_path):
    # upstream replays a reorg (rollback commit + corrected re-apply);
    # the cascaded net changes must still converge B to A's final state
    epochs = generate_changelog(seed=94, n_epochs=4, p_reorg_epoch=0.6)
    a = SnapshotTable.create(spark, str(tmp_path / "a"), TARGET_SCHEMA, n_buckets=8)
    b = SnapshotTable.create(spark, str(tmp_path / "b"), TARGET_SCHEMA, n_buckets=8)
    from blockchain_etl_spark.streaming.epoch_store import EpochStore

    store = EpochStore(spark, str(tmp_path / "store"))
    ea = CdcEngine(spark, a, epoch_store=store, collect_metrics=False)
    eb = CdcEngine(spark, b, collect_metrics=False)
    tailer = CascadeTailer(a, eb, str(tmp_path / "cursor.json"))
    n_markers = 0
    for i, ep in enumerate(epochs):
        df = events_to_df(spark, ep)
        store.write_epoch(i, df)
        ea.apply_epoch(df, epoch_id=i)
        n_markers += sum(1 for e in ep if e["op"] == "R")
        tailer.run_once()
        assert _live(b) == _live(a)
    assert n_markers > 0, "seed must actually exercise the reorg path"


def test_delete_sequencing_uses_commit_lsn(spark, tmp_path):
    # insert at lsn 5, delete at lsn 9: the cascaded D must carry lsn 9
    # (the pre-image lsn 5 would be stale-guarded by B and ignored)
    a = SnapshotTable.create(spark, str(tmp_path / "da"), TARGET_SCHEMA, n_buckets=4)
    b = SnapshotTable.create(spark, str(tmp_path / "db"), TARGET_SCHEMA, n_buckets=4)
    ea = CdcEngine(spark, a, collect_metrics=False)
    eb = CdcEngine(spark, b, collect_metrics=False)
    ins = [dict(stream_pos=1, lsn=5, seq=0, op="I", doc_id="d1", tokens=[1, 2],
                n_tok=2, source="s", rollback_to_lsn=None, epoch_hash="e0")]
    ea.apply_epoch(events_to_df(spark, ins), epoch_id=0)
    tailer = CascadeTailer(a, eb, str(tmp_path / "cur.json"))
    tailer.run_once()
    assert "d1" in _live(b)

    dele = [dict(stream_pos=2, lsn=9, seq=0, op="D", doc_id="d1", tokens=None,
                 n_tok=None, source=None, rollback_to_lsn=None, epoch_hash="e1")]
    ea.apply_epoch(events_to_df(spark, dele), epoch_id=1)
    ch = a.read_changes(1)
    row = ch.filter("_change_type = 'delete'").first()
    assert row["lsn"] == 5 and row["_commit_lsn"] == 9
    # payload sequencing: D carries the tombstone's lsn, not the pre-image's
    ev = changes_to_events(ch, sequence_by="payload").filter("op = 'D'").first()
    assert ev["lsn"] == 9
    # commit-version sequencing (the default): D carries the version
    ev2 = changes_to_events(ch).filter("op = 'D'").first()
    assert ev2["lsn"] == a.current_version()
    tailer.run_once()
    assert "d1" not in _live(b)


def test_cascade_propagates_schema_evolution(spark, tmp_path):
    # upstream table evolves mid-stream (new payload column `lang`);
    # the cascaded events must carry it and evolve B's schema too
    from pyspark.sql import types as T

    a = SnapshotTable.create(spark, str(tmp_path / "a"), TARGET_SCHEMA, n_buckets=4)
    b = SnapshotTable.create(spark, str(tmp_path / "b"), TARGET_SCHEMA, n_buckets=4)
    ea = CdcEngine(spark, a, collect_metrics=False)
    eb = CdcEngine(spark, b, collect_metrics=False)
    tailer = CascadeTailer(a, eb, str(tmp_path / "cur.json"))

    ins = [dict(stream_pos=1, lsn=1, seq=0, op="I", doc_id="d1", tokens=[1],
                n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="e0")]
    ea.apply_epoch(events_to_df(spark, ins), epoch_id=0)
    tailer.run_once()

    evolved = spark.createDataFrame(
        [(2, 2, 0, "I", "d2", [2, 3], 2, "s", None, "e1", "en")],
        T.StructType(
            [
                T.StructField("stream_pos", T.LongType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("seq", T.IntegerType()),
                T.StructField("op", T.StringType()),
                T.StructField("doc_id", T.StringType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
                T.StructField("n_tok", T.IntegerType()),
                T.StructField("source", T.StringType()),
                T.StructField("rollback_to_lsn", T.LongType()),
                T.StructField("epoch_hash", T.StringType()),
                T.StructField("lang", T.StringType()),
            ]
        ),
    )
    ea.apply_epoch(evolved, epoch_id=1)
    assert "lang" in [f.name for f in a.manifest().schema().fields]

    ch = a.read_changes(tailer._cursor())
    ev = changes_to_events(ch)
    assert "lang" in ev.columns  # evolution flows through the hop
    tailer.run_once()
    rows = {r["doc_id"]: r for r in read_state(SnapshotTable(spark, b.path)).collect()}
    assert rows["d2"]["lang"] == "en"
    assert rows["d1"]["lang"] is None  # null-backfilled on old rows


def test_crash_then_upstream_advances_does_not_lose_transitions(spark, tmp_path):
    """The killer crash case: hop (0,v1] applies but the cursor write is
    lost; upstream then deletes a key added in that range. A re-diff from
    the stale cursor would emit nothing for the key (absent at 0, dead
    now) — the ledger-stamped cursor must resume from v1 instead."""
    a = SnapshotTable.create(spark, str(tmp_path / "ca"), TARGET_SCHEMA, n_buckets=4)
    b = SnapshotTable.create(spark, str(tmp_path / "cb"), TARGET_SCHEMA, n_buckets=4)
    ea = CdcEngine(spark, a, collect_metrics=False)
    eb = CdcEngine(spark, b, collect_metrics=False)
    tailer = CascadeTailer(a, eb, str(tmp_path / "cur.json"))

    ins = [dict(stream_pos=1, lsn=1, seq=0, op="I", doc_id="k", tokens=[1],
                n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="e0")]
    ea.apply_epoch(events_to_df(spark, ins), epoch_id=0)
    tailer.run_once()
    assert "k" in _live(b)
    # crash: the cursor write is lost
    import os

    os.remove(tailer.cursor_path)
    # upstream deletes k BEFORE the retry
    dele = [dict(stream_pos=2, lsn=2, seq=0, op="D", doc_id="k", tokens=None,
                 n_tok=None, source=None, rollback_to_lsn=None, epoch_hash="e1")]
    ea.apply_epoch(events_to_df(spark, dele), epoch_id=1)
    # retry: ledger cursor (stamped in b's manifest lineage) must win
    assert tailer._cursor() > 0
    tailer.run_once()
    assert "k" not in _live(b)
    assert _live(b) == _live(a)


def test_corrupt_cursor_file_recovers_from_ledger(spark, tmp_path):
    a = SnapshotTable.create(spark, str(tmp_path / "fa"), TARGET_SCHEMA, n_buckets=4)
    b = SnapshotTable.create(spark, str(tmp_path / "fb"), TARGET_SCHEMA, n_buckets=4)
    ea = CdcEngine(spark, a, collect_metrics=False)
    eb = CdcEngine(spark, b, collect_metrics=False)
    tailer = CascadeTailer(a, eb, str(tmp_path / "cur.json"))
    ins = [dict(stream_pos=1, lsn=1, seq=0, op="I", doc_id="x", tokens=[1],
                n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="e0")]
    ea.apply_epoch(events_to_df(spark, ins), epoch_id=0)
    tailer.run_once()
    with open(tailer.cursor_path, "w") as f:
        f.write("")  # torn write
    assert tailer._cursor() == a.current_version()
    assert tailer.run_once() is None  # caught up, no crash


def test_stale_high_cursor_from_recreated_dst_is_discarded(spark, tmp_path):
    """A cursor file surviving a dst delete+recreate is stale-HIGH: its
    version belongs to the previous incarnation, and max()ing it against
    the fresh ledger would skip every upstream change until the upstream
    version passed it. The table_uid binding discards it instead."""
    import shutil

    a = SnapshotTable.create(spark, str(tmp_path / "sa"), TARGET_SCHEMA, n_buckets=4)
    b_path = str(tmp_path / "sb")
    b = SnapshotTable.create(spark, b_path, TARGET_SCHEMA, n_buckets=4)
    ea = CdcEngine(spark, a, collect_metrics=False)
    tailer = CascadeTailer(a, CdcEngine(spark, b, collect_metrics=False),
                           str(tmp_path / "scur.json"))
    ins = [dict(stream_pos=i, lsn=i, seq=0, op="I", doc_id=f"d{i}", tokens=[i],
                n_tok=1, source="s", rollback_to_lsn=None, epoch_hash=f"e{i}")
           for i in range(1, 4)]
    for i, e in enumerate(ins):
        ea.apply_epoch(events_to_df(spark, [e]), epoch_id=i)
        tailer.run_once()
    assert _live(b) == _live(a)

    # destination wiped and recreated — the cursor file survives
    shutil.rmtree(b_path)
    b2 = SnapshotTable.create(spark, b_path, TARGET_SCHEMA, n_buckets=4)
    tailer2 = CascadeTailer(a, CdcEngine(spark, b2, collect_metrics=False),
                            str(tmp_path / "scur.json"))
    assert tailer2._cursor() == 0  # stale-HIGH file cursor discarded
    assert tailer2.run_once() is not None  # full re-sync, not a silent skip
    assert _live(b2) == _live(a)
