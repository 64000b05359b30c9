"""Golden end-to-end: engine replay must equal the single-threaded oracle
row-for-row (token-array equality included), across mixed I/U/D, invalid
payloads, duplicate redelivery, and reorg markers."""

import pytest

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.cdc.replay import replay_final_state
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _final_state_dict(df):
    return {
        r["doc_id"]: {
            "doc_id": r["doc_id"],
            "tokens": list(r["tokens"]) if r["tokens"] is not None else None,
            "n_tok": r["n_tok"],
            "source": r["source"],
            "lsn": r["lsn"],
            "seq": r["seq"],
        }
        for r in df.collect()
    }


def _run_engine(spark, tmp_path, epochs, redeliver=(), mode="mor"):
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id", n_buckets=8
    )
    store = EpochStore(spark, str(tmp_path / "store"))
    eng = CdcEngine(spark, table, epoch_store=store, mode=mode)
    for i, ev in enumerate(epochs):
        df = events_to_df(spark, ev)
        store.write_epoch(i, df)
        eng.apply_epoch(store.read_epoch(i), i)
        if i in redeliver:
            assert eng.apply_epoch(store.read_epoch(i), i) is None  # ledger skip
    return table, eng


@pytest.mark.parametrize("seed,mode", [(42, "mor"), (7, "mor"), (99, "mor"),
                                       (42, "cow"), (21, "cow")])
def test_engine_matches_oracle(spark, tmp_path, seed, mode):
    epochs = generate_changelog(seed=seed)
    flat = [e for ep in epochs for e in ep]
    expected = oracle_replay(flat)

    table, _ = _run_engine(spark, tmp_path, epochs, mode=mode)
    got = _final_state_dict(
        read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq")
    )
    assert got == expected


def test_inserts_only(spark, tmp_path):
    epochs = generate_changelog(seed=1, p_update=0.0, p_delete=0.0, p_reorg_epoch=0.0,
                                invalid_rate=0.0, n_epochs=3)
    flat = [e for ep in epochs for e in ep]
    table, _ = _run_engine(spark, tmp_path, epochs)
    got = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    assert got == oracle_replay(flat)
    assert len(got) > 0


def test_duplicate_epoch_redelivery_is_noop(spark, tmp_path):
    epochs = generate_changelog(seed=5, n_epochs=5)
    flat = [e for ep in epochs for e in ep]
    table, _ = _run_engine(spark, tmp_path, epochs, redeliver={1, 3})
    got = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    assert got == oracle_replay(flat)


def test_stale_partial_redelivery_dropped_by_guard(spark, tmp_path):
    """Re-applying an old epoch under a NEW epoch id (so the ledger does
    not catch it) must be a no-op thanks to the LSN-monotonic guard
    (≙ cond_upsert_on_blknum)."""
    epochs = generate_changelog(seed=11, n_epochs=4, p_reorg_epoch=0.0)
    flat = [e for ep in epochs for e in ep]
    table, eng = _run_engine(spark, tmp_path, epochs, mode="cow")
    before = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    df = events_to_df(spark, epochs[1])
    metrics = eng.apply_epoch(df, 999)  # new epoch id, old content
    assert metrics["n_insert"] == 0 and metrics["n_update"] == 0 and metrics["n_delete"] == 0
    assert metrics["n_stale"] > 0
    after = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    assert after == before == oracle_replay(flat)


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_reorg_reverts_and_replays(spark, tmp_path, mode):
    # force reorg on every epoch after the first: deep coverage of the
    # tombstone-then-reinsert path
    epochs = generate_changelog(seed=21, n_epochs=6, p_reorg_epoch=1.0, reorg_max_depth=8)
    flat = [e for ep in epochs for e in ep]
    assert any(e["op"] == "R" for e in flat)
    table, _ = _run_engine(spark, tmp_path, epochs, mode=mode)
    got = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    assert got == oracle_replay(flat)


def test_validation_rejects_bad_payloads(spark, tmp_path):
    epochs = generate_changelog(seed=31, n_epochs=3, invalid_rate=0.5, p_reorg_epoch=0.0)
    flat = [e for ep in epochs for e in ep]
    n_invalid = sum(
        1
        for e in flat
        if e["op"] in ("I", "U") and (e["tokens"] is None or e["n_tok"] != len(e["tokens"]))
    )
    assert n_invalid > 0
    table, eng = _run_engine(spark, tmp_path, epochs)
    got = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    assert got == oracle_replay(flat)


def test_declarative_replay_matches_engine_and_oracle(spark, tmp_path):
    epochs = generate_changelog(seed=13, n_epochs=6, p_reorg_epoch=0.5)
    flat = [e for ep in epochs for e in ep]
    df = events_to_df(spark, flat)
    for mode in ("collect", "window"):
        got = _final_state_dict(replay_final_state(df, markers=mode))
        assert got == oracle_replay(flat)


def test_metrics_lineage(spark, tmp_path):
    epochs = generate_changelog(seed=3, n_epochs=3, p_reorg_epoch=0.0)
    table, eng = _run_engine(spark, tmp_path, epochs)
    m = table.manifest()
    assert m.lineage["epoch_id"] == 2
    assert set(m.applied_epochs) == {0, 1, 2}
    rows = {r["epoch_id"]: r.asDict() for r in eng.read_metrics().collect()}
    assert set(rows) == {0, 1, 2}
    for i in range(3):
        assert rows[i]["n_events"] == len(epochs[i])
        assert rows[i]["lsn_min"] is not None and rows[i]["lsn_max"] >= rows[i]["lsn_min"]
        assert rows[i]["n_insert"] + rows[i]["n_delete"] >= 0
        assert rows[i]["merge_ms"] > 0


def test_mor_stale_redelivery_loses_at_read(spark, tmp_path):
    """MOR: stale rows appended under a new epoch id lose to newer rows
    in the read-time resolver — final state unchanged."""
    epochs = generate_changelog(seed=11, n_epochs=4, p_reorg_epoch=0.0)
    flat = [e for ep in epochs for e in ep]
    table, eng = _run_engine(spark, tmp_path, epochs, mode="mor")
    before = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    eng.apply_epoch(events_to_df(spark, epochs[1]), 999)
    after = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    assert after == before == oracle_replay(flat)


def test_mor_compaction_preserves_state(spark, tmp_path):
    epochs = generate_changelog(seed=61, n_epochs=5, p_reorg_epoch=0.3)
    flat = [e for ep in epochs for e in ep]
    table, eng = _run_engine(spark, tmp_path, epochs, mode="mor")
    before = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    assert table.delta_file_counts(), "expected delta files before compaction"
    table.compact()
    assert not table.delta_file_counts()
    after = _final_state_dict(read_state(table).select("doc_id", "tokens", "n_tok", "source", "lsn", "seq"))
    assert after == before == oracle_replay(flat)
    # tombstones survive compaction (stale-replay guard)
    assert table.read().filter("deleted").count() > 0


def test_apply_retries_through_commit_conflict(spark, tmp_path):
    """A concurrent writer stealing our next version must not fail the
    epoch: apply re-checks the ledger and re-derives against the fresh
    state, landing one version later with identical results."""
    from blockchain_etl_spark.tables.snapshot import Manifest, SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor")
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=1, lsn=1, seq=0, op="I", doc_id="a", tokens=[1],
             n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="e1")]),
        epoch_id=0)
    v = t.current_version()

    # competitor commits v+1 (a foreign epoch) before our next apply
    base = t.manifest()
    foreign = Manifest(
        version=v + 1, key=base.key, n_buckets=base.n_buckets,
        schema_version=base.schema_version, schemas=base.schemas,
        files=base.files, watermark=base.watermark,
        applied_epochs=base.applied_epochs + [999], parent=v,
        lineage={"who": "competitor"},
    )
    with open(t._manifest_path(foreign.version), "w") as f:
        f.write(foreign.to_json())

    m = eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=2, lsn=2, seq=0, op="I", doc_id="b", tokens=[2],
             n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="e2")]),
        epoch_id=1)
    assert m is not None
    assert t.current_version() == v + 2  # landed AFTER the competitor
    ledger = t.manifest().applied_epochs
    assert 1 in ledger and 999 in ledger  # both commits survived
    got = {r["doc_id"] for r in read_state(t).collect()}
    assert got == {"a", "b"}

    # if the competitor had applied OUR epoch, apply returns None (dedup)
    base = t.manifest()
    foreign2 = Manifest(
        version=base.version + 1, key=base.key, n_buckets=base.n_buckets,
        schema_version=base.schema_version, schemas=base.schemas,
        files=base.files, watermark=base.watermark,
        applied_epochs=base.applied_epochs + [7], parent=base.version,
        lineage={},
    )
    with open(t._manifest_path(foreign2.version), "w") as f:
        f.write(foreign2.to_json())
    assert eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=3, lsn=3, seq=0, op="I", doc_id="c", tokens=[3],
             n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="e3")]),
        epoch_id=7) is None


def test_semi_dedup_matches_aggregate_dedup(spark):
    """The two-pass broadcast-winners dedup (dedup_last_writer_semi)
    must select exactly the rows the aggregate form selects — same
    winner per key, same columns — on a changelog with heavy per-key
    redelivery and deletes."""
    from pyspark.sql import functions as F

    from blockchain_etl_spark.cdc.apply import (
        dedup_last_writer,
        dedup_last_writer_semi,
    )
    from blockchain_etl_spark.cdc.generator import generate_changelog_spark

    ev = generate_changelog_spark(spark, 30_000, n_docs=500, partitions=4)
    ev = ev.filter(F.col("op") != "R")
    a = dedup_last_writer(ev)
    b = dedup_last_writer_semi(ev)
    assert a.columns == b.columns
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
    assert len(rows_a) == ev.select("doc_id").distinct().count()

    # the cascade-hop shape: ONE event per key, and every event in the
    # batch shares ONE stream_pos (changes_to_events nets the range and
    # mints lsn=to_version, seq=0). A position-only winner join would
    # cross-match every key's winner (M x N blowup — the r7 bench
    # caught exactly that); the (doc_id, stream_pos) pair join must
    # reproduce the aggregate form row for row.
    flat = dedup_last_writer(ev).withColumn(
        "stream_pos", F.lit(7_340_032).cast("long")
    )
    fa = sorted(map(tuple, dedup_last_writer(flat).collect()))
    fb = sorted(map(tuple, dedup_last_writer_semi(flat).collect()))
    assert fa == fb
    assert len(fb) == flat.count()
