from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _setup(spark, tmp_path, n_epochs=4, **kw):
    epochs = generate_changelog(seed=9, n_epochs=n_epochs, **kw)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    store = EpochStore(spark, str(tmp_path / "s"))
    eng = CdcEngine(spark, table, epoch_store=store)
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        eng.apply_epoch(store.read_epoch(i), i)
    return epochs, table, eng


def test_vacuum_tombstones(spark, tmp_path):
    epochs, table, eng = _setup(spark, tmp_path, p_reorg_epoch=0.0, p_delete=0.3)
    full = table.read()
    n_ts = full.filter("deleted").count()
    assert n_ts > 0
    wm = table.manifest().watermark["lsn"]
    table.vacuum_tombstones(older_than_lsn=wm + 1)
    assert table.read().filter("deleted").count() == 0
    # logical state unchanged
    got = {r["doc_id"] for r in read_state(table).collect()}
    exp = set(oracle_replay([e for ep in epochs for e in ep]))
    assert got == exp


def test_gc_removes_old_versions_keeps_state(spark, tmp_path):
    epochs, table, eng = _setup(spark, tmp_path)
    before = {
        r["doc_id"]: list(r["tokens"]) for r in read_state(table).collect()
    }
    all_versions = table.versions()
    assert len(all_versions) > 2
    stats = table.gc(keep_last_versions=2)
    assert stats["manifests_removed"] == len(all_versions) - 2
    after = {r["doc_id"]: list(r["tokens"]) for r in read_state(table).collect()}
    assert after == before
    # time travel within the kept window still works
    kept = table.versions()
    assert len(kept) == 2
    assert table.read(version=kept[0]) is not None
