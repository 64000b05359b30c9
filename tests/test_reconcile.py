from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.cdc.reconcile import reconcile
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def test_reconcile_repairs_unapplied_epochs(spark, tmp_path):
    """Crash between landing and apply (epochs 2,3 landed, never applied)
    → reconcile detects and re-applies them exactly-once."""
    epochs = generate_changelog(seed=37, n_epochs=4, p_reorg_epoch=0.0)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "s"))
    eng = CdcEngine(spark, table, epoch_store=store)
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        if i < 2:  # "crash" before applying 2 and 3
            eng.apply_epoch(store.read_epoch(i), i)

    rep = reconcile(eng)
    assert rep["unapplied_epochs"] == [2, 3]
    assert rep["reapplied"] == [2, 3]
    assert rep["duplicate_doc_ids"] == 0

    got = {
        r["doc_id"]: list(r["tokens"]) for r in read_state(table).collect()
    }
    exp = {k: v["tokens"] for k, v in
           oracle_replay([e for ep in epochs for e in ep]).items()}
    assert got == exp
    # second reconcile: clean
    rep2 = reconcile(eng)
    assert rep2["unapplied_epochs"] == []


def test_reconcile_reports_missing_lsns(spark, tmp_path):
    epochs = generate_changelog(seed=43, n_epochs=2, p_reorg_epoch=0.0)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "s"))
    eng = CdcEngine(spark, table, epoch_store=store)
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        eng.apply_epoch(store.read_epoch(i), i)
    max_lsn = max(e["lsn"] for ep in epochs for e in ep)
    rep = reconcile(eng, expected_lsn_range=(0, max_lsn + 5))
    assert rep["missing_lsns"] == [max_lsn + i for i in range(1, 6)]


def test_reconcile_on_pruned_store_reports_loss_not_crash(spark, tmp_path):
    """Retention GC must not break the audit: reconcile over a pruned
    store completes, skips pruned epochs in the missing-LSN scan, and
    surfaces a landed-but-never-applied epoch that was pruned as
    unrecoverable loss instead of reporting clean."""
    from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
    from blockchain_etl_spark.cdc.reconcile import reconcile

    epochs = generate_changelog(seed=61, n_epochs=5, p_reorg_epoch=0.0)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "store"))
    eng = CdcEngine(spark, table, epoch_store=store)
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        if i != 1:  # epoch 1 lands but is never applied (crash window)
            eng.apply_epoch(store.read_epoch(i), i)
    # retention prunes everything below the watermark — including the
    # never-applied epoch 1 (prune only checks lsn ranges)
    store.prune(table.manifest().watermark["lsn"])
    rep = reconcile(eng, expected_lsn_range=(0, 3), autofix=True)
    assert 1 in rep["unapplied_epochs"]
    assert rep["unapplied_pruned_epochs"] == [1]
    assert rep["consistent"] is False  # the loss is surfaced
