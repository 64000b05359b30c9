"""Confirmation-lag zone: finalized table never rolls back under
reorgs ≤ lag; latest view (finalized ⊕ pending) equals the oracle."""

from blockchain_etl_spark.cdc.apply import CdcEngine
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.streaming.lagged import LaggedTailer
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _d(df):
    return {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["lsn"], r["seq"])
        for r in df.collect()
    }


def test_lagged_finalized_never_rolls_back(spark, tmp_path):
    lag = 15  # > reorg_max_depth of the generator
    epochs = generate_changelog(seed=29, n_epochs=6, p_reorg_epoch=0.6, reorg_max_depth=10)
    flat = [e for ep in epochs for e in ep]
    assert any(e["op"] == "R" for e in flat)

    table = SnapshotTable.create(spark, str(tmp_path / "fin"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "store"))
    engine = CdcEngine(spark, table, epoch_store=store)
    tailer = LaggedTailer(spark, engine, store, str(tmp_path / "pending"), lag=lag)

    final_wms = []
    for i, ep in enumerate(epochs):
        out = tailer.process_epoch(events_to_df(spark, ep), i)
        final_wms.append(out["final_lsn"])

    # finalized watermark is monotonic, and no rollback commit ever hit
    # the finalized table (reorg depth < lag)
    assert final_wms == sorted(final_wms)
    for v in table.versions():
        assert "rollback_to" not in table.manifest(v).lineage

    # latest view == oracle over the full stream
    got = _d(
        tailer.latest_view().select("doc_id", "tokens", "n_tok", "lsn", "seq")
    )
    exp = {
        k: (tuple(v["tokens"]), v["n_tok"], v["lsn"], v["seq"])
        for k, v in oracle_replay(flat).items()
    }
    assert got == exp

    # finalized alone is a strict prefix: every finalized row is ≤ final_lsn
    fin_rows = engine.read_state().collect()
    assert all(r["lsn"] <= final_wms[-1] for r in fin_rows)


def test_lagged_epoch_reads_bounded_and_store_pruned(spark, tmp_path):
    """VERDICT r4 #1: per-epoch cost must be O(lag window), not O(total
    history) — the number of epoch files opened per process_epoch stays
    constant as history grows, and retention GC deletes epochs that
    cleared the lag while replay correctness holds (latest view still
    equals the oracle over the full stream, reorgs included)."""
    lag = 15
    epochs = generate_changelog(
        seed=31, n_epochs=14, p_reorg_epoch=0.4, reorg_max_depth=10
    )
    flat = [e for ep in epochs for e in ep]
    assert any(e["op"] == "R" for e in flat)

    table = SnapshotTable.create(spark, str(tmp_path / "fin"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "store"))
    engine = CdcEngine(spark, table, epoch_store=store)
    tailer = LaggedTailer(
        spark, engine, store, str(tmp_path / "pending"), lag=lag
    )

    files_read = []
    for i, ep in enumerate(epochs):
        out = tailer.process_epoch(events_to_df(spark, ep), i)
        files_read.append(out["epoch_files_read"])

    # bounded: the steady-state tail never re-opens the whole history —
    # every epoch past warmup reads at most the lag window's worth of
    # epochs (generous cap: lag + reorg redelivery spans a few epochs)
    steady = files_read[6:]
    assert max(steady) <= 5, files_read
    # and it is NOT monotonically growing with history
    assert files_read[-1] <= max(files_read[:7])

    # retention actually deleted epoch files (index metas say pruned)
    import os

    idx_pruned = [
        eid for eid in store.epoch_ids(include_pruned=True)
        if eid not in store.epoch_ids()
    ]
    assert idx_pruned, "no epochs were pruned over 14 epochs of history"
    for eid in idx_pruned:
        assert not os.path.exists(
            os.path.join(store.path, f"epoch-{eid:08d}.parquet")
        )
    # markers survive pruning in the index
    n_markers_stream = sum(1 for e in flat if e["op"] == "R")
    assert len(store.index_markers()) == n_markers_stream

    # correctness after GC: latest view == oracle over the full stream
    got = _d(
        tailer.latest_view().select("doc_id", "tokens", "n_tok", "lsn", "seq")
    )
    exp = {
        k: (tuple(v["tokens"]), v["n_tok"], v["lsn"], v["seq"])
        for k, v in oracle_replay(flat).items()
    }
    assert got == exp

    # a read below the retention horizon fails loud, never a silent gap
    import pytest

    with pytest.raises(RuntimeError, match="pruned below the retention"):
        store.read_slice(-1, 1 << 62)


def test_process_epoch_rerun_is_skipped_and_crash_safe(spark, tmp_path):
    """CLI re-listing of lag-window epochs (they never enter the
    finalized ledger) must not reprocess them: a rerun of an already-
    processed epoch is a no-op skip — even after retention pruned its
    store file — and the overlay is not overwritten with a stale slice."""
    lag = 15
    epochs = generate_changelog(seed=53, n_epochs=8, p_reorg_epoch=0.3,
                                reorg_max_depth=10)
    flat = [e for ep in epochs for e in ep]
    table = SnapshotTable.create(spark, str(tmp_path / "fin"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "store"))
    engine = CdcEngine(spark, table, epoch_store=store)
    tailer = LaggedTailer(spark, engine, store, str(tmp_path / "pending"), lag=lag)
    for i, ep in enumerate(epochs):
        tailer.process_epoch(events_to_df(spark, ep), i)
    before = _d(tailer.latest_view().select("doc_id", "tokens", "n_tok", "lsn", "seq"))

    # rerun epoch 0 (pruned by now) and epoch 3: both skipped, no crash
    out0 = tailer.process_epoch(events_to_df(spark, epochs[0]), 0)
    out3 = tailer.process_epoch(events_to_df(spark, epochs[3]), 3)
    assert out0.get("skipped") and out3.get("skipped")
    after = _d(tailer.latest_view().select("doc_id", "tokens", "n_tok", "lsn", "seq"))
    assert after == before
    # and the oracle still holds
    exp = {
        k: (tuple(v["tokens"]), v["n_tok"], v["lsn"], v["seq"])
        for k, v in oracle_replay(flat).items()
    }
    assert after == exp
