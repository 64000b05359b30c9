"""Tail loop: discovery, ordering, resumability (kill/restart), and the
Structured Streaming driver with a real checkpoint dir."""

import os

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.streaming.tail import ChangeLogTailer, run_structured_stream
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _landing(spark, tmp_path, epochs):
    d = str(tmp_path / "landing")
    os.makedirs(d, exist_ok=True)
    for i, ev in enumerate(epochs):
        events_to_df(spark, ev).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"epoch-{i:08d}.parquet")
        )
    return d


def _mk_engine(spark, tmp_path):
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "store"))
    return CdcEngine(spark, table, epoch_store=store), table


def _state(table):
    return {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"], r["lsn"], r["seq"])
        for r in read_state(table).collect()
    }


def _expected(epochs):
    exp = oracle_replay([e for ep in epochs for e in ep])
    return {
        k: (v["tokens"], v["n_tok"], v["source"], v["lsn"], v["seq"]) for k, v in exp.items()
    }


def test_tailer_applies_all_pending_in_order(spark, tmp_path):
    epochs = generate_changelog(seed=8, n_epochs=5)
    d = _landing(spark, tmp_path, epochs)
    eng, table = _mk_engine(spark, tmp_path)
    tailer = ChangeLogTailer(spark, d, eng)
    metrics = tailer.run_once()
    assert [m["epoch_id"] for m in metrics] == [0, 1, 2, 3, 4]
    assert _state(table) == _expected(epochs)
    # second pass: nothing pending
    assert tailer.run_once() == []


def test_tailer_resumes_after_crash(spark, tmp_path):
    """Kill after epoch 2, restart with a fresh tailer over the same
    table dir — checkpoint is the manifest ledger, so the restart picks
    up exactly where the crash left off."""
    epochs = generate_changelog(seed=17, n_epochs=6, p_reorg_epoch=0.4)
    d = _landing(spark, tmp_path, epochs[:3])
    eng, table = _mk_engine(spark, tmp_path)
    ChangeLogTailer(spark, d, eng).run_once()
    assert set(table.manifest().applied_epochs) == {0, 1, 2}

    # "restart": new engine/tailer objects over the same dirs, more epochs
    d = _landing(spark, tmp_path, epochs)  # all 6 now present
    table2 = SnapshotTable(spark, str(tmp_path / "t"))
    store2 = EpochStore(spark, str(tmp_path / "store"))
    eng2 = CdcEngine(spark, table2, epoch_store=store2)
    metrics = ChangeLogTailer(spark, d, eng2).run_once()
    assert [m["epoch_id"] for m in metrics] == [3, 4, 5]
    assert _state(table2) == _expected(epochs)


def test_structured_streaming_driver(spark, tmp_path):
    epochs = generate_changelog(seed=23, n_epochs=4, p_reorg_epoch=0.3)
    d = _landing(spark, tmp_path, epochs)
    eng, table = _mk_engine(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    run_structured_stream(spark, d, eng, ckpt, available_now=True, max_files_per_trigger=1)
    assert _state(table) == _expected(epochs)
    # restart the query over the same checkpoint: no new data → no change
    v = table.current_version()
    run_structured_stream(spark, d, eng, ckpt, available_now=True)
    assert table.current_version() == v


def test_structured_streaming_survives_checkpoint_loss(spark, tmp_path):
    """After checkpoint LOSS the file source restarts batch ids at 0 and
    redelivers everything. Epoch identity is content-derived (min
    stream_pos), so redelivered batches hit the same ledger entries and
    are no-ops; new files still apply. batch_id-keyed ledgers silently
    drop the new data here."""
    epochs = generate_changelog(seed=31, n_epochs=4)
    d = _landing(spark, tmp_path, epochs[:2])
    eng, table = _mk_engine(spark, tmp_path)
    run_structured_stream(
        spark, d, eng, str(tmp_path / "ckpt1"), available_now=True, max_files_per_trigger=1
    )
    assert _state(table) == _expected(epochs[:2])

    # checkpoint lost: fresh dir → redelivery of epochs 0-1 + new 2-3
    d = _landing(spark, tmp_path, epochs)
    v = table.current_version()
    run_structured_stream(
        spark, d, eng, str(tmp_path / "ckpt2"), available_now=True, max_files_per_trigger=1
    )
    assert table.current_version() > v
    assert _state(table) == _expected(epochs)


def test_rebatched_straddling_batch_filters_applied_prefix(spark, tmp_path):
    """ADVICE r2: a re-batched batch whose NEW min stream_pos straddles the
    committed watermark (already-applied prefix + new suffix) must not
    re-apply the prefix — state would converge anyway, but metrics, DLQ
    output and MOR delta files would duplicate. The handler drops the
    prefix, re-keys the epoch on the surviving suffix, and a pure
    redelivery (all events behind the watermark) is skipped outright."""
    from blockchain_etl_spark.streaming.tail import make_epoch_handler

    epochs = generate_changelog(seed=31, n_epochs=3)
    flat = [e for ep in epochs for e in ep]
    eng, table = _mk_engine(spark, tmp_path)
    handle = make_epoch_handler(eng)

    cut = len(epochs[0])
    handle(events_to_df(spark, flat[:cut]), 0)  # normal epoch 0
    wm = table.manifest().watermark["pos"]
    applied_after_0 = set(table.manifest().applied_epochs)

    # straddling re-batch: second half of epoch 0 + all of epoch 1
    half = cut // 2
    straddle = flat[half : cut + len(epochs[1])]
    assert straddle[0]["stream_pos"] <= wm  # really straddles
    metrics = handle(events_to_df(spark, straddle), 1)
    m = table.manifest()
    # re-keyed on the first NEW event, not on the redelivered min
    new_key = min(e["stream_pos"] for e in straddle if e["stream_pos"] > wm)
    assert set(m.applied_epochs) == applied_after_0 | {new_key}
    # exactly-once on the apply: only the events past the watermark count
    suffix_len = sum(1 for e in straddle if e["stream_pos"] > wm)
    assert metrics["n_events"] == suffix_len

    # pure redelivery (entirely behind the watermark): skipped, no ledger row
    v = table.current_version()
    handle(events_to_df(spark, flat[:half]), 2)
    assert table.current_version() == v
    assert set(table.manifest().applied_epochs) == applied_after_0 | {new_key}

    # finish epoch 2 normally; state equals the oracle over the flat stream
    handle(events_to_df(spark, epochs[2]), 3)
    assert _state(table) == _expected(epochs)


def test_direct_tailer_retention_prunes_and_replay_survives(spark, tmp_path):
    """Direct-ingest retention (round 5): with retain_lsn_margin set, the
    tailer GC's store epochs wholly below watermark - margin after each
    batch; reorg replay inside the margin still works (final state ==
    oracle), and reads below the horizon fail loud."""
    import pytest

    epochs = generate_changelog(
        seed=41, n_epochs=10, p_reorg_epoch=0.4, reorg_max_depth=6
    )
    flat = [e for ep in epochs for e in ep]
    assert any(e["op"] == "R" for e in flat)
    landing = _landing(spark, tmp_path, epochs)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "store"))
    engine = CdcEngine(spark, table, epoch_store=store)
    # margin comfortably above the generator's reorg depth
    tailer = ChangeLogTailer(spark, landing, engine, retain_lsn_margin=15)
    metrics = tailer.run_once()
    assert len(metrics) == 10

    # retention actually fired: some epochs gone from the live set
    live = store.epoch_ids()
    all_ids = store.epoch_ids(include_pruned=True)
    assert set(live) < set(all_ids), "no epochs were pruned over 10 epochs"

    # final state still equals the oracle (reorgs replayed correctly
    # from the retained window)
    got = {
        r["doc_id"]: (tuple(r["tokens"]), r["lsn"], r["seq"])
        for r in read_state(table).collect()
    }
    exp = {
        k: (tuple(v["tokens"]), v["lsn"], v["seq"])
        for k, v in oracle_replay(flat).items()
    }
    assert got == exp

    # a read below the horizon is refused, not silently empty
    with pytest.raises(RuntimeError, match="pruned below the retention"):
        store.read_slice(-1, 1 << 62)


def test_empty_epoch_survives_retention(spark, tmp_path):
    """An empty landed epoch (null lsn/pos ranges in the index) must not
    crash prune() or slice reads — it is prunable and unreadable."""
    from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA

    store = EpochStore(spark, str(tmp_path / "store"))
    store.write_epoch(0, spark.createDataFrame([], EVENT_SCHEMA))
    ev = generate_changelog(seed=7, n_epochs=1, p_reorg_epoch=0.0)[0]
    store.write_epoch(1, events_to_df(spark, ev))
    assert store.read_slice(-1, 1 << 62).count() == len(ev)
    out = store.prune(upto_lsn=-1)  # nothing below -1 except the empty epoch
    assert out["pruned_epochs"] == [0]
    assert store.epoch_ids() == [1]
