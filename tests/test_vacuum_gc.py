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


def test_manifest_zone_maps_recorded(spark, tmp_path):
    _, table, _ = _setup(spark, tmp_path, p_reorg_epoch=0.0, p_delete=0.3)
    files = table.manifest().files
    assert files and all(f.get("stats") for f in files)
    for f in files:
        lo, hi = f["stats"]["lsn"]
        assert lo <= hi
        assert isinstance(f["stats"]["deleted_any"], bool)
    assert any(f["stats"]["deleted_any"] for f in files)


def test_vacuum_candidates_match_brute_force(spark, tmp_path):
    _, table, _ = _setup(spark, tmp_path, p_reorg_epoch=0.0, p_delete=0.3)
    wm = table.manifest().watermark["lsn"]
    from blockchain_etl_spark.tables.snapshot import bucket_expr

    m = table.manifest()
    truth = {
        r["b"]
        for r in table.read(resolve=True)
        .filter(F.col("deleted") & (F.col("lsn") < wm + 1))
        .select(bucket_expr(m.key, m.n_buckets).alias("b"))
        .distinct()
        .collect()
    }
    cand = table.vacuum_candidate_buckets(wm + 1)
    assert cand is not None
    # zone maps may over-approximate (file-level granularity) but can
    # never miss a bucket that really holds an old tombstone
    assert truth <= set(cand)
    # horizon below every lsn → no candidates at all
    assert table.vacuum_candidate_buckets(0) == []


def test_vacuum_falls_back_without_stats(spark, tmp_path):
    import json as _json

    _, table, _ = _setup(spark, tmp_path, p_reorg_epoch=0.0, p_delete=0.3)
    # simulate a pre-stats table: strip stats from the live manifest
    mp = table._manifest_path(table.current_version())
    with open(mp) as f:
        raw = _json.load(f)
    for fe in raw["files"]:
        fe.pop("stats", None)
    with open(mp, "w") as f:
        _json.dump(raw, f)
    assert table.vacuum_candidate_buckets(10**9) is None
    wm = table.manifest().watermark["lsn"]
    table.vacuum_tombstones(older_than_lsn=wm + 1)  # full-scan path
    assert table.read().filter("deleted").count() == 0
