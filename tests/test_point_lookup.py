"""Point-lookup path: bucket-pruned logical reads return exactly the
full-read rows for keys in those buckets, touching fewer files."""

from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.snapshot import SnapshotTable, bucket_expr


def test_bucket_pruned_point_lookup(spark, tmp_path):
    epochs = generate_changelog(seed=53, n_epochs=3, p_reorg_epoch=0.0)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=16)
    store = EpochStore(spark, str(tmp_path / "s"))
    eng = CdcEngine(spark, table, epoch_store=store)
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        eng.apply_epoch(store.read_epoch(i), i)

    full = {r["doc_id"]: r["lsn"] for r in read_state(table).collect()}
    some_doc = sorted(full)[0]
    b = (
        spark.createDataFrame([(some_doc,)], "doc_id string")
        .select(bucket_expr("doc_id", 16).alias("b"))
        .first()["b"]
    )
    pruned = read_state(table, buckets=[b])
    got = {r["doc_id"]: r["lsn"] for r in pruned.collect()}
    assert got[some_doc] == full[some_doc]
    # every pruned row belongs to the requested bucket and matches full
    assert all(full[k] == v for k, v in got.items())
    assert (
        pruned.filter(bucket_expr("doc_id", 16) != b).count() == 0
    )


def test_backward_scan_version_lookup(spark, tmp_path):
    def rows(lsn):
        return spark.createDataFrame(
            [(f"d{lsn}", [1], 1, "s", lsn, 0, 0, False)], TARGET_SCHEMA
        )

    t2 = SnapshotTable.create(spark, str(tmp_path / "t2"), TARGET_SCHEMA, n_buckets=4)
    for lsn in (5, 10, 20):
        t2.append_deltas(rows(lsn), watermark={"lsn": lsn, "seq": 0, "pos": lsn})
    assert t2.manifest(t2.latest_version_at_or_before(12)).watermark["lsn"] == 10
    assert t2.manifest(t2.latest_version_at_or_before(5)).watermark["lsn"] == 5
    assert t2.manifest(t2.latest_version_at_or_before(100)).watermark["lsn"] == 20
    assert t2.latest_version_at_or_before(-1) == 0  # genesis wm = -1
    assert t2.latest_version_at_or_before(-5) is None  # below genesis


def test_key_zone_maps_prune_files_inside_a_bucket(spark, tmp_path):
    """Point lookup prunes at THREE levels: bucket → file (key zone
    map) → row group. The file level is the new one: a bucket that
    accumulated many delta files from disjoint key batches opens only
    the files whose [min,max] key range can contain the probe."""
    from blockchain_etl_spark.cdc.apply import CdcEngine, point_lookup, read_state
    from blockchain_etl_spark.cdc.generator import events_to_df
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=1)
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor",
                    compact_delta_threshold=10_000)
    # three commits with DISJOINT key prefixes → disjoint file key ranges
    for epoch, prefix in enumerate(["a", "m", "z"]):
        eng.apply_epoch(events_to_df(spark, [
            dict(stream_pos=epoch * 100 + i, lsn=epoch * 100 + i, seq=0, op="I",
                 doc_id=f"{prefix}{i:03d}", tokens=[i], n_tok=1, source="s",
                 rollback_to_lsn=None, epoch_hash=f"e{epoch}-{i}")
            for i in range(20)]), epoch_id=epoch)

    files = t.manifest().files
    assert all((f.get("stats") or {}).get("key") for f in files), files
    # manifest-level: only ONE of the three files can contain "m005"
    lo, hi = "m005", "m005"
    cands = [f for f in files
             if not (f["stats"]["key"][1] < lo or f["stats"]["key"][0] > hi)]
    assert len(cands) == 1 and len(files) == 3

    got = point_lookup(t, "m005").collect()
    assert len(got) == 1 and got[0]["tokens"] == [5]
    assert point_lookup(t, "qqq").count() == 0
    # pruned read agrees with the unpruned one
    full = read_state(t).filter("doc_id = 'm005'").collect()
    assert [r["doc_id"] for r in full] == ["m005"]
