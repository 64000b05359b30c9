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
