"""Hypertable chunking: a declared integral cluster column (event
time) makes base rewrites split each bucket into slab-wide chunk FILES
with manifest zone maps, and ``read(cluster_range=...)`` prunes files —
a time-ranged scan of a long table opens only the touched chunks.
Winner-safety rides the immutable-per-key / non-null contract (same
shape as bucket_key): tombstones carry the value, so a delete can
never be pruned away from its key's chunk."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.tables.snapshot import SnapshotTable

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("ets", T.LongType()),
    T.StructField("val", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
EV = T.StructType([
    T.StructField("stream_pos", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("op", T.StringType()),
    T.StructField("rollback_to_lsn", T.LongType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("ets", T.LongType()),
    T.StructField("val", T.LongType()),
])

SLAB = 100


def _mk(spark, tmp_path, mode="mor", n_buckets=4):
    t = SnapshotTable.create(
        spark, str(tmp_path / f"t-{mode}"), SCHEMA, n_buckets=n_buckets,
        cluster_by="ets", cluster_slab=SLAB,
    )
    return t, CdcEngine(spark, t, mode=mode, collect_metrics=False)


def _events(spark, n=60, lsn0=0):
    # key k-i lives forever at ets = i*17 % 600 (immutable per key)
    rows = [
        (lsn0 + i, lsn0 + i, 0, "I", None, f"k-{i:03d}", (i * 17) % 600, i)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, EV)


def _range_files(table, lo, hi):
    from blockchain_etl_spark.tables.snapshot import cluster_zone_overlaps

    m = table.manifest()
    keep = [f for f in m.files if cluster_zone_overlaps(f, lo, hi)]
    return len(keep), len(m.files)


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_cluster_range_read_matches_full_filter(spark, tmp_path, mode):
    t, eng = _mk(spark, tmp_path, mode)
    eng.apply_epoch(_events(spark, 60), 0)
    if mode == "mor":
        t.compact()
    eng.apply_epoch(_events(spark, 20, lsn0=100), 1)  # updates same keys
    lo, hi = 100, 299
    full = {
        (r["doc_id"], r["ets"], r["val"])
        for r in read_state(t).filter(F.col("ets").between(lo, hi)).collect()
    }
    pruned = {
        (r["doc_id"], r["ets"], r["val"])
        for r in read_state(t, cluster_range=(lo, hi)).collect()
    }
    assert pruned == full and full


def test_chunked_rewrite_prunes_files(spark, tmp_path):
    t, eng = _mk(spark, tmp_path, "mor")
    eng.apply_epoch(_events(spark, 120), 0)
    t.compact()
    # 600-wide ets span / 100-wide slabs → ~6 chunk files per bucket
    m = t.manifest()
    per_bucket: dict[int, int] = {}
    for f in m.files:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert max(per_bucket.values()) >= 4
    # a one-slab range opens a small fraction of the files
    kept, total = _range_files(t, 100, 199)
    assert kept <= total // 3
    # every file carries a cluster zone map
    assert all((f.get("stats") or {}).get("cluster") for f in m.files)


def test_tombstone_survives_chunk_pruning(spark, tmp_path):
    """Delete a key, compact, then read ITS chunk with pruning — the
    tombstone's carried ets keeps it inside the key's chunk, so the key
    stays deleted (no resurrection through a pruned read)."""
    t, eng = _mk(spark, tmp_path, "mor")
    eng.apply_epoch(_events(spark, 60), 0)
    t.compact()
    victim, vets = "k-001", 17
    d = [(200, 200, 0, "D", None, victim, vets, None)]
    eng.apply_epoch(spark.createDataFrame(d, EV), 1)
    rng = (0, 99)  # the victim's chunk
    got = {
        r["doc_id"] for r in read_state(t, cluster_range=rng).collect()
    }
    assert victim not in got
    # and after folding the tombstone into the chunked base layout too
    t.compact()
    got2 = {
        r["doc_id"] for r in read_state(t, cluster_range=rng).collect()
    }
    assert victim not in got2


def test_cow_tombstone_carries_cluster_value(spark, tmp_path):
    t, eng = _mk(spark, tmp_path, "cow")
    eng.apply_epoch(_events(spark, 10), 0)
    d = [(200, 200, 0, "D", None, "k-002", 34, None)]
    eng.apply_epoch(spark.createDataFrame(d, EV), 1)
    tomb = (
        t.read(resolve=True)
        .filter(F.col("doc_id") == "k-002")
        .select("ets", "deleted")
        .first()
    )
    assert tomb["deleted"] is True and tomb["ets"] == 34


def test_null_cluster_value_rejected(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4,
        cluster_by="ets", cluster_slab=SLAB,
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=True)
    ok = _events(spark, 5)
    bad = spark.createDataFrame(
        [(900, 900, 0, "I", None, "k-bad", None, 1)], EV
    )
    metrics = eng.apply_epoch(ok.unionByName(bad), 0)
    assert metrics["n_rejected"] == 1
    assert read_state(t).filter("doc_id = 'k-bad'").count() == 0


def test_create_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="integral"):
        SnapshotTable.create(
            spark, str(tmp_path / "a"), SCHEMA, cluster_by="doc_id"
        )
    with pytest.raises(ValueError, match="requires cluster_by"):
        SnapshotTable.create(
            spark, str(tmp_path / "b"), SCHEMA, cluster_slab=10
        )
    with pytest.raises(ValueError, match="positive"):
        SnapshotTable.create(
            spark, str(tmp_path / "c"), SCHEMA, cluster_by="ets", cluster_slab=0
        )
    with pytest.raises(ValueError, match="no cluster_by"):
        t = SnapshotTable.create(spark, str(tmp_path / "d"), SCHEMA)
        t.read(cluster_range=(0, 10))


def test_drop_chunks_retention_is_manifest_math(spark, tmp_path):
    """Expiring old slabs drops whole files with zero rewrite: state
    loses exactly the keys wholly below the bound, retained keys keep
    every row, and gc reclaims the dropped files."""
    import os

    t, eng = _mk(spark, tmp_path, "mor")
    eng.apply_epoch(_events(spark, 120), 0)
    t.compact()  # slab-aligned base layout
    files_before = len(t.manifest().files)
    keep_expected = {
        r["doc_id"] for r in read_state(t).filter("ets >= 200").collect()
    }
    drop_expected = {
        r["doc_id"] for r in read_state(t).filter("ets < 200").collect()
    }
    assert keep_expected and drop_expected

    v = t.drop_chunks(below=200)
    assert v == t.current_version()
    assert len(t.manifest().files) < files_before
    got = {r["doc_id"] for r in read_state(t).collect()}
    assert got == keep_expected
    # idempotent: nothing left below the bound → no new version
    assert t.drop_chunks(below=200) == v
    # the dropped files become unreferenced and gc can reclaim them
    recl = t.gc(keep_last_versions=1)
    assert recl["files_removed"] >= 1


def test_drop_chunks_keeps_mixed_delta_files_whole(spark, tmp_path):
    """An un-slabbed delta file mixing retained and expired rows must
    survive whole — a retained key never loses rows (exactness returns
    after the next compaction re-slabs)."""
    t, eng = _mk(spark, tmp_path, "mor")
    eng.apply_epoch(_events(spark, 60), 0)  # delta files span slabs
    state_before = {
        (r["doc_id"], r["val"]) for r in read_state(t).filter("ets >= 100").collect()
    }
    t.drop_chunks(below=100)
    after = {
        (r["doc_id"], r["val"]) for r in read_state(t).filter("ets >= 100").collect()
    }
    assert after == state_before  # retained keys untouched
    t.compact()
    v2 = t.drop_chunks(below=100)
    assert read_state(t).filter("ets < 100").count() == 0
    assert v2 == t.current_version()


def test_drop_chunks_requires_cluster_by(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "plain"), SCHEMA)
    with pytest.raises(ValueError, match="no cluster_by"):
        t.drop_chunks(below=10)


def test_drop_chunks_is_honest_in_the_change_feed(spark, tmp_path):
    """read_changes spanning a retention commit reports the expired
    keys as deletes — downstream consumers see the truth, not a silent
    disappearance."""
    t, eng = _mk(spark, tmp_path, "mor")
    eng.apply_epoch(_events(spark, 60), 0)
    t.compact()
    v0 = t.current_version()
    expired = {
        r["doc_id"] for r in read_state(t).filter("ets < 100").collect()
    }
    t.drop_chunks(below=100)
    changed = {
        (r["_change_type"], r["doc_id"])
        for r in t.read_changes(v0, t.current_version()).collect()
    }
    assert {("delete", k) for k in expired} <= changed
    assert not any(ct != "delete" for ct, _ in changed)


def test_cdf_stream_over_chunked_table_matches_batch(spark, tmp_path):
    """The table_changes streaming source diffs per-bucket FILE SETS —
    the chunked layout (several base files per bucket) and a retention
    commit in range must both stream the same rows the batch
    read_changes computes."""
    from blockchain_etl_spark.sources.table_changes_source import (
        TableChangesDataSource,
    )

    t, eng = _mk(spark, tmp_path, "mor")
    eng.apply_epoch(_events(spark, 60), 0)
    t.compact()  # chunk-splitting rewrite
    v0 = t.current_version()
    eng.apply_epoch(_events(spark, 20, lsn0=100), 1)  # updates
    t.drop_chunks(below=100)  # retention inside the streamed range

    batch = {
        (r["_change_type"], r["doc_id"], r["val"])
        for r in t.read_changes(v0, t.current_version()).collect()
    }
    spark.dataSource.register(TableChangesDataSource)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (
        spark.readStream.format("table_changes")
        .option("path", str(tmp_path / "t-mor"))
        .option("start_version", v0)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    stream = {
        (r["_change_type"], r["doc_id"], r["val"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert stream == batch
    assert any(ct == "delete" for ct, _k, _v in batch)  # retention visible


def test_drop_chunks_refuses_policy_tables(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "pol"), SCHEMA, n_buckets=2,
        cluster_by="ets", cluster_slab=SLAB, policies={"val": "add"},
    )
    with pytest.raises(ValueError, match="policy table"):
        t.drop_chunks(below=100)


def test_drop_chunks_never_resurrects_split_key_rows(spark, tmp_path):
    """Review regression: a tombstone delta whose tiny zone sits wholly
    below a NON-slab-aligned bound must not drop while the pre-delete
    base row survives in an overlapping chunk file — the per-bucket
    effective horizon keeps them together (resurrection impossible)."""
    t, eng = _mk(spark, tmp_path, "mor", n_buckets=1)
    rows = [
        (0, 0, 0, "I", None, "k", 120, 1),
        (1, 1, 0, "I", None, "k2", 180, 2),
    ]
    eng.apply_epoch(spark.createDataFrame(rows, EV), 0)
    t.compact()  # one chunk file, zone [120, 180]
    d = [(2, 2, 0, "D", None, "k", 120, None)]
    eng.apply_epoch(spark.createDataFrame(d, EV), 1)  # delta zone [120,120]
    v = t.drop_chunks(below=150)  # naive rule would drop ONLY the tombstone
    got = {r["doc_id"] for r in read_state(t).collect()}
    assert got == {"k2"}  # k stays deleted — no resurrection
    if v > 2:  # if anything committed, the feed must still be delete-only
        kinds = {r["_change_type"] for r in t.read_changes(2, v).collect()}
        assert kinds <= {"delete"}


def test_cluster_range_projection_does_not_leak_cluster_column(spark, tmp_path):
    t, eng = _mk(spark, tmp_path, "mor")
    eng.apply_epoch(_events(spark, 10), 0)
    cols = t.read(columns=["val"], cluster_range=(0, 600)).columns
    assert "ets" not in cols and "val" in cols


def test_drop_chunks_horizon_is_a_fixed_point(spark, tmp_path):
    """Second review regression: chained overlaps must lower the
    horizon TRANSITIVELY. Three files S[~50..150], E[~40..80],
    F[tombstone at 42] overlap pairwise in a chain; with below=100 a
    one-pass horizon (min survivor zone-min = 50) would drop F (the
    tombstone) while E (the base insert) survives — resurrecting the
    key. The fixed point lowers H 100→50→40→<=42, so nothing drops."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=1,
        cluster_by="ets", cluster_slab=1000,  # wide slab: no auto-split
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    # file E (one delta commit): zone [40, 80] — holds key kv's insert
    e_rows = [(0, 0, 0, "I", None, "kv", 42, 1), (1, 1, 0, "I", None, "e2", 80, 2),
              (2, 2, 0, "I", None, "e3", 40, 3)]
    eng.apply_epoch(spark.createDataFrame(e_rows, EV), 0)
    # file S: zone [50, 150]
    s_rows = [(3, 3, 0, "I", None, "s1", 50, 4), (4, 4, 0, "I", None, "s2", 150, 5)]
    eng.apply_epoch(spark.createDataFrame(s_rows, EV), 1)
    # file F: zone [42, 45] — kv's TOMBSTONE (+ a filler at 45)
    f_rows = [(5, 5, 0, "D", None, "kv", 42, None), (6, 6, 0, "I", None, "f2", 45, 6)]
    eng.apply_epoch(spark.createDataFrame(f_rows, EV), 2)

    v_before = t.current_version()
    v = t.drop_chunks(below=100)
    # the chain pins the horizon below every zone — nothing may drop
    assert v == v_before
    got = {r["doc_id"] for r in read_state(t).collect()}
    assert "kv" not in got  # still deleted — no resurrection
    assert {"e2", "e3", "s1", "s2", "f2"} <= got
