"""Secondary bucketing (``bucket_key``): hash-bucket a table by a
non-key column so reads prune by that column's VALUE — the index
layout behind the indexed join-MV legs. Contract under test: layout
survives every write path (MOR append, COW merge, compaction), deletes
route to the value's bucket, and events violating the carry contract
are rejected, not silently misplaced."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.tables.snapshot import SnapshotTable, bucket_expr

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("jv", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)

EV_SCHEMA = (
    "stream_pos long, lsn long, seq int, op string, rollback_to_lsn long, "
    "doc_id string, jv string, val long"
)


def _ev(spark, rows, lsn):
    return spark.createDataFrame(
        [
            (lsn * 1000 + i, lsn, i, op, None, d, j, v)
            for i, (d, j, v, op) in enumerate(rows)
        ],
        EV_SCHEMA,
    )


def _bucket_of(spark, value, n_buckets):
    return (
        spark.createDataFrame([(value,)], "jv string")
        .select(bucket_expr("jv", n_buckets).alias("b"))
        .first()["b"]
    )


@pytest.fixture(params=["mor", "cow"])
def idx(request, spark, tmp_path):
    t = SnapshotTable.create(
        spark,
        os.path.join(tmp_path, f"idx-{request.param}"),
        SCHEMA,
        key="doc_id",
        n_buckets=8,
        bucket_key="jv",
    )
    return t, CdcEngine(spark, t, mode=request.param)


def test_create_rejects_unknown_bucket_key(spark, tmp_path):
    with pytest.raises(ValueError, match="bucket_key"):
        SnapshotTable.create(
            spark, os.path.join(tmp_path, "bad"), SCHEMA, bucket_key="nope"
        )


def test_bucket_key_equal_to_key_is_default_layout(spark, tmp_path):
    t = SnapshotTable.create(
        spark, os.path.join(tmp_path, "plain"), SCHEMA, bucket_key="doc_id"
    )
    assert t.manifest().bucket_key is None


def test_value_pruned_read_is_complete(spark, tmp_path, idx):
    t, eng = idx
    eng.apply_epoch(
        _ev(spark, [("k1", "a", 10, "U"), ("k2", "a", 20, "U"), ("k3", "b", 30, "U")], 1),
        epoch_id=1,
    )
    eng.apply_epoch(
        _ev(spark, [("k2", "a", 21, "U"), ("k4", "b", 40, "U")], 2), epoch_id=2
    )
    nb = t.manifest().n_buckets
    got = {
        (r["doc_id"], r["val"])
        for r in read_state(t, buckets=[_bucket_of(spark, "a", nb)]).collect()
    }
    # every live key whose jv='a', with the resolved (updated) value
    assert got == {("k1", 10), ("k2", 21)}


def test_delete_routes_to_value_bucket(spark, tmp_path, idx):
    t, eng = idx
    eng.apply_epoch(
        _ev(spark, [("k1", "a", 10, "U"), ("k3", "b", 30, "U")], 1), epoch_id=1
    )
    # the D event carries jv (the contract) — tombstone lands in a's bucket
    eng.apply_epoch(_ev(spark, [("k1", "a", None, "D")], 2), epoch_id=2)
    nb = t.manifest().n_buckets
    pruned = read_state(t, buckets=[_bucket_of(spark, "a", nb)])
    assert pruned.filter(F.col("doc_id") == "k1").count() == 0
    # the tombstone itself is IN that bucket (no resurrection on pruned read)
    raw = t.read(buckets=[_bucket_of(spark, "a", nb)], resolve=True)
    row = raw.filter(F.col("doc_id") == "k1").first()
    assert row is not None and row["deleted"] is True
    # compaction keeps the layout
    t.compact()
    raw2 = t.read(buckets=[_bucket_of(spark, "a", nb)], resolve=True)
    row2 = raw2.filter(F.col("doc_id") == "k1").first()
    assert row2 is not None and row2["deleted"] is True


def test_null_bucket_key_rejected_not_misplaced(spark, tmp_path, idx):
    t, eng = idx
    m = eng.apply_epoch(
        _ev(spark, [("k1", "a", 10, "U"), ("k2", None, 20, "U")], 1), epoch_id=1
    )
    assert m["n_rejected"] == 1
    assert read_state(t).count() == 1


def test_missing_bucket_key_column_raises(spark, tmp_path, idx):
    t, eng = idx
    bad = spark.createDataFrame(
        [(1, 1, 0, "U", None, "k1", 10)],
        "stream_pos long, lsn long, seq int, op string, rollback_to_lsn long, "
        "doc_id string, val long",
    )
    with pytest.raises(ValueError, match="bucket_key"):
        eng.apply_epoch(bad, epoch_id=1)


def test_read_changes_on_bucket_key_table(spark, tmp_path, idx):
    t, eng = idx
    eng.apply_epoch(
        _ev(spark, [("k1", "a", 10, "U"), ("k2", "b", 20, "U")], 1), epoch_id=1
    )
    v1 = t.current_version()
    eng.apply_epoch(
        _ev(spark, [("k1", "a", 11, "U"), ("k2", "b", None, "D"), ("k5", "c", 50, "U")], 2),
        epoch_id=2,
    )
    ch = {
        (r["_change_type"], r["doc_id"])
        for r in t.read_changes(v1).collect()
    }
    assert ch == {
        ("update_preimage", "k1"),
        ("update_postimage", "k1"),
        ("delete", "k2"),
        ("insert", "k5"),
    }


def test_create_race_shape_check_covers_bucket_key(spark, tmp_path):
    path = os.path.join(tmp_path, "race")
    SnapshotTable.create(spark, path, SCHEMA, bucket_key="jv")
    # simulate the healed-conflict path: create() on an existing v0 with a
    # DIFFERENT bucket_key must refuse rather than share the table
    from blockchain_etl_spark.tables import snapshot as snap

    orig = snap.SnapshotTable._write_manifest

    def conflict(self, m):
        raise snap.CommitConflictError("simulated")

    snap.SnapshotTable._write_manifest = conflict
    try:
        with pytest.raises(FileExistsError):
            SnapshotTable.create(spark, path, SCHEMA, bucket_key=None)
        # identical shape → idempotent completion succeeds
        t = SnapshotTable.create(spark, path, SCHEMA, bucket_key="jv")
        assert t.manifest().bucket_key == "jv"
    finally:
        snap.SnapshotTable._write_manifest = orig
