import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.tables.snapshot import SnapshotTable, bucket_expr


def _mk_rows(spark, ids, lsn=1):
    rows = [(f"doc-{i}", [i, i + 1], 2, "s", lsn, 0, 0, False) for i in ids]
    return spark.createDataFrame(rows, TARGET_SCHEMA)


def test_create_overwrite_read(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, key="doc_id", n_buckets=8)
    assert t.exists()
    t.overwrite(_mk_rows(spark, range(100)))
    df = t.read()
    assert df.count() == 100
    assert df.dtypes == [(f.name, f.dataType.simpleString()) for f in TARGET_SCHEMA.fields]
    got = df.filter(F.col("doc_id") == "doc-7").first()
    assert got["tokens"] == [7, 8]


def test_bucket_pruned_read(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    t.overwrite(_mk_rows(spark, range(200)))
    # pick one doc, read only its bucket — the row must be there, and the
    # read must touch fewer files than the full table
    b = (
        spark.createDataFrame([("doc-42",)], "doc_id string")
        .select(bucket_expr("doc_id", 8).alias("b"))
        .first()["b"]
    )
    pruned = t.read(buckets=[b])
    assert pruned.filter(F.col("doc_id") == "doc-42").count() == 1
    m = t.manifest()
    assert len([f for f in m.files if f["bucket"] == b]) < len(m.files)


def test_replace_buckets_is_cow(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    t.overwrite(_mk_rows(spark, range(100)))
    before = {f["path"]: f for f in t.manifest().files}
    # rewrite bucket of doc-0 only
    b = (
        spark.createDataFrame([("doc-0",)], "doc_id string")
        .select(bucket_expr("doc_id", 8).alias("b"))
        .first()["b"]
    )
    keep = t.read(buckets=[b]).filter(F.col("doc_id") != "doc-0")
    t.replace_buckets([b], keep, watermark={"lsn": 5, "seq": 0, "pos": 10}, epoch_id=1)
    after = t.manifest()
    assert t.read().count() == 99
    assert after.applied_epochs == [1]
    assert after.watermark["lsn"] == 5
    # untouched buckets carried forward by reference (same file paths)
    untouched_before = {p for p, f in before.items() if f["bucket"] != b}
    untouched_after = {f["path"] for f in after.files if f["bucket"] != b}
    assert untouched_before == untouched_after


def test_time_travel_and_rollback(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=4)
    t.overwrite(_mk_rows(spark, range(10)))
    v1 = t.current_version()
    t.overwrite(_mk_rows(spark, range(20)))
    assert t.read().count() == 20
    assert t.read(version=v1).count() == 10
    t.rollback_to_version(v1)
    assert t.read().count() == 10
    # history stays linear: the rollback is a new version
    assert t.current_version() > v1


def test_atomic_commit_pointer(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=4)
    t.overwrite(_mk_rows(spark, range(10)))
    # a manifest file for a "future" version without pointer swap must not
    # be visible (simulates crash between manifest write and swap)
    v = t.current_version()
    fake = t.manifest()
    fake.version = v + 1
    with open(t._manifest_path(v + 1), "w") as f:
        f.write(fake.to_json())
    assert t.current_version() == v  # LATEST still points at committed


def test_schema_evolution_add_column_and_widen(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=4)
    t.overwrite(_mk_rows(spark, range(10)))

    evolved = T.StructType(
        [
            *[f for f in TARGET_SCHEMA.fields if f.name != "n_tok"],
            T.StructField("n_tok", T.LongType(), True),  # widened int -> long
            T.StructField("lang", T.StringType(), True),  # added column
        ]
    )
    new_rows = spark.createDataFrame(
        [("doc-new", [9], "s2", 7, 1, 1, False, 2**40, "en")],
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
                T.StructField("source", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("seq", T.IntegerType()),
                T.StructField("updated_epoch", T.LongType()),
                T.StructField("deleted", T.BooleanType()),
                T.StructField("n_tok", T.LongType()),
                T.StructField("lang", T.StringType()),
            ]
        ),
    )
    b = (
        spark.createDataFrame([("doc-new",)], "doc_id string")
        .select(bucket_expr("doc_id", 4).alias("b"))
        .first()["b"]
    )
    old_bucket = t.read(buckets=[b]).withColumn("lang", F.lit(None).cast("string")).withColumn(
        "n_tok", F.col("n_tok").cast("long")
    )
    t.replace_buckets([b], old_bucket.unionByName(new_rows), new_schema=evolved)

    df = t.read()
    assert df.count() == 11
    assert dict(df.dtypes)["n_tok"] == "bigint"
    assert "lang" in df.columns
    # old rows null-backfilled on the added column, values upcast intact
    old = df.filter(F.col("doc_id") == "doc-3").first()
    assert old["lang"] is None and old["n_tok"] == 2
    new = df.filter(F.col("doc_id") == "doc-new").first()
    assert new["lang"] == "en" and new["n_tok"] == 2**40
    m = t.manifest()
    assert m.schema_version == 1 and len(json.loads(m.schemas["0"])) > 0


def test_merge_refuses_out_of_bucket_writes(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    t.overwrite(_mk_rows(spark, range(10)))
    rows = _mk_rows(spark, range(10, 20))
    try:
        t.replace_buckets([0], rows)  # rows hash into many buckets
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_empty_bucket_after_delete(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=2)
    t.overwrite(_mk_rows(spark, range(6)))
    empty = spark.createDataFrame([], TARGET_SCHEMA)
    t.replace_buckets([0, 1], empty)
    assert t.read().count() == 0
    assert os.path.exists(os.path.join(tmp_table_dir, "manifests", "LATEST"))
