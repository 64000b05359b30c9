"""Delta-style MERGE INTO facade: batch upsert/delete sugar over the
CDC apply path — exactly-once, exact splits, schema evolution, and the
duplicate-source-key rejection Delta mandates."""

import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, merge_into, read_state
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.tables.snapshot import SnapshotTable

SRC = "doc_id string, tokens array<int>, n_tok int, source string"


def _mk(spark, tmp_path, mode="cow"):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    return t, CdcEngine(spark, t, mode=mode)


def test_merge_upsert_delete_splits_and_state(spark, tmp_path):
    t, eng = _mk(spark, tmp_path)
    m1 = merge_into(
        eng,
        spark.createDataFrame(
            [("a", [1], 1, "s"), ("b", [2], 1, "s"), ("c", [3], 1, "s")], SRC
        ),
    )
    assert (m1["n_insert"], m1["n_update"], m1["n_delete"]) == (3, 0, 0)

    # second merge: update a, insert d, delete b via delete_where
    m2 = merge_into(
        eng,
        spark.createDataFrame(
            [("a", [9, 9], 2, "s2"), ("d", [4], 1, "s"), ("b", None, None, "gone")],
            SRC,
        ),
        delete_where=F.col("source") == "gone",
    )
    assert (m2["n_insert"], m2["n_update"], m2["n_delete"]) == (1, 1, 1)

    got = {r["doc_id"]: (list(r["tokens"]), r["source"])
           for r in read_state(t).collect()}
    assert got == {"a": ([9, 9], "s2"), "c": ([3], "s"), "d": ([4], "s")}
    # watermark advanced monotonically across the two merges
    # (first merge lands at lsn 0 = initial watermark -1 + 1)
    assert t.manifest().watermark["lsn"] == 1


def test_merge_exactly_once_on_redelivery(spark, tmp_path):
    t, eng = _mk(spark, tmp_path)
    src = spark.createDataFrame([("a", [1], 1, "s")], SRC)
    assert merge_into(eng, src, epoch_id=7) is not None
    v = t.current_version()
    # same epoch_id redelivered → ledger skip, no new version
    assert merge_into(eng, src, epoch_id=7) is None
    assert t.current_version() == v


def test_merge_duplicate_source_keys_rejected(spark, tmp_path):
    t, eng = _mk(spark, tmp_path)
    dup = spark.createDataFrame([("a", [1], 1, "s"), ("a", [2], 1, "s")], SRC)
    with pytest.raises(ValueError, match="multiple rows for key"):
        merge_into(eng, dup)
    with pytest.raises(ValueError, match="lacks the table key"):
        merge_into(eng, spark.createDataFrame([([1],)], "tokens array<int>"))


def test_merge_schema_evolution_from_source_column(spark, tmp_path):
    t, eng = _mk(spark, tmp_path)
    merge_into(eng, spark.createDataFrame([("a", [1], 1, "s")], SRC))
    evolved = spark.createDataFrame(
        [("b", [2], 1, "s", "wiki")], SRC + ", domain string"
    )
    merge_into(eng, evolved)
    got = {r["doc_id"]: r["domain"] for r in read_state(t).collect()}
    # new column present for b, null-backfilled for pre-evolution a
    assert got == {"a": None, "b": "wiki"}


def test_merge_into_mor_engine(spark, tmp_path):
    t, eng = _mk(spark, tmp_path, mode="mor")
    merge_into(eng, spark.createDataFrame([("a", [1], 1, "s")], SRC))
    merge_into(
        eng,
        spark.createDataFrame([("a", [5], 1, "s2"), ("b", None, None, "x")], SRC),
        delete_where=F.col("tokens").isNull(),
    )
    got = {r["doc_id"]: list(r["tokens"]) for r in read_state(t).collect()}
    assert got == {"a": [5]}
