"""Column merge policies (≙ the reference's per-table upsert hooks,
ethereumetl/streaming/postgres_hooks.py:43-150: counters add, first_*
keep earliest, last_* take newest): policy fold in the MOR resolver,
the COW merge, and the in-batch pre-aggregation — all three must
compose to the same state."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.tables.snapshot import SnapshotTable

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_xfers", T.LongType()),
    T.StructField("first_blknum", T.LongType()),
    T.StructField("last_value", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
POLICIES = {"n_xfers": "add", "first_blknum": "first", "last_value": "last"}

EV_SCHEMA = T.StructType([
    T.StructField("stream_pos", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("op", T.StringType()),
    T.StructField("rollback_to_lsn", T.LongType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_xfers", T.LongType()),
    T.StructField("first_blknum", T.LongType()),
    T.StructField("last_value", T.LongType()),
])


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _epochs():
    # epoch 0: a twice (in-batch fold), b once
    e0 = [
        (0, 10, 0, "I", None, "a", 1, 100, 5),
        (1, 11, 0, "U", None, "a", 2, None, 7),
        (2, 12, 0, "I", None, "b", 1, 200, 9),
    ]
    # epoch 1: a again, b deleted (tombstone carries totals)
    e1 = [
        (3, 13, 0, "U", None, "a", 3, None, 11),
        (4, 14, 0, "D", None, "b", None, None, None),
    ]
    # epoch 2: b re-inserted — totals resume; a untouched
    e2 = [
        (5, 15, 0, "I", None, "b", 4, 300, 13),
    ]
    return [e0, e1, e2]


EXPECT = {
    # n_xfers summed; first_blknum earliest non-null; last_value newest
    "a": (6, 100, 11),
    "b": (5, 200, 13),  # 1 + 4; first 200 survives the tombstone
}


def _state(table):
    return {
        r["doc_id"]: (r["n_xfers"], r["first_blknum"], r["last_value"])
        for r in read_state(table).collect()
    }


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_policy_fold_mor_and_cow_agree(spark, tmp_path, mode):
    t = SnapshotTable.create(
        spark, str(tmp_path / mode), SCHEMA, n_buckets=4, policies=POLICIES
    )
    eng = CdcEngine(spark, t, mode=mode, collect_metrics=False)
    for i, rows in enumerate(_epochs()):
        eng.apply_epoch(_ev(spark, rows), i)
    assert _state(t) == EXPECT


def test_policy_compaction_preserves_totals(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, policies=POLICIES
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    epochs = _epochs()
    eng.apply_epoch(_ev(spark, epochs[0]), 0)
    t.compact()  # folds deltas into a base row carrying the totals
    eng.apply_epoch(_ev(spark, epochs[1]), 1)
    eng.apply_epoch(_ev(spark, epochs[2]), 2)
    assert _state(t) == EXPECT
    t.compact()
    assert _state(t) == EXPECT


def test_policy_tombstone_hides_key_until_reinsert(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, policies=POLICIES
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    epochs = _epochs()
    eng.apply_epoch(_ev(spark, epochs[0]), 0)
    eng.apply_epoch(_ev(spark, epochs[1]), 1)
    assert set(_state(t)) == {"a"}  # b hidden by the tombstone
    eng.apply_epoch(_ev(spark, epochs[2]), 2)
    assert set(_state(t)) == {"a", "b"}


def test_policy_is_part_of_create_identity(spark, tmp_path):
    path = str(tmp_path / "t")
    SnapshotTable.create(spark, path, SCHEMA, n_buckets=4, policies=POLICIES)
    with pytest.raises(FileExistsError):
        SnapshotTable.create(spark, path, SCHEMA, n_buckets=4)  # no policies
    with pytest.raises(ValueError):
        SnapshotTable.create(
            spark, str(tmp_path / "bad"), SCHEMA, policies={"nope": "add"}
        )
    with pytest.raises(ValueError):
        SnapshotTable.create(
            spark, str(tmp_path / "bad2"), SCHEMA, policies={"n_xfers": "sum"}
        )
