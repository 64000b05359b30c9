"""RangeJoinMV (incremental interval join on a grid-cell index): after
every hop the MV must equal a from-scratch range join of current
states — N:M through overlapping intervals, intervals spanning many
cells, fact values on lo (inclusive) and hi (exclusive) boundaries,
interval reshapes, and same-hop churn on both inputs."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.streaming.join_mv import RangeJoinMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable

FACT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("v", T.LongType()),
    T.StructField("val", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
IVL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("lo", T.LongType()),
    T.StructField("hi", T.LongType()),
    T.StructField("w", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
FACT_EV = ("stream_pos long, lsn long, seq int, op string, "
           "rollback_to_lsn long, doc_id string, v long, val long")
IVL_EV = ("stream_pos long, lsn long, seq int, op string, "
          "rollback_to_lsn long, doc_id string, lo long, hi long, w long")


def _mk(spark, tmp_path, cell_size=4):
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), FACT_SCHEMA, key="doc_id", n_buckets=4
    )
    ivl = SnapshotTable.create(
        spark, str(tmp_path / "ivl"), IVL_SCHEMA, key="doc_id", n_buckets=2
    )
    jm = RangeJoinMV(
        spark, fact, ivl, str(tmp_path / "rng"), val_col="v",
        lo_col="lo", hi_col="hi", fact_cols=["val"], dim_cols=["w"],
        cell_size=cell_size, n_buckets=2,
    )
    return (fact, CdcEngine(spark, fact, collect_metrics=False),
            ivl, CdcEngine(spark, ivl, collect_metrics=False), jm)


def _fev(spark, rows, lsn):
    return spark.createDataFrame(
        [(lsn, lsn, i, op, None, d, v, x)
         for i, (op, d, v, x) in enumerate(rows)], FACT_EV)


def _iev(spark, rows, lsn):
    return spark.createDataFrame(
        [(lsn, lsn, i, op, None, d, lo, hi, w)
         for i, (op, d, lo, hi, w) in enumerate(rows)], IVL_EV)


def _recompute(fact, ivl):
    f, d = read_state(fact).alias("f"), read_state(ivl).alias("d")
    j = f.join(d, (F.col("d.lo") <= F.col("f.v"))
               & (F.col("f.v") < F.col("d.hi")), "inner")
    return {
        (r["fid"], r["iid"]): (r["v"], r["val"], r["lo"], r["hi"], r["w"])
        for r in j.select(
            F.col("f.doc_id").alias("fid"), F.col("d.doc_id").alias("iid"),
            "f.v", "f.val", "d.lo", "d.hi", "d.w").collect()
    }


def _got(jm):
    return {
        (r["fact_id"], r["ivl_id"]): (r["v"], r["val"], r["lo"], r["hi"], r["w"])
        for r in jm.state().collect()
    }


def test_range_join_mv_tracks_churn(spark, tmp_path):
    fact, feng, ivl, ieng, jm = _mk(spark, tmp_path)

    # hop 1: overlapping intervals (N:M), a multi-cell-span interval,
    # values exactly on lo (in) and hi (out), a value in no interval,
    # and a null value
    ieng.apply_epoch(_iev(spark, [
        ("I", "i1", 0, 10, 100),    # spans cells 0-2
        ("I", "i2", 5, 7, 200),     # overlaps i1
        ("I", "i3", 20, 21, 300),   # single point
    ], lsn=1), epoch_id=0)
    feng.apply_epoch(_fev(spark, [
        ("I", "a", 5, 1),    # in i1 AND i2 (lo boundary of i2)
        ("I", "b", 7, 2),    # in i1 only (hi of i2 is exclusive)
        ("I", "c", 15, 3),   # no interval
        ("I", "d", 20, 4),   # i3's point
        ("I", "e", None, 5),
    ], lsn=1), epoch_id=0)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, ivl) == {
        ("a", "i1"): (5, 1, 0, 10, 100),
        ("a", "i2"): (5, 1, 5, 7, 200),
        ("b", "i1"): (7, 2, 0, 10, 100),
        ("d", "i3"): (20, 4, 20, 21, 300),
    }

    # hop 2, both sides: i1 reshapes to [6, 16) (a falls out, b stays,
    # c at 15 falls IN); a new fact lands inside i2 same-hop
    ieng.apply_epoch(_iev(spark, [
        ("U", "i1", 6, 16, 110),
    ], lsn=2), epoch_id=1)
    feng.apply_epoch(_fev(spark, [
        ("I", "f", 6, 6),
    ], lsn=2), epoch_id=1)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, ivl) == {
        ("a", "i2"): (5, 1, 5, 7, 200),
        ("b", "i1"): (7, 2, 6, 16, 110),
        ("c", "i1"): (15, 3, 6, 16, 110),
        ("d", "i3"): (20, 4, 20, 21, 300),
        ("f", "i1"): (6, 6, 6, 16, 110),
        ("f", "i2"): (6, 6, 5, 7, 200),
    }

    # hop 3: i2 deleted; fact b moves to v=40 (out of everything);
    # fact d deleted
    ieng.apply_epoch(_iev(spark, [
        ("D", "i2", None, None, None),
    ], lsn=3), epoch_id=2)
    feng.apply_epoch(_fev(spark, [
        ("U", "b", 40, 2), ("D", "d", None, None),
    ], lsn=3), epoch_id=2)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, ivl) == {
        ("c", "i1"): (15, 3, 6, 16, 110),
        ("f", "i1"): (6, 6, 6, 16, 110),
    }

    # caught up -> no-op
    assert jm.run_once() is None


def test_range_join_mv_resumes(spark, tmp_path):
    fact, feng, ivl, ieng, jm = _mk(spark, tmp_path)
    ieng.apply_epoch(_iev(spark, [("I", "i1", 0, 8, 10)], lsn=1), epoch_id=0)
    feng.apply_epoch(_fev(spark, [("I", "a", 3, 1)], lsn=1), epoch_id=0)
    assert jm.run_once() is not None
    want = _got(jm)

    jm2 = RangeJoinMV(
        spark, fact, ivl, str(tmp_path / "rng"), val_col="v",
        lo_col="lo", hi_col="hi", fact_cols=["val"], dim_cols=["w"],
        cell_size=4, n_buckets=2,
    )
    assert jm2.run_once() is None
    assert _got(jm2) == want == _recompute(fact, ivl)
