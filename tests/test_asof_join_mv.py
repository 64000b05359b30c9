"""AsofJoinMV (incremental point-in-time join): after every hop the MV
must equal a from-scratch LEFT AS-OF join of the two tables' current
states — each fact row paired with the latest history row of its key
at-or-before the fact's ts, null-extended when none exists. Exercises
history BACKFILL (a row inserted with a ts in the past must
retroactively steal exactly the fact rows in its win window), fact
churn, same-hop changes on both inputs, and resume."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.streaming.join_mv import AsofJoinMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable

FACT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("k", T.StringType()),
    T.StructField("ets", T.LongType()),
    T.StructField("val", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
HIST_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("hk", T.StringType()),
    T.StructField("vf", T.LongType()),
    T.StructField("weight", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
FACT_EV = ("stream_pos long, lsn long, seq int, op string, "
           "rollback_to_lsn long, doc_id string, k string, ets long, val long")
HIST_EV = ("stream_pos long, lsn long, seq int, op string, "
           "rollback_to_lsn long, doc_id string, hk string, vf long, "
           "weight long")


def _mk(spark, tmp_path):
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), FACT_SCHEMA, key="doc_id", n_buckets=4
    )
    hist = SnapshotTable.create(
        spark, str(tmp_path / "hist"), HIST_SCHEMA, key="doc_id",
        n_buckets=2, bucket_key="hk",
    )
    jm = AsofJoinMV(
        spark, fact, hist, str(tmp_path / "asof"), join_col="k",
        ts_col="ets", hist_key_col="hk", hist_ts_col="vf",
        fact_cols=["val"], dim_cols=["weight"], n_buckets=2,
    )
    return (fact, CdcEngine(spark, fact, collect_metrics=False),
            hist, CdcEngine(spark, hist, collect_metrics=False), jm)


def _fev(spark, rows, lsn):
    return spark.createDataFrame(
        [(lsn, lsn, i, op, None, d, k, e, v)
         for i, (op, d, k, e, v) in enumerate(rows)], FACT_EV)


def _hev(spark, rows, lsn):
    return spark.createDataFrame(
        [(lsn, lsn, i, op, None, f"{k}@{vf}", k, vf, w)
         for i, (op, k, vf, w) in enumerate(rows)], HIST_EV)


def _recompute(fact, hist):
    f, h = read_state(fact).alias("f"), read_state(hist).alias("h")
    j = f.join(h, (F.col("f.k") == F.col("h.hk"))
               & (F.col("h.vf") <= F.col("f.ets")), "left")
    w = Window.partitionBy("f.doc_id").orderBy(F.col("h.vf").desc_nulls_last())
    return {
        r["fact_id"]: (r["k"], r["ets"], r["val"], r["vf"], r["weight"])
        for r in j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("f.doc_id").alias("fact_id"), "f.k", "f.ets", "f.val",
                "h.vf", "h.weight").collect()
    }


def _got(jm):
    return {
        r["fact_id"]: (r["k"], r["ets"], r["val"], r["vf"], r["weight"])
        for r in jm.state().collect()
    }


def test_asof_join_mv_backfill_rewrites_window(spark, tmp_path):
    fact, feng, hist, heng, jm = _mk(spark, tmp_path)

    # hop 1: history at vf 0 and 20 for k1; facts at ets 5, 25, and a
    # key with no history, and a null-ts fact
    heng.apply_epoch(_hev(spark, [
        ("I", "k1", 0, 100), ("I", "k1", 20, 120),
    ], lsn=1), epoch_id=0)
    feng.apply_epoch(_fev(spark, [
        ("I", "a", "k1", 5, 1), ("I", "b", "k1", 25, 2),
        ("I", "c", "k9", 7, 3), ("I", "d", "k1", None, 4),
    ], lsn=1), epoch_id=0)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, hist) == {
        "a": ("k1", 5, 1, 0, 100),
        "b": ("k1", 25, 2, 20, 120),
        "c": ("k9", 7, 3, None, None),
        "d": ("k1", None, 4, None, None),
    }

    # hop 2: BACKFILL k1@10 — must steal exactly the facts with
    # ets in [10, 20): none of a (ets 5) or b (ets 25)... so also add
    # a fact at ets 15 in the SAME hop (resolved against H@old by leg1,
    # then re-resolved by the backfill leg — cross-term check)
    heng.apply_epoch(_hev(spark, [("I", "k1", 10, 110)], lsn=2), epoch_id=1)
    feng.apply_epoch(_fev(spark, [("I", "e", "k1", 15, 5)], lsn=2), epoch_id=1)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, hist) == {
        "a": ("k1", 5, 1, 0, 100),
        "b": ("k1", 25, 2, 20, 120),
        "c": ("k9", 7, 3, None, None),
        "d": ("k1", None, 4, None, None),
        "e": ("k1", 15, 5, 10, 110),
    }

    # hop 3: history k1@20 RETRACTED (reorg-style) -> b falls back to
    # the backfilled k1@10; fact a re-times to ets 30 (winner moves)
    heng.apply_epoch(_hev(spark, [("D", "k1", 20, None)], lsn=3), epoch_id=2)
    feng.apply_epoch(_fev(spark, [("U", "a", "k1", 30, 1)], lsn=3), epoch_id=2)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, hist) == {
        "a": ("k1", 30, 1, 10, 110),
        "b": ("k1", 25, 2, 10, 110),
        "c": ("k9", 7, 3, None, None),
        "d": ("k1", None, 4, None, None),
        "e": ("k1", 15, 5, 10, 110),
    }

    # caught up -> no-op
    assert jm.run_once() is None

    # hop 4: first history for k9 arrives at vf 7 (boundary: vf <= ets
    # INCLUSIVE, so c at ets 7 matches); fact b deleted
    heng.apply_epoch(_hev(spark, [("I", "k9", 7, 900)], lsn=4), epoch_id=3)
    feng.apply_epoch(_fev(spark, [("D", "b", None, None, None)], lsn=4),
                     epoch_id=3)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, hist) == {
        "a": ("k1", 30, 1, 10, 110),
        "c": ("k9", 7, 3, 7, 900),
        "d": ("k1", None, 4, None, None),
        "e": ("k1", 15, 5, 10, 110),
    }


def test_asof_join_mv_resumes(spark, tmp_path):
    fact, feng, hist, heng, jm = _mk(spark, tmp_path)
    heng.apply_epoch(_hev(spark, [("I", "k1", 0, 100)], lsn=1), epoch_id=0)
    feng.apply_epoch(_fev(spark, [("I", "a", "k1", 5, 1)], lsn=1), epoch_id=0)
    assert jm.run_once() is not None
    want = _got(jm)

    jm2 = AsofJoinMV(
        spark, fact, hist, str(tmp_path / "asof"), join_col="k",
        ts_col="ets", hist_key_col="hk", hist_ts_col="vf",
        fact_cols=["val"], dim_cols=["weight"], n_buckets=2,
    )
    assert jm2.run_once() is None
    assert _got(jm2) == want == _recompute(fact, hist)
