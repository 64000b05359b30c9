"""historyize (SCD-2 from the CDF): an append-only history table with
one liveness-flagged row per (key, hop) transition — delete leaves a
dead marker, re-insert a fresh live row — feeding AsofJoinMV as the
point-in-time dimension."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.streaming.cascade import CascadeTailer
from blockchain_etl_spark.streaming.history import (
    create_history_table,
    history_transform,
)
from blockchain_etl_spark.tables.snapshot import SnapshotTable

from tests.test_join_mv import DIM_EV, DIM_SCHEMA


def _dim_ev(spark, rows, lsn):
    return spark.createDataFrame(
        [(lsn, lsn, i, op, None, k, w) for i, (op, k, w) in enumerate(rows)],
        DIM_EV,
    )


def test_historyize_transitions_and_exactly_once(spark, tmp_path):
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    deng = CdcEngine(spark, dim, mode="cow", collect_metrics=False)
    hist = create_history_table(
        spark, str(tmp_path / "hist"), dim, ["weight"], n_buckets=2
    )
    tailer = CascadeTailer(
        dim, CdcEngine(spark, hist, collect_metrics=False),
        str(tmp_path / "cur.json"),
        transform=history_transform(["weight"]),
    )

    # v1: s1, s2 born
    deng.apply_epoch(_dim_ev(spark, [("I", "s1", 10), ("I", "s2", 20)], 1),
                     epoch_id=0)
    tailer.run_once()
    # v2: s1 reweighted, s2 deleted
    deng.apply_epoch(_dim_ev(spark, [("U", "s1", 11), ("D", "s2", None)], 2),
                     epoch_id=1)
    tailer.run_once()
    # v3: s2 re-born
    deng.apply_epoch(_dim_ev(spark, [("I", "s2", 22)], 3), epoch_id=2)
    tailer.run_once()

    got = {
        (r["k"], r["vf"]): (r["is_live"], r["weight"])
        for r in read_state(hist).collect()
    }
    assert got == {
        ("s1", 1): (True, 10),
        ("s2", 1): (True, 20),
        ("s1", 2): (True, 11),
        ("s2", 2): (False, None),   # dead marker, payload nulled
        ("s2", 3): (True, 22),      # rebirth = fresh live row
    }
    # caught up -> no-op; history is append-only and exactly-once
    assert tailer.run_once() is None
    assert read_state(hist).count() == 5


def test_historyize_feeds_asof_join(spark, tmp_path):
    """The composition: facts at ts 1..3 resolve each key's payload AS
    OF their ts through the generated history — including seeing the
    dead marker (null payload, is_live false) after a delete."""
    from blockchain_etl_spark.streaming.join_mv import AsofJoinMV

    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    deng = CdcEngine(spark, dim, mode="cow", collect_metrics=False)
    hist = create_history_table(
        spark, str(tmp_path / "hist"), dim, ["weight"], n_buckets=2
    )
    tailer = CascadeTailer(
        dim, CdcEngine(spark, hist, collect_metrics=False),
        str(tmp_path / "cur.json"),
        transform=history_transform(["weight"]),
    )
    fact_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("kk", T.StringType()),
        T.StructField("ets", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), fact_schema, key="doc_id", n_buckets=2
    )
    feng = CdcEngine(spark, fact, collect_metrics=False)
    jm = AsofJoinMV(
        spark, fact, hist, str(tmp_path / "asof"), join_col="kk",
        ts_col="ets", hist_key_col="k", hist_ts_col="vf",
        fact_cols=[], dim_cols=["is_live", "weight"], n_buckets=2,
    )

    # one tailer hop per dim commit — a hop NETS its range, so batching
    # all three would collapse the intermediate transitions (documented)
    deng.apply_epoch(_dim_ev(spark, [("I", "s1", 10)], 1), epoch_id=0)  # v1
    tailer.run_once()
    deng.apply_epoch(_dim_ev(spark, [("D", "s1", None)], 2), epoch_id=1)  # v2
    tailer.run_once()
    deng.apply_epoch(_dim_ev(spark, [("I", "s1", 30)], 3), epoch_id=2)  # v3
    tailer.run_once()
    feng.apply_epoch(spark.createDataFrame(
        [(1, 1, i, "I", None, f"f{t}", "s1", t)
         for i, t in enumerate([1, 2, 3])],
        "stream_pos long, lsn long, seq int, op string, rollback_to_lsn long, "
        "doc_id string, kk string, ets long",
    ), epoch_id=0)
    assert jm.run_once() is not None
    got = {
        r["fact_id"]: (r["vf"], r["is_live"], r["weight"])
        for r in jm.state().collect()
    }
    assert got == {
        "f1": (1, True, 10),    # as of ts 1: alive at 10
        "f2": (2, False, None),  # as of ts 2: deleted
        "f3": (3, True, 30),    # as of ts 3: re-born at 30
    }
