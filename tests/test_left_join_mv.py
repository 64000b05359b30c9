"""LeftJoinMV (incremental LEFT OUTER join): after every hop the MV
must equal a from-scratch left join of the two tables' current states —
through unmatched inserts, late dim arrival (unmatched → matched), dim
deletes (matched → unmatched, null-extended rows reappear), null join
values (never match, always unmatched), fact deletes on both sides of
the match boundary, and same-hop changes on both inputs (the
ΔU = ΔA⋈(1−m_old) − A_new⋈Δm cross-term cancellation)."""

import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.join_mv import LeftJoinMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable

from tests.test_join_mv import DIM_EV, DIM_SCHEMA, _frow


def _mk(spark, tmp_path):
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    jm = LeftJoinMV(
        spark, fact, dim, str(tmp_path / "ljm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
    )
    return (fact, CdcEngine(spark, fact, collect_metrics=False),
            dim, CdcEngine(spark, dim, collect_metrics=False), jm)


def _recompute(fact, dim):
    j = read_state(fact).alias("f").join(
        read_state(dim).alias("d"),
        F.col("f.source") == F.col("d.doc_id"), "left_outer",
    )
    return {
        r["fact_id"]: (r["source"], r["n_tok"], r["weight"])
        for r in j.select(
            F.col("f.doc_id").alias("fact_id"), F.col("f.source").alias("source"),
            F.col("f.n_tok").alias("n_tok"), F.col("d.weight").alias("weight"),
        ).collect()
    }


def _got(jm):
    return {
        r["fact_id"]: (r["source"], r["n_tok"], r["weight"])
        for r in jm.state().collect()
    }


def test_left_join_mv_tracks_match_boundary(spark, tmp_path):
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)

    # hop 1: one matched, one unmatched, one null-join-value fact
    deng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "s1", 10),
    ], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1, 2], "s1"),
        _frow(1, 1, 1, "I", "b", [3], "s9"),       # no dim row
        _frow(2, 1, 2, "I", "c", [4, 5, 6], None),  # null join value
    ]), epoch_id=0)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        "a": ("s1", 2, 10), "b": ("s9", 1, None), "c": (None, 3, None),
    }

    # hop 2, same-hop changes on BOTH sides: s9 arrives (b flips
    # unmatched -> matched), s1 reweights (a's inner tuple retracts +
    # reinserts; its unmatched side must stay absent), d inserts
    # unmatched under a value that was NEVER in the dim
    deng.apply_epoch(spark.createDataFrame([
        (1, 2, 0, "I", None, "s9", 90),
        (2, 2, 1, "U", None, "s1", 11),
    ], DIM_EV), epoch_id=1)
    feng.apply_epoch(events_to_df(spark, [
        _frow(3, 2, 0, "I", "d", [7], "s5"),
    ]), epoch_id=1)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        "a": ("s1", 2, 11), "b": ("s9", 1, 90), "d": ("s5", 1, None),
        "c": (None, 3, None),
    }

    # hop 3: dim s1 deleted -> a flips matched -> unmatched (null-
    # extended); unmatched d deleted outright; null-value c deleted
    deng.apply_epoch(spark.createDataFrame([
        (3, 3, 0, "D", None, "s1", None),
    ], DIM_EV), epoch_id=2)
    feng.apply_epoch(events_to_df(spark, [
        _frow(4, 3, 0, "D", "d", None, None),
        _frow(5, 3, 1, "D", "c", None, None),
    ]), epoch_id=2)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        "a": ("s1", 2, None), "b": ("s9", 1, 90),
    }

    # caught up -> no-op
    assert jm.run_once() is None

    # hop 4: fact a re-points s1 -> s9 (unmatched retracts, inner
    # tuple appears) — one-sided hop
    feng.apply_epoch(events_to_df(spark, [
        _frow(6, 4, 0, "U", "a", [1, 2], "s9"),
    ]), epoch_id=3)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        "a": ("s9", 2, 90), "b": ("s9", 1, 90),
    }


def test_left_join_mv_dim_only_hops(spark, tmp_path):
    """Dim-only churn flips match liveness for standing facts — the
    A_new⋈Δm leg alone, including a delete+reinsert in ONE hop (a net
    no-transition: the CDF diffs states, so nothing moves)."""
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1], "s1"),
        _frow(1, 1, 1, "I", "b", [2], "s2"),
    ]), epoch_id=0)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        "a": ("s1", 1, None), "b": ("s2", 1, None),
    }

    deng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "s1", 10),
    ], DIM_EV), epoch_id=0)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        "a": ("s1", 1, 10), "b": ("s2", 1, None),
    }

    # delete + reinsert s1 across two dim commits, ONE hop: net state
    # change is only the weight — a flips tuples, never unmatched
    deng.apply_epoch(spark.createDataFrame([
        (1, 2, 0, "D", None, "s1", None),
    ], DIM_EV), epoch_id=1)
    deng.apply_epoch(spark.createDataFrame([
        (2, 3, 0, "I", None, "s1", 12),
    ], DIM_EV), epoch_id=2)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        "a": ("s1", 1, 12), "b": ("s2", 1, None),
    }


def test_left_join_mv_resumes(spark, tmp_path):
    """A fresh instance over the same root resumes from lineage; a
    caught-up hop is a no-op and state survives reconstruction."""
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)
    deng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "s1", 10),
    ], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1], "s1"),
        _frow(1, 1, 1, "I", "b", [2], "s2"),
    ]), epoch_id=0)
    assert jm.run_once() is not None
    want = _got(jm)

    jm2 = LeftJoinMV(
        spark, fact, dim, str(tmp_path / "ljm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
    )
    assert jm2.run_once() is None
    assert _got(jm2) == want == _recompute(fact, dim)
