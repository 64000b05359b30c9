"""FullOuterJoinMV: after every hop the MV must equal a from-scratch
FULL OUTER join of the two tables' current states — dim rows with no
live fact (fact side null-extended), fact rows with no dim (dim side
null-extended), inner tuples, and the liveness transitions that move
rows between the three: last fact row of a value deleted (dim row must
REAPPEAR null-extended), first fact row of a value inserted (dim row's
unmatched tuple retracts), same-hop changes on both inputs (the
ΔU_B = ΔB⋈(1−m_A@old) − B@new⋈Δm_A cross-term cancellation)."""

import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.join_mv import FullOuterJoinMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable

from tests.test_join_mv import DIM_EV, DIM_SCHEMA, _frow


def _mk(spark, tmp_path):
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    jm = FullOuterJoinMV(
        spark, fact, dim, str(tmp_path / "fjm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
    )
    return (fact, CdcEngine(spark, fact, collect_metrics=False),
            dim, CdcEngine(spark, dim, collect_metrics=False), jm)


def _recompute(fact, dim):
    j = read_state(fact).alias("f").join(
        read_state(dim).alias("d"),
        F.col("f.source") == F.col("d.doc_id"), "full_outer",
    )
    return {
        (r["fact_id"], r["dim_id"]): (r["source"], r["n_tok"], r["weight"])
        for r in j.select(
            F.col("f.doc_id").alias("fact_id"), F.col("f.source").alias("source"),
            F.col("f.n_tok").alias("n_tok"), F.col("d.doc_id").alias("dim_id"),
            F.col("d.weight").alias("weight"),
        ).collect()
    }


def _got(jm):
    return {
        (r["fact_id"], r["dim_id"]): (r["source"], r["n_tok"], r["weight"])
        for r in jm.state().collect()
    }


def test_full_outer_join_mv_three_regions(spark, tmp_path):
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)

    # hop 1: matched pair, unmatched fact, unmatched dim, null-value fact
    deng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "s1", 10),
        (1, 1, 1, "I", None, "s7", 70),   # no fact row
    ], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1, 2], "s1"),
        _frow(1, 1, 1, "I", "b", [3], "s9"),       # no dim row
        _frow(2, 1, 2, "I", "c", [4, 5, 6], None),  # null join value
    ]), epoch_id=0)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        ("a", "s1"): ("s1", 2, 10),
        ("b", None): ("s9", 1, None),
        ("c", None): (None, 3, None),
        (None, "s7"): (None, None, 70),
    }
    # the RIGHT OUTER view: inner ∪ dim-unmatched, fact orphans gone
    assert {
        (r["fact_id"], r["dim_id"]) for r in jm.right_state().collect()
    } == {("a", "s1"), (None, "s7")}

    # hop 2, both sides: dim s9 arrives (b's fact tuple flips matched,
    # NOT a dim-unmatched insert — cross-term: ΔB row lands while a0's
    # index says s9 dead, but leg2 sees s9 became live? no: fact didn't
    # change s9 this hop — the ΔB anti keys off A@old where b ALREADY
    # lives, so nothing inserts); second fact row lands on s1 (inner
    # multiplicity, no liveness flip); fact row on s7 (dim-unmatched s7
    # must retract)
    deng.apply_epoch(spark.createDataFrame([
        (2, 2, 0, "I", None, "s9", 90),
    ], DIM_EV), epoch_id=1)
    feng.apply_epoch(events_to_df(spark, [
        _frow(3, 2, 0, "I", "d", [7, 8], "s1"),
        _frow(4, 2, 1, "I", "e", [9], "s7"),
    ]), epoch_id=1)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        ("a", "s1"): ("s1", 2, 10),
        ("d", "s1"): ("s1", 2, 10),
        ("b", "s9"): ("s9", 1, 90),
        ("e", "s7"): ("s7", 1, 70),
        ("c", None): (None, 3, None),
    }

    # hop 3: LAST fact row of s7 deleted -> dim s7 reappears unmatched;
    # ONE of s1's two fact rows deleted -> s1 stays matched (count 2->1,
    # no liveness flip); dim s9 deleted -> b flips fact-unmatched
    deng.apply_epoch(spark.createDataFrame([
        (3, 3, 0, "D", None, "s9", None),
    ], DIM_EV), epoch_id=2)
    feng.apply_epoch(events_to_df(spark, [
        _frow(5, 3, 0, "D", "e", None, None),
        _frow(6, 3, 1, "D", "d", None, None),
    ]), epoch_id=2)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        ("a", "s1"): ("s1", 2, 10),
        ("b", None): ("s9", 1, None),
        ("c", None): (None, 3, None),
        (None, "s7"): (None, None, 70),
    }

    # caught up -> no-op
    assert jm.run_once() is None

    # hop 4, one-sided dim churn: s7 reweights while unmatched (its
    # null-extended tuple retracts + reinserts with the new weight)
    deng.apply_epoch(spark.createDataFrame([
        (4, 4, 0, "U", None, "s7", 77),
    ], DIM_EV), epoch_id=3)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        ("a", "s1"): ("s1", 2, 10),
        ("b", None): ("s9", 1, None),
        ("c", None): (None, 3, None),
        (None, "s7"): (None, None, 77),
    }


def test_full_outer_same_hop_cancellation(spark, tmp_path):
    """The cross terms: a dim row and its FIRST fact row arriving in
    the SAME hop must net zero dim-unmatched tuples; a dim row arriving
    in the same hop its LAST fact row dies must net one."""
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1], "s2"),
    ]), epoch_id=0)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {("a", None): ("s2", 1, None)}

    # same hop: dim s1 + first fact row on s1 (cancel to inner);
    # dim s2 + delete of s2's only fact row (dim-unmatched survives)
    deng.apply_epoch(spark.createDataFrame([
        (0, 2, 0, "I", None, "s1", 10),
        (1, 2, 1, "I", None, "s2", 20),
    ], DIM_EV), epoch_id=1)
    feng.apply_epoch(events_to_df(spark, [
        _frow(1, 2, 0, "I", "b", [2], "s1"),
        _frow(2, 2, 1, "D", "a", None, None),
    ]), epoch_id=1)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        ("b", "s1"): ("s1", 1, 10),
        (None, "s2"): (None, None, 20),
    }


def test_full_outer_join_mv_resumes(spark, tmp_path):
    """A fresh instance over the same root resumes from lineage; a
    caught-up hop is a no-op and state survives reconstruction."""
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)
    deng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "s1", 10),
        (1, 1, 1, "I", None, "s3", 30),
    ], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1], "s1"),
        _frow(1, 1, 1, "I", "b", [2], "s2"),
    ]), epoch_id=0)
    assert jm.run_once() is not None
    want = _got(jm)

    jm2 = FullOuterJoinMV(
        spark, fact, dim, str(tmp_path / "fjm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
    )
    assert jm2.run_once() is None
    assert _got(jm2) == want == _recompute(fact, dim)


def test_full_outer_join_mv_across_upstream_reorg(spark, tmp_path):
    """A chain reorg on the fact side (rollback commit + corrected
    re-apply, tombstone-then-reinsert) must flow through BOTH unmatched
    Z-sets like any other change — fact rows whose value's last live
    row is reorged away must flip their dim back to unmatched. After
    every hop the MV equals a from-scratch full outer join."""
    from blockchain_etl_spark.cdc.generator import generate_changelog
    from blockchain_etl_spark.streaming.epoch_store import EpochStore

    epochs = list(generate_changelog(seed=94, n_epochs=4, p_reorg_epoch=0.6))
    assert sum(1 for ep in epochs for e in ep if e["op"] == "R") > 0, \
        "seed must actually exercise the reorg path"
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    store = EpochStore(spark, str(tmp_path / "store"))
    feng = CdcEngine(spark, fact, epoch_store=store, collect_metrics=False)
    deng = CdcEngine(spark, dim, collect_metrics=False)
    jm = FullOuterJoinMV(
        spark, fact, dim, str(tmp_path / "fjm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
    )
    # dim: HALF the generator's sources (the rest stay fact-unmatched)
    # plus a value no fact ever carries (stays dim-unmatched throughout)
    srcs = sorted({
        e["source"] for ep in epochs for e in ep if e.get("source") is not None
    })[::2] + ["zz#never"]
    deng.apply_epoch(spark.createDataFrame(
        [(i, 1, i, "U", None, s, (i + 1) * 10) for i, s in enumerate(srcs)],
        DIM_EV,
    ), epoch_id=0)
    for i, ep in enumerate(epochs):
        df = events_to_df(spark, ep)
        store.write_epoch(i, df)
        feng.apply_epoch(df, epoch_id=i)
        jm.run_once()
        assert _got(jm) == _recompute(fact, dim)
