"""Incremental join MV (Δ(A⋈B) = ΔA⋈B_old + A_new⋈ΔB): after every
hop the MV must equal a from-scratch inner join of the two tables'
current states — through fact inserts/updates/deletes, dim payload
updates (every matching tuple retracts + reinserts), a fact row
re-pointing at a different dim key, dim deletes, and same-hop changes
on both sides (the cross-term cancellation)."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.join_mv import GeneralJoinMV, JoinMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable

# engine convention: every engine-applied table's key is NAMED doc_id
# (here it holds the source value)
DIM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("weight", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
DIM_EV = T.StructType([
    T.StructField("stream_pos", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("op", T.StringType()),
    T.StructField("rollback_to_lsn", T.LongType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("weight", T.LongType()),
])


def _frow(pos, lsn, seq, op, doc, toks, src):
    return dict(
        stream_pos=pos, lsn=lsn, seq=seq, op=op, doc_id=doc, tokens=toks,
        n_tok=len(toks) if toks is not None else None, source=src,
        rollback_to_lsn=None, epoch_hash=f"e{pos}",
    )


def _mk(spark, tmp_path, indexed=False):
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    jm = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2, indexed=indexed,
    )
    return (fact, CdcEngine(spark, fact, collect_metrics=False),
            dim, CdcEngine(spark, dim, collect_metrics=False), jm)


def _recompute(fact, dim):
    j = read_state(fact).alias("f").join(
        read_state(dim).alias("d"),
        F.col("f.source") == F.col("d.doc_id"), "inner",
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


@pytest.mark.parametrize("indexed", [False, True], ids=["scan", "indexed"])
def test_join_mv_tracks_both_sides(spark, tmp_path, indexed):
    fact, feng, dim, deng, jm = _mk(spark, tmp_path, indexed=indexed)

    # hop 1: two dims, three facts (one unmatched -> absent from MV)
    deng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "s1", 10),
        (1, 1, 1, "I", None, "s2", 20),
    ], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1, 2], "s1"),
        _frow(1, 1, 1, "I", "b", [3], "s2"),
        _frow(2, 1, 2, "I", "c", [4], "s9"),  # no dim match
    ]), epoch_id=0)
    assert jm.run_once() is not None
    got = _got(jm)
    assert got == _recompute(fact, dim) == {
        "a": ("s1", 2, 10), "b": ("s2", 1, 20)
    }
    assert "c" not in got

    # hop 2, same-hop changes on BOTH sides: dim s1 reweights (a's
    # tuple retracts + reinserts), fact b re-points s2 -> s1, fact d
    # inserts under the dim value updated THIS hop (cross-term test)
    deng.apply_epoch(spark.createDataFrame([
        (2, 2, 0, "U", None, "s1", 11),
    ], DIM_EV), epoch_id=1)
    feng.apply_epoch(events_to_df(spark, [
        _frow(3, 2, 0, "U", "b", [3], "s1"),
        _frow(4, 2, 1, "I", "d", [5, 6, 7], "s1"),
    ]), epoch_id=1)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {
        "a": ("s1", 2, 11), "b": ("s1", 1, 11), "d": ("s1", 3, 11)
    }

    # hop 3: dim s1 deleted -> all its tuples retract; fact a deleted
    deng.apply_epoch(spark.createDataFrame([
        (3, 3, 0, "D", None, "s1", None),
    ], DIM_EV), epoch_id=2)
    feng.apply_epoch(events_to_df(spark, [
        _frow(5, 3, 0, "D", "a", None, None),
    ]), epoch_id=2)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {}

    # caught up -> no-op
    assert jm.run_once() is None

    # hop 4: dim s9 appears late -> the waiting fact c joins in
    deng.apply_epoch(spark.createDataFrame([
        (4, 4, 0, "I", None, "s9", 90),
    ], DIM_EV), epoch_id=3)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim) == {"c": ("s9", 1, 90)}


def test_join_mv_one_sided_hops_and_resume(spark, tmp_path):
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)
    deng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "s1", 10),
    ], DIM_EV), epoch_id=0)
    assert jm.run_once() is not None  # dim-only hop, no facts yet
    assert _got(jm) == {}

    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1], "s1"),
    ]), epoch_id=0)
    assert jm.run_once() is not None  # fact-only hop
    assert _got(jm) == _recompute(fact, dim) == {"a": ("s1", 1, 10)}

    # a fresh instance over the same root resumes from the cursors
    jm2 = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
    )
    assert jm2.run_once() is None
    import os
    os.remove(str(tmp_path / "jm" / "join_cursor.json"))
    jm3 = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
    )
    assert jm3.run_once() is None  # ledger-recovered cursor, no replay
    assert _got(jm3) == {"a": ("s1", 1, 10)}


# ---------------------------------------------------------------- N:M
# GeneralJoinMV: join on NON-key columns of both sides — every hop must
# leave the MV equal to a from-scratch inner join of the two current
# states, through N:M fan-out, same-hop changes on both sides, group
# re-pointing, deletes, resume, and a crashed trailing index advance.

A_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("grp", T.StringType()),
    T.StructField("av", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
B_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("grp2", T.StringType()),
    T.StructField("bv", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])


def _aev(spark, rows, lsn):
    return spark.createDataFrame(
        [(lsn * 100 + i, lsn, i, op, None, d, g, v)
         for i, (d, g, v, op) in enumerate(rows)],
        "stream_pos long, lsn long, seq int, op string, rollback_to_lsn long, "
        "doc_id string, grp string, av long",
    )


def _bev(spark, rows, lsn):
    return spark.createDataFrame(
        [(lsn * 100 + i, lsn, i, op, None, d, g, v)
         for i, (d, g, v, op) in enumerate(rows)],
        "stream_pos long, lsn long, seq int, op string, rollback_to_lsn long, "
        "doc_id string, grp2 string, bv long",
    )


def _mk_nm(spark, tmp_path):
    a = SnapshotTable.create(
        spark, str(tmp_path / "a"), A_SCHEMA, key="doc_id", n_buckets=4)
    b = SnapshotTable.create(
        spark, str(tmp_path / "b"), B_SCHEMA, key="doc_id", n_buckets=4)
    jm = GeneralJoinMV(
        spark, a, b, str(tmp_path / "nm"), a_join_col="grp",
        b_join_col="grp2", a_cols=["av"], b_cols=["bv"], n_buckets=4,
    )
    return (a, CdcEngine(spark, a, collect_metrics=False),
            b, CdcEngine(spark, b, collect_metrics=False), jm)


def _nm_recompute(a, b):
    j = read_state(a).alias("l").join(
        read_state(b).alias("r"), F.col("l.grp") == F.col("r.grp2"), "inner")
    return {
        (r["a_id"], r["b_id"]): (r["grp"], r["av"], r["bv"])
        for r in j.select(
            F.col("l.doc_id").alias("a_id"), F.col("r.doc_id").alias("b_id"),
            F.col("l.grp").alias("grp"), F.col("l.av").alias("av"),
            F.col("r.bv").alias("bv"),
        ).collect()
    }


def _nm_got(jm):
    return {
        (r["a_id"], r["b_id"]): (r["grp"], r["av"], r["bv"])
        for r in jm.state().collect()
    }


def test_general_join_mv_nm_fanout(spark, tmp_path):
    a, aeng, b, beng, jm = _mk_nm(spark, tmp_path)

    # hop 1: 2 A-rows and 2 B-rows in g1 (2x2 fan-out), 1x1 in g2,
    # one A row with an unmatched group
    aeng.apply_epoch(_aev(spark, [
        ("a1", "g1", 1, "U"), ("a2", "g1", 2, "U"),
        ("a3", "g2", 3, "U"), ("a4", "g9", 4, "U"),
    ], 1), epoch_id=1)
    beng.apply_epoch(_bev(spark, [
        ("b1", "g1", 10, "U"), ("b2", "g1", 20, "U"), ("b3", "g2", 30, "U"),
    ], 1), epoch_id=1)
    assert jm.run_once() is not None
    got = _nm_got(jm)
    assert got == _nm_recompute(a, b)
    assert len(got) == 5  # 4 in g1 + 1 in g2
    assert got[("a1", "b2")] == ("g1", 1, 20)

    # hop 2, same-hop changes on BOTH sides: a2 re-points g1->g2 (its 2
    # g1 tuples retract, a g2 tuple appears), b1 revalues (both its
    # tuples retract+reinsert), b4 inserts into g2 — against a2's NEW
    # position (cross-term cancellation under fan-out)
    aeng.apply_epoch(_aev(spark, [("a2", "g2", 2, "U")], 2), epoch_id=2)
    beng.apply_epoch(_bev(spark, [
        ("b1", "g1", 11, "U"), ("b4", "g2", 40, "U"),
    ], 2), epoch_id=2)
    assert jm.run_once() is not None
    assert _nm_got(jm) == _nm_recompute(a, b)

    # hop 3: delete b3 (all its g2 partners retract), delete a1
    aeng.apply_epoch(_aev(spark, [("a1", "g1", None, "D")], 3), epoch_id=3)
    beng.apply_epoch(_bev(spark, [("b3", "g2", None, "D")], 3), epoch_id=3)
    assert jm.run_once() is not None
    assert _nm_got(jm) == _nm_recompute(a, b)

    # caught up -> no-op; fresh instance resumes without replay
    assert jm.run_once() is None
    jm2 = GeneralJoinMV(
        spark, a, b, str(tmp_path / "nm"), a_join_col="grp",
        b_join_col="grp2", a_cols=["av"], b_cols=["bv"], n_buckets=4,
    )
    assert jm2.run_once() is None
    assert _nm_got(jm2) == _nm_recompute(a, b)


def test_general_join_mv_heals_crashed_trailing_advance(spark, tmp_path):
    a, aeng, b, beng, jm = _mk_nm(spark, tmp_path)
    aeng.apply_epoch(_aev(spark, [("a1", "g1", 1, "U")], 1), epoch_id=1)
    beng.apply_epoch(_bev(spark, [("b1", "g1", 10, "U")], 1), epoch_id=1)

    # crash AFTER the MV commit, BEFORE the trailing idx_b advance
    real = jm.idx_b.catch_up
    calls = {"n": 0}

    def crashing(to_version, changes=None):
        # step-0 heal (to b0) passes; the trailing advance dies
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash")
        real(to_version, changes=changes)

    jm.idx_b.catch_up = crashing
    with pytest.raises(RuntimeError):
        jm.run_once()
    jm.idx_b.catch_up = real
    assert _nm_got(jm) == _nm_recompute(a, b)  # MV itself committed

    # next hop: ΔA must join B@old (idx_b healed to b0 first), ΔB must
    # join A@new — values stay exact despite the stale index
    aeng.apply_epoch(_aev(spark, [("a2", "g1", 2, "U")], 2), epoch_id=2)
    beng.apply_epoch(_bev(spark, [("b2", "g1", 20, "U")], 2), epoch_id=2)
    assert jm.run_once() is not None
    assert _nm_got(jm) == _nm_recompute(a, b)


def test_general_join_mv_rejects_key_join(spark, tmp_path):
    a = SnapshotTable.create(
        spark, str(tmp_path / "a"), A_SCHEMA, key="doc_id", n_buckets=4)
    b = SnapshotTable.create(
        spark, str(tmp_path / "b"), B_SCHEMA, key="doc_id", n_buckets=4)
    with pytest.raises(ValueError, match="JoinMV"):
        GeneralJoinMV(
            spark, a, b, str(tmp_path / "nm"), a_join_col="doc_id",
            b_join_col="grp2", a_cols=["av"], b_cols=["bv"],
        )


def test_join_mv_across_upstream_reorg(spark, tmp_path):
    """A chain reorg on the fact side (rollback commit + corrected
    re-apply, tombstone-then-reinsert) must flow through the join MV's
    version diffs like any other change — after every hop the MV equals
    a from-scratch join of current states."""
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
    jm = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
    )
    # dim: every source the generator can emit, keyed by source value
    srcs = sorted({
        e["source"] for ep in epochs for e in ep if e.get("source") is not None
    })
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


def test_join_mv_version_retention(spark, tmp_path, monkeypatch):
    """A long hop loop must not accumulate manifests/files O(hops): the
    MV GCs the tables it OWNS (Z-set output + side index) once they
    exceed 2x the retention window, and correctness + resume survive
    because every pinned read targets cursor-adjacent versions."""
    import blockchain_etl_spark.streaming.join_mv as jmv

    monkeypatch.setattr(jmv, "MV_KEEP_VERSIONS", 2)
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    feng = CdcEngine(spark, fact, collect_metrics=False)
    deng = CdcEngine(spark, dim, collect_metrics=False)
    jm = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2, indexed=True,
    )
    deng.apply_epoch(spark.createDataFrame(
        [(0, 1, 0, "U", None, "s1", 10)], DIM_EV), epoch_id=0)
    for i in range(7):
        feng.apply_epoch(events_to_df(spark, [
            _frow(i, i + 1, 0, "I", f"d{i}", [i], "s1"),
        ]), epoch_id=i)
        jm.run_once()
    # retention engaged: owned tables trimmed, inputs untouched
    assert len(jm.mv.versions()) <= 5           # 2*keep + the hop's commit
    assert len(jm.index.table.versions()) <= 5
    assert len(fact.versions()) == 8            # inputs never GC'd (create + 7)
    # correctness after GC, including a both-sided hop (pinned probes)
    deng.apply_epoch(spark.createDataFrame(
        [(1, 2, 0, "U", None, "s1", 11)], DIM_EV), epoch_id=1)
    feng.apply_epoch(events_to_df(spark, [
        _frow(7, 9, 0, "I", "d7", [7], "s1"),
    ]), epoch_id=7)
    assert jm.run_once() is not None
    assert _got(jm) == _recompute(fact, dim)
    # a fresh instance still resumes from the (trimmed) ledger
    jm2 = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2, indexed=True,
    )
    assert jm2.run_once() is None
