"""Z-set dead-tuple GC: a join-MV tuple that retracts must not live
forever as a multiplicity-0 row. Tables created with ``zset_col``
drop folded-dead groups at compaction (and at COW rewrites), so the
MV's physical size tracks LIVE tuples, not all-time distinct tuples,
under retract/reinsert churn — while logical state, the change
protocol, and downstream cascade consumers see nothing.

The churn shape is ``incremental_join_mv``'s round-2 reweight: every
dim payload update retracts + reinserts every matching tuple, which
without GC leaves one permanent dead row per (tuple, cycle)."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.aggregate_mv import ZsetAggMV
from blockchain_etl_spark.streaming.join_mv import JoinMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable

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


def _mk(spark, tmp_path):
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    jm = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2, indexed=True,
    )
    return (fact, CdcEngine(spark, fact, collect_metrics=False),
            dim, CdcEngine(spark, dim, collect_metrics=False), jm)


def _physical_rows(t: SnapshotTable) -> int:
    """All folded rows, dead ones included (what the files hold)."""
    return t.read(resolve=True).count()


def _live(jm) -> dict:
    return {
        r["fact_id"]: (r["source"], r["n_tok"], r["weight"])
        for r in jm.state().collect()
    }


def _recompute(fact, dim) -> dict:
    j = read_state(fact).alias("f").join(
        read_state(dim).alias("d"),
        F.col("f.source") == F.col("d.doc_id"), "inner",
    )
    return {
        r["fact_id"]: (r["source"], r["n_tok"], r["weight"])
        for r in j.select(
            F.col("f.doc_id").alias("fact_id"),
            F.col("f.source").alias("source"),
            F.col("f.n_tok").alias("n_tok"),
            F.col("d.weight").alias("weight"),
        ).collect()
    }


def test_churn_physical_size_tracks_live_tuples(spark, tmp_path):
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)
    assert jm.mv.manifest().zset_col == "n_rows"

    deng.apply_epoch(spark.createDataFrame(
        [(0, 1, 0, "I", None, "s1", 100)], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1, 2], "s1"),
        _frow(1, 1, 1, "I", "b", [3], "s1"),
        _frow(2, 1, 2, "I", "c", [4, 5, 6], "s1"),
    ]), epoch_id=0)
    jm.run_once()
    n_live = 3

    # reweight churn: each cycle retracts + reinserts all 3 tuples
    # (new weight => new tuple hash). Without GC the MV accumulates
    # 3 dead rows per cycle; with GC compaction folds them away.
    for cyc in range(1, 6):
        deng.apply_epoch(spark.createDataFrame(
            [(cyc, cyc + 1, 0, "U", None, "s1", 100 + cyc)], DIM_EV),
            epoch_id=cyc)
        jm.run_once()
        before = _live(jm)
        jm.mv.compact()
        assert _live(jm) == before == _recompute(fact, dim)
        assert _physical_rows(jm.mv) == n_live, (
            f"cycle {cyc}: dead tuples survived compaction"
        )

    # the dims' OWN table is a user policy-free table — untouched
    assert read_state(dim).count() == 1


def test_retraction_reads_as_delete_and_gc_is_cdf_invisible(spark, tmp_path):
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)

    deng.apply_epoch(spark.createDataFrame(
        [(0, 1, 0, "I", None, "s1", 10)], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1, 2], "s1"),
    ]), epoch_id=0)
    jm.run_once()
    v_live = jm.mv.current_version()

    # fact re-points away: the s1 tuple retracts to multiplicity 0
    feng.apply_epoch(events_to_df(spark, [
        _frow(1, 2, 0, "U", "a", [1, 2], "s9"),
    ]), epoch_id=1)
    jm.run_once()
    v_dead = jm.mv.current_version()

    ch = jm.mv.read_changes(v_live, v_dead).collect()
    dels = [r for r in ch if r["_change_type"] == "delete"]
    assert len(dels) == 1, (
        "a multiplicity 1 -> 0 transition must read as a DELETE under "
        f"zset liveness, got {[r['_change_type'] for r in ch]}"
    )
    # the delete pre-image carries the last LIVE multiplicity, so a
    # weighted consumer retracts exactly what it added
    assert dels[0]["n_rows"] == 1

    # GC the dead tuple; the compaction commit must be logically empty
    jm.mv.compact()
    v_gc = jm.mv.current_version()
    assert v_gc > v_dead
    assert jm.mv.read_changes(v_dead, v_gc).count() == 0
    assert jm.mv.read_changes_per_commit(v_dead, v_gc).count() == 0
    # and the ranged diff SPANNING retraction + GC still shows one delete
    spanned = jm.mv.read_changes(v_live, v_gc).collect()
    assert [r["_change_type"] for r in spanned] == ["delete"]


def test_cascade_consumer_exact_across_gc(spark, tmp_path):
    """A ZsetAggMV whose cursor predates the GC compaction must stay
    exact: the hop's version range spans the physical drop and sees
    only the logical changes."""
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)
    zagg = ZsetAggMV(
        spark, jm.mv, str(tmp_path / "zagg"), group_col="source",
        measures={"sum_tok": "n_tok"},
    )

    deng.apply_epoch(spark.createDataFrame(
        [(0, 1, 0, "I", None, "s1", 10), (1, 1, 1, "I", None, "s2", 20)],
        DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1, 2], "s1"),
        _frow(1, 1, 1, "I", "b", [3], "s1"),
        _frow(2, 1, 2, "I", "c", [4, 5], "s2"),
    ]), epoch_id=0)
    jm.run_once()
    zagg.run_once()

    # churn: retract every s1 tuple (reweight), then GC, THEN let the
    # consumer catch up across the compaction
    deng.apply_epoch(spark.createDataFrame(
        [(2, 2, 0, "U", None, "s1", 11)], DIM_EV), epoch_id=1)
    jm.run_once()
    jm.mv.compact()  # physical drop happens inside the consumer's range
    feng.apply_epoch(events_to_df(spark, [
        _frow(3, 3, 0, "D", "c", None, "s2"),
    ]), epoch_id=1)
    jm.run_once()
    zagg.run_once()

    got = {r["source"]: (r["n_rows"], r["sum_tok"])
           for r in zagg.state().collect()}
    assert got == {"s1": (2, 3)}  # a(2 tok) + b(1 tok); s2 gone

    # the consumer's own MV is a Z-set too: the dead s2 group GCs
    zagg.mv.compact()
    assert _physical_rows(zagg.mv) == 1


def test_zset_create_validation(spark, tmp_path):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    with pytest.raises(ValueError, match="not a column"):
        SnapshotTable.create(spark, str(tmp_path / "t1"), schema,
                             policies={"n_rows": "add"}, zset_col="nope")
    with pytest.raises(ValueError, match="integral"):
        SnapshotTable.create(spark, str(tmp_path / "t2"), schema,
                             policies={"name": "last", "n_rows": "add"},
                             zset_col="name")
    with pytest.raises(ValueError, match="'add' merge"):
        SnapshotTable.create(spark, str(tmp_path / "t3"), schema,
                             policies={"n_rows": "max"}, zset_col="n_rows")
    # user policy tables don't declare it — and keep their semantics:
    # manifests without the field read back as zset_col=None
    t = SnapshotTable.create(spark, str(tmp_path / "t4"), schema,
                             policies={"n_rows": "add"})
    assert t.manifest().zset_col is None


def test_rebucket_and_clone_carry_zset_col(spark, tmp_path):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    t = SnapshotTable.create(spark, str(tmp_path / "t"), schema,
                             policies={"n_rows": "add"}, zset_col="n_rows",
                             n_buckets=2)
    t.rebucket(4)
    assert t.manifest().zset_col == "n_rows"
    c = t.clone_at(str(tmp_path / "c"))
    assert c.manifest().zset_col == "n_rows"


def test_non_indexed_joinmv_autobuilds_index_on_dim_delta(spark, tmp_path):
    """VERDICT r5 #4: a dim delta on a non-indexed JoinMV must not
    silently read the full fact state — the fact-side index is
    auto-built on the first dim delta (recorded in lineage), persists,
    and later constructors adopt it."""
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    jm = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2, indexed=False,
    )
    assert jm.index is None
    feng = CdcEngine(spark, fact, collect_metrics=False)
    deng = CdcEngine(spark, dim, collect_metrics=False)

    deng.apply_epoch(spark.createDataFrame(
        [(0, 1, 0, "I", None, "s1", 10)], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1, 2], "s1"),
    ]), epoch_id=0)
    jm.run_once()  # first hop sees a dim delta -> index auto-builds
    assert jm.index is not None
    lin = jm.mv.manifest().lineage
    assert lin.get("fact_index_autobuilt") is True
    assert _live(jm) == _recompute(fact, dim)

    # a later dim-only hop probes through the (now warm) index and
    # does NOT re-seed
    deng.apply_epoch(spark.createDataFrame(
        [(1, 2, 0, "U", None, "s1", 11)], DIM_EV), epoch_id=1)
    jm.run_once()
    assert "fact_index_autobuilt" not in jm.mv.manifest().lineage
    assert _live(jm) == _recompute(fact, dim) == {"a": ("s1", 2, 11)}

    # a fresh constructor with indexed=False ADOPTS the on-disk index
    jm2 = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2, indexed=False,
    )
    assert jm2.index is not None
