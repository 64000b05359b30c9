"""Incremental join MV (Δ(A⋈B) = ΔA⋈B_old + A_new⋈ΔB): after every
hop the MV must equal a from-scratch inner join of the two tables'
current states — through fact inserts/updates/deletes, dim payload
updates (every matching tuple retracts + reinserts), a fact row
re-pointing at a different dim key, dim deletes, and same-hop changes
on both sides (the cross-term cancellation)."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.join_mv import JoinMV
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


def _mk(spark, tmp_path):
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    jm = JoinMV(
        spark, fact, dim, str(tmp_path / "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
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


def test_join_mv_tracks_both_sides(spark, tmp_path):
    fact, feng, dim, deng, jm = _mk(spark, tmp_path)

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
