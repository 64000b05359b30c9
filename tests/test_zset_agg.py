"""ZsetAggMV (Δγ(A⋈B), the reduce-after-bilinear composition): after
every join-hop + agg-hop pair the aggregate MV must equal a
from-scratch GROUP BY over a from-scratch join of the two tables'
current states — through dim reweights (tuple retract+reinsert nets to
zero in the aggregate), group emptying (rows read absent, then the
group reappears), and deletes on both sides. The Z-set weighting is
what's under test: dead join tuples surface in the join MV's CDF as
multiplicity 1→0 UPDATES, not deletes."""

import pyspark.sql.types as T
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.aggregate_mv import ZsetAggMV
from blockchain_etl_spark.streaming.join_mv import JoinMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable

from tests.test_join_mv import DIM_EV, DIM_SCHEMA, _frow


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
    zagg = ZsetAggMV(
        spark, jm.mv, str(tmp_path / "zagg"), "source",
        measures={"sum_tok": "n_tok"}, n_buckets=2,
    )
    return (fact, CdcEngine(spark, fact, collect_metrics=False),
            dim, CdcEngine(spark, dim, collect_metrics=False), jm, zagg)


def _recompute(fact, dim):
    j = read_state(fact).alias("f").join(
        read_state(dim).alias("d"),
        F.col("f.source") == F.col("d.doc_id"), "inner",
    )
    return {
        r["source"]: (r["n_tuples"], r["sum_tok"])
        for r in j.groupBy(F.col("f.source").alias("source")).agg(
            F.count("*").alias("n_tuples"),
            F.sum("f.n_tok").alias("sum_tok"),
        ).collect()
    }


def _got(zagg):
    return {
        r["source"]: (r["n_rows"], r["sum_tok"])
        for r in zagg.state().select("source", "n_rows", "sum_tok").collect()
    }


def _hop(jm, zagg):
    jm.run_once()
    zagg.run_once()


def test_zset_agg_tracks_grouped_join(spark, tmp_path):
    fact, feng, dim, deng, jm, zagg = _mk(spark, tmp_path)

    # hop 1: two groups, one unmatched fact (absent everywhere)
    deng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "s1", 10),
        (1, 1, 1, "I", None, "s2", 20),
    ], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1, 2], "s1"),
        _frow(1, 1, 1, "I", "b", [3], "s1"),
        _frow(2, 1, 2, "I", "c", [4], "s2"),
        _frow(3, 1, 3, "I", "x", [5], "s9"),  # no dim match
    ]), epoch_id=0)
    _hop(jm, zagg)
    assert _got(zagg) == _recompute(fact, dim) == {
        "s1": (2, 3), "s2": (1, 1)
    }

    # hop 2: dim s1 reweights — every s1 tuple retracts + reinserts in
    # the Z-set; the AGGREGATE must net to zero (n_tok unchanged).
    # Fact c re-points s2 -> s1 (moves between groups).
    deng.apply_epoch(spark.createDataFrame([
        (2, 2, 0, "U", None, "s1", 11),
    ], DIM_EV), epoch_id=1)
    feng.apply_epoch(events_to_df(spark, [
        _frow(4, 2, 0, "U", "c", [4], "s1"),
    ]), epoch_id=1)
    _hop(jm, zagg)
    assert _got(zagg) == _recompute(fact, dim) == {"s1": (3, 4)}

    # hop 3: dim s1 deleted — the whole group empties via 1→0 UPDATE
    # rows in the join MV's CDF (no physical deletes); group must read
    # absent, not zero-valued.
    deng.apply_epoch(spark.createDataFrame([
        (3, 3, 0, "D", None, "s1", None),
    ], DIM_EV), epoch_id=2)
    _hop(jm, zagg)
    assert _got(zagg) == _recompute(fact, dim) == {}

    # caught up -> both hops no-op
    assert jm.run_once() is None
    assert zagg.run_once() is None

    # hop 4: s9 appears late — the waiting fact x joins; a once-dead
    # tuple group reappears with correct totals
    deng.apply_epoch(spark.createDataFrame([
        (4, 4, 0, "I", None, "s9", 90),
    ], DIM_EV), epoch_id=3)
    feng.apply_epoch(events_to_df(spark, [
        _frow(5, 4, 0, "D", "a", None, None),
        _frow(6, 4, 1, "I", "a", [7, 8, 9], "s9"),
    ]), epoch_id=3)
    _hop(jm, zagg)
    assert _got(zagg) == _recompute(fact, dim) == {"s9": (2, 4)}


def test_zset_agg_resumes_from_lineage(spark, tmp_path):
    """A fresh ZsetAggMV over the same paths resumes from the MV's own
    commit lineage — rerunning a caught-up hop is a no-op, and state
    survives reconstruction."""
    fact, feng, dim, deng, jm, zagg = _mk(spark, tmp_path)
    deng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "s1", 10),
    ], DIM_EV), epoch_id=0)
    feng.apply_epoch(events_to_df(spark, [
        _frow(0, 1, 0, "I", "a", [1, 2], "s1"),
    ]), epoch_id=0)
    _hop(jm, zagg)
    want = _got(zagg)
    assert want == {"s1": (1, 2)}

    z2 = ZsetAggMV(
        spark, jm.mv, str(tmp_path / "zagg"), "source",
        measures={"sum_tok": "n_tok"}, n_buckets=2,
    )
    assert z2.run_once() is None
    assert _got(z2) == want


def test_unigram_mv_retracts_on_update_and_delete(spark, tmp_path):
    """exploded_terms_transform: the vocabulary MV equals the
    from-scratch unigram/DF stats of live docs after every hop —
    through an update that swaps a doc's tokens (old terms retract)
    and a delete (pre-image terms retract; a term emptied of all
    occurrences leaves the live vocabulary)."""
    from blockchain_etl_spark.streaming.aggregate_mv import (
        create_agg_mv,
        exploded_terms_transform,
        mv_state,
    )
    from blockchain_etl_spark.streaming.cascade import CascadeTailer

    EV = T.StructType([
        T.StructField("stream_pos", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("op", T.StringType()),
        T.StructField("rollback_to_lsn", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    eng = CdcEngine(spark, src, mode="cow", collect_metrics=False)
    mv = create_agg_mv(
        spark, str(tmp_path / "mv"), "term", {"n_docs": "_"},
        n_buckets=2, zset=True,
    )
    tailer = CascadeTailer(
        src, CdcEngine(spark, mv, collect_metrics=False),
        str(tmp_path / "cur.json"),
        transform=exploded_terms_transform("tokens"),
    )

    def _vocab():
        return {
            int(r["doc_id"]): (r["n_rows"], r["n_docs"])
            for r in mv_state(mv).collect()
        }

    def _expect():
        occ, dfq = {}, {}
        for r in read_state(src).collect():
            for t in r["tokens"]:
                occ[t] = occ.get(t, 0) + 1
            for t in set(r["tokens"]):
                dfq[t] = dfq.get(t, 0) + 1
        return {t: (occ[t], dfq[t]) for t in occ}

    # epoch 1: two docs sharing token 7; token 5 appears twice in one doc
    eng.apply_epoch(spark.createDataFrame([
        (0, 1, 0, "I", None, "a", [5, 5, 7], 3, "s1"),
        (1, 2, 0, "I", None, "b", [7, 9], 2, "s1"),
    ], EV), 1)
    tailer.run_once()
    assert _vocab() == _expect() == {5: (2, 1), 7: (2, 2), 9: (1, 1)}

    # epoch 2: update swaps a's tokens (5,7 retract; 11 enters),
    # delete b (7 leaves entirely, 9 leaves the live vocabulary)
    eng.apply_epoch(spark.createDataFrame([
        (2, 3, 0, "U", None, "a", [11, 7], 2, "s1"),
        (3, 4, 0, "D", None, "b", None, None, None),
    ], EV), 2)
    tailer.run_once()
    assert _vocab() == _expect() == {7: (1, 1), 11: (1, 1)}
    # rerun is a no-op hop
    assert tailer.run_once() is None
    assert _vocab() == {7: (1, 1), 11: (1, 1)}
