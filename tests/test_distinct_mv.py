"""Exact incremental COUNT(DISTINCT) as a two-stage MV cascade: after
every hop the distinct MV must equal a from-scratch
``count(distinct value) group by group`` over the source's current
state — through duplicate values, values moving between groups, a
value losing its last holder, reappearance, deletes, and nulls."""

from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.aggregate_mv import DistinctCountMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _row(pos, lsn, seq, op, doc, toks, src):
    return dict(
        stream_pos=pos, lsn=lsn, seq=seq, op=op, doc_id=doc, tokens=toks,
        n_tok=len(toks) if toks is not None else None, source=src,
        rollback_to_lsn=None, epoch_hash=f"e{pos}",
    )


def _recompute(src_table):
    return {
        r["source"]: r["d"]
        for r in read_state(src_table)
        .groupBy("source")
        .agg(F.countDistinct("n_tok").alias("d"))
        .collect()
    }


def _got(dc):
    return {r["source"]: r["n_distinct"] for r in dc.state().collect()}


def test_distinct_mv_tracks_source(spark, tmp_path):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    eng = CdcEngine(spark, src, collect_metrics=False)
    dc = DistinctCountMV(
        spark, src, str(tmp_path / "dc"), "source", "n_tok", n_buckets=2
    )

    # epoch 0: s1 has lengths {2, 2, 1} -> 2 distinct; s2 has {3} -> 1
    eng.apply_epoch(events_to_df(spark, [
        _row(0, 1, 0, "I", "a", [1, 2], "s1"),
        _row(1, 1, 1, "I", "b", [3, 4], "s1"),
        _row(2, 1, 2, "I", "c", [5], "s1"),
        _row(3, 1, 3, "I", "d", [6, 7, 8], "s2"),
    ]), epoch_id=0)
    dc.run_once()
    assert _got(dc) == _recompute(src) == {"s1": 2, "s2": 1}

    # epoch 1: a grows to length 3 (s1 gains 3, keeps 2 via b);
    # c moves to s2 with length 1 (s1 loses 1, s2 gains 1);
    # d deleted (s2 loses 3)
    eng.apply_epoch(events_to_df(spark, [
        _row(4, 2, 0, "U", "a", [1, 2, 3], "s1"),
        _row(5, 2, 1, "U", "c", [9], "s2"),
        _row(6, 2, 2, "D", "d", None, None),
    ]), epoch_id=1)
    dc.run_once()
    assert _got(dc) == _recompute(src) == {"s1": 2, "s2": 1}

    # epoch 2: b shrinks to length 1 — s1 now {3, 1}; a deleted ->
    # s1 {1}; c deleted -> s2 empties and must read absent
    eng.apply_epoch(events_to_df(spark, [
        _row(7, 3, 0, "U", "b", [9], "s1"),
        _row(8, 3, 1, "D", "a", None, None),
        _row(9, 3, 2, "D", "c", None, None),
    ]), epoch_id=2)
    dc.run_once()
    got = _got(dc)
    assert got == _recompute(src) == {"s1": 1}
    assert "s2" not in got

    # caught up -> both hops no-op
    m = dc.run_once()
    assert m == {"pairs": None, "distinct": None}


def test_distinct_mv_duplicate_value_retraction_is_exact(spark, tmp_path):
    """The liveness algebra, not occurrence arithmetic: two holders of
    the same (group, value); removing one must NOT decrement, removing
    the last must."""
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id", n_buckets=2
    )
    eng = CdcEngine(spark, src, collect_metrics=False)
    dc = DistinctCountMV(
        spark, src, str(tmp_path / "dc"), "source", "n_tok", n_buckets=2
    )
    eng.apply_epoch(events_to_df(spark, [
        _row(0, 1, 0, "I", "a", [1], "s"),
        _row(1, 1, 1, "I", "b", [2], "s"),
    ]), epoch_id=0)
    dc.run_once()
    assert _got(dc) == {"s": 1}

    eng.apply_epoch(events_to_df(spark, [_row(2, 2, 0, "D", "a", None, None)]),
                    epoch_id=1)
    dc.run_once()
    assert _got(dc) == {"s": 1}  # b still holds length 1

    eng.apply_epoch(events_to_df(spark, [_row(3, 3, 0, "D", "b", None, None)]),
                    epoch_id=2)
    dc.run_once()
    assert _got(dc) == {}

    # reappearance after the pair died: count comes back
    eng.apply_epoch(events_to_df(spark, [_row(4, 4, 0, "I", "c", [7], "s")]),
                    epoch_id=3)
    dc.run_once()
    assert _got(dc) == _recompute(src) == {"s": 1}


def test_distinct_mv_resumes_from_fresh_instance(spark, tmp_path):
    """Re-opening the MV pair over existing tables/cursors continues
    incrementally (no re-count, no reset)."""
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id", n_buckets=2
    )
    eng = CdcEngine(spark, src, collect_metrics=False)
    root = str(tmp_path / "dc")
    dc = DistinctCountMV(spark, src, root, "source", "n_tok", n_buckets=2)
    eng.apply_epoch(events_to_df(spark, [
        _row(0, 1, 0, "I", "a", [1], "s1"),
        _row(1, 1, 1, "I", "b", [2, 3], "s1"),
    ]), epoch_id=0)
    dc.run_once()

    dc2 = DistinctCountMV(spark, src, root, "source", "n_tok", n_buckets=2)
    assert dc2.run_once() == {"pairs": None, "distinct": None}
    eng.apply_epoch(events_to_df(spark, [_row(2, 2, 0, "I", "c", [4], "s2")]),
                    epoch_id=1)
    dc2.run_once()
    assert _got(dc2) == _recompute(src) == {"s1": 2, "s2": 1}
