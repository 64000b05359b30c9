"""Incremental GROUP-BY aggregate MV over the CDF, with retractions:
after every hop the MV must equal a from-scratch recompute over the
source's current state — including updates that move rows between
groups, measure changes within a group, and a group emptying out."""

import os

from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.aggregate_mv import (
    agg_mv_transform,
    create_agg_mv,
    mv_state,
)
from blockchain_etl_spark.streaming.cascade import CascadeTailer
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _recompute(src_table):
    from blockchain_etl_spark.cdc.apply import read_state

    return {
        r["source"]: (r["n"], r["s"])
        for r in read_state(src_table)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tok").cast("long").alias("s"))
        .collect()
    }


def _mv(dst_table):
    return {
        r["source"]: (r["n_rows"], r["sum_tok"])
        for r in mv_state(dst_table, "source").collect()
    }


def _row(pos, lsn, seq, op, doc, toks, src):
    return dict(
        stream_pos=pos, lsn=lsn, seq=seq, op=op, doc_id=doc, tokens=toks,
        n_tok=len(toks) if toks is not None else None, source=src,
        rollback_to_lsn=None, epoch_hash=f"e{pos}",
    )


def test_agg_mv_tracks_source_through_moves_and_deletes(spark, tmp_path):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    src_eng = CdcEngine(spark, src, collect_metrics=False)
    mv = create_agg_mv(
        spark, str(tmp_path / "mv"), "source", {"sum_tok": "n_tok"}, n_buckets=2
    )
    tailer = CascadeTailer(
        src,
        CdcEngine(spark, mv, collect_metrics=False),
        str(tmp_path / "cur.json"),
        transform=agg_mv_transform("source", {"sum_tok": "n_tok"}),
    )

    # epoch 0: three groups
    src_eng.apply_epoch(events_to_df(spark, [
        _row(0, 1, 0, "I", "a", [1, 2], "s1"),
        _row(1, 1, 1, "I", "b", [3], "s1"),
        _row(2, 1, 2, "I", "c", [4, 5, 6], "s2"),
        _row(3, 1, 3, "I", "d", [7], "s3"),
    ]), epoch_id=0)
    assert tailer.run_once() is not None
    assert _mv(mv) == _recompute(src) == {
        "s1": (2, 3), "s2": (1, 3), "s3": (1, 1)
    }

    # epoch 1: a moves s1→s2 (retract + add), b grows in place,
    # d deleted (s3 empties out)
    src_eng.apply_epoch(events_to_df(spark, [
        _row(4, 2, 0, "U", "a", [1, 2, 3, 4], "s2"),
        _row(5, 2, 1, "U", "b", [3, 4, 5], "s1"),
        _row(6, 2, 2, "D", "d", None, None),
    ]), epoch_id=1)
    assert tailer.run_once() is not None
    got = _mv(mv)
    assert got == _recompute(src) == {"s1": (1, 3), "s2": (2, 7)}
    assert "s3" not in got  # emptied group reads as absent

    # caught up → no-op
    assert tailer.run_once() is None

    # crash-resume: cursor file gone → ledger-recovered cursor, no
    # double-count on rerun
    os.remove(str(tmp_path / "cur.json"))
    assert tailer.run_once() is None
    assert _mv(mv) == _recompute(src)


def test_agg_mv_exactly_once_across_redelivered_hop(spark, tmp_path):
    """A hop redelivered for the SAME version range (stale cursor file
    pointing below the ledger) must not double-count."""
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id", n_buckets=2
    )
    src_eng = CdcEngine(spark, src, collect_metrics=False)
    mv = create_agg_mv(spark, str(tmp_path / "mv"), "source", n_buckets=2)
    eng = CdcEngine(spark, mv, collect_metrics=False)
    cur = str(tmp_path / "cur.json")
    t1 = CascadeTailer(src, eng, cur, transform=agg_mv_transform("source"))

    src_eng.apply_epoch(events_to_df(spark, [
        _row(0, 1, 0, "I", "a", [1], "s1"),
    ]), epoch_id=0)
    assert t1.run_once() is not None
    # second tailer with its own (missing) cursor file: ledger wins
    t2 = CascadeTailer(src, eng, str(tmp_path / "cur2.json"),
                       transform=agg_mv_transform("source"))
    assert t2.run_once() is None
    assert {r["source"]: r["n_rows"]
            for r in mv_state(mv, "source").collect()} == {"s1": 1}


def test_expression_measure_maintains_variance(spark, tmp_path):
    """measures values are SQL expressions: sum(x) + sum(x*x) + n_rows
    maintained differentially give exact mean/variance per group,
    including under retraction."""
    import os

    from pyspark.sql import functions as F

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA, TARGET_SCHEMA
    from blockchain_etl_spark.streaming.aggregate_mv import (
        agg_mv_transform,
        create_agg_mv,
        mv_state,
    )
    from blockchain_etl_spark.streaming.cascade import CascadeTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    eng = CdcEngine(spark, src, collect_metrics=False)
    measures = {"sum_v": "n_tok", "sum_vv": "n_tok * n_tok"}
    mv = create_agg_mv(
        spark, str(tmp_path / "mv"), "source", measures, n_buckets=4, zset=True
    )
    hop = CascadeTailer(
        src, CdcEngine(spark, mv, collect_metrics=False),
        str(tmp_path / "cur.json"),
        transform=agg_mv_transform("source", measures),
    )

    def ev(rows, lsn):
        data = [
            (lsn * 100 + i, lsn, i, op, doc,
             [1] * (n or 0) if op in ("I", "U") else None,
             n if op in ("I", "U") else None,
             s if op in ("I", "U") else None, None, f"h{lsn}")
            for i, (doc, op, n, s) in enumerate(rows)
        ]
        return spark.createDataFrame(data, EVENT_SCHEMA)

    eng.apply_epoch(ev([("a", "I", 2, "g"), ("b", "I", 4, "g"),
                        ("c", "I", 6, "g")], 1), epoch_id=1)
    hop.run_once()
    eng.apply_epoch(ev([("b", "D", None, None)], 2), epoch_id=2)
    hop.run_once()

    st = {r["doc_id"]: r for r in mv_state(mv).collect()}["g"]
    n, s1, s2 = st["n_rows"], st["sum_v"], st["sum_vv"]
    # live rows: {2, 6} -> mean 4, population variance 4
    assert (n, s1, s2) == (2, 8, 40)
    mean = s1 / n
    assert s2 / n - mean * mean == 4.0
