"""MIN/MAX aggregate MV (streaming/extrema_mv.py): the non-subtractable
fold maintained via fold-when-safe / index-probe-rederive-when-not."""

import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine
from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA, TARGET_SCHEMA
from blockchain_etl_spark.streaming.extrema_mv import MinMaxAggMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _ev(spark, rows, lsn):
    """rows: list of (doc_id, op, n_tok, source)."""
    data = [
        (
            lsn * 100 + i,
            lsn,
            i,
            op,
            doc,
            [1] * (n or 0) if op in ("I", "U") else None,
            n if op in ("I", "U") else None,
            src if op in ("I", "U") else None,
            None,
            f"h{lsn}",
        )
        for i, (doc, op, n, src) in enumerate(rows)
    ]
    return spark.createDataFrame(data, EVENT_SCHEMA)


@pytest.fixture()
def rig(spark, tmp_path):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    eng = CdcEngine(spark, src, collect_metrics=False)
    mv = MinMaxAggMV(
        spark, src, str(tmp_path / "mmx"), group_col="source", value_col="n_tok"
    )
    return src, eng, mv


def _state(mv):
    return {
        r["source"]: (r["n_rows"], r["min_v"], r["max_v"])
        for r in mv.state().collect()
    }


def _truth(src):
    return {
        r["source"]: (r["n"], r["mn"], r["mx"])
        for r in src.read()
        .filter("NOT deleted")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.min("n_tok").alias("mn"),
            F.max("n_tok").alias("mx"),
        )
        .collect()
    }


def test_build_and_fold(rig, spark):
    src, eng, mv = rig
    eng.apply_epoch(
        _ev(
            spark,
            [
                ("a", "I", 5, "s1"),
                ("b", "I", 9, "s1"),
                ("c", "I", 7, "s1"),
                ("d", "I", 3, "s2"),
            ],
            lsn=1,
        ),
        epoch_id=1,
    )
    m = mv.run_once()
    assert m["n_rederive"] == 0  # pure inserts: fold path only
    assert _state(mv) == {"s1": (3, 5, 9), "s2": (1, 3, 3)}
    assert mv.run_once() is None  # caught up


def test_interior_retraction_folds_extremum_retraction_rederives(rig, spark):
    src, eng, mv = rig
    eng.apply_epoch(
        _ev(
            spark,
            [
                ("a", "I", 5, "s1"),
                ("b", "I", 9, "s1"),
                ("c", "I", 7, "s1"),
            ],
            lsn=1,
        ),
        epoch_id=1,
    )
    mv.run_once()
    # delete the interior value 7: exact fold, no index probe
    eng.apply_epoch(_ev(spark, [("c", "D", None, None)], lsn=2), epoch_id=2)
    m = mv.run_once()
    assert m["n_rederive"] == 0
    assert _state(mv)["s1"] == (2, 5, 9)
    # delete the max 9: must re-derive from the index
    eng.apply_epoch(_ev(spark, [("b", "D", None, None)], lsn=3), epoch_id=3)
    m = mv.run_once()
    assert m["n_rederive"] == 1
    assert _state(mv)["s1"] == (1, 5, 5)


def test_duplicate_extremum_survives_single_retraction(rig, spark):
    src, eng, mv = rig
    eng.apply_epoch(
        _ev(
            spark,
            [
                ("a", "I", 5, "s1"),
                ("b", "I", 5, "s1"),
                ("c", "I", 8, "s1"),
            ],
            lsn=1,
        ),
        epoch_id=1,
    )
    mv.run_once()
    eng.apply_epoch(_ev(spark, [("a", "D", None, None)], lsn=2), epoch_id=2)
    mv.run_once()
    # min stays 5 — the other 5-valued row survives
    assert _state(mv)["s1"] == (2, 5, 8)
    assert _state(mv) == _truth(src)


def test_group_death_and_rebirth(rig, spark):
    src, eng, mv = rig
    eng.apply_epoch(_ev(spark, [("a", "I", 4, "s9")], lsn=1), epoch_id=1)
    mv.run_once()
    eng.apply_epoch(_ev(spark, [("a", "D", None, None)], lsn=2), epoch_id=2)
    mv.run_once()
    assert "s9" not in _state(mv)
    eng.apply_epoch(_ev(spark, [("z", "I", 11, "s9")], lsn=3), epoch_id=3)
    mv.run_once()
    assert _state(mv)["s9"] == (1, 11, 11)


def test_update_moves_row_between_groups(rig, spark):
    src, eng, mv = rig
    eng.apply_epoch(
        _ev(spark, [("a", "I", 5, "s1"), ("b", "I", 7, "s2")], lsn=1), epoch_id=1
    )
    mv.run_once()
    # a moves from s1 to s2 with a new value
    eng.apply_epoch(_ev(spark, [("a", "U", 2, "s2")], lsn=2), epoch_id=2)
    mv.run_once()
    st = _state(mv)
    assert "s1" not in st
    assert st["s2"] == (2, 2, 7)
    assert st == _truth(src)


def test_intra_batch_insert_then_delete_of_new_min(rig, spark):
    src, eng, mv = rig
    eng.apply_epoch(_ev(spark, [("a", "I", 5, "s1")], lsn=1), epoch_id=1)
    mv.run_once()
    # one hop: insert 1 (new would-be min) and delete it again, plus a
    # real new row 8 — naive fold would report min 1
    eng.apply_epoch(
        _ev(spark, [("x", "I", 1, "s1"), ("y", "I", 8, "s1")], lsn=2), epoch_id=2
    )
    eng.apply_epoch(_ev(spark, [("x", "D", None, None)], lsn=3), epoch_id=3)
    mv.run_once()
    assert _state(mv)["s1"] == (2, 5, 8)
    assert _state(mv) == _truth(src)


def test_fresh_instance_resumes_from_lineage(rig, spark, tmp_path):
    src, eng, mv = rig
    eng.apply_epoch(_ev(spark, [("a", "I", 5, "s1")], lsn=1), epoch_id=1)
    mv.run_once()
    eng.apply_epoch(_ev(spark, [("b", "I", 2, "s1")], lsn=2), epoch_id=2)
    mv2 = MinMaxAggMV(
        spark, src, str(tmp_path / "mmx"), group_col="source", value_col="n_tok"
    )
    m = mv2.run_once()
    assert m is not None and m["src_from"] == mv.cursor() - 1 or m["src_from"] >= 1
    assert _state(mv2)["s1"] == (2, 2, 5)
    assert mv2.run_once() is None


def test_random_churn_matches_truth(rig, spark):
    import random

    src, eng, mv = rig
    rnd = random.Random(7)
    live = {}
    lsn = 0
    for epoch in range(1, 6):
        rows = []
        for _ in range(12):
            doc = f"d{rnd.randrange(15)}"
            if doc in live and rnd.random() < 0.4:
                rows.append((doc, "D", None, None))
                live.pop(doc)
            else:
                n, s = rnd.randrange(1, 30), f"s{rnd.randrange(3)}"
                rows.append((doc, "U" if doc in live else "I", n, s))
                live[doc] = (n, s)
        lsn += 1
        # dedupe docs within an epoch (engine last-writer resolves, but
        # keep the python mirror simple)
        seen = set()
        uniq = []
        for r in reversed(rows):
            if r[0] not in seen:
                uniq.append(r)
                seen.add(r[0])
        eng.apply_epoch(_ev(spark, list(reversed(uniq)), lsn=lsn), epoch_id=lsn)
        mv.run_once()
        assert _state(mv) == _truth(src), f"divergence at epoch {epoch}"


# ---------------- TopKAggMV ----------------------------------------------

from blockchain_etl_spark.streaming.extrema_mv import TopKAggMV  # noqa: E402


@pytest.fixture()
def krig(spark, tmp_path):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    eng = CdcEngine(spark, src, collect_metrics=False)
    mv = TopKAggMV(
        spark, src, str(tmp_path / "tpk"), group_col="source",
        value_col="n_tok", k=3,
    )
    return src, eng, mv


def _kstate(mv):
    return {
        r["source"]: (r["n_rows"], tuple(r["topk"]))
        for r in mv.state().collect()
    }


def _ktruth(src, k=3):
    rows = (
        src.read()
        .filter("NOT deleted")
        .select("source", F.col("n_tok").cast("long").alias("v"))
        .collect()
    )
    agg = {}
    for r in rows:
        agg.setdefault(r["source"], []).append(r["v"])
    return {
        s: (len(vs), tuple(sorted(vs, reverse=True)[:k])) for s, vs in agg.items()
    }


def test_topk_insert_fold_and_boundary_retraction(krig, spark):
    src, eng, mv = krig
    eng.apply_epoch(
        _ev(
            spark,
            [
                ("a", "I", 9, "s1"),
                ("b", "I", 7, "s1"),
                ("c", "I", 5, "s1"),
                ("d", "I", 3, "s1"),
                ("e", "I", 1, "s1"),
            ],
            lsn=1,
        ),
        epoch_id=1,
    )
    m = mv.run_once()
    assert m["n_rederive"] == 0
    assert _kstate(mv)["s1"] == (5, (9, 7, 5))
    # retraction strictly below the k-th (3 < 5): count-only fold
    eng.apply_epoch(_ev(spark, [("d", "D", None, None)], lsn=2), epoch_id=2)
    m = mv.run_once()
    assert m["n_rederive"] == 0
    assert _kstate(mv)["s1"] == (4, (9, 7, 5))
    # retraction of a member (7): re-derive pulls 1 into the window
    eng.apply_epoch(_ev(spark, [("b", "D", None, None)], lsn=3), epoch_id=3)
    m = mv.run_once()
    assert m["n_rederive"] == 1
    assert _kstate(mv)["s1"] == (3, (9, 5, 1))
    assert _kstate(mv) == _ktruth(src)


def test_topk_insert_enters_window(krig, spark):
    src, eng, mv = krig
    eng.apply_epoch(
        _ev(
            spark,
            [("a", "I", 9, "s1"), ("b", "I", 7, "s1"), ("c", "I", 5, "s1"),
             ("d", "I", 3, "s1")],
            lsn=1,
        ),
        epoch_id=1,
    )
    mv.run_once()
    eng.apply_epoch(_ev(spark, [("x", "I", 8, "s1")], lsn=2), epoch_id=2)
    m = mv.run_once()
    assert m["n_rederive"] == 0  # pure insert folds
    assert _kstate(mv)["s1"] == (5, (9, 8, 7))
    assert _kstate(mv) == _ktruth(src)


def test_topk_random_churn_matches_truth(krig, spark):
    import random

    src, eng, mv = krig
    rnd = random.Random(13)
    live = set()
    for lsn in range(1, 6):
        rows = []
        used = set()
        for _ in range(10):
            doc = f"d{rnd.randrange(12)}"
            if doc in used:
                continue
            used.add(doc)
            if doc in live and rnd.random() < 0.45:
                rows.append((doc, "D", None, None))
                live.discard(doc)
            else:
                rows.append(
                    (doc, "U" if doc in live else "I",
                     rnd.randrange(1, 25), f"s{rnd.randrange(3)}")
                )
                live.add(doc)
        eng.apply_epoch(_ev(spark, rows, lsn=lsn), epoch_id=lsn)
        mv.run_once()
        assert _kstate(mv) == _ktruth(src), f"divergence at lsn {lsn}"


# ---------------- review-wave regressions --------------------------------


def test_null_group_extremum_retraction(rig, spark):
    """Rows with a NULL group are tracked under the sentinel AND
    indexed (the index keys off the derived sentinel column) — a
    boundary retraction in the null group re-derives correctly instead
    of tombstoning a live group (review round 6, finding 1)."""
    src, eng, mv = rig
    eng.apply_epoch(
        _ev(spark, [("a", "I", 1, None), ("b", "I", 5, None)], lsn=1),
        epoch_id=1,
    )
    mv.run_once()
    st = _state(mv)
    from blockchain_etl_spark.streaming.aggregate_mv import NULL_GROUP

    assert st[NULL_GROUP] == (2, 1, 5)
    # delete the max: must re-derive from the (sentinel-keyed) index
    eng.apply_epoch(_ev(spark, [("b", "D", None, None)], lsn=2), epoch_id=2)
    m = mv.run_once()
    assert m["n_rederive"] == 1
    assert _state(mv)[NULL_GROUP] == (1, 1, 1)


def test_integer_group_column_probe(spark, tmp_path):
    """A non-string group column buckets the index by the derived
    STRING key, so the string-keyed re-derive probe reads the right
    buckets (review round 6, finding 2: xxhash64 is type-sensitive)."""
    src = SnapshotTable.create(
        spark, str(tmp_path / "s2"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    eng = CdcEngine(spark, src, collect_metrics=False)
    mv = MinMaxAggMV(
        spark, src, str(tmp_path / "m2"), group_col="n_tok", value_col="source"
    )
    rows = [(f"d{i}", "I", 7, f"s{i}") for i in range(6)]
    eng.apply_epoch(_ev(spark, rows, lsn=1), epoch_id=1)
    mv.run_once()
    # all rows share INT group n_tok=7; lexicographic min/max over the
    # string values — delete the current max (s5) to force the
    # re-derive probe through the int-group index
    eng.apply_epoch(_ev(spark, [("d5", "D", None, None)], lsn=2), epoch_id=2)
    m = mv.run_once()
    assert m["n_rederive"] == 1
    st = {r["n_tok"]: (r["n_rows"], r["min_v"], r["max_v"])
          for r in mv.state().collect()}
    assert st["7"] == (5, "s0", "s4")
