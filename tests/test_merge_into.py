"""Delta-style MERGE INTO facade: batch upsert/delete sugar over the
CDC apply path — exactly-once, exact splits, schema evolution, and the
duplicate-source-key rejection Delta mandates."""

import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, merge_into, read_state
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.tables.snapshot import SnapshotTable

SRC = "doc_id string, tokens array<int>, n_tok int, source string"


def _mk(spark, tmp_path, mode="cow"):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    return t, CdcEngine(spark, t, mode=mode)


def test_merge_upsert_delete_splits_and_state(spark, tmp_path):
    t, eng = _mk(spark, tmp_path)
    m1 = merge_into(
        eng,
        spark.createDataFrame(
            [("a", [1], 1, "s"), ("b", [2], 1, "s"), ("c", [3], 1, "s")], SRC
        ),
    )
    assert (m1["n_insert"], m1["n_update"], m1["n_delete"]) == (3, 0, 0)

    # second merge: update a, insert d, delete b via delete_where
    m2 = merge_into(
        eng,
        spark.createDataFrame(
            [("a", [9, 9], 2, "s2"), ("d", [4], 1, "s"), ("b", None, None, "gone")],
            SRC,
        ),
        delete_where=F.col("source") == "gone",
    )
    assert (m2["n_insert"], m2["n_update"], m2["n_delete"]) == (1, 1, 1)

    got = {r["doc_id"]: (list(r["tokens"]), r["source"])
           for r in read_state(t).collect()}
    assert got == {"a": ([9, 9], "s2"), "c": ([3], "s"), "d": ([4], "s")}
    # merges consume NO WAL position: lsn stays at the committed
    # watermark (-1 on a fresh table), only seq advances per merge
    wm = t.manifest().watermark
    assert (wm["lsn"], wm["seq"]) == (-1, 1)


def test_merge_coexists_with_dense_lsn_stream(spark, tmp_path):
    """THE trap the lsn choice avoids: merge mid-stream, then apply the
    next dense-LSN epoch — had the merge consumed wm.lsn + 1, that
    epoch's rows would be silently dropped as stale redelivery."""
    from blockchain_etl_spark.cdc.apply import MERGE_EPOCH_BASE
    from blockchain_etl_spark.cdc.generator import events_to_df

    t, eng = _mk(spark, tmp_path)
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=0, lsn=0, seq=0, op="I", doc_id="a", tokens=[1],
             n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="h0"),
    ]), epoch_id=0)

    mm = merge_into(eng, spark.createDataFrame([("fix", [42], 1, "manual")], SRC))
    assert mm["epoch_id"] == MERGE_EPOCH_BASE  # disjoint from tailer ids

    # next WAL epoch at the dense next lsn (= 1) must apply fully
    m2 = eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=1, lsn=1, seq=0, op="U", doc_id="a", tokens=[2],
             n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="h1"),
        dict(stream_pos=2, lsn=1, seq=1, op="I", doc_id="b", tokens=[3],
             n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="h2"),
    ]), epoch_id=1)
    assert (m2["n_insert"], m2["n_update"], m2["n_stale"]) == (1, 1, 0)

    got = {r["doc_id"]: list(r["tokens"]) for r in read_state(t).collect()}
    assert got == {"a": [2], "b": [3], "fix": [42]}


def test_merge_exactly_once_on_redelivery(spark, tmp_path):
    t, eng = _mk(spark, tmp_path)
    src = spark.createDataFrame([("a", [1], 1, "s")], SRC)
    assert merge_into(eng, src, epoch_id=7) is not None
    v = t.current_version()
    # same epoch_id redelivered → ledger skip, no new version
    assert merge_into(eng, src, epoch_id=7) is None
    assert t.current_version() == v


def test_merge_duplicate_source_keys_rejected(spark, tmp_path):
    t, eng = _mk(spark, tmp_path)
    dup = spark.createDataFrame([("a", [1], 1, "s"), ("a", [2], 1, "s")], SRC)
    with pytest.raises(ValueError, match="multiple rows for key"):
        merge_into(eng, dup)
    with pytest.raises(ValueError, match="lacks the table key"):
        merge_into(eng, spark.createDataFrame([([1],)], "tokens array<int>"))


def test_merge_schema_evolution_from_source_column(spark, tmp_path):
    t, eng = _mk(spark, tmp_path)
    merge_into(eng, spark.createDataFrame([("a", [1], 1, "s")], SRC))
    evolved = spark.createDataFrame(
        [("b", [2], 1, "s", "wiki")], SRC + ", domain string"
    )
    merge_into(eng, evolved)
    got = {r["doc_id"]: r["domain"] for r in read_state(t).collect()}
    # new column present for b, null-backfilled for pre-evolution a
    assert got == {"a": None, "b": "wiki"}


def test_merge_into_policy_table_folds(spark, tmp_path):
    """Merging into a policy table follows the TABLE's column
    semantics, not replace: 'add' columns accumulate across merges,
    'first' keeps the earliest non-null — a merge is just one more
    change-event batch to the fold."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_xfers", T.LongType()),
        T.StructField("first_blknum", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    t = SnapshotTable.create(
        spark, str(tmp_path / "tp"), schema, key="doc_id", n_buckets=2,
        policies={"n_xfers": "add", "first_blknum": "first"},
    )
    eng = CdcEngine(spark, t, mode="mor")
    psrc = "doc_id string, n_xfers long, first_blknum long"
    merge_into(eng, spark.createDataFrame([("a", 2, 100)], psrc))
    merge_into(eng, spark.createDataFrame([("a", 3, 999), ("b", 1, 7)], psrc))
    got = {r["doc_id"]: (r["n_xfers"], r["first_blknum"])
           for r in read_state(t).collect()}
    assert got == {"a": (5, 100), "b": (1, 7)}


def test_merge_sequence_matches_dict_oracle(spark, tmp_path):
    """Property-style: an arbitrary deterministic sequence of merges
    (upserts + conditional deletes, overlapping keys) equals a plain
    dict replay of the same batches."""
    t, eng = _mk(spark, tmp_path)
    rng_rows = [
        [("k%d" % (i % 7), [i], 1, "del" if (i * 3) % 11 == 0 else "s%d" % i)
         for i in range(b * 5, b * 5 + 5)]
        for b in range(4)
    ]
    oracle: dict = {}
    for batch in rng_rows:
        # one row per key per batch (keys within a batch are distinct
        # because i % 7 cycles over 5 consecutive i)
        merge_into(
            eng,
            spark.createDataFrame(batch, SRC),
            delete_where=F.col("source") == "del",
        )
        for k, toks, n, src in batch:
            if src == "del":
                oracle.pop(k, None)
            else:
                oracle[k] = (toks, src)
    got = {r["doc_id"]: (list(r["tokens"]), r["source"])
           for r in read_state(t).collect()}
    assert got == oracle


def test_merge_into_mor_engine(spark, tmp_path):
    t, eng = _mk(spark, tmp_path, mode="mor")
    merge_into(eng, spark.createDataFrame([("a", [1], 1, "s")], SRC))
    merge_into(
        eng,
        spark.createDataFrame([("a", [5], 1, "s2"), ("b", None, None, "x")], SRC),
        delete_where=F.col("tokens").isNull(),
    )
    got = {r["doc_id"]: list(r["tokens"]) for r in read_state(t).collect()}
    assert got == {"a": [5]}


def test_merge_if_absent_seeds_without_clobbering(spark, tmp_path):
    """WHEN NOT MATCHED THEN INSERT alone: a state-dump seed inserts
    only genuinely absent keys — live values survive, two successive
    if-absent merges don't overwrite each other, redelivery no-ops,
    and combining with delete_where is refused."""
    t, eng = _mk(spark, tmp_path)
    live = spark.createDataFrame([("k1", [1], 1, "live")], SRC)
    merge_into(eng, live, epoch_id=1)

    dump = spark.createDataFrame(
        [("k1", [9], 1, "dump"), ("k2", [2, 2], 2, "dump")], SRC
    )
    m = merge_into(eng, dump, epoch_id=2, if_absent=True)
    assert m["n_insert"] == 1 and m["n_update"] == 0
    st = {r["doc_id"]: r["source"] for r in read_state(t).collect()}
    assert st == {"k1": "live", "k2": "dump"}

    # a second dump must not clobber the first dump's inserts either
    dump2 = spark.createDataFrame(
        [("k2", [7], 1, "dump2"), ("k3", [3], 1, "dump2")], SRC
    )
    merge_into(eng, dump2, epoch_id=3, if_absent=True)
    st = {r["doc_id"]: r["source"] for r in read_state(t).collect()}
    assert st == {"k1": "live", "k2": "dump", "k3": "dump2"}

    # exactly-once on redelivery
    assert merge_into(eng, dump2, epoch_id=3, if_absent=True) is None

    with pytest.raises(ValueError, match="delete_where"):
        merge_into(
            eng, dump, epoch_id=4, if_absent=True,
            delete_where=F.col("source") == "dump",
        )
