"""Streaming CDF source: tail a SnapshotTable's change feed via
readStream, verified row-equal against the batch read_changes /
read_changes_per_commit implementations."""

import os

from blockchain_etl_spark.cdc.apply import CdcEngine
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.sources.table_changes_source import TableChangesDataSource
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _ev(lsn, op, doc, tok, seq=0):
    return dict(stream_pos=(lsn << 4) + seq, lsn=lsn, seq=seq, op=op, doc_id=doc,
                tokens=None if op == "D" else [tok],
                n_tok=None if op == "D" else 1,
                source=None if op == "D" else "s",
                rollback_to_lsn=None, epoch_hash=f"e{lsn}-{seq}")


def _setup(spark, tmp_path):
    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor")
    eng.apply_epoch(events_to_df(spark, [
        _ev(1, "I", "a", 1), _ev(1, "I", "b", 2, seq=1), _ev(2, "I", "c", 3),
    ]), epoch_id=0)
    eng.apply_epoch(events_to_df(spark, [
        _ev(3, "U", "a", 9), _ev(4, "D", "b", 0),
    ]), epoch_id=1)
    eng.apply_epoch(events_to_df(spark, [
        _ev(5, "I", "d", 4), _ev(6, "D", "c", 0), _ev(7, "I", "c", 5),
    ]), epoch_id=2)
    return t


def _run_stream(spark, t, ckpt, **opts):
    spark.dataSource.register(TableChangesDataSource)
    got = []
    reader = spark.readStream.format("table_changes").option("path", t.path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: got.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


def _norm(rows):
    return sorted(
        (r["_change_type"], r["doc_id"],
         tuple(r["tokens"]) if r["tokens"] is not None else None,
         r["n_tok"], r["source"], r["lsn"], r["seq"], r["deleted"])
        for r in rows
    )


def test_stream_equals_batch_net_diff(spark, tmp_path):
    t = _setup(spark, tmp_path)
    got = _run_stream(spark, t, str(tmp_path / "ck1"))
    want = t.read_changes(0).collect()
    assert _norm(got) == _norm(want)
    assert len(got) > 0


def test_paced_stream_equals_per_commit_attribution(spark, tmp_path):
    """max_versions_per_batch=1 → one micro-batch per upstream commit;
    the union across batches IS the per-commit audit view."""
    t = _setup(spark, tmp_path)
    # a paced availableNow run advances ONE clamped batch per invocation
    # (same contract as the changelog source) — loop to the tip
    got = []
    for _ in range(t.current_version() + 1):
        step = _run_stream(spark, t, str(tmp_path / "ck2"), max_versions_per_batch=1)
        got.extend(step)
        if not step and len(got) > 0:
            break
    want = t.read_changes_per_commit(0).collect()
    assert _norm(got) == _norm(want)
    # per-commit view differs from net: c was deleted+reinserted in one
    # commit range but (delete@6, insert@7) collapse only across commits
    steps = {(r["_from_version"], r["_to_version"]) for r in got}
    assert len(steps) >= 3


def test_stream_restart_is_exactly_once(spark, tmp_path):
    t = _setup(spark, tmp_path)
    ck = str(tmp_path / "ck3")
    got1 = _run_stream(spark, t, ck)
    # caught up: rerun with the same checkpoint delivers nothing new
    got2 = _run_stream(spark, t, ck)
    assert got2 == []
    # new commit → only ITS delta arrives
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor")
    eng.apply_epoch(events_to_df(spark, [_ev(9, "I", "z", 7)]), epoch_id=3)
    got3 = _run_stream(spark, t, ck)
    assert {(r["_change_type"], r["doc_id"]) for r in got3} == {("insert", "z")}
    assert len(got1) > 0


def test_stream_skips_compaction_commits(spark, tmp_path):
    t = _setup(spark, tmp_path)
    ck = str(tmp_path / "ck4")
    _run_stream(spark, t, ck)
    t.compact()
    # compaction commit: identical logical state → zero rows, no error
    assert _run_stream(spark, t, ck) == []


def test_stream_conforms_across_schema_evolution(spark, tmp_path):
    """A range spanning a schema-evolution commit reads old files under
    the new schema (null backfill) — same rows as the batch path."""
    from pyspark.sql import functions as F

    t = _setup(spark, tmp_path)
    ck = str(tmp_path / "ck5")
    _run_stream(spark, t, ck)  # drain pre-evolution history
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor")
    ev = events_to_df(spark, [_ev(11, "I", "n1", 6)]).withColumn(
        "lang", F.lit("en")
    )
    eng.apply_epoch(ev, epoch_id=9)
    got = _run_stream(spark, t, ck)
    by_doc = {(r["_change_type"], r["doc_id"]): r for r in got}
    assert ("insert", "n1") in by_doc
    assert by_doc[("insert", "n1")]["lang"] == "en"
    # the evolved batch also re-describes untouched keys? no — only n1
    assert set(by_doc) == {("insert", "n1")}

    # a FULL-history stream under the evolved schema: old rows carry
    # lang = NULL, identical to the batch reader's conformance
    got_all = _run_stream(spark, t, str(tmp_path / "ck6"))
    want = t.read_changes(0).collect()
    assert _norm(got_all) == _norm(want)
    langs = {r["doc_id"]: r["lang"] for r in got_all}
    assert langs["n1"] == "en" and langs["a"] is None


def test_paced_stream_restart_never_regresses(spark, tmp_path):
    """Restart safety under pacing: a fresh reader recovers its cursor
    from Spark's checkpoint replay (partitions/commit are re-driven for
    the committed batch before latestOffset), so the clamped offset
    never falls behind the committed frontier — no version is re-emitted
    across restarts, in order."""
    t = _setup(spark, tmp_path)  # 3 commits
    ck = str(tmp_path / "ckr")
    seen = []
    for _ in range(6):  # each invocation = a full restart
        step = _run_stream(spark, t, ck, max_versions_per_batch=1)
        if step:
            vers = {(r["_from_version"], r["_to_version"]) for r in step}
            assert len(vers) == 1  # exactly one commit per paced batch
            seen.append(vers.pop())
    assert seen == [(0, 1), (1, 2), (2, 3)]

    # more commits after a cold restart — resumes exactly at the frontier
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor")
    eng.apply_epoch(events_to_df(spark, [_ev(20, "I", "r1", 1)]), epoch_id=5)
    eng.apply_epoch(events_to_df(spark, [_ev(21, "I", "r2", 2)]), epoch_id=6)
    for _ in range(4):
        step = _run_stream(spark, t, ck, max_versions_per_batch=1)
        if step:
            seen.append(
                (step[0]["_from_version"], step[0]["_to_version"])
            )
    assert seen == [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]


def test_load_resolved_null_updated_epoch_loses_ties(tmp_path):
    """Pandas resolver tie order must match the Spark struct-max: a null
    updated_epoch sorts SMALLEST and loses (lsn, seq) ties (ADVICE r4 —
    pandas' default NaN-last would let it win)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from blockchain_etl_spark.sources.table_changes_source import _load_resolved

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    f1 = str(tmp_path / "a.parquet")
    f2 = str(tmp_path / "b.parquet")
    # same (lsn, seq); one row has updated_epoch=3, the other null
    pq.write_table(pa.table({
        "doc_id": ["k"], "v": [1], "lsn": [10], "seq": [0],
        "updated_epoch": pa.array([3], type=pa.int64()), "deleted": [False],
    }), f1)
    pq.write_table(pa.table({
        "doc_id": ["k"], "v": [2], "lsn": [10], "seq": [0],
        "updated_epoch": pa.array([None], type=pa.int64()), "deleted": [False],
    }), f2)
    got = _load_resolved([f1, f2], schema, "doc_id")
    assert len(got) == 1
    assert int(got.iloc[0]["v"]) == 1  # non-null updated_epoch wins
    # order of file listing must not matter
    got2 = _load_resolved([f2, f1], schema, "doc_id")
    assert int(got2.iloc[0]["v"]) == 1


def test_reader_cursor_floor_includes_replayed_start(tmp_path):
    """On checkpoint recovery Spark replays the last batch's partitions()
    before latestOffset; folding start['version'] into the cursor floor
    means latestOffset can never propose an end below the checkpointed
    start even if commit() never ran (ADVICE r4)."""
    import json
    import os

    from blockchain_etl_spark.sources.table_changes_source import (
        TableChangesStreamReader,
    )

    # minimal on-disk manifest scaffolding for the driver-side helpers
    path = str(tmp_path / "t")
    os.makedirs(os.path.join(path, "manifests"))
    schema_json = json.dumps(
        {"type": "struct", "fields": [
            {"name": "doc_id", "type": "string", "nullable": True, "metadata": {}}
        ]}
    )
    for v in range(0, 10):
        with open(os.path.join(path, "manifests", f"v{v:08d}.json"), "w") as f:
            json.dump({"version": v, "key": "doc_id", "n_buckets": 4,
                       "schema_version": 0, "schemas": {"0": schema_json},
                       "files": []}, f)
    with open(os.path.join(path, "manifests", "LATEST"), "w") as f:
        f.write("9")

    r = TableChangesStreamReader({"path": path, "start_version": 0,
                                  "max_versions_per_batch": 2})
    # fresh reader, recovery replays the checkpointed batch (6, 8]
    r.partitions({"version": 6}, {"version": 8})
    off = r.latestOffset()
    assert off["version"] >= 8  # never below the replayed range
    # and a fresh reader that saw only the batch START still floors there
    r2 = TableChangesStreamReader({"path": path, "start_version": 0,
                                   "max_versions_per_batch": 2})
    r2.partitions({"version": 7}, {"version": 7})
    assert r2.latestOffset()["version"] >= 7
