"""The `changelog` Python DataSource: batch + streaming reads, pacing,
checkpoint resume, and end-to-end equivalence with fetch_lsn_range."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blockchain_etl_spark.sources.changelog_datasource import ChangelogDataSource
from blockchain_etl_spark.sources.changelog_source import fetch_lsn_range


def _register(spark):
    spark.dataSource.register(ChangelogDataSource)


def test_batch_read_matches_fetch_lsn_range(spark):
    _register(spark)
    got = (
        spark.read.format("changelog")
        .option("start_lsn", 0)
        .option("tip_lsn", 12)
        .load()
    )
    want = fetch_lsn_range(spark, 0, 12)
    g = {r["stream_pos"]: r for r in got.collect()}
    w = {r["stream_pos"]: r for r in want.collect()}
    assert len(g) == len(w) > 0
    assert g.keys() == w.keys()
    s = min(g)
    assert g[s]["doc_id"] == w[s]["doc_id"] and list(g[s]["tokens"] or []) == list(
        w[s]["tokens"] or []
    )


def test_stream_paces_and_resumes(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(tip):
        q = (
            spark.readStream.format("changelog")
            .option("tip_lsn", tip)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(8)
    first = spark.read.parquet(out)
    n1 = first.count()
    assert first.agg(F.max("lsn")).first()[0] == 7
    assert n1 == first.dropDuplicates(["stream_pos"]).count()  # no dups

    # tip advances; restart from the SAME checkpoint → only the delta
    run(16)
    second = spark.read.parquet(out)
    assert second.agg(F.max("lsn")).first()[0] == 15
    assert second.count() == second.dropDuplicates(["stream_pos"]).count()
    assert second.count() > n1


def test_pacing_clamps_batches():
    """Reader-level pacing contract (≙ block_batch_size, streamer.py:153):
    each planned batch advances at most max_lsns_per_batch, never past
    the tip."""
    from blockchain_etl_spark.sources.changelog_datasource import (
        ChangelogStreamReader,
    )

    r = ChangelogStreamReader({"max_lsns_per_batch": "4", "tip_lsn": "10"})
    start = r.initialOffset()
    ends = []
    for _ in range(4):
        end = r.latestOffset()
        r.partitions(start, end)
        ends.append(end["lsn"])
        start = end
    assert ends == [4, 8, 10, 10]


def test_source_to_engine_end_to_end(spark, tmp_path):
    """changelog DataSource → foreachBatch → CdcEngine: final state equals
    the declarative replay of the same LSN range; tip advance + restart
    stays exactly-once."""
    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.cdc.replay import replay_final_state
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.streaming.tail import run_source_stream
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id", n_buckets=8
    )
    store = EpochStore(spark, str(tmp_path / "s"))
    eng = CdcEngine(spark, table, epoch_store=store)
    ckpt = str(tmp_path / "ckpt")

    run_source_stream(spark, eng, ckpt, {"tip_lsn": 10})
    run_source_stream(spark, eng, ckpt, {"tip_lsn": 16})  # tip advances
    v = table.current_version()
    run_source_stream(spark, eng, ckpt, {"tip_lsn": 16})  # no new data
    assert table.current_version() == v

    def _st(df):
        return {
            r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["lsn"], r["seq"])
            for r in df.collect()
        }

    got = _st(read_state(table).select("doc_id", "tokens", "n_tok", "lsn", "seq"))
    want = _st(
        replay_final_state(fetch_lsn_range(spark, 0, 16)).select(
            "doc_id", "tokens", "n_tok", "lsn", "seq"
        )
    )
    assert len(got) > 0 and got == want


def test_paced_stream_restart_keeps_cursor(spark, tmp_path):
    """Paced reader across checkpoint restarts: each availableNow run is a
    fresh reader instance (same as a process restart), so the cursor must
    be restored from Spark's replayed commit/partitions calls — a reader
    that forgets it offers a latestOffset BEHIND the checkpoint, which
    Spark plans as a regressive batch and then re-reads the gap
    (duplicate rows). Asserts forward-only progress and zero duplicate
    stream_pos across 4 restarts."""
    _register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.format("changelog")
            .option("tip_lsn", 16)
            .option("max_lsns_per_batch", 4)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    seen_max = -1
    for _ in range(4):
        run()
        cur = spark.read.parquet(out)
        n, ndist = cur.count(), cur.dropDuplicates(["stream_pos"]).count()
        assert n == ndist, f"duplicate stream_pos after restart: {n} != {ndist}"
        mx = cur.agg(F.max("lsn")).first()[0]
        assert mx > seen_max, f"no forward progress: max lsn {mx} <= {seen_max}"
        seen_max = mx
    assert seen_max == 15  # reached the tip: 4 paced runs x 4 lsns
