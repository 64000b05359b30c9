import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.tables.snapshot import SnapshotTable, bucket_expr


def _mk_rows(spark, ids, lsn=1):
    rows = [(f"doc-{i}", [i, i + 1], 2, "s", lsn, 0, 0, False) for i in ids]
    return spark.createDataFrame(rows, TARGET_SCHEMA)


def test_create_overwrite_read(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, key="doc_id", n_buckets=8)
    assert t.exists()
    t.overwrite(_mk_rows(spark, range(100)))
    df = t.read()
    assert df.count() == 100
    assert df.dtypes == [(f.name, f.dataType.simpleString()) for f in TARGET_SCHEMA.fields]
    got = df.filter(F.col("doc_id") == "doc-7").first()
    assert got["tokens"] == [7, 8]


def test_bucket_pruned_read(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    t.overwrite(_mk_rows(spark, range(200)))
    # pick one doc, read only its bucket — the row must be there, and the
    # read must touch fewer files than the full table
    b = (
        spark.createDataFrame([("doc-42",)], "doc_id string")
        .select(bucket_expr("doc_id", 8).alias("b"))
        .first()["b"]
    )
    pruned = t.read(buckets=[b])
    assert pruned.filter(F.col("doc_id") == "doc-42").count() == 1
    m = t.manifest()
    assert len([f for f in m.files if f["bucket"] == b]) < len(m.files)


def test_replace_buckets_is_cow(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    t.overwrite(_mk_rows(spark, range(100)))
    before = {f["path"]: f for f in t.manifest().files}
    # rewrite bucket of doc-0 only
    b = (
        spark.createDataFrame([("doc-0",)], "doc_id string")
        .select(bucket_expr("doc_id", 8).alias("b"))
        .first()["b"]
    )
    keep = t.read(buckets=[b]).filter(F.col("doc_id") != "doc-0")
    t.replace_buckets([b], keep, watermark={"lsn": 5, "seq": 0, "pos": 10}, epoch_id=1)
    after = t.manifest()
    assert t.read().count() == 99
    assert after.applied_epochs == [1]
    assert after.watermark["lsn"] == 5
    # untouched buckets carried forward by reference (same file paths)
    untouched_before = {p for p, f in before.items() if f["bucket"] != b}
    untouched_after = {f["path"] for f in after.files if f["bucket"] != b}
    assert untouched_before == untouched_after


def test_time_travel_and_rollback(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=4)
    t.overwrite(_mk_rows(spark, range(10)))
    v1 = t.current_version()
    t.overwrite(_mk_rows(spark, range(20)))
    assert t.read().count() == 20
    assert t.read(version=v1).count() == 10
    t.rollback_to_version(v1)
    assert t.read().count() == 10
    # history stays linear: the rollback is a new version
    assert t.current_version() > v1


def test_atomic_commit_pointer(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=4)
    t.overwrite(_mk_rows(spark, range(10)))
    # a manifest file for a "future" version without pointer swap must not
    # be visible (simulates crash between manifest write and swap)
    v = t.current_version()
    fake = t.manifest()
    fake.version = v + 1
    with open(t._manifest_path(v + 1), "w") as f:
        f.write(fake.to_json())
    assert t.current_version() == v  # LATEST still points at committed


def test_schema_evolution_add_column_and_widen(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=4)
    t.overwrite(_mk_rows(spark, range(10)))

    evolved = T.StructType(
        [
            *[f for f in TARGET_SCHEMA.fields if f.name != "n_tok"],
            T.StructField("n_tok", T.LongType(), True),  # widened int -> long
            T.StructField("lang", T.StringType(), True),  # added column
        ]
    )
    new_rows = spark.createDataFrame(
        [("doc-new", [9], "s2", 7, 1, 1, False, 2**40, "en")],
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
                T.StructField("source", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("seq", T.IntegerType()),
                T.StructField("updated_epoch", T.LongType()),
                T.StructField("deleted", T.BooleanType()),
                T.StructField("n_tok", T.LongType()),
                T.StructField("lang", T.StringType()),
            ]
        ),
    )
    b = (
        spark.createDataFrame([("doc-new",)], "doc_id string")
        .select(bucket_expr("doc_id", 4).alias("b"))
        .first()["b"]
    )
    old_bucket = t.read(buckets=[b]).withColumn("lang", F.lit(None).cast("string")).withColumn(
        "n_tok", F.col("n_tok").cast("long")
    )
    t.replace_buckets([b], old_bucket.unionByName(new_rows), new_schema=evolved)

    df = t.read()
    assert df.count() == 11
    assert dict(df.dtypes)["n_tok"] == "bigint"
    assert "lang" in df.columns
    # old rows null-backfilled on the added column, values upcast intact
    old = df.filter(F.col("doc_id") == "doc-3").first()
    assert old["lang"] is None and old["n_tok"] == 2
    new = df.filter(F.col("doc_id") == "doc-new").first()
    assert new["lang"] == "en" and new["n_tok"] == 2**40
    m = t.manifest()
    assert m.schema_version == 1 and len(json.loads(m.schemas["0"])) > 0


def test_merge_refuses_out_of_bucket_writes(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    t.overwrite(_mk_rows(spark, range(10)))
    rows = _mk_rows(spark, range(10, 20))
    try:
        t.replace_buckets([0], rows)  # rows hash into many buckets
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_empty_bucket_after_delete(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=2)
    t.overwrite(_mk_rows(spark, range(6)))
    empty = spark.createDataFrame([], TARGET_SCHEMA)
    t.replace_buckets([0, 1], empty)
    assert t.read().count() == 0
    assert os.path.exists(os.path.join(tmp_table_dir, "manifests", "LATEST"))


def test_utxo_enrich_merge_over_snapshot(spark, tmp_table_dir):
    """UTXO enrich as a MERGE-shaped update over the snapshot table
    (≙ UPDATE..FROM, /root/reference/bitcoinetl/streaming/enrich.py:16-34):
    the trace table holds outputs (address set) and inputs (address
    NULL); the enrichment pass joins inputs to the outputs they spend,
    rewrites ONLY the buckets containing filled inputs (copy-on-write),
    and the final state equals the declarative join."""
    schema = T.StructType([
        T.StructField("utxo_key", T.StringType()),   # txhash:idx / spender id
        T.StructField("isin", T.BooleanType()),
        T.StructField("pxhash", T.StringType()),
        T.StructField("vout_idx", T.LongType()),
        T.StructField("address", T.StringType()),
        T.StructField("value", T.LongType()),
    ])
    t = SnapshotTable.create(spark, tmp_table_dir, schema, key="utxo_key", n_buckets=8)
    outs = [(f"out:{i}", False, None, i % 3, f"0xaddr{i}", 100 + i) for i in range(40)]
    # input j spends output j-10; j % 17 == 0 spends an unknown parent
    ins = [
        (f"in:{j}", True, f"out:{j - 10}" if j % 17 else "out:bogus", (j - 10) % 3, None, None)
        for j in range(10, 40)
    ]
    t.overwrite(spark.createDataFrame(outs + ins, schema))
    v0 = t.current_version()
    before_files = {f["path"]: f["bucket"] for f in t.manifest().files}

    # the enrich pass: inputs with NULL address joined to their parent
    # output row (by key prefix here; (pxhash, vout_idx) in the catalog
    # twin — same shape), then a COW merge of only the touched buckets
    state = t.read()
    a = state.filter(F.col("isin") & F.col("address").isNull()).alias("a")
    b = state.filter(~F.col("isin") & F.col("address").isNotNull()).alias("b")
    filled = a.join(b, F.col("a.pxhash") == F.col("b.utxo_key")).select(
        F.col("a.utxo_key").alias("utxo_key"),
        F.lit(True).alias("isin"),
        F.col("a.pxhash").alias("pxhash"),
        F.col("a.vout_idx").alias("vout_idx"),
        F.col("b.address").alias("address"),
        F.col("b.value").alias("value"),
    )
    touched = sorted(
        r["b"]
        for r in filled.select(bucket_expr("utxo_key", 8).alias("b")).distinct().collect()
    )
    old = t.read(buckets=touched).alias("t")
    merged = (
        old.join(filled.alias("s"), F.col("t.utxo_key") == F.col("s.utxo_key"), "left")
        .select(
            *[
                F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
                for c in ("utxo_key", "isin", "pxhash", "vout_idx", "address", "value")
            ]
        )
    )
    t.replace_buckets(touched, merged, epoch_id=1)

    got = {r["utxo_key"]: (r["address"], r["value"]) for r in t.read().filter("isin").collect()}
    for j in range(10, 40):
        if j % 17:
            assert got[f"in:{j}"] == (f"0xaddr{j - 10}", 100 + j - 10), j
        else:
            assert got[f"in:{j}"] == (None, None), j  # unknown parent stays NULL
    # COW: untouched buckets carried forward by reference
    after = {f["path"]: f["bucket"] for f in t.manifest().files}
    carried = {p for p, bk in before_files.items() if bk not in touched}
    assert carried <= set(after)
    assert t.current_version() == v0 + 1 and 1 in t.manifest().applied_epochs


def test_per_bucket_compaction_bounds_read_amplification(spark, tmp_path):
    """Long skewed epoch sequence: the hot bucket compacts when IT
    crosses the threshold; cold buckets are never rewritten along with
    it (write amplification ∝ hot set, not table size), and no bucket
    is ever readable through more than `threshold` delta files (bounded
    read amplification). State stays oracle-correct throughout."""
    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.cdc.generator import events_to_df
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.tables.snapshot import SnapshotTable, bucket_expr

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    thresh = 4
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor",
                    compact_delta_threshold=thresh)

    # find doc ids for a hot bucket and a cold bucket
    probe = spark.createDataFrame(
        [(f"d{i}",) for i in range(64)], "doc_id string"
    ).select("doc_id", bucket_expr("doc_id", 4).alias("b")).collect()
    by_bucket = {}
    for r in probe:
        by_bucket.setdefault(r["b"], []).append(r["doc_id"])
    hot, cold = by_bucket[0][0], by_bucket[1][0]

    compactions = []
    for i in range(1, 3 * thresh + 1):
        rows = [dict(stream_pos=10 * i, lsn=i, seq=0, op="U", doc_id=hot,
                     tokens=[i], n_tok=1, source="h",
                     rollback_to_lsn=None, epoch_hash=f"e{i}")]
        if i == 1:  # cold bucket written ONCE, then left alone
            rows.append(dict(stream_pos=10 * i + 1, lsn=i, seq=1, op="I",
                             doc_id=cold, tokens=[0], n_tok=1, source="c",
                             rollback_to_lsn=None, epoch_hash=f"e{i}c"))
        m = eng.apply_epoch(events_to_df(spark, rows), epoch_id=i)
        if m.get("compacted"):
            compactions.append(m["compacted_buckets"])
        # bounded read amplification at EVERY point in the sequence
        dc = t.delta_file_counts()
        assert all(c <= thresh for c in dc.values()), dc

    assert compactions, "threshold never triggered"
    # the cold bucket's delta was folded only if IT crossed — it never did
    cold_bucket = 1
    assert all(cold_bucket not in bs for bs in compactions), compactions

    got = {r["doc_id"]: r["tokens"] for r in read_state(t).collect()}
    assert got == {hot: [3 * thresh], cold: [0]}


def _mk_events(spark, rows):
    from blockchain_etl_spark.cdc.generator import events_to_df
    return events_to_df(spark, rows)


def test_rebucket_preserves_state_and_guards(spark, tmp_path):
    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor")
    ev = [dict(stream_pos=i, lsn=i, seq=0, op="I", doc_id=f"d{i}", tokens=[i],
               n_tok=1, source="s", rollback_to_lsn=None, epoch_hash=f"e{i}")
          for i in range(1, 30)]
    ev.append(dict(stream_pos=99, lsn=99, seq=0, op="D", doc_id="d5",
                   tokens=None, n_tok=None, source=None,
                   rollback_to_lsn=None, epoch_hash="ed"))
    eng.apply_epoch(_mk_events(spark, ev), epoch_id=0)
    before = {r["doc_id"]: r["tokens"] for r in read_state(t).collect()}
    v_pre = t.current_version()

    v = t.rebucket(16)
    assert t.manifest().n_buckets == 16
    after = {r["doc_id"]: r["tokens"] for r in read_state(t).collect()}
    assert after == before
    # tombstone guard survived the rewrite: a stale replay of d5 still loses
    eng.apply_epoch(_mk_events(spark, [
        dict(stream_pos=3, lsn=3, seq=0, op="I", doc_id="d5", tokens=[3],
             n_tok=1, source="s", rollback_to_lsn=None, epoch_hash="stale"),
    ]), epoch_id=1)
    assert "d5" not in {r["doc_id"] for r in read_state(t).collect()}
    # the rebucket commit is logically empty for change readers
    assert t.read_changes_per_commit(v_pre, v).count() == 0
    # ranged diff across it falls back to unpruned (None) but stays correct
    assert t.changed_buckets(v_pre, v) is None
    assert t.read_changes(v_pre, v).count() == 0


def test_clone_at_is_independent_of_source_lifecycle(spark, tmp_path):
    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "src"), TARGET_SCHEMA, n_buckets=4)
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor")
    def ins(lo, hi, epoch):
        eng.apply_epoch(_mk_events(spark, [
            dict(stream_pos=i, lsn=i, seq=0, op="I", doc_id=f"d{i}", tokens=[i],
                 n_tok=1, source="s", rollback_to_lsn=None, epoch_hash=f"e{i}")
            for i in range(lo, hi)]), epoch_id=epoch)
    ins(1, 10, 0)
    v_fork = t.current_version()
    ins(10, 20, 1)

    c = t.clone_at(str(tmp_path / "fork"), version=v_fork)
    got = {r["doc_id"] for r in read_state(c).collect()}
    assert got == {f"d{i}" for i in range(1, 10)}  # state AT the fork point
    # clone has its own identity and ledger carried over
    assert c.table_uid() is not None and c.table_uid() != t.table_uid()
    assert 0 in c.manifest().applied_epochs

    # source lifecycle (compact rewrites files) cannot corrupt the clone
    t.compact()
    assert {r["doc_id"] for r in read_state(c).collect()} == got
    # and writes diverge independently
    ce = CdcEngine(spark, c, collect_metrics=False, mode="mor")
    ce.apply_epoch(_mk_events(spark, [
        dict(stream_pos=500, lsn=500, seq=0, op="I", doc_id="fork-only",
             tokens=[1], n_tok=1, source="s", rollback_to_lsn=None,
             epoch_hash="f")]), epoch_id=77)
    assert "fork-only" in {r["doc_id"] for r in read_state(c).collect()}
    assert "fork-only" not in {r["doc_id"] for r in read_state(t).collect()}


def test_clone_retry_after_crash_is_idempotent(spark, tmp_path):
    """A clone that crashed after linking some files but before its
    manifest write must be retryable: links to the same immutable files
    are treated as already-done, and the manifest write is the commit."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.cdc.generator import events_to_df
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "src"), TARGET_SCHEMA, n_buckets=4)
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor")
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=i, lsn=i, seq=0, op="I", doc_id=f"d{i}", tokens=[i],
             n_tok=1, source="s", rollback_to_lsn=None, epoch_hash=f"e{i}")
        for i in range(1, 9)]), epoch_id=0)

    dst = str(tmp_path / "fork")
    # simulate the crash: link a SUBSET of the data files, no manifest
    m = t.manifest()
    half = m.files[: len(m.files) // 2]
    for f in half:
        p = os.path.join(dst, f["path"])
        os.makedirs(os.path.dirname(p), exist_ok=True)
        os.link(os.path.join(t.path, f["path"]), p)
    assert not SnapshotTable(spark, dst).exists()

    c = t.clone_at(dst)  # retry completes over the partial residue
    assert c.exists()
    assert {r["doc_id"] for r in read_state(c).collect()} == {
        f"d{i}" for i in range(1, 9)
    }


def test_concurrent_commit_loser_gets_conflict_and_pointer_heals(spark, tmp_path):
    """Optimistic concurrency: two writers racing to the same next
    version produce one winner; the loser raises CommitConflictError
    instead of silently clobbering the winner's commit, and the pointer
    heals to the winner even if the winner crashed before its swap."""
    import json as _json
    import os

    import pytest as _pt

    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.tables.snapshot import (
        CommitConflictError,
        Manifest,
        SnapshotTable,
    )

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    df = spark.createDataFrame(
        [("a", [1], 1, "s", 1, 0, None, False)], TARGET_SCHEMA
    )
    t.overwrite(df)  # v1
    base = t.manifest()

    # a concurrent winner commits v2 but CRASHES before the pointer swap
    winner = Manifest(
        version=base.version + 1, key=base.key, n_buckets=base.n_buckets,
        schema_version=base.schema_version, schemas=base.schemas,
        files=base.files, watermark=base.watermark,
        applied_epochs=base.applied_epochs, parent=base.version,
        lineage={"who": "winner"},
    )
    with open(t._manifest_path(winner.version), "w") as f:
        f.write(winner.to_json())
    assert t.current_version() == base.version  # swap never happened

    # our commit at the same version must CONFLICT, not clobber
    with _pt.raises(CommitConflictError, match="concurrent writer"):
        t.overwrite(df)
    # ...and the conflict healed the pointer to the crashed winner
    assert t.current_version() == winner.version
    assert t.manifest().lineage == {"who": "winner"}

    # the retry (fresh read) lands cleanly on the NEXT version
    v = t.overwrite(df)
    assert v == winner.version + 1

    # pointer never regresses: a stale writer's late swap is a no-op
    t._advance_pointer(1)
    assert t.current_version() == v


def test_commit_cas_under_threaded_contention(spark, tmp_path):
    """Four writers hammer the commit protocol concurrently (manifest
    CAS + flock'd pointer, no Spark on the hot path): every version has
    exactly one winner, the history is gapless, total wins equal the
    version count, and the pointer lands on the max — no commit is ever
    silently dropped or shadowed."""
    import threading

    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.tables.snapshot import (
        CommitConflictError,
        Manifest,
        SnapshotTable,
    )

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=2)
    per_writer = 25
    wins = {w: 0 for w in range(4)}

    def worker(wid):
        for _ in range(per_writer):
            while True:
                m = t.manifest()
                new = Manifest(
                    version=m.version + 1, key=m.key, n_buckets=m.n_buckets,
                    schema_version=m.schema_version, schemas=m.schemas,
                    files=m.files, watermark=m.watermark,
                    applied_epochs=m.applied_epochs, parent=m.version,
                    lineage={"writer": wid},
                )
                try:
                    t._write_manifest(new)
                    wins[wid] += 1
                    break
                except CommitConflictError:
                    continue  # lost the race — re-read and retry

    threads = [threading.Thread(target=worker, args=(w,)) for w in wins]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    total = 4 * per_writer
    assert sum(wins.values()) == total
    assert t.current_version() == total  # pointer at the max, no shadowing
    assert t.versions() == list(range(0, total + 1))  # gapless history
    # every committed version names exactly one winner
    owners = [t.manifest(v).lineage.get("writer") for v in range(1, total + 1)]
    assert all(o in wins for o in owners)
    from collections import Counter

    assert Counter(owners) == Counter({w: wins[w] for w in wins if wins[w]})


def test_commit_watermark_never_regresses(spark, tmp_path):
    """An OCC loser retrying with its pre-conflict watermark must not
    regress the table watermark a competitor's later epoch advanced
    (ADVICE r4: append_deltas/replace_buckets set watermark
    unconditionally). The clamp is lexicographic on (lsn, seq)."""
    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    deltas = _mk_rows(spark, range(5), lsn=100).withColumn("updated_epoch", F.lit(1))
    t.append_deltas(deltas, watermark={"lsn": 100, "seq": 3, "pos": 50}, epoch_id=1)
    assert t.manifest().watermark == {"lsn": 100, "seq": 3, "pos": 50}

    # a retry proposing an OLDER watermark: commit lands, watermark holds
    stale = _mk_rows(spark, range(5, 8), lsn=90).withColumn("updated_epoch", F.lit(2))
    t.append_deltas(stale, watermark={"lsn": 90, "seq": 9, "pos": 40}, epoch_id=2)
    assert t.manifest().watermark == {"lsn": 100, "seq": 3, "pos": 50}
    # same via the COW path
    t.replace_buckets(
        [0, 1, 2, 3],
        t.read(resolve=True),
        watermark={"lsn": 99, "seq": 0, "pos": 10},
        epoch_id=3,
    )
    assert t.manifest().watermark == {"lsn": 100, "seq": 3, "pos": 50}
    # a genuinely newer watermark still advances
    newer = _mk_rows(spark, range(8, 9), lsn=101).withColumn("updated_epoch", F.lit(4))
    t.append_deltas(newer, watermark={"lsn": 101, "seq": 0, "pos": 60}, epoch_id=4)
    assert t.manifest().watermark == {"lsn": 101, "seq": 0, "pos": 60}
    # ledger carried every epoch regardless of clamping
    assert set(t.manifest().applied_epochs) == {1, 2, 3, 4}


def test_create_conflict_heal_checks_shape(spark, tmp_path):
    """Idempotent create() after a crashed v0 commit only heals when the
    existing table has the SAME key/n_buckets/schema — racing creators
    with different shapes must not silently share one table."""
    import pytest

    path = str(tmp_path / "t")
    SnapshotTable.create(spark, path, TARGET_SCHEMA, n_buckets=8)
    # same shape → idempotent, same table
    t2 = SnapshotTable.create(spark, path, TARGET_SCHEMA, n_buckets=8)
    assert t2.current_version() == 0
    # different bucket layout → refused
    with pytest.raises(FileExistsError):
        SnapshotTable.create(spark, path, TARGET_SCHEMA, n_buckets=16)
    # different schema → refused
    other = T.StructType([T.StructField("doc_id", T.StringType()), T.StructField("x", T.LongType())])
    with pytest.raises(FileExistsError):
        SnapshotTable.create(spark, path, other, n_buckets=8)
    # different key → refused
    with pytest.raises(FileExistsError):
        SnapshotTable.create(spark, path, TARGET_SCHEMA, key="source", n_buckets=8)


def test_clustered_compaction_sorts_buckets_and_preserves_state(spark, tmp_path):
    """compact(cluster=True) must be a pure physical rewrite: resolved
    state identical, tombstones preserved, and every rewritten base
    file internally sorted by key so parquet row-group min/max pruning
    works inside bucket files."""
    import pyarrow.parquet as pq

    from blockchain_etl_spark.cdc.apply import CdcEngine, point_lookup, read_state
    from blockchain_etl_spark.cdc.generator import events_to_df

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    eng = CdcEngine(spark, t, collect_metrics=False)
    docs = [f"doc-{i:03d}" for i in range(60)]
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=i, lsn=1, seq=i, op="I", doc_id=d, tokens=[i],
             n_tok=1, source="s", rollback_to_lsn=None, epoch_hash=f"h{i}")
        for i, d in enumerate(docs)
    ]), epoch_id=0)
    eng.apply_epoch(events_to_df(spark, [
        dict(stream_pos=100 + i, lsn=2, seq=i, op="U" if i % 3 else "D",
             doc_id=d, tokens=[9, i] if i % 3 else None,
             n_tok=2 if i % 3 else None, source="s" if i % 3 else None,
             rollback_to_lsn=None, epoch_hash=f"g{i}")
        for i, d in enumerate(docs[:30])
    ]), epoch_id=1)

    before = {
        r["doc_id"]: (list(r["tokens"]), r["lsn"], r["seq"])
        for r in read_state(t).collect()
    }
    v = t.compact(cluster=True)
    assert t.current_version() == v
    after = {
        r["doc_id"]: (list(r["tokens"]), r["lsn"], r["seq"])
        for r in read_state(t).collect()
    }
    assert after == before

    # every rewritten base file is key-sorted internally
    m = t.manifest()
    n_checked = 0
    for e in m.files:
        if e.get("kind") != "base":
            continue
        col = pq.read_table(
            os.path.join(t.path, e["path"]), columns=["doc_id"]
        )["doc_id"].to_pylist()
        assert col == sorted(col), e["path"]
        n_checked += 1
    assert n_checked >= 1

    # tombstones survived the rewrite (deletes keep guarding replays)
    resolved = t.read(resolve=True)
    assert resolved.filter(F.col("deleted")).count() == 10
    # point lookups still hit
    assert point_lookup(t, "doc-013").first()["tokens"] == [9, 13]
    assert point_lookup(t, "doc-000").first() is None


def test_auto_compaction_clusters_when_engine_configured(spark, tmp_path):
    """CdcEngine(compact_cluster=True): the threshold-triggered
    auto-compaction is a sort-order rewrite — rewritten base files come
    out key-sorted without a separate maintenance pass."""
    import pyarrow.parquet as pq

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.cdc.generator import events_to_df

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id", n_buckets=2
    )
    thresh = 3
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor",
                    compact_delta_threshold=thresh, compact_cluster=True)
    compacted = False
    for i in range(1, 2 * thresh + 1):
        # many keys per epoch so each bucket file holds >1 row (an
        # unsorted multi-row file would fail the sortedness assert)
        rows = [
            dict(stream_pos=100 * i + j, lsn=i, seq=j, op="I",
                 doc_id=f"doc-{(7 * j + i) % 40:03d}", tokens=[i, j],
                 n_tok=2, source="s", rollback_to_lsn=None,
                 epoch_hash=f"e{i}-{j}")
            for j in range(20)
        ]
        m = eng.apply_epoch(events_to_df(spark, rows), epoch_id=i)
        if m.get("compacted"):
            compacted = True
            for e in t.manifest().files:
                if e.get("kind") != "base":
                    continue
                col = pq.read_table(
                    os.path.join(t.path, e["path"]), columns=["doc_id"]
                )["doc_id"].to_pylist()
                assert col == sorted(col), e["path"]
    assert compacted, "threshold never triggered"
    assert read_state(t).count() == 40
