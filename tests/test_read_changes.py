"""Incremental change-log reads between table versions (Iceberg
incremental scan / Delta CDF shape): SnapshotTable.read_changes."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _rows(spark, specs):
    """specs: (doc_id, tokens, lsn, deleted)"""
    rows = [
        (d, toks, len(toks) if toks is not None else None, "s", lsn, 0, 0, dead)
        for d, toks, lsn, dead in specs
    ]
    return spark.createDataFrame(rows, TARGET_SCHEMA)


def _changes(t, v0, v1=None):
    return {
        (r["_change_type"], r["doc_id"]): r
        for r in t.read_changes(v0, v1).collect()
    }


def test_insert_update_delete_classified(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    v0 = t.overwrite(
        _rows(spark, [("a", [1], 1, False), ("b", [2], 1, False), ("c", [3], 1, False)])
    )
    # b updated, c tombstoned, d inserted — via MOR delta append
    v1 = t.append_deltas(
        _rows(
            spark,
            [("b", [2, 9], 2, False), ("c", None, 2, True), ("d", [4], 2, False)],
        )
    )
    ch = _changes(t, v0, v1)
    assert set(ch) == {
        ("insert", "d"),
        ("update_preimage", "b"),
        ("update_postimage", "b"),
        ("delete", "c"),
    }
    assert ch[("update_preimage", "b")]["tokens"] == [2]
    assert ch[("update_postimage", "b")]["tokens"] == [2, 9]
    # delete carries the pre-image payload, not the tombstone's nulls
    assert ch[("delete", "c")]["tokens"] == [3]
    assert all(
        r["_from_version"] == v0 and r["_to_version"] == v1 for r in ch.values()
    )


def test_net_semantics_and_noop_rows(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    v0 = t.overwrite(_rows(spark, [("a", [1], 1, False)]))
    # x inserted then deleted inside the range → net nothing;
    # a rewritten with identical payload (redelivery) → no update row
    t.append_deltas(_rows(spark, [("x", [7], 2, False), ("a", [1], 1, False)]))
    v2 = t.append_deltas(_rows(spark, [("x", None, 3, True)]))
    assert _changes(t, v0, v2) == {}


def test_updated_epoch_is_not_a_logical_change(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    rows = [("a", [1], 1, False)]
    v0 = t.overwrite(_rows(spark, rows))
    bumped = _rows(spark, rows).withColumn("updated_epoch", F.lit(99).cast("long"))
    v1 = t.append_deltas(bumped)
    assert _changes(t, v0, v1) == {}
    # but a real payload change under the same epoch IS one
    v2 = t.append_deltas(_rows(spark, [("a", [1, 2], 2, False)]))
    assert set(_changes(t, v1, v2)) == {
        ("update_preimage", "a"),
        ("update_postimage", "a"),
    }


def test_compaction_emits_no_changes_and_prunes_buckets(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    v0 = t.overwrite(_rows(spark, [(f"d{i}", [i], 1, False) for i in range(50)]))
    t.append_deltas(_rows(spark, [("d1", [1, 1], 2, False)]))
    v2 = t.compact()
    assert v2 > v0 + 1
    # compaction rewrote files, but the only logical change is d1's update
    assert t.changed_buckets(v0 + 1, v2) == []
    ch = _changes(t, v0, v2)
    assert set(ch) == {("update_preimage", "d1"), ("update_postimage", "d1")}
    # bucket pruning: the diff reads only d1's bucket, not all 8
    touched = t.changed_buckets(v0, v2)
    assert len(touched) == 1


def test_rollback_range_emits_inverse_changes(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    v0 = t.overwrite(_rows(spark, [("a", [1], 1, False)]))
    t.append_deltas(_rows(spark, [("z", [9], 2, False)]))
    v2 = t.rollback_to_version(v0)
    # net v0→v2 is identity; the sub-range that saw z insert+revert nets out
    assert _changes(t, v0, v2) == {}
    # and v1→v2 (the rollback commit alone) emits the inverse delete
    assert set(_changes(t, v0 + 1, v2)) == {("delete", "z")}


def test_schema_evolution_diff_null_backfills(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    v0 = t.overwrite(_rows(spark, [("a", [1], 1, False)]))
    wide = T.StructType(
        list(TARGET_SCHEMA.fields) + [T.StructField("lang", T.StringType(), True)]
    )
    new = spark.createDataFrame(
        [("b", [2], 1, "s", 2, 0, 0, False, "en")], wide
    )
    v1 = t.append_deltas(new, new_schema=wide)
    ch = _changes(t, v0, v1)
    # only b inserted; a's null-backfilled lang is not a change
    assert set(ch) == {("insert", "b")}
    assert ch[("insert", "b")]["lang"] == "en"


def test_empty_and_identity_ranges(spark, tmp_table_dir):
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    v0 = t.overwrite(_rows(spark, [("a", [1], 1, False)]))
    df = t.read_changes(v0, v0)
    assert df.count() == 0
    assert "_change_type" in df.columns


def test_changes_reconstruct_state_across_mixed_commits(spark, tmp_table_dir):
    """Invariant: applying read_changes(v0, v1) to state(v0) yields
    state(v1), across a mixed history of delta appends, COW bucket
    rewrites, compaction, and rollback."""
    import random

    rng = random.Random(7)
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=8)
    t.overwrite(_rows(spark, [(f"d{i}", [i], 1, False) for i in range(40)]))

    def commit(step):
        kind = rng.choice(["delta", "delta", "cow", "compact", "rollback"])
        lsn = 2 + step
        if kind == "delta":
            specs = []
            for _ in range(rng.randint(1, 6)):
                d = f"d{rng.randrange(50)}"
                if rng.random() < 0.2:
                    specs.append((d, None, lsn, True))
                else:
                    specs.append((d, [rng.randrange(100) for _ in range(3)], lsn, False))
            t.append_deltas(_rows(spark, specs))
        elif kind == "cow":
            d = f"d{rng.randrange(50)}"
            from blockchain_etl_spark.tables.snapshot import bucket_expr

            b = (
                spark.createDataFrame([(d,)], "doc_id string")
                .select(bucket_expr("doc_id", 8).alias("b"))
                .first()["b"]
            )
            cur = t.read(buckets=[b], resolve=True).filter(F.col("doc_id") != d)
            new = _rows(spark, [(d, [99, step], lsn, False)])
            t.replace_buckets([b], cur.unionByName(new))
        elif kind == "compact":
            t.compact()
        else:
            vs = t.versions()
            t.rollback_to_version(rng.choice(vs[-3:]))

    def live_state(v):
        return {
            r["doc_id"]: (tuple(r["tokens"] or []), r["lsn"])
            for r in t.read(version=v, resolve=True).collect()
            if not r["deleted"]
        }

    versions = [t.current_version()]
    for step in range(8):
        commit(step)
        versions.append(t.current_version())

    for v0 in [versions[0], versions[3], versions[6]]:
        v1 = versions[-1]
        s = dict(live_state(v0))
        for r in t.read_changes(v0, v1).collect():
            ct = r["_change_type"]
            if ct in ("insert", "update_postimage"):
                s[r["doc_id"]] = (tuple(r["tokens"] or []), r["lsn"])
            elif ct == "delete":
                s.pop(r["doc_id"], None)
        assert s == live_state(v1), f"divergence replaying {v0}->{v1}"


def test_read_since_lsn_exact_and_pruned(spark, tmp_table_dir):
    """WAL-position incremental read: equals the brute-force filter, and
    the zone maps actually skip all-older files."""
    t = SnapshotTable.create(spark, tmp_table_dir, TARGET_SCHEMA, n_buckets=4)
    t.overwrite(_rows(spark, [(f"d{i}", [i], 1, False) for i in range(30)]))
    t.append_deltas(_rows(spark, [("d1", [1, 1], 5, False), ("d2", None, 5, True)]))
    t.append_deltas(_rows(spark, [("d3", [3, 3], 9, False), ("d1", [7], 9, False)]))

    for x in (0, 4, 8, 9):
        got = {
            (r["doc_id"], r["lsn"], r["deleted"])
            for r in t.read_since_lsn(x).collect()
        }
        exp = {
            (r["doc_id"], r["lsn"], r["deleted"])
            for r in t.read(resolve=True).filter(F.col("lsn") > x).collect()
        }
        assert got == exp, f"divergence at lsn > {x}"

    # deletions surface as tombstone rows
    since4 = {r["doc_id"]: r["deleted"] for r in t.read_since_lsn(4).collect()}
    assert since4["d2"] is True and since4["d1"] is False

    # pruning is real: raw (unresolved) scan past lsn 4 skips the 30-row
    # base files entirely and reads only the 4 delta rows
    raw = t.read(resolve=False, min_lsn_exclusive=4)
    assert raw.count() == 4


def test_read_changes_per_commit_attributes_each_step(spark, tmp_path):
    """Audit view vs state-sync view: insert-then-delete inside the
    range nets to NOTHING in read_changes but shows both steps in
    read_changes_per_commit, each stamped with its own version pair;
    compaction commits are skipped as logically empty."""
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.generator import events_to_df
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    eng = CdcEngine(spark, t, collect_metrics=False, mode="mor")
    v0 = t.current_version()

    def ev(lsn, op, doc, tok):
        return dict(stream_pos=lsn, lsn=lsn, seq=0, op=op, doc_id=doc,
                    tokens=None if op == "D" else [tok],
                    n_tok=None if op == "D" else 1, source="s",
                    rollback_to_lsn=None, epoch_hash=f"e{lsn}")

    eng.apply_epoch(events_to_df(spark, [ev(1, "I", "x", 1)]), epoch_id=1)
    eng.apply_epoch(events_to_df(spark, [ev(2, "D", "x", 0)]), epoch_id=2)
    t.compact()
    eng.apply_epoch(events_to_df(spark, [ev(3, "I", "y", 3)]), epoch_id=3)
    v1 = t.current_version()

    # net view: x vanished entirely
    net = {(r["_change_type"], r["doc_id"]) for r in t.read_changes(v0, v1).collect()}
    assert net == {("insert", "y")}

    rows = t.read_changes_per_commit(v0, v1).collect()
    got = sorted(
        (r["_change_type"], r["doc_id"], r["_from_version"], r["_to_version"])
        for r in rows
    )
    assert got == [
        ("delete", "x", v0 + 1, v0 + 2),
        ("insert", "x", v0, v0 + 1),
        ("insert", "y", v0 + 3, v0 + 4),
    ]
