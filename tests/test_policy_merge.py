"""Column merge policies (≙ the reference's per-table upsert hooks,
ethereumetl/streaming/postgres_hooks.py:43-150: counters add, first_*
keep earliest, last_* take newest): policy fold in the MOR resolver,
the COW merge, and the in-batch pre-aggregation — all three must
compose to the same state."""

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.tables.snapshot import SnapshotTable

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_xfers", T.LongType()),
    T.StructField("first_blknum", T.LongType()),
    T.StructField("last_value", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
POLICIES = {"n_xfers": "add", "first_blknum": "first", "last_value": "last"}

EV_SCHEMA = T.StructType([
    T.StructField("stream_pos", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("op", T.StringType()),
    T.StructField("rollback_to_lsn", T.LongType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_xfers", T.LongType()),
    T.StructField("first_blknum", T.LongType()),
    T.StructField("last_value", T.LongType()),
])


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _epochs():
    # epoch 0: a twice (in-batch fold), b once
    e0 = [
        (0, 10, 0, "I", None, "a", 1, 100, 5),
        (1, 11, 0, "U", None, "a", 2, None, 7),
        (2, 12, 0, "I", None, "b", 1, 200, 9),
    ]
    # epoch 1: a again, b deleted (tombstone carries totals)
    e1 = [
        (3, 13, 0, "U", None, "a", 3, None, 11),
        (4, 14, 0, "D", None, "b", None, None, None),
    ]
    # epoch 2: b re-inserted — totals resume; a untouched
    e2 = [
        (5, 15, 0, "I", None, "b", 4, 300, 13),
    ]
    return [e0, e1, e2]


EXPECT = {
    # n_xfers summed; first_blknum earliest non-null; last_value newest
    "a": (6, 100, 11),
    "b": (5, 200, 13),  # 1 + 4; first 200 survives the tombstone
}


def _state(table):
    return {
        r["doc_id"]: (r["n_xfers"], r["first_blknum"], r["last_value"])
        for r in read_state(table).collect()
    }


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_policy_fold_mor_and_cow_agree(spark, tmp_path, mode):
    t = SnapshotTable.create(
        spark, str(tmp_path / mode), SCHEMA, n_buckets=4, policies=POLICIES
    )
    eng = CdcEngine(spark, t, mode=mode, collect_metrics=False)
    for i, rows in enumerate(_epochs()):
        eng.apply_epoch(_ev(spark, rows), i)
    assert _state(t) == EXPECT


def test_policy_compaction_preserves_totals(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, policies=POLICIES
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    epochs = _epochs()
    eng.apply_epoch(_ev(spark, epochs[0]), 0)
    t.compact()  # folds deltas into a base row carrying the totals
    eng.apply_epoch(_ev(spark, epochs[1]), 1)
    eng.apply_epoch(_ev(spark, epochs[2]), 2)
    assert _state(t) == EXPECT
    t.compact()
    assert _state(t) == EXPECT


def test_policy_tombstone_hides_key_until_reinsert(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, policies=POLICIES
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    epochs = _epochs()
    eng.apply_epoch(_ev(spark, epochs[0]), 0)
    eng.apply_epoch(_ev(spark, epochs[1]), 1)
    assert set(_state(t)) == {"a"}  # b hidden by the tombstone
    eng.apply_epoch(_ev(spark, epochs[2]), 2)
    assert set(_state(t)) == {"a", "b"}


def test_policy_is_part_of_create_identity(spark, tmp_path):
    path = str(tmp_path / "t")
    SnapshotTable.create(spark, path, SCHEMA, n_buckets=4, policies=POLICIES)
    with pytest.raises(FileExistsError):
        SnapshotTable.create(spark, path, SCHEMA, n_buckets=4)  # no policies
    with pytest.raises(ValueError):
        SnapshotTable.create(
            spark, str(tmp_path / "bad"), SCHEMA, policies={"nope": "add"}
        )
    with pytest.raises(ValueError):
        SnapshotTable.create(
            spark, str(tmp_path / "bad2"), SCHEMA, policies={"n_xfers": "sum"}
        )


def test_policy_redelivery_counts_once(spark, tmp_path):
    """At-least-once delivery must not inflate 'add' columns: the same
    (lsn, seq) event replayed in a LATER epoch is dropped by the
    committed-watermark guard, and an exact duplicate INSIDE a batch
    collapses by (doc_id, lsn, seq) — in both modes."""
    for mode in ("mor", "cow"):
        t = SnapshotTable.create(
            spark, str(tmp_path / f"r-{mode}"), SCHEMA, n_buckets=4,
            policies=POLICIES,
        )
        eng = CdcEngine(spark, t, mode=mode, collect_metrics=False)
        e0 = [
            (0, 10, 0, "I", None, "a", 1, 100, 5),
            (1, 10, 0, "I", None, "a", 1, 100, 5),  # in-batch duplicate
            (2, 12, 0, "U", None, "a", 2, None, 7),
        ]
        eng.apply_epoch(_ev(spark, e0), 0)
        # epoch 1 redelivers the lsn-12 event (new stream_pos, same
        # lsn/seq) alongside one genuinely new event
        e1 = [
            (3, 12, 0, "U", None, "a", 2, None, 7),  # replay — must drop
            (4, 13, 0, "U", None, "a", 4, None, 9),
        ]
        eng.apply_epoch(_ev(spark, e1), 1)
        got = _state(t)
        assert got == {"a": (7, 100, 9)}, (mode, got)


def test_vacuum_refuses_policy_tables(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, policies=POLICIES
    )
    with pytest.raises(ValueError, match="merge policies"):
        t.vacuum_tombstones(10)


def test_cdf_source_folds_policies(spark, tmp_path):
    """The streaming table_changes source's pandas resolver must apply
    the same policy folds as the Spark resolver — its diff rows equal
    the batch read_changes on a policy MOR table."""
    from blockchain_etl_spark.sources.table_changes_source import (
        TableChangesDataSource,
    )

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, n_buckets=4, policies=POLICIES
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    for i, rows in enumerate(_epochs()):
        eng.apply_epoch(_ev(spark, rows), i)
    v0, v1 = 1, t.current_version()  # span the delta-accumulating commits

    batch = {
        (r["_change_type"], r["doc_id"]): (
            r["n_xfers"], r["first_blknum"], r["last_value"]
        )
        for r in t.read_changes(v0, v1).collect()
    }
    spark.dataSource.register(TableChangesDataSource)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (
        spark.readStream.format("table_changes")
        .option("path", str(tmp_path / "t"))
        .option("start_version", v0)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    stream = {
        (r["_change_type"], r["doc_id"]): (
            r["n_xfers"], r["first_blknum"], r["last_value"]
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    assert stream == batch
    assert batch  # non-degenerate


# --------------------------------------------------------------- min / max
MM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("lo", T.LongType()),
    T.StructField("hi", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
MM_POLICIES = {"lo": "min", "hi": "max"}
MM_EV = T.StructType([
    T.StructField("stream_pos", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("op", T.StringType()),
    T.StructField("rollback_to_lsn", T.LongType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("lo", T.LongType()),
    T.StructField("hi", T.LongType()),
])


def _mm_epochs():
    # a: values 5, 9, 2 (in-batch pair then another epoch); nulls skip.
    # b: single value, tombstoned, reinserted — extrema CARRY (lifetime
    # min/max resume across delete→reinsert, same contract as 'add').
    return [
        [
            (0, 10, 0, "I", None, "a", 5, 5),
            (1, 11, 0, "U", None, "a", 9, 9),
            (2, 12, 0, "I", None, "b", 50, 50),
        ],
        [
            (3, 13, 0, "U", None, "a", 2, 2),
            (4, 14, 0, "U", None, "a", None, None),  # null never wins
            (5, 15, 0, "D", None, "b", None, None),
        ],
        [
            (6, 16, 0, "I", None, "b", 70, 70),
        ],
    ]


MM_EXPECT = {"a": (2, 9), "b": (50, 70)}


def _mm_state(table):
    return {
        r["doc_id"]: (r["lo"], r["hi"]) for r in read_state(table).collect()
    }


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_minmax_policy_mor_and_cow_agree(spark, tmp_path, mode):
    t = SnapshotTable.create(
        spark, str(tmp_path / mode), MM_SCHEMA, n_buckets=4,
        policies=MM_POLICIES,
    )
    eng = CdcEngine(spark, t, mode=mode, collect_metrics=False)
    for i, rows in enumerate(_mm_epochs()):
        eng.apply_epoch(spark.createDataFrame(rows, MM_EV), i)
    assert _mm_state(t) == MM_EXPECT


def test_minmax_policy_compaction_preserves_extrema(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), MM_SCHEMA, n_buckets=4,
        policies=MM_POLICIES,
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    epochs = _mm_epochs()
    eng.apply_epoch(spark.createDataFrame(epochs[0], MM_EV), 0)
    t.compact()
    for i, rows in enumerate(epochs[1:], start=1):
        eng.apply_epoch(spark.createDataFrame(rows, MM_EV), i)
    assert _mm_state(t) == MM_EXPECT
    t.compact()
    assert _mm_state(t) == MM_EXPECT


def test_minmax_cdf_pandas_resolver_matches_batch(spark, tmp_path):
    from blockchain_etl_spark.sources.table_changes_source import (
        TableChangesDataSource,
    )

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), MM_SCHEMA, n_buckets=4,
        policies=MM_POLICIES,
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    for i, rows in enumerate(_mm_epochs()):
        eng.apply_epoch(spark.createDataFrame(rows, MM_EV), i)
    v0, v1 = 1, t.current_version()
    batch = {
        (r["_change_type"], r["doc_id"]): (r["lo"], r["hi"])
        for r in t.read_changes(v0, v1).collect()
    }
    spark.dataSource.register(TableChangesDataSource)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (
        spark.readStream.format("table_changes")
        .option("path", str(tmp_path / "t"))
        .option("start_version", v0)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    stream = {
        (r["_change_type"], r["doc_id"]): (r["lo"], r["hi"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert stream == batch
    assert batch


# ------------------------------------------------------------------- kmv
# KMV distinct-count sketch policy: union of per-event single-hash
# sketches, k smallest kept — associative/commutative/idempotent, so
# in-batch fold, MOR resolver, COW merge, compaction, and the CDF
# pandas resolver must all land on the identical sketch.
import hashlib


def _md5(v: str) -> str:
    return hashlib.md5(v.encode()).hexdigest()


KMV_K = 2
KMV_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("uniq", T.ArrayType(T.StringType())),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
KMV_POLICIES = {"uniq": f"kmv{KMV_K}"}
KMV_EV = T.StructType([
    T.StructField("stream_pos", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("op", T.StringType()),
    T.StructField("rollback_to_lsn", T.LongType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("uniq", T.ArrayType(T.StringType())),
])


def _kmv_epochs():
    # a: 3 distinct values (v1 twice — idempotent) + a null; k=2 keeps
    # the 2 smallest hashes. b: value, tombstone, reinsert — the sketch
    # CARRIES across delete→reinsert like 'add' totals.
    return [
        [
            (0, 10, 0, "I", None, "a", [_md5("v1")]),
            (1, 11, 0, "U", None, "a", [_md5("v2")]),
            (1, 11, 0, "U", None, "a", [_md5("v2")]),  # redelivery
            (2, 12, 0, "I", None, "b", [_md5("w1")]),
        ],
        [
            (3, 13, 0, "U", None, "a", [_md5("v3")]),
            (4, 14, 0, "U", None, "a", None),  # null contributes nothing
            (5, 15, 0, "D", None, "b", None),
        ],
        [
            (6, 16, 0, "I", None, "b", [_md5("w2")]),
        ],
    ]


KMV_EXPECT = {
    "a": sorted({_md5("v1"), _md5("v2"), _md5("v3")})[:KMV_K],
    "b": sorted({_md5("w1"), _md5("w2")})[:KMV_K],
}


def _kmv_state(table):
    return {
        r["doc_id"]: list(r["uniq"]) for r in read_state(table).collect()
    }


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_kmv_policy_mor_and_cow_agree(spark, tmp_path, mode):
    t = SnapshotTable.create(
        spark, str(tmp_path / mode), KMV_SCHEMA, n_buckets=4,
        policies=KMV_POLICIES,
    )
    eng = CdcEngine(spark, t, mode=mode, collect_metrics=False)
    for i, rows in enumerate(_kmv_epochs()):
        eng.apply_epoch(spark.createDataFrame(rows, KMV_EV), i)
    assert _kmv_state(t) == KMV_EXPECT


def test_kmv_policy_compaction_preserves_sketch(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), KMV_SCHEMA, n_buckets=4,
        policies=KMV_POLICIES,
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    epochs = _kmv_epochs()
    eng.apply_epoch(spark.createDataFrame(epochs[0], KMV_EV), 0)
    t.compact()
    for i, rows in enumerate(epochs[1:], start=1):
        eng.apply_epoch(spark.createDataFrame(rows, KMV_EV), i)
    assert _kmv_state(t) == KMV_EXPECT
    t.compact()
    assert _kmv_state(t) == KMV_EXPECT


def test_kmv_cdf_pandas_resolver_matches_batch(spark, tmp_path):
    from blockchain_etl_spark.sources.table_changes_source import (
        TableChangesDataSource,
    )

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), KMV_SCHEMA, n_buckets=4,
        policies=KMV_POLICIES,
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    for i, rows in enumerate(_kmv_epochs()):
        eng.apply_epoch(spark.createDataFrame(rows, KMV_EV), i)
    v0, v1 = 1, t.current_version()
    batch = {
        (r["_change_type"], r["doc_id"]): tuple(r["uniq"] or [])
        for r in t.read_changes(v0, v1).collect()
    }
    spark.dataSource.register(TableChangesDataSource)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (
        spark.readStream.format("table_changes")
        .option("path", str(tmp_path / "t"))
        .option("start_version", v0)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    stream = {
        (r["_change_type"], r["doc_id"]): tuple(r["uniq"] or [])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert stream == batch
    assert batch


def test_kmv_policy_requires_array_string_column(spark, tmp_path):
    with pytest.raises(ValueError, match="array<string>"):
        SnapshotTable.create(
            spark, str(tmp_path / "bad"), MM_SCHEMA, n_buckets=4,
            policies={"lo": "kmv8"},
        )
    with pytest.raises(ValueError, match="invalid merge policies"):
        SnapshotTable.create(
            spark, str(tmp_path / "bad2"), KMV_SCHEMA, n_buckets=4,
            policies={"uniq": "kmv0"},
        )


def test_kmv_estimator_exact_below_k_and_deterministic(spark):
    from blockchain_etl_spark.functions.sketch import (
        kmv_estimate, kmv_estimate_sql, kmv_item, kmv_truncate,
    )
    import duckdb

    k = 16
    values = [f"u-{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    sk = df.select(kmv_item(F.col("v")).alias("s")).agg(
        kmv_truncate(F.flatten(F.collect_list("s")), k).alias("uniq")
    )
    row = sk.select(
        F.size("uniq").alias("n"), kmv_estimate(F.col("uniq"), k).alias("est")
    ).first()
    assert row["n"] == k
    # (k-1)/U with 200 true distinct: expect the right order of magnitude
    assert 60 <= row["est"] <= 700
    # the DuckDB twin computes the identical estimate from the same sketch
    sketch = sk.first()["uniq"]
    est_sql = kmv_estimate_sql("sk", k)
    got = duckdb.sql(
        f"SELECT {est_sql} AS est FROM (SELECT {sketch!r}::VARCHAR[] AS sk)"
    ).fetchone()[0]
    assert got == row["est"]
    # below k the estimate IS the exact count
    small = spark.createDataFrame([(f"x{i}",) for i in range(5)], ["v"])
    sk2 = small.select(kmv_item(F.col("v")).alias("s")).agg(
        kmv_truncate(F.flatten(F.collect_list("s")), k).alias("uniq")
    )
    assert sk2.select(kmv_estimate(F.col("uniq"), k)).first()[0] == 5


def test_kmv_random_sequence_matches_set_oracle(spark, tmp_path):
    """Seeded random walk: I/U/D with random per-event values, random
    epoch boundaries, occasional exact redelivery, compactions at
    random points — the engine's kmv fold must equal the set oracle
    (union of every value ever contributed per key, k smallest,
    carried across delete→reinsert) at the end."""
    import random

    rng = random.Random(99)
    k = 4
    keys = [f"r{i}" for i in range(8)]
    contributed: dict[str, set] = {d: set() for d in keys}
    alive: dict[str, bool] = {}
    events, pos = [], 0
    for lsn in range(60):
        d = rng.choice(keys)
        if rng.random() < 0.15:
            ev = (pos, lsn, 0, "D", None, d, None)
            alive[d] = False
        else:
            val = f"v{rng.randrange(20)}"
            h = _md5(val)
            contributed[d].add(h)
            alive[d] = True
            ev = (pos, lsn, 0, "U" if d in alive else "I", None, d, [h])
        events.append(ev)
        pos += 1
        if rng.random() < 0.1:
            events.append(ev)  # exact redelivery (same pos/lsn/seq)

    cuts = sorted(rng.sample(range(1, len(events)), 4))
    epochs, prev = [], 0
    for c in [*cuts, len(events)]:
        epochs.append(events[prev:c])
        prev = c

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), KMV_SCHEMA, n_buckets=4,
        policies=KMV_POLICIES | {"uniq": f"kmv{k}"},
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    for i, ep in enumerate(epochs):
        eng.apply_epoch(spark.createDataFrame(ep, KMV_EV), i)
        if rng.random() < 0.5:
            t.compact()

    expect = {
        d: sorted(contributed[d])[:k]
        for d in keys
        if alive.get(d) and contributed[d]
    }
    # a key whose last op is D is hidden even though its sketch carries
    got = _kmv_state(t)
    assert got == expect


# ------------------------------------------------------------------- hist
# Fixed-width histogram policy: element-wise sum of per-event one-hot
# bin sketches — associative/commutative (NOT idempotent: redelivery
# dedup lives in the delta path, same contract as 'add'). In-batch
# fold, MOR resolver, COW merge, compaction, and the CDF pandas
# resolver must all land on the identical bins.
HIST_B = 4
HIST_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("lat", T.ArrayType(T.LongType())),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
HIST_POLICIES = {"lat": f"hist{HIST_B}"}
HIST_EV = T.StructType([
    T.StructField("stream_pos", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("op", T.StringType()),
    T.StructField("rollback_to_lsn", T.LongType()),
    T.StructField("doc_id", T.StringType()),
    T.StructField("lat", T.ArrayType(T.LongType())),
])


def _hist_epochs():
    # a: three observations in bins 0,1,2 (bin-1 event redelivered —
    # counted ONCE) + a null contribution; b: observation, tombstone,
    # reinsert — the histogram CARRIES across delete→reinsert.
    return [
        [
            (0, 10, 0, "I", None, "a", [1, 0, 0, 0]),
            (1, 11, 0, "U", None, "a", [0, 1, 0, 0]),
            (1, 11, 0, "U", None, "a", [0, 1, 0, 0]),  # redelivery
            (2, 12, 0, "I", None, "b", [0, 0, 0, 1]),
        ],
        [
            (3, 13, 0, "U", None, "a", [0, 0, 1, 0]),
            (4, 14, 0, "U", None, "a", None),  # null contributes nothing
            (5, 15, 0, "D", None, "b", None),
        ],
        [
            (6, 16, 0, "I", None, "b", [1, 0, 0, 0]),
        ],
    ]


HIST_EXPECT = {"a": [1, 1, 1, 0], "b": [1, 0, 0, 1]}


def _hist_state(table):
    return {
        r["doc_id"]: list(r["lat"]) for r in read_state(table).collect()
    }


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_hist_policy_mor_and_cow_agree(spark, tmp_path, mode):
    t = SnapshotTable.create(
        spark, str(tmp_path / mode), HIST_SCHEMA, n_buckets=4,
        policies=HIST_POLICIES,
    )
    eng = CdcEngine(spark, t, mode=mode, collect_metrics=False)
    for i, rows in enumerate(_hist_epochs()):
        eng.apply_epoch(spark.createDataFrame(rows, HIST_EV), i)
    assert _hist_state(t) == HIST_EXPECT


def test_hist_policy_compaction_preserves_bins(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), HIST_SCHEMA, n_buckets=4,
        policies=HIST_POLICIES,
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    epochs = _hist_epochs()
    eng.apply_epoch(spark.createDataFrame(epochs[0], HIST_EV), 0)
    t.compact()
    for i, rows in enumerate(epochs[1:], start=1):
        eng.apply_epoch(spark.createDataFrame(rows, HIST_EV), i)
    assert _hist_state(t) == HIST_EXPECT
    t.compact()
    assert _hist_state(t) == HIST_EXPECT


def test_hist_cdf_pandas_resolver_matches_batch(spark, tmp_path):
    from blockchain_etl_spark.sources.table_changes_source import (
        TableChangesDataSource,
    )

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), HIST_SCHEMA, n_buckets=4,
        policies=HIST_POLICIES,
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    for i, rows in enumerate(_hist_epochs()):
        eng.apply_epoch(spark.createDataFrame(rows, HIST_EV), i)
    v0, v1 = 1, t.current_version()
    batch = {
        (r["_change_type"], r["doc_id"]): tuple(r["lat"] or [])
        for r in t.read_changes(v0, v1).collect()
    }
    spark.dataSource.register(TableChangesDataSource)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (
        spark.readStream.format("table_changes")
        .option("path", str(tmp_path / "t"))
        .option("start_version", v0)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    stream = {
        (r["_change_type"], r["doc_id"]): tuple(r["lat"] or [])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert stream == batch
    assert batch


def test_hist_policy_requires_array_long_column(spark, tmp_path):
    with pytest.raises(ValueError, match="array<bigint>"):
        SnapshotTable.create(
            spark, str(tmp_path / "bad"), KMV_SCHEMA, n_buckets=4,
            policies={"uniq": "hist4"},  # array<string>, not array<bigint>
        )


def test_hist_random_sequence_matches_count_oracle(spark, tmp_path):
    """Seeded random walk: I/U/D with random bins, random epoch
    boundaries, occasional exact redelivery (counted once), compactions
    at random points — the engine's hist fold must equal the counting
    oracle (per-key bin counts over every contribution, carried across
    delete→reinsert), and the quantile estimator must equal the oracle's
    inverted CDF."""
    import math
    import random

    from blockchain_etl_spark.functions.hist import hist_quantile_bin

    rng = random.Random(101)
    b = 4
    keys = [f"r{i}" for i in range(8)]
    counts = {d: [0] * b for d in keys}
    alive: dict[str, bool] = {}
    events, pos = [], 0
    for lsn in range(60):
        d = rng.choice(keys)
        if rng.random() < 0.15:
            ev = (pos, lsn, 0, "D", None, d, None)
            alive[d] = False
        else:
            i = rng.randrange(b)
            counts[d][i] += 1
            alive[d] = True
            one_hot = [1 if j == i else 0 for j in range(b)]
            ev = (pos, lsn, 0, "U", None, d, one_hot)
        events.append(ev)
        pos += 1
        if rng.random() < 0.1:
            events.append(ev)  # exact redelivery (same pos/lsn/seq)

    cuts = sorted(rng.sample(range(1, len(events)), 4))
    epochs, prev = [], 0
    for c in [*cuts, len(events)]:
        epochs.append(events[prev:c])
        prev = c

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), HIST_SCHEMA, n_buckets=4,
        policies={"lat": f"hist{b}"},
    )
    eng = CdcEngine(spark, t, mode="mor", collect_metrics=False)
    for i, ep in enumerate(epochs):
        eng.apply_epoch(spark.createDataFrame(ep, HIST_EV), i)
        if rng.random() < 0.5:
            t.compact()

    expect = {
        d: counts[d] for d in keys if alive.get(d) and sum(counts[d])
    }
    assert _hist_state(t) == expect

    got_q = {
        r["doc_id"]: r["p50"]
        for r in read_state(t)
        .select("doc_id", hist_quantile_bin(F.col("lat"), 0.5).alias("p50"))
        .collect()
    }
    for d, c in expect.items():
        target = math.ceil(0.5 * sum(c))
        cum, want = 0, None
        for i, n in enumerate(c):
            cum += n
            if cum >= target:
                want = i
                break
        assert got_q[d] == want, (d, c)
