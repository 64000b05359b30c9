"""M5 — schema evolution mid-stream: an epoch that adds a payload column
(lang) and widens n_tok int32→int64 must evolve the target without
rewriting old files; old rows null-backfill / upcast on read."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA, TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.snapshot import SnapshotTable

EVOLVED_EVENT_SCHEMA = T.StructType(
    [
        *[
            f if f.name != "n_tok" else T.StructField("n_tok", T.LongType(), True)
            for f in EVENT_SCHEMA.fields
        ],
        T.StructField("lang", T.StringType(), True),
    ]
)


def _evolved_events(spark, start_pos, start_lsn, rows):
    data = [
        (
            start_pos + i, start_lsn + i, 0, "U", f"doc-{i:06d}",
            [1, 2, 3], 2**35 if False else 3, "srcX", None, "h", "en",
        )
        for i in range(rows)
    ]
    return spark.createDataFrame(data, EVOLVED_EVENT_SCHEMA)


def test_mid_stream_evolution(spark, tmp_path):
    epochs = generate_changelog(seed=41, n_epochs=3, p_reorg_epoch=0.0)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "store"))
    eng = CdcEngine(spark, table, epoch_store=store)
    for i, ev in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ev))
        eng.apply_epoch(store.read_epoch(i), i)
    files_before = {f["path"] for f in table.manifest().files}
    max_pos = max(e["stream_pos"] for ep in epochs for e in ep)
    max_lsn = max(e["lsn"] for ep in epochs for e in ep)

    # evolved epoch: +lang column, n_tok widened to long
    ev3 = _evolved_events(spark, max_pos + 1, max_lsn + 1, rows=5)
    store.write_epoch(3, ev3)
    metrics = eng.apply_epoch(store.read_epoch(3), 3)
    assert metrics["n_insert"] + metrics["n_update"] == 5

    st = read_state(table)
    dt = dict(st.dtypes)
    assert dt["n_tok"] == "bigint"
    assert dt["lang"] == "string"
    # new rows carry lang; untouched old rows are null-backfilled
    assert st.filter(F.col("lang") == "en").count() == 5
    assert st.filter(F.col("lang").isNull()).count() > 0
    # old files in untouched buckets carried forward without rewrite
    files_after = {f["path"] for f in table.manifest().files}
    assert files_before & files_after, "evolution must not rewrite the whole table"
    m = table.manifest()
    assert m.schema_version == 1

    # post-evolution epoch in the OLD schema still applies (conformed)
    ev4 = generate_changelog(seed=77, n_epochs=1, p_reorg_epoch=0.0)[0]
    for e in ev4:
        e["stream_pos"] += max_pos + 100
        e["lsn"] += max_lsn + 100
    store.write_epoch(4, events_to_df(spark, ev4))
    assert eng.apply_epoch(store.read_epoch(4), 4) is not None
    assert dict(read_state(table).dtypes)["n_tok"] == "bigint"


def test_evolution_with_reorg_replay_across_schemas(spark, tmp_path):
    """A reorg whose replay slice spans pre- and post-evolution epochs."""
    epochs = generate_changelog(seed=51, n_epochs=2, p_reorg_epoch=0.0)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=8)
    store = EpochStore(spark, str(tmp_path / "store"))
    eng = CdcEngine(spark, table, epoch_store=store)
    for i, ev in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ev))
        eng.apply_epoch(store.read_epoch(i), i)
    max_pos = max(e["stream_pos"] for ep in epochs for e in ep)
    max_lsn = max(e["lsn"] for ep in epochs for e in ep)

    ev2 = _evolved_events(spark, max_pos + 1, max_lsn + 1, rows=4)
    store.write_epoch(2, ev2)
    eng.apply_epoch(store.read_epoch(2), 2)

    # reorg rolling back into the pre-evolution range
    rb = max_lsn - 3
    reorg = [
        {
            "stream_pos": max_pos + 50,
            "lsn": max_lsn + 5,
            "seq": 0,
            "op": "R",
            "doc_id": None,
            "tokens": None,
            "n_tok": None,
            "source": None,
            "rollback_to_lsn": rb,
            "epoch_hash": "r",
        },
        {
            "stream_pos": max_pos + 51,
            "lsn": max_lsn + 5,
            "seq": 1,
            "op": "I",
            "doc_id": "doc-re",
            "tokens": [9, 9],
            "n_tok": 2,
            "source": "s",
            "rollback_to_lsn": None,
            "epoch_hash": "r",
        },
    ]
    store.write_epoch(3, events_to_df(spark, reorg))
    eng.apply_epoch(store.read_epoch(3), 3)
    st = read_state(table)
    # rolled-back: evolved rows (lsn > rb) are gone, re-inserted doc present
    assert st.filter(F.col("doc_id") == "doc-re").count() == 1
    assert st.filter(F.col("lang") == "en").count() == 0
    assert st.filter(F.col("lsn") > rb).count() == 1  # only doc-re
