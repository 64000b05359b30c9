"""Random-walk stress for hypertable-chunked tables: the full reorg /
redelivery / compaction gauntlet with a cluster column whose value is
a pure function of the key (the immutability contract), checked
against the python oracle — plus chunk-pruned range reads at every
checkpoint. Verifies in particular that reorg R markers (null
payload!) drive the rollback even though the cluster validity gate
rejects null-valued DATA rows."""

import hashlib

import pyspark.sql.types as T
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA, TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.snapshot import SnapshotTable

SLAB = 70


def _ets(doc_id: str) -> int:
    return (int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) % 10) * SLAB


EV2 = T.StructType([*EVENT_SCHEMA.fields, T.StructField("ets", T.LongType())])
SCHEMA2 = T.StructType([
    T.StructField("doc_id", T.StringType()),
    *[f for f in TARGET_SCHEMA.fields if f.name != "doc_id" and f.name not in
      ("lsn", "seq", "updated_epoch", "deleted")],
    T.StructField("ets", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])


def _to_df(spark, ep):
    names = [f.name for f in EVENT_SCHEMA.fields]
    rows = [
        tuple(e.get(n) for n in names)
        + ((_ets(e["doc_id"]) if e.get("doc_id") is not None else None),)
        for e in ep
    ]
    return spark.createDataFrame(rows, EV2)


def test_chunked_randomwalk_matches_oracle(spark, tmp_path):
    epochs = generate_changelog(seed=23, n_epochs=6, p_reorg_epoch=0.5)
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA2, key="doc_id", n_buckets=4,
        cluster_by="ets", cluster_slab=SLAB,
    )
    store = EpochStore(spark, str(tmp_path / "s"))
    eng = CdcEngine(spark, table, epoch_store=store, collect_metrics=False)
    for i, ep in enumerate(epochs):
        store.write_epoch(i, _to_df(spark, ep))
        eng.apply_epoch(store.read_epoch(i), i)
        if i % 2 == 1:
            table.compact()  # chunk-splitting rewrite mid-walk
        # checkpoint: pruned range read == full read filtered
        st = read_state(table)
        for lo, hi in ((0, 2 * SLAB - 1), (3 * SLAB, 6 * SLAB - 1)):
            full = {
                (r["doc_id"], r["ets"], r["n_tok"])
                for r in st.filter(F.col("ets").between(lo, hi)).collect()
            }
            pruned = {
                (r["doc_id"], r["ets"], r["n_tok"])
                for r in read_state(table, cluster_range=(lo, hi)).collect()
            }
            assert pruned == full, f"epoch {i} range {(lo, hi)}"

    flat = [e for ep in epochs for e in ep]
    expect = oracle_replay(flat)
    got = {
        r["doc_id"]: (r["ets"], r["n_tok"]) for r in read_state(table).collect()
    }
    assert set(got) == set(expect)
    for k, (ets, _n) in got.items():
        assert ets == _ets(k)  # the immutable value survived the gauntlet
    # reorgs actually happened (the walk exercised rollback+replay)
    assert any(e["op"] == "R" for e in flat)
