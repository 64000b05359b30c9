"""Poison-epoch robustness: when every row of an epoch is rejected by
the validity contract, the first action on the upsert set collapses to
an empty relation and Catalyst/AQE optimizes the CollectMetrics node
out of the executed plan. Classic PySpark's ``Observation.get`` then
dies inside ``PythonSQLUtils.toPyRow`` (opaque Py4J AssertionError) —
AFTER the table commit succeeded, which would crash-loop any tailer on
a ledger-applied epoch. ``blockchain_etl_spark.observe.observed_get``
detects the collapse; these tests pin the apply paths that consume it.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, merge_into, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.snapshot import SnapshotTable


def _poison(pos, lsn, seq, doc):
    # tokens=None on an upsert violates the payload contract -> rejected
    return dict(
        stream_pos=pos, lsn=lsn, seq=seq, op="U", doc_id=doc, tokens=None,
        n_tok=None, source="s", rollback_to_lsn=None, epoch_hash=f"e{pos}",
    )


def _good(pos, lsn, seq, doc):
    return dict(
        stream_pos=pos, lsn=lsn, seq=seq, op="I", doc_id=doc, tokens=[1, 2],
        n_tok=2, source="s", rollback_to_lsn=None, epoch_hash=f"e{pos}",
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_all_rejected_epoch_does_not_crash_metrics(spark, tmp_path, mode):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    eng = CdcEngine(spark, t, mode=mode)  # collect_metrics defaults True
    m = eng.apply_epoch(
        events_to_df(spark, [_poison(0, 1, 0, "a"), _poison(1, 1, 1, "b")]),
        epoch_id=0,
    )
    assert m is not None
    assert m["n_rejected"] == 2
    assert read_state(t).count() == 0
    # the ledger holds the epoch: a redelivery is a no-op, not a retry loop
    assert eng.apply_epoch(
        events_to_df(spark, [_poison(0, 1, 0, "a")]), epoch_id=0
    ) is None
    # and the stream continues: the next good epoch applies normally
    m2 = eng.apply_epoch(events_to_df(spark, [_good(2, 2, 0, "c")]), epoch_id=1)
    assert m2["n_rejected"] == 0
    assert read_state(t).count() == 1


def test_merge_source_without_payload_contract_columns(spark, tmp_path):
    """The original repro: a parquet merge source lacking ``tokens``
    nulls the payload via the schema conform, every row is rejected,
    and the apply must survive with an exact rejected count."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    src_dir = tmp_path / "srcpq"
    src_dir.mkdir()
    pd.DataFrame(
        {"doc_id": ["a", "b", "c"], "n_tok": [2, 1, 3], "source": ["x", "x", "y"]}
    ).to_parquet(str(src_dir / "p.parquet"))
    m = merge_into(CdcEngine(spark, t, mode="cow"), spark.read.parquet(str(src_dir)))
    assert m["n_rejected"] == 3
    assert read_state(t).count() == 0


def test_write_epoch_of_empty_df(spark, tmp_path):
    store = EpochStore(spark, str(tmp_path / "store"))
    empty = events_to_df(spark, []).filter(F.lit(False))
    stats = store.write_epoch(0, empty)
    assert stats["n"] == 0
    assert stats["watermark"] is None
    assert stats["markers"] == []
