"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship: derive a deterministic change-log from
  the sf0.001 tables, run the full CDC engine (epoch store + snapshot
  table + ledger + reorg replay) incrementally over 4 epochs, return
  the final target state.
- ``queries()`` / ``oracle_sql()`` — the operator catalog
  (blockchain_etl_spark/catalog.py) with DuckDB oracle twins.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    from pyspark.sql import functions as F

    from blockchain_etl_spark.catalog import derive_changelog
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
    events = derive_changelog(spark, sf_dir)
    n = events.count()
    n_epochs = 4
    per = (n + n_epochs - 1) // n_epochs

    workdir = tempfile.mkdtemp(prefix="cdc-entry-")
    table = SnapshotTable.create(
        spark, os.path.join(workdir, "target"), TARGET_SCHEMA, key="doc_id", n_buckets=16
    )
    store = EpochStore(spark, os.path.join(workdir, "store"))
    engine = CdcEngine(spark, table, epoch_store=store)
    for i in range(n_epochs):
        ep = events.filter(
            (F.col("stream_pos") >= i * per) & (F.col("stream_pos") < (i + 1) * per)
        )
        store.write_epoch(i, ep)
        engine.apply_epoch(store.read_epoch(i), i)
    return engine.read_state().select(
        "doc_id",
        F.concat_ws(",", F.col("tokens").cast("array<string>")).alias("tokens_csv"),
        "n_tok",
        "source",
        "lsn",
        "seq",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blockchain_etl_spark.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from blockchain_etl_spark.catalog import oracle_sqls

    return oracle_sqls()
