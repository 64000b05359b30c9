"""Txpool snapshot source (≙ EthTxpoolAdapter + ExportTxpoolJob,
/root/reference/ethereumetl/streaming/eth_txpool_adapter.py:1-68): the
mempool content at a point in time, stamped with the current block
height + snapshot timestamp and an ``item_id``.

The reference makes one `txpool_content` RPC call on the driver-side
loop. Spark-first: the fetch is sharded across executors (real nodes
page the pool by sender-address ranges / multiple replicas), each shard
fetched by an Arrow-batched callable — pluggable RPC in production, a
deterministic synthetic pool here (no network in this image). Everything
downstream (stamping, item ids, dedup by tx hash) is pure column work.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.functions.ids import item_id

TXPOOL_SCHEMA = T.StructType(
    [
        T.StructField("pool", T.StringType()),        # pending | queued
        T.StructField("tx_hash", T.StringType()),
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("nonce", T.LongType()),
        T.StructField("gas_price", T.LongType()),
        T.StructField("value", T.StringType()),       # uint256 → string
    ]
)


def synthetic_pool_fetcher(seed: int = 7, per_shard: int = 50) -> Callable:
    """Deterministic stand-in for the txpool_content RPC shard fetch."""

    def fetch(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for shard in pdf["id"]:
                for i in range(per_shard):
                    h = hashlib.md5(f"{seed}|{int(shard)}|{i}".encode()).hexdigest()
                    rows.append(
                        {
                            "pool": "pending" if i % 3 else "queued",
                            "tx_hash": "0x" + h,
                            "from_address": "0x" + h[:40],
                            "to_address": "0x" + h[-40:],
                            "nonce": int(shard) * per_shard + i,
                            "gas_price": int(h[:8], 16),
                            "value": str(int(h[8:20], 16)),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in TXPOOL_SCHEMA.fields])

    return fetch


def fetch_txpool(
    spark: SparkSession,
    blknum: int,
    block_timestamp: int,
    fetcher: Callable | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """One mempool snapshot: shard → fetch → stamp blknum/timestamp/item_id
    (≙ export_all stamping, eth_txpool_adapter.py:37-62) → dedup by
    tx_hash (a tx can surface from several replicas)."""
    shards = spark.range(0, n_shards, 1, n_shards)
    raw = shards.mapInPandas(fetcher or synthetic_pool_fetcher(), TXPOOL_SCHEMA)
    stamped = (
        raw.withColumn("blknum", F.lit(blknum))
        .withColumn("block_timestamp", F.to_timestamp(F.lit(block_timestamp)))
        .withColumn("item_id", item_id("txpool", "tx_hash"))
    )
    return stamped.dropDuplicates(["tx_hash"])
