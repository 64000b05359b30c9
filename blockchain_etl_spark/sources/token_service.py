"""Token-metadata dim service with a persistent cache (≙ EthTokenService,
/root/reference/ethereumetl/service/eth_token_service.py:45-160: per-
address web3 `symbol()/name()/decimals()/totalSupply()` calls behind an
LRU + diskcache).

Spark-first inversion: instead of 10^10 per-row lookups through a
process-local cache, the cache IS a persistent parquet dim table and the
hot path is a broadcast join against it. ``resolve()`` anti-joins the
incoming address set against the dim, fetches ONLY the misses through an
Arrow-batched fetcher (web3 RPC in production — pluggable; a
deterministic fake here, the RPC client isn't in this image), and
commits them with an atomic directory swap. Every subsequent batch hits
the enlarged cache — the diskcache semantics, table-shaped.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("decimals", T.IntegerType()),
        T.StructField("total_supply", T.StringType()),  # uint256 → string
    ]
)

# ≙ DEFAULT_TOKEN_ETH special case (eth_token_service.py:72-77)
ETH_PSEUDO_TOKEN = ("0x0000000000000000000000000000000000000000", "ETH", "Ether", 18, None)


def deterministic_fake_fetcher(batches):
    """Test/bench stand-in for the web3 fetcher (NO network in this
    image): metadata derived from md5(address) — deterministic, so tests
    and oracles can re-derive it. A production deployment passes a
    fetcher that batch-calls the RPC node instead."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        h = pdf["address"].map(lambda a: hashlib.md5(a.encode()).hexdigest())
        yield pd.DataFrame(
            {
                "address": pdf["address"],
                "symbol": h.str[:6].str.upper(),
                "name": "Token " + h.str[:8],
                "decimals": h.map(lambda x: int(x[8:10], 16) % 24),
                "total_supply": h.map(lambda x: str(int(x[10:20], 16))),
            }
        )


class TokenDimService:
    def __init__(
        self,
        spark: SparkSession,
        cache_path: str,
        fetcher: Callable | None = None,
    ):
        self.spark = spark
        self.cache_path = cache_path
        self.fetcher = fetcher or deterministic_fake_fetcher
        os.makedirs(cache_path, exist_ok=True)
        if not os.path.exists(self._data_dir()):
            seed = spark.createDataFrame([ETH_PSEUDO_TOKEN], TOKEN_SCHEMA)
            self._commit(seed)

    def _pointer(self) -> str:
        return os.path.join(self.cache_path, "CURRENT")

    def _data_dir(self) -> str:
        if os.path.exists(self._pointer()):
            with open(self._pointer()) as f:
                return os.path.join(self.cache_path, f.read().strip())
        return os.path.join(self.cache_path, "current")  # legacy layout

    def _commit(self, dim: DataFrame) -> None:
        """Crash-safe swap via a pointer file (same scheme as
        SnapshotTable's manifest): write the new dim to an immutable
        stage dir, then atomically os.replace a one-line pointer file at
        it. A crash at ANY point leaves a readable cache — either the
        old pointer (orphan stage dir, GC'd on the next commit) or the
        new one (orphan old dir, ditto). Never a state with no `current`
        and never a directory-rename onto a non-empty target."""
        stage = f"stage-{os.getpid()}-{uuid.uuid4().hex}"
        dim.write.mode("overwrite").parquet(os.path.join(self.cache_path, stage))
        prev = self._data_dir()
        ptmp = self._pointer() + f".tmp-{os.getpid()}-{uuid.uuid4().hex}"
        with open(ptmp, "w") as f:
            f.write(stage)
        os.replace(ptmp, self._pointer())  # atomic file rename = the commit
        # GC the previous data dir (now unreferenced — the pointer moved
        # past it in OUR commit, so no new reader can resolve it) and
        # orphaned stage/tmp files — but only those whose owning process
        # is provably dead (same liveness gate as the table-changes gate
        # dirs): two processes sharing one cache_path must never delete
        # each other's in-flight stage dir or pointer temp file.
        cur = os.path.join(self.cache_path, stage)
        if os.path.abspath(prev) != os.path.abspath(cur):
            shutil.rmtree(prev, ignore_errors=True)
        for d in os.listdir(self.cache_path):
            p = os.path.join(self.cache_path, d)
            is_stage = d.startswith("stage-") and d != stage and os.path.isdir(p)
            is_tmp = d.startswith("CURRENT.tmp-")
            if not (is_stage or is_tmp):
                continue
            if not self._owner_dead(d):
                continue
            if is_stage:
                shutil.rmtree(p, ignore_errors=True)
            else:
                try:
                    os.unlink(p)
                except FileNotFoundError:
                    pass

    @staticmethod
    def _owner_dead(name: str) -> bool:
        """True only when the pid embedded in a stage-/CURRENT.tmp- name
        provably no longer runs. Legacy names without a pid segment are
        treated as dead (pre-r4 layout: single-process caches only)."""
        parts = name.split("-")
        # stage-{pid}-{hex} / CURRENT.tmp-{pid}-{hex}
        pid_part = parts[-2] if len(parts) >= 3 else None
        if pid_part is None or not pid_part.isdigit():
            return True  # legacy single-process layout
        if int(pid_part) == os.getpid():
            return True  # our own orphan from an earlier failed commit
        try:
            os.kill(int(pid_part), 0)
            return False
        except ProcessLookupError:
            return True
        except PermissionError:
            return False  # alive under another uid — leave it

    def dim(self) -> DataFrame:
        return self.spark.read.schema(TOKEN_SCHEMA).parquet(self._data_dir())

    def resolve(self, addresses: DataFrame, addr_col: str = "token_address") -> DataFrame:
        """Ensure every distinct address is cached; returns the dim.

        One anti-join finds the misses; only those go through the
        fetcher (reorg-style bursts of new tokens stay O(new tokens),
        never O(rows))."""
        want = addresses.select(
            F.lower(F.col(addr_col)).alias("address")
        ).distinct()
        cached = self.dim()
        misses = want.join(cached, "address", "left_anti")
        # gate on the anti-join, NOT on the fetched frame — evaluating the
        # fetch plan twice would hit the upstream RPC twice
        if misses.limit(1).count() > 0:
            fetched = misses.mapInPandas(self.fetcher, TOKEN_SCHEMA)
            # cached rows win deterministically over refetches
            self._commit(
                cached.unionByName(fetched.join(cached, "address", "left_anti"))
            )
        return self.dim()

    def enrich(
        self, df: DataFrame, addr_col: str = "token_address"
    ) -> DataFrame:
        """Broadcast-join token metadata onto transfer rows — the shape
        the reference reaches per item via get_token (token dims are
        ≪ transfer streams, so this is always the broadcast side)."""
        dim = self.resolve(df, addr_col)
        d = F.broadcast(
            dim.select(
                F.col("address").alias("__addr"),
                F.col("symbol").alias("token_symbol"),
                F.col("name").alias("token_name"),
                F.col("decimals").alias("token_decimals"),
            )
        )
        out = df.join(d, F.lower(F.col(addr_col)) == F.col("__addr"), "left")
        return out.drop("__addr")
