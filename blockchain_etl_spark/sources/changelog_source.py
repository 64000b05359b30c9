"""Distributed range-fetch source — the shape of the reference's extract
jobs (``ExportBlocksJob`` fanning JSON-RPC batches over a thread pool,
/root/reference/ethereumetl/jobs/export_blocks_job.py:36-103), Spark-first:

    spark.range(lsn_lo, lsn_hi)  →  mapInPandas(fetch_batch)  →  events

Each partition "fetches" its LSN sub-range in Arrow-sized batches — in
production the fetch body would call the upstream system (node RPC,
binlog server); here it synthesizes deterministic events so the source
is testable hermetically. The parallelism story is identical either
way: the driver plans the range, executors fetch concurrently, failed
tasks retry their own sub-range only (≙ BatchWorkExecutor retries,
blockchainetl/executors/batch_work_executor.py:34-43 — but per-task
instead of halve-and-retry).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA


def _synth_events_for_lsn(lsn: int, seed: int, events_per_lsn: int) -> list[dict]:
    """Deterministic 'RPC response' for one LSN (stand-in for the real
    upstream call)."""
    out = []
    for seq in range(events_per_lsn):
        h = hashlib.md5(f"{seed}|{lsn}|{seq}".encode()).hexdigest()
        v = int(h[:8], 16)
        op = "D" if v % 100 < 8 else ("U" if v % 100 < 50 else "I")
        n_tok = (v % 24) + 1
        toks = [int(h[i % 28 : i % 28 + 4], 16) % 32768 for i in range(n_tok)]
        out.append(
            {
                "stream_pos": lsn * events_per_lsn + seq,
                "lsn": lsn,
                "seq": seq,
                "op": op,
                "doc_id": f"doc-{int(h[8:14], 16) % 10_000:06d}",
                "tokens": None if op == "D" else toks,
                "n_tok": None if op == "D" else n_tok,
                "source": f"src{lsn % 5}",
                "rollback_to_lsn": None,
                "epoch_hash": h,
            }
        )
    return out


def fetch_lsn_range(
    spark: SparkSession,
    lsn_lo: int,
    lsn_hi: int,
    seed: int = 42,
    events_per_lsn: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Fetch events for [lsn_lo, lsn_hi) with executor-side parallelism."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for lsn in pdf["id"]:
                rows.extend(_synth_events_for_lsn(int(lsn), seed, events_per_lsn))
            yield pd.DataFrame(rows, columns=[f.name for f in EVENT_SCHEMA.fields])

    rng = spark.range(
        lsn_lo, lsn_hi, 1, partitions or spark.sparkContext.defaultParallelism
    )
    return rng.mapInPandas(fetch, EVENT_SCHEMA)


class AdaptiveRangeFetcher:
    """Driver-side adaptive batch sizing + retry-with-backoff (≙
    BatchWorkExecutor, /root/reference/blockchainetl/executors/
    batch_work_executor.py:52-110: halve the batch on a retriable
    failure, re-grow after sustained success; and the streamer's
    block_batch_size pacing, blockchainetl/streaming/streamer.py:153).

    Spark already retries failed TASKS; this handles the orthogonal
    failure mode — the upstream system (RPC node, binlog server)
    rejecting a whole range because it is too large or briefly
    unavailable. The fetch callable covers [lo, hi) and raises on
    failure; chunks shrink geometrically to ``min_batch``, and after
    ``grow_after`` consecutive successes the size doubles back toward
    ``max_batch``.
    """

    def __init__(
        self,
        fetch_fn,
        max_batch: int = 128,
        min_batch: int = 1,
        max_retries: int = 5,
        backoff_sec: float = 0.0,
        grow_after: int = 2,
    ):
        self.fetch_fn = fetch_fn
        self.max_batch = max_batch
        self.min_batch = min_batch
        self.max_retries = max_retries
        self.backoff_sec = backoff_sec
        self.grow_after = grow_after
        self.batch_size = max_batch
        self._streak = 0

    def run(self, lo: int, hi: int) -> Iterator[tuple[int, int, DataFrame]]:
        """Yield (start, end, df) chunks covering [lo, hi) in order."""
        import time as _time

        pos = lo
        while pos < hi:
            end = min(pos + self.batch_size, hi)
            attempts = 0
            while True:
                try:
                    df = self.fetch_fn(pos, end)
                    break
                except Exception:
                    attempts += 1
                    if attempts > self.max_retries:
                        raise
                    self._streak = 0
                    if self.batch_size > self.min_batch:
                        self.batch_size = max(self.min_batch, self.batch_size // 2)
                        end = min(pos + self.batch_size, hi)
                    if self.backoff_sec:
                        _time.sleep(self.backoff_sec * (2 ** (attempts - 1)))
            self._streak += 1
            if self._streak >= self.grow_after and self.batch_size < self.max_batch:
                self.batch_size = min(self.max_batch, self.batch_size * 2)
                self._streak = 0
            yield pos, end, df
            pos = end
