"""The change-log tail loop (≙ ``blockchainetl/streaming/streamer.py``).

Two drivers over the same apply path:

- ``ChangeLogTailer`` — the micro-batch loop: discover new epoch files
  in a landing directory (the change-log "bus", ≙ the Redis stream in
  the reference's dump/load split), persist each to the ``EpochStore``
  (WAL retention for reorg replay), apply via ``CdcEngine``. The
  **checkpoint is the target table's manifest ledger** — a crash at any
  point resumes by skipping already-applied epochs; there is no separate
  offset file to get out of sync (the reference's
  ``last_synced_block.txt`` vs DB race, ``streamer.py:144-163``).
- ``run_structured_stream`` — the same apply path driven by Structured
  Streaming ``foreachBatch`` with a real checkpoint dir:
  ``maxFilesPerTrigger`` paces epochs (≙ ``--block-batch-size``),
  the ledger makes redelivered batches no-ops (exactly-once sink).
"""

from __future__ import annotations

import os
import re
from typing import TYPE_CHECKING, Any

from pyspark.sql import SparkSession

from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA

if TYPE_CHECKING:  # avoid circular import (apply.py imports epoch_store)
    from blockchain_etl_spark.cdc.apply import CdcEngine

_EPOCH_RE = re.compile(r"epoch-(\d+)\.parquet$")


class ChangeLogTailer:
    def __init__(self, spark: SparkSession, landing_dir: str, engine: "CdcEngine"):
        self.spark = spark
        self.landing_dir = landing_dir
        self.engine = engine

    def pending_epochs(self) -> list[int]:
        applied = set(self.engine.table.manifest().applied_epochs)
        found = []
        for name in os.listdir(self.landing_dir):
            m = _EPOCH_RE.search(name)
            if m and int(m.group(1)) not in applied:
                found.append(int(m.group(1)))
        return sorted(found)

    def run_once(self) -> list[dict[str, Any]]:
        """Apply every pending epoch in order; returns metrics per epoch."""
        out = []
        for eid in self.pending_epochs():
            path = os.path.join(self.landing_dir, f"epoch-{eid:08d}.parquet")
            df = self.spark.read.schema(EVENT_SCHEMA).parquet(path)
            if self.engine.epoch_store is not None and str(eid) not in self.engine.epoch_store._index():
                self.engine.epoch_store.write_epoch(eid, df)
                df = self.engine.epoch_store.read_epoch(eid)
            metrics = self.engine.apply_epoch(df, eid)
            if metrics is not None:
                out.append(metrics)
        return out


def run_structured_stream(
    spark: SparkSession,
    landing_dir: str,
    engine: "CdcEngine",
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Drive the engine from a Structured Streaming file source.

    Epoch identity inside the ledger is the streaming batch_id, so a
    restarted query that redelivers a batch (checkpoint wrote the offset
    but the sink crashed mid-apply... impossible here since the manifest
    commit IS the sink transaction, but also after checkpoint loss) is
    deduplicated by the ledger — exactly-once end to end.
    """
    # epoch files land as directories epoch-N.parquet/part-*.parquet; glob
    # one level down so the file source sees the leaf parquet files. The
    # source processes files oldest-first (producer writes in order), so
    # batches arrive in stream order.
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(os.path.join(landing_dir, "*"))
    )

    def handle(batch_df, batch_id: int):
        if engine.epoch_store is not None:
            engine.epoch_store.write_epoch(batch_id, batch_df)
            batch_df = engine.epoch_store.read_epoch(batch_id)
        engine.apply_epoch(batch_df, batch_id)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
