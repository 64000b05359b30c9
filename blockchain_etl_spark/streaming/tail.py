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
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA

if TYPE_CHECKING:  # avoid circular import (apply.py imports epoch_store)
    from blockchain_etl_spark.cdc.apply import CdcEngine

_EPOCH_RE = re.compile(r"epoch-(\d+)\.(parquet|jsonl)$")


class ChangeLogTailer:
    def __init__(
        self,
        spark: SparkSession,
        landing_dir: str,
        engine: "CdcEngine",
        retain_lsn_margin: int | None = None,
        bus_format: str = "native",
        row_schema=None,
    ):
        self.spark = spark
        self.landing_dir = landing_dir
        self.engine = engine
        # change-log retention for direct ingest (≙ the reference's
        # ledger TTL, blockchainetl/cli/load.py:45): after each batch,
        # epochs wholly below watermark − margin are GC'd from the
        # store. The margin is the reorg + redelivery horizon — keep it
        # ≥ the deepest rollback the chain contract allows (≙ the
        # 80-block watermark); reorg replay below the horizon then
        # fails loud in EpochStore.slice_metas instead of silently
        # missing events. None = retain forever (the r4 behavior).
        self.retain_lsn_margin = retain_lsn_margin
        # wire format of the landing epochs: "native" = EVENT_SCHEMA
        # parquet; "debezium"/"maxwell" = JSONL envelope streams
        # (epoch-N.jsonl, one envelope per line) decoded JVM-side via
        # sources/envelope.py before store+apply — the EpochStore keeps
        # the DECODED native schema so reorg replay is format-agnostic.
        if bus_format not in ("native", "debezium", "maxwell"):
            raise ValueError(f"unknown bus_format {bus_format!r}")
        self.bus_format = bus_format
        # payload schema the envelope decoders parse with (the schema-
        # registry contract): pass an EVOLVED schema to follow an
        # upstream column addition — added columns flow through decode
        # into the engine's mergeSchema apply. None = EVENT_SCHEMA's
        # payload columns.
        self.row_schema = row_schema

    def _epoch_files(self) -> dict[int, str]:
        out: dict[int, str] = {}
        for name in os.listdir(self.landing_dir):
            m = _EPOCH_RE.search(name)
            if m:
                eid = int(m.group(1))
                if eid in out:
                    # epoch-N.parquet AND epoch-N.jsonl: picking a
                    # winner by listdir order could silently apply the
                    # wrong-format (stale) file — fail loud
                    raise ValueError(
                        f"duplicate landing files for epoch {eid}: "
                        f"{out[eid]} and {name}"
                    )
                out[eid] = name
        return out

    def pending_epochs(self) -> list[int]:
        applied = set(self.engine.table.manifest().applied_epochs)
        return sorted(e for e in self._epoch_files() if e not in applied)

    def _read_epoch(self, name: str):
        path = os.path.join(self.landing_dir, name)
        if name.endswith(".jsonl"):
            from blockchain_etl_spark.sources.envelope import DECODERS

            if self.bus_format not in DECODERS:
                raise ValueError(
                    f"landing file {name} is an envelope stream but the "
                    f"tailer was built with bus_format='native' — pass "
                    f"bus_format='debezium' or 'maxwell'"
                )
            raw = self.spark.read.text(path).withColumnRenamed("value", "_v")
            return DECODERS[self.bus_format](
                raw, value_col="_v", row_schema=self.row_schema
            )
        return self.spark.read.schema(EVENT_SCHEMA).parquet(path)

    def run_once(self) -> list[dict[str, Any]]:
        """Apply every pending epoch in order; returns metrics per epoch."""
        out = []
        files = self._epoch_files()
        for eid in self.pending_epochs():
            df = self._read_epoch(files[eid])
            if self.engine.epoch_store is not None and str(eid) not in self.engine.epoch_store._index():
                st = None
                if not files[eid].endswith(".jsonl"):
                    # native landed epochs are already columnar and
                    # already positioned — land them by hardlink + one
                    # narrow stats pass instead of a full re-encode
                    st = self.engine.epoch_store.link_native_epoch(
                        eid, os.path.join(self.landing_dir, files[eid]),
                        EVENT_SCHEMA,
                    )
                if st is None:
                    self.engine.epoch_store.write_epoch(eid, df)
                df = self.engine.epoch_store.read_epoch(eid)
            metrics = self.engine.apply_epoch(df, eid)
            if metrics is not None:
                out.append(metrics)
        if (
            out
            and self.retain_lsn_margin is not None
            and self.engine.epoch_store is not None
        ):
            wm = self.engine.table.manifest().watermark
            pruned = self.engine.epoch_store.prune(wm["lsn"] - self.retain_lsn_margin)
            if pruned["pruned_epochs"]:
                out[-1]["store_pruned_epochs"] = pruned["pruned_epochs"]
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

    Epoch identity inside the ledger is derived from batch CONTENT (the
    batch's min stream_pos), NOT the streaming batch_id: after checkpoint
    loss batch ids restart at 0 and only coincide with the previously
    applied epochs if file grouping and trigger pacing happen to repeat —
    keying on content makes redelivery of the same events hit the same
    ledger entry regardless of how the source re-batches them. A batch
    that collides with an applied epoch but carries events PAST the
    committed watermark (re-batched grouping straddling the applied
    boundary) is a misalignment and fails loudly instead of being
    silently skipped; a batch with a NEW min that straddles the
    watermark has its already-applied prefix filtered out before apply
    (exactly-once on metrics/DLQ/deltas, not just on converged state).
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

    handle = make_epoch_handler(engine)
    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def make_epoch_handler(engine: "CdcEngine"):
    """foreachBatch handler with content-derived epoch identity +
    re-batching misalignment detection (shared by every streaming
    ingest path)."""

    def handle(batch_df, batch_id: int):
        # content-derived epoch identity (one small agg per batch; the
        # landing write below recomputes full stats via Observation)
        row = batch_df.agg(
            F.min("stream_pos").alias("lo"), F.max("stream_pos").alias("hi")
        ).first()
        if row["lo"] is None:
            return  # empty batch: nothing to key or apply
        epoch_id = int(row["lo"])
        m = engine.table.manifest()
        wm_pos = m.watermark["pos"] if m.watermark["pos"] is not None else -1
        if epoch_id in m.applied_epochs and int(row["hi"]) > wm_pos:
            raise RuntimeError(
                f"stream/ledger misalignment: batch keyed epoch {epoch_id} was "
                f"already applied but carries events up to pos {row['hi']} past "
                f"the committed watermark {m.watermark['pos']} — the source "
                "re-batched files across an applied-epoch boundary; reprocess "
                "with the original pacing or reconcile()"
            )
        if epoch_id not in m.applied_epochs and epoch_id <= wm_pos:
            # re-batched delivery with a NEW min that straddles (or sits
            # entirely behind) the committed watermark: the <= wm_pos
            # prefix was already applied under a different batching —
            # without this, apply would converge (last-writer) but
            # metrics/DLQ/MOR deltas duplicate. Drop the applied prefix
            # and re-key the epoch on the surviving content.
            if int(row["hi"]) <= wm_pos:
                return  # every event already applied: pure redelivery
            batch_df = batch_df.filter(F.col("stream_pos") > wm_pos)
            epoch_id = int(
                batch_df.agg(F.min("stream_pos")).first()[0]
            )
            if epoch_id in m.applied_epochs:
                return  # surviving suffix is itself an applied epoch
        if engine.epoch_store is not None:
            engine.epoch_store.write_epoch(epoch_id, batch_df)
            batch_df = engine.epoch_store.read_epoch(epoch_id)
        return engine.apply_epoch(batch_df, epoch_id)

    return handle


def run_source_stream(
    spark: SparkSession,
    engine: "CdcEngine",
    checkpoint_dir: str,
    source_options: dict | None = None,
    available_now: bool = True,
):
    """Drive the engine straight from the native ``changelog`` DataSource
    (sources/changelog_datasource.py) — the no-landing-dir ingest path:
    source offsets ride Spark's checkpoint, epoch identity + exactly-once
    ride the engine's manifest ledger."""
    from blockchain_etl_spark.sources.changelog_datasource import ChangelogDataSource

    spark.dataSource.register(ChangelogDataSource)
    reader = spark.readStream.format("changelog")
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    writer = (
        reader.load()
        .writeStream.foreachBatch(make_epoch_handler(engine))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
