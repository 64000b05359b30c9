"""Confirmation-lag tailer: finalized table + pending overlay.

≙ the reference's production setup: ``--lag 80`` holds the head of
chain back from the finalized tables, and a separate ``{chain}_pending``
schema carries head-of-chain rows (``blockchainetl/cli/dump2.py:148-155``,
``streamer.py:151-152``). Benefits at scale: the finalized table NEVER
rolls back (reorgs deeper than the lag are out of contract), so its
snapshots/compaction/GC are append-mostly and consumers can trust it;
only the small pending overlay churns.

Mechanics per arriving epoch:

1. land the epoch in the store (WAL);
2. ``new_final = head_lsn - lag``; apply the retained slice with
   ``prev_final < lsn ≤ new_final`` to the finalized engine as a
   synthetic epoch (liveness filtering handles markers inside it —
   by contract rollbacks never reach below the lag);
3. rebuild the pending overlay: declarative replay of the retained
   events with ``lsn > new_final`` — one small overwrite (the overlay
   holds only docs touched within the lag window, including delete
   tombstones as op='D' rows).

The "latest" view = finalized ⊖ (docs in overlay) ⊕ (live overlay rows).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, _liveness_filter, _valid_expr, dedup_last_writer, read_state
from blockchain_etl_spark.streaming.epoch_store import EpochStore


class LaggedTailer:
    def __init__(
        self,
        spark: SparkSession,
        engine: CdcEngine,
        store: EpochStore,
        pending_path: str,
        lag: int,
        prune: bool = True,
        retain_lsn_margin: int = 0,
    ):
        from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.spark = spark
        self.engine = engine
        self.store = store
        self.lag = lag
        # retention: after finalizing through lsn F, epochs wholly at or
        # below F - retain_lsn_margin are GC'd (≙ the reference's ledger
        # TTL, load.py:45, + ack'd stream consumption). The margin is the
        # redelivery horizon — keep it ≥ the deepest redelivery replay
        # you expect; reorgs never need pruned epochs (by the lag
        # contract they stay inside the lag window).
        self.prune = prune
        self.retain_lsn_margin = retain_lsn_margin
        self.pending = SnapshotTable(spark, pending_path)
        if not self.pending.exists():
            # pending overlay carries op so deletes mask finalized rows
            import pyspark.sql.types as T

            schema = T.StructType(
                [*TARGET_SCHEMA.fields, T.StructField("op", T.StringType(), True)]
            )
            SnapshotTable.create(spark, pending_path, schema, n_buckets=8)

    # ------------------------------------------------------------------
    def process_epoch(self, events_df: DataFrame, epoch_id: int) -> dict[str, Any]:
        # exactly-once for the LAG path: lagged epochs don't necessarily
        # enter the finalized table's ledger (an epoch wholly inside the
        # lag window finalizes nothing), so the pending overlay's commit
        # lineage carries the processed-epoch cursor — re-running an old
        # epoch would both crash on its pruned store file and overwrite
        # the overlay with a stale slice.
        done = self.pending.manifest().lineage.get("epoch_id", -1)
        if epoch_id <= done:
            return {"epoch_id": epoch_id, "skipped": "already processed"}
        stats = self.store.epoch_stats(epoch_id)
        if stats is None:
            stats = self.store.write_epoch(epoch_id, events_df)
        head = stats["lsn_max"]
        prev_final = self.engine.table.manifest().watermark["lsn"]
        new_final = max(head - self.lag, prev_final)

        # Bounded slice: only epochs holding events ABOVE the finalized
        # watermark are opened — per-epoch cost is O(lag window), not
        # O(total history) (the epoch-level lsn_max filter runs on the
        # index, no file is listed or opened for finalized epochs). The
        # downstream lsn predicates are unchanged; this is pure pruning.
        metas = self.store.slice_metas(
            -1, stats["pos_max"] + 1, min_lsn_exclusive=prev_final
        )
        sl = self.store.read_slice(
            -1, stats["pos_max"] + 1, min_lsn_exclusive=prev_final, metas=metas
        )
        if sl is None:
            sl = events_df.limit(0)  # schema only — never re-opens a file
        # ALL markers ever landed, straight from the index (zero data
        # files opened; they survive pruning): a marker above the final
        # window still kills events inside it (the reorg happened while
        # those lsns were within the lag — that is exactly why they
        # waited), and an old marker can never kill a newer event
        # (liveness only looks backwards in stream_pos).
        markers = self.store.index_markers(pos_hi=stats["pos_max"] + 1)
        data = sl.filter(F.col("op") != "R")

        # --- finalize the slice that cleared the lag -----------------------
        finalized_metrics = None
        if new_final > prev_final:
            fin = _liveness_filter(
                data.filter((F.col("lsn") > prev_final) & (F.col("lsn") <= new_final)),
                markers,
            )
            # pre-filtered (no R rows, liveness applied): the engine sees a
            # plain upsert batch; its own pre-scan computes the correct
            # ≤ new_final watermark (store stats would claim head's).
            finalized_metrics = self.engine.apply_epoch(
                fin, epoch_id, use_store_stats=False
            )

        # --- rebuild the pending overlay -----------------------------------
        live = _liveness_filter(data.filter(F.col("lsn") > new_final), markers)
        overlay = dedup_last_writer(live.filter(_valid_expr())).select(
            "doc_id",
            "tokens",
            "n_tok",
            "source",
            "lsn",
            "seq",
            F.lit(epoch_id).alias("updated_epoch"),
            (F.col("op") == "D").alias("deleted"),
            "op",
        )
        self.pending.overwrite(overlay, lineage={"epoch_id": epoch_id, "final_lsn": new_final})

        # --- retention: GC epochs that cleared the lag + margin -----------
        # Horizon clamps to the COMMITTED watermark, not new_final: if
        # the finalize commit landed a watermark below new_final (every
        # window event killed by a marker), the next read slices from
        # that lower watermark — pruning past it would make the read hit
        # a pruned epoch and wedge the tailer.
        pruned = None
        if self.prune:
            committed = self.engine.table.manifest().watermark["lsn"]
            pruned = self.store.prune(
                min(new_final, committed) - self.retain_lsn_margin
            )
        return {
            "epoch_id": epoch_id,
            "head_lsn": head,
            "final_lsn": new_final,
            "finalized": finalized_metrics,
            "epoch_files_read": len(metas),
            "pruned_epochs": (pruned or {}).get("pruned_epochs", []),
        }

    # ------------------------------------------------------------------
    def latest_view(self) -> DataFrame:
        """finalized ⊖ docs-in-overlay ⊕ live overlay rows."""
        fin = read_state(self.engine.table)
        ov = self.pending.read()
        masked = fin.join(ov.select("doc_id"), "doc_id", "left_anti")
        live_ov = ov.filter(~F.col("deleted")).select(*fin.columns)
        return masked.unionByName(live_ov)
