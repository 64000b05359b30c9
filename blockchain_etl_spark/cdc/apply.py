"""The keyed exactly-once apply path: validate → reorg → dedup → merge.

This is the Spark-first re-expression of the reference's load pipeline
(`PostgresItemExporter` upserts + Redis result ledger + reorg adapter):

- **Ledger check** (≙ ``blockchainetl/cli/load.py:208-231``): an epoch
  already present in the manifest's ``applied_epochs`` is skipped —
  duplicate redelivery of whole epochs is a no-op. The ledger lives IN
  the manifest, so data + ledger commit atomically (the reference's
  crash window between COPY and SETEX does not exist).
- **Reorg** (≙ ``eth_reorg_adapter.py:116-142,301-302``): an ``R``
  marker with ``rollback_to_lsn = L`` reverts the table to the newest
  snapshot with watermark ≤ L (time travel, no data rewrite), then
  replays the retained change-log slice up to L — tombstone-then-
  reinsert resolved atomically in the following merge commit.
- **Validation** (≙ the consistency counters,
  ``eth_streamer_adapter.py:276-321``): I/U events whose token array
  is null or whose ``n_tok != size(tokens)`` are rejected and counted.
- **In-batch dedup** (FIXTURES.md #5): last-writer per doc_id via a
  two-level ``max(struct(...))`` aggregation — map-side partial
  aggregation absorbs key skew (a hot doc_id combines locally on every
  input partition before one row per partition shuffles), which is why
  this is an agg and NOT a ``row_number()`` window (a window would
  shuffle every hot-key row to one task).
- **LSN-monotonic guard** (≙ ``cond_upsert_on_blknum``,
  ``blockchainetl/streaming/postgres_utils.py:80-88``): an incoming
  row older than the stored row is dropped as stale.
- **Copy-on-write MERGE**: only buckets containing touched keys are
  read and rewritten (bucket-level file pruning); the join inside a
  bucket set is a hash join on doc_id between the incoming upserts and
  the pruned target slice.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.schema_util import conform, merge_schemas
from blockchain_etl_spark.tables.snapshot import SnapshotTable, bucket_expr

# event bookkeeping columns — everything else in an event is payload, so
# a stream that grows columns (schema evolution) Just Works: new payload
# columns evolve the target schema (null backfill on old rows), widened
# numeric types widen the target column.
_EVENT_META = {"stream_pos", "lsn", "seq", "op", "doc_id", "rollback_to_lsn", "epoch_hash"}
# target bookkeeping columns (engine-maintained)
_TARGET_META = ["doc_id", "lsn", "seq", "updated_epoch", "deleted"]


def read_state(table: SnapshotTable, version: int | None = None) -> DataFrame:
    """Logical table state: tombstones filtered out."""
    return table.read(version=version).filter(~F.col("deleted")).drop("deleted")


def _valid_expr():
    # I/U payload contract: tokens present and n_tok == size(tokens).
    # D rows carry no payload and are always "valid".
    return (F.col("op") == "D") | (
        F.col("tokens").isNotNull() & (F.col("n_tok") == F.size("tokens"))
    )


def _liveness_filter(df: DataFrame, markers: list[dict[str, Any]]) -> DataFrame:
    """Drop events killed by any of the given (later) markers.

    Markers are rare (reorgs), so this is a conjunction of literal
    predicates — pure JVM column expressions, no window, no shuffle.
    """
    cond = F.lit(True)
    for m in markers:
        cond = cond & (
            (F.col("stream_pos") > m["stream_pos"]) | (F.col("lsn") <= m["rollback_to_lsn"])
        )
    return df.filter(cond)


def dedup_last_writer(events: DataFrame, payload_cols: list[str] | None = None) -> DataFrame:
    """One row per doc_id: the event with max stream_pos.

    ``max(struct(stream_pos, ...))`` is an ordinary aggregate, so Spark
    runs a partial (map-side) aggregation before the shuffle — the skew
    story for hot doc_ids. stream_pos is globally unique, so the struct
    comparison never ties.
    """
    if payload_cols is None:
        payload_cols = [c for c in events.columns if c not in _EVENT_META]
    carry = ["lsn", "seq", "op", *payload_cols]
    winner = F.max(F.struct(F.col("stream_pos"), *[F.col(c) for c in carry])).alias("w")
    g = events.groupBy("doc_id").agg(winner)
    return g.select(
        "doc_id",
        *[F.col(f"w.{c}").alias(c) for c in carry],
        F.col("w.stream_pos").alias("stream_pos"),
    )


class CdcEngine:
    """Applies change-log epochs to a SnapshotTable target."""

    def __init__(
        self,
        spark: SparkSession,
        table: SnapshotTable,
        epoch_store: EpochStore | None = None,
        collect_metrics: bool = True,
    ):
        self.spark = spark
        self.table = table
        self.epoch_store = epoch_store
        self.collect_metrics = collect_metrics

    def read_state(self, version: int | None = None) -> DataFrame:
        return read_state(self.table, version=version)

    # ------------------------------------------------------------------ api
    def apply_epoch(self, events_df: DataFrame, epoch_id: int) -> dict[str, Any] | None:
        """Apply one epoch exactly-once. Returns metrics, or None if the
        epoch was already applied (ledger skip)."""
        t0 = time.monotonic()
        m = self.table.manifest()
        if epoch_id in m.applied_epochs:
            return None

        wm = m.watermark
        prior_epochs = list(m.applied_epochs)
        # --- markers in this batch (tiny: reorgs are rare) ----------------
        markers = [
            r.asDict()
            for r in events_df.filter(F.col("op") == "R")
            .select("stream_pos", "lsn", "rollback_to_lsn")
            .orderBy("stream_pos")
            .collect()
        ]
        n_reorg = len(markers)

        batch_events = events_df.filter(F.col("op") != "R")
        if markers:
            batch_events = _liveness_filter(batch_events, markers)
            min_rb = min(mk["rollback_to_lsn"] for mk in markers)
            if min_rb < wm["lsn"]:
                # --- reorg touching already-committed state ---------------
                v = self.table.latest_version_at_or_before(min_rb)
                if v is None:
                    raise RuntimeError(
                        f"reorg to lsn {min_rb} is deeper than snapshot retention"
                    )
                self.table.rollback_to_version(v, lineage={"epoch_id": epoch_id})
                snap_wm = self.table.manifest().watermark
                # replay the retained slice (snapshot, batch start) up to
                # the rollback point; inner markers re-apply their kills.
                batch_start = min(
                    r["stream_pos"] for r in markers
                )  # markers precede re-emission
                if batch_start > snap_wm["pos"] + 1:
                    if self.epoch_store is None:
                        raise RuntimeError(
                            "reorg past committed state needs an epoch store to "
                            f"replay ({snap_wm['pos']} .. {batch_start})"
                        )
                    slice_df = self.epoch_store.read_slice(snap_wm["pos"], batch_start)
                    if slice_df is not None:
                        slice_markers = [
                            r.asDict()
                            for r in slice_df.filter(F.col("op") == "R")
                            .select("stream_pos", "lsn", "rollback_to_lsn")
                            .collect()
                        ]
                        replay = slice_df.filter(
                            (F.col("op") != "R") & (F.col("lsn") <= min_rb)
                        )
                        if slice_markers:
                            replay = _liveness_filter(replay, slice_markers)
                        # allowMissingColumns: replayed epochs may predate
                        # a schema evolution in the current batch
                        batch_events = replay.unionByName(
                            batch_events, allowMissingColumns=True
                        )

        # --- validate (≙ consistency counters) ---------------------------
        valid = batch_events.filter(_valid_expr())

        # --- last-writer per key, then merge ------------------------------
        ups = dedup_last_writer(valid)
        metrics = self._merge(
            ups, epoch_id=epoch_id, events_df=events_df, extra_epochs=prior_epochs
        )
        if metrics is not None and self.collect_metrics:
            rejected = batch_events.filter(~_valid_expr()).count()
            metrics["n_rejected"] = rejected
            metrics["n_reorg"] = n_reorg
            metrics["merge_ms"] = int((time.monotonic() - t0) * 1000)
        return metrics

    # ---------------------------------------------------------------- merge
    def _merge(
        self,
        ups: DataFrame,
        *,
        epoch_id: int,
        events_df: DataFrame,
        extra_epochs: list[int] | None = None,
    ) -> dict[str, Any]:
        import pyspark.sql.types as T

        m = self.table.manifest()
        nb = m.n_buckets
        ups = ups.withColumn("_b", bucket_expr("doc_id", nb))

        # --- schema evolution: incoming payload columns merge into the
        # target schema (added cols null-backfill, numeric types widen)
        incoming_payload = T.StructType(
            [
                f
                for f in ups.schema.fields
                if f.name not in ("doc_id", "op", "lsn", "seq", "stream_pos", "_b")
            ]
        )
        target_schema = m.schema()
        merged_schema, _ = merge_schemas(target_schema, incoming_payload)
        payload_cols = [f.name for f in merged_schema.fields if f.name not in _TARGET_META]
        ptypes = {f.name: f.dataType for f in merged_schema.fields}
        # conform the source side to the merged payload set
        ups = ups.select(
            "doc_id", "op", "lsn", "seq", "stream_pos", "_b",
            *[
                (
                    F.col(c).cast(ptypes[c])
                    if c in ups.columns
                    else F.lit(None).cast(ptypes[c])
                ).alias(c)
                for c in payload_cols
            ],
        )

        # batch watermark from the raw epoch (includes markers): one tiny agg
        wm_row = events_df.agg(
            F.max(F.struct("lsn", "seq")).alias("ls"),
            F.max("stream_pos").alias("pos"),
            F.min("lsn").alias("lsn_min"),
            F.count("*").alias("n_events"),
        ).first()
        if wm_row["n_events"] == 0:
            # empty epoch: still record it in the ledger (exactly-once)
            self.table.replace_buckets(
                [],
                self.spark.createDataFrame([], target_schema),
                epoch_id=epoch_id,
                extra_epochs=extra_epochs,
            )
            return {"epoch_id": epoch_id, "n_events": 0, "n_insert": 0, "n_update": 0,
                    "n_delete": 0, "n_stale": 0, "n_buckets_touched": 0,
                    "lsn_min": None, "lsn_max": None}
        new_wm = {
            "lsn": wm_row["ls"]["lsn"],
            "seq": wm_row["ls"]["seq"],
            "pos": wm_row["pos"],
        }

        # bucket pruning: collect touched bucket ids (≤ n_buckets values)
        buckets = [r["_b"] for r in ups.select("_b").distinct().collect()]
        old = conform(self.table.read(buckets=buckets), merged_schema)

        s = ups.alias("s")
        t = old.alias("t")
        j = t.join(s, on=F.col("t.doc_id") == F.col("s.doc_id"), how="full_outer")
        # LSN-monotonic guard, total over (lsn, seq); strict '<' makes an
        # exact redelivery stale. Tombstones participate: a deleted key's
        # (lsn, seq) fends off stale pre-delete replays.
        incoming_fresh = F.col("s.doc_id").isNotNull() & (
            F.col("t.doc_id").isNull()
            | (
                F.struct(F.col("t.lsn"), F.col("t.seq"))
                < F.struct(F.col("s.lsn"), F.col("s.seq"))
            )
        )
        t_live = F.col("t.doc_id").isNotNull() & ~F.col("t.deleted")
        tag = (
            F.when(F.col("s.doc_id").isNull(), F.lit("keep"))
            .when(~incoming_fresh, F.lit("stale"))
            .when(
                F.col("s.op") == "D",
                # both write a tombstone row; 'delete' removed a live row,
                # 'tombstone' is a D on an absent/already-deleted key
                F.when(t_live, F.lit("delete")).otherwise(F.lit("tombstone")),
            )
            .when(t_live, F.lit("update"))
            .otherwise(F.lit("insert"))
        )
        takes_s = tag.isin("insert", "update", "delete", "tombstone")
        tagged = j.select(
            F.coalesce(F.col("s.doc_id"), F.col("t.doc_id")).alias("doc_id"),
            tag.alias("_tag"),
            *[
                F.when(tag.isin("insert", "update"), F.col(f"s.{c}"))
                .when(tag.isin("delete", "tombstone"), F.lit(None).cast(ptypes[c]))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in payload_cols
            ],
            F.when(takes_s, F.col("s.lsn")).otherwise(F.col("t.lsn")).alias("lsn"),
            F.when(takes_s, F.col("s.seq")).otherwise(F.col("t.seq")).alias("seq"),
            F.when(takes_s, F.lit(epoch_id))
            .otherwise(F.col("t.updated_epoch"))
            .alias("updated_epoch"),
            F.when(takes_s, F.col("s.op") == "D")
            .otherwise(F.col("t.deleted"))
            .alias("deleted"),
        ).persist()

        counts: dict[str, int] = {}
        if self.collect_metrics:
            counts = {
                r["_tag"]: r["n"]
                for r in tagged.groupBy("_tag").agg(F.count("*").alias("n")).collect()
            }
        result = tagged.drop("_tag")

        metrics = {
            "epoch_id": epoch_id,
            "lsn_min": wm_row["lsn_min"],
            "lsn_max": new_wm["lsn"],
            "n_events": wm_row["n_events"],
            "n_insert": counts.get("insert", 0),
            "n_update": counts.get("update", 0),
            "n_delete": counts.get("delete", 0),
            "n_stale": counts.get("stale", 0),
            "n_buckets_touched": len(buckets),
        }
        self.table.replace_buckets(
            buckets,
            result,
            watermark=new_wm,
            epoch_id=epoch_id,
            extra_epochs=extra_epochs,
            lineage=metrics,
            new_schema=merged_schema,
        )
        tagged.unpersist()
        return metrics
