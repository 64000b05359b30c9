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

from blockchain_etl_spark.streaming.epoch_store import EpochStore
from blockchain_etl_spark.tables.schema_util import conform, merge_schemas
from blockchain_etl_spark.tables.snapshot import (
    CommitConflictError,
    SnapshotTable,
    bucket_expr,
)

# event bookkeeping columns — everything else in an event is payload, so
# a stream that grows columns (schema evolution) Just Works: new payload
# columns evolve the target schema (null backfill on old rows), widened
# numeric types widen the target column.
_EVENT_META = {"stream_pos", "lsn", "seq", "op", "doc_id", "rollback_to_lsn", "epoch_hash"}
# default epoch-id band for merge_into: disjoint from tailer-assigned
# ids so a merge never marks a future landing epoch as already-applied
MERGE_EPOCH_BASE = 1 << 40
# target bookkeeping columns (engine-maintained)
_TARGET_META = ["doc_id", "lsn", "seq", "updated_epoch", "deleted"]


def read_state(
    table: SnapshotTable,
    version: int | None = None,
    buckets: list[int] | None = None,
    columns: list[str] | None = None,
    key_range: tuple[str, str] | None = None,
    cluster_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Logical table state: tombstones filtered out. ``buckets`` prunes
    the read to the hash buckets of interest (point-lookup path: compute
    ``bucket_expr(key, n_buckets)`` for the keys you want and read only
    those buckets' files); ``columns`` prunes the payload columns BELOW
    the merge-on-read resolver, where Catalyst cannot (see
    SnapshotTable.read)."""
    return (
        table.read(
            version=version,
            buckets=buckets,
            columns=columns,
            key_range=key_range,
            cluster_range=cluster_range,
        )
        .filter(~F.col("deleted"))
        .drop("deleted")
    )


def point_lookup(table: SnapshotTable, key_value: str) -> DataFrame:
    """Single-key read: bucket pruning picks the ONE bucket, the key
    zone maps pick which of its base+delta files can mention the key,
    and the parquet row-group min/max pushdown (the filter below) prunes
    inside the opened files — three pruning levels, none scanning cold
    data. The MOR resolution then runs over the surviving sliver."""
    m = table.manifest()
    if m.bucket_key is not None:
        # secondary-bucketed index table: buckets hash the bucket_key
        # VALUE, which a key alone doesn't determine — fall back to the
        # key zone maps + row-group pushdown (no bucket pruning).
        return read_state(table, key_range=(key_value, key_value)).filter(
            F.col(m.key) == key_value
        )
    bucket = (
        table.spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(key_value)), F.lit(m.n_buckets))
            .cast("int")
            .alias("b")
        )
        .first()["b"]
    )
    return read_state(
        table, buckets=[bucket], key_range=(key_value, key_value)
    ).filter(F.col(m.key) == key_value)


def _valid_expr(df: DataFrame | None = None):
    # I/U payload contract: tokens present and n_tok == size(tokens).
    # D rows carry no payload and are always "valid". The contract is
    # schema-aware: an event stream without the docs payload (derived
    # entities carry their own columns — see streaming/pipeline.py) has
    # no length invariant to check, so everything passes; entity-specific
    # contracts go through CdcEngine(valid_expr=...).
    if df is not None and not {"tokens", "n_tok"} <= set(df.columns):
        return F.lit(True)
    return (F.col("op") == "D") | (
        F.col("tokens").isNotNull() & (F.col("n_tok") == F.size("tokens"))
    )


def _liveness_filter(df: DataFrame, markers: list[dict[str, Any]]) -> DataFrame:
    """Drop events killed by any of the given (later) markers — pure JVM
    column expressions, no window, no shuffle.

    Few markers → a flat conjunction of predicates. Many markers (long
    retained logs can hold thousands of reorgs) → a single aggregate
    over a literal array of (pos, rb) structs: constant expression
    depth, O(#markers) vectorized work per row inside codegen.
    """
    if not markers:
        return df
    if len(markers) <= 16:
        cond = F.lit(True)
        for m in markers:
            cond = cond & (
                (F.col("stream_pos") > m["stream_pos"])
                | (F.col("lsn") <= m["rollback_to_lsn"])
            )
        return df.filter(cond)
    # ONE literal string parsed by a foldable from_json — building
    # thousands of per-marker lit()/struct() nodes costs Catalyst
    # analysis time linear in #markers (measured: ~half the flagship
    # query's wall at 474 markers), while a folded constant is O(1)
    import json as _json

    arr = F.from_json(
        F.lit(
            _json.dumps(
                [
                    {"pos": m["stream_pos"], "rb": m["rollback_to_lsn"]}
                    for m in markers
                ]
            )
        ),
        "array<struct<pos:bigint,rb:bigint>>",
    )
    # min rollback_to among markers strictly after this event
    min_rb = F.aggregate(
        arr,
        F.lit(None).cast("long"),
        lambda acc, m: F.when(
            (m["pos"] > F.col("stream_pos")) & (acc.isNull() | (m["rb"] < acc)),
            m["rb"],
        ).otherwise(acc),
    )
    return df.filter(min_rb.isNull() | (F.col("lsn") <= min_rb))


def dedup_policy_fold(
    events: DataFrame, policies: dict[str, str]
) -> DataFrame:
    """In-batch fold for POLICY tables (≙ postgres_hooks column
    policies): one row per doc_id where ``add`` columns sum across the
    batch's events, ``first``/``last`` take the earliest/newest non-null
    by stream order, and everything else (op, lsn, seq, plain payload)
    comes from the last event. The same associative folds the MOR
    resolver applies across deltas — so in-batch and cross-epoch
    resolution compose to the same state regardless of batching.

    Delete contract for policy tables: a tombstone hides the key but
    CARRIES the accumulated columns; a later re-insert resumes the
    totals (reference counters are lifetime totals — token_holder
    turnover counters never reset, postgres_hooks.py:12-40)."""
    pol = {c: p for c, p in policies.items() if c in events.columns}
    payload = [c for c in events.columns if c not in _EVENT_META]
    plain = [c for c in payload if c not in pol]
    carry = ["lsn", "seq", "op", *plain]
    dtypes = {f.name: f.dataType for f in events.schema.fields}
    # collapse exact in-batch redeliveries first: the same (doc_id, lsn,
    # seq) delivered twice is the at-least-once replay case (value-
    # identical by the stream contract) — folding both would double-
    # count the 'add' columns, where the last-writer path is naturally
    # idempotent. max(stream_pos) picks one row deterministically.
    ev_cols = [c for c in events.columns if c not in ("doc_id", "lsn", "seq", "stream_pos")]
    u = events.groupBy("doc_id", "lsn", "seq").agg(
        F.max(F.struct(F.col("stream_pos"), *[F.col(c) for c in ev_cols])).alias("_u")
    )
    events = u.select(
        "doc_id",
        "lsn",
        "seq",
        F.col("_u.stream_pos").alias("stream_pos"),
        *[F.col(f"_u.{c}").alias(c) for c in ev_cols],
    )
    sp = F.col("stream_pos")
    aggs = [
        F.max(F.struct(sp, *[F.col(c) for c in carry])).alias("_w"),
        F.max(sp).alias("_sp"),
    ]
    from blockchain_etl_spark.functions.hist import hist_agg, hist_bins
    from blockchain_etl_spark.functions.sketch import kmv_agg, kmv_k

    for c, p in pol.items():
        if (k := kmv_k(p)) is not None:
            aggs.append(kmv_agg(c, k).alias(c))
        elif (b := hist_bins(p)) is not None:
            aggs.append(hist_agg(c, b).alias(c))
        elif p == "add":
            aggs.append(F.sum(c).cast(dtypes[c]).alias(c))
        elif p == "min":
            aggs.append(F.min(c).alias(c))
        elif p == "max":
            aggs.append(F.max(c).alias(c))
        elif p == "first":
            aggs.append(
                F.min(F.when(F.col(c).isNotNull(), F.struct(sp, F.col(c))))[c].alias(c)
            )
        else:
            aggs.append(
                F.max(F.when(F.col(c).isNotNull(), F.struct(sp, F.col(c))))[c].alias(c)
            )
    g = events.groupBy("doc_id").agg(*aggs)
    return g.select(
        "doc_id",
        *[F.col(f"_w.{c}").alias(c) for c in carry],
        *[F.col(c) for c in pol],
        F.col("_sp").alias("stream_pos"),
    )


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


# dedup_last_writer_semi is used for batches up to this many events:
# winners carry one (key, pos) pair per distinct key, so even a
# pathological all-unique-keys batch at the bound broadcasts a few
# hundred MB — inside the "a few hundred MB is usually fine" broadcast
# envelope, far under the 8 GB / 512M-row cap. Beyond it the aggregate
# path shuffles payload but never builds an oversized broadcast.
_SEMI_DEDUP_MAX_EVENTS = 8_000_000


def dedup_last_writer_semi(
    events: DataFrame, payload_cols: list[str] | None = None
) -> DataFrame:
    """Two-pass last-writer dedup — the guide-§8 shape: decide with
    small rows, move big rows once. Pass 1 finds each key's winning
    ``stream_pos`` over a NARROW projection (the scan prunes to two
    columns; the shuffle carries ~tens of bytes/row where
    :func:`dedup_last_writer`'s ``max(struct(...))`` aggregation
    shuffles every payload byte — the token arrays are ~90% of the
    batch). Pass 2 broadcast-joins the winners back ON THE (doc_id,
    stream_pos) PAIR, so the payload crosses no exchange at all before
    the bucket-layout write.

    The pair join is load-bearing: cascade-hop event streams mint ONE
    stream_pos for a whole hop (changes_to_events: lsn = to_version,
    seq = 0), so a position-only join would match every row against
    every key's winner — an M×N blowup. Keyed by the pair, each row
    matches exactly its own key's winner; duplicate (doc_id,
    stream_pos) deliveries are value-identical by the stream contract
    and resolve downstream like any redelivery. Callers bound the batch
    size (``_SEMI_DEDUP_MAX_EVENTS``) so the winner set always fits a
    broadcast; the aggregate form remains the unbounded-batch
    fallback."""
    if payload_cols is None:
        payload_cols = [c for c in events.columns if c not in _EVENT_META]
    carry = ["lsn", "seq", "op", *payload_cols]
    winners = events.groupBy("doc_id").agg(
        F.max("stream_pos").alias("stream_pos")
    )
    return events.join(
        F.broadcast(winners), ["doc_id", "stream_pos"]
    ).select("doc_id", *carry, "stream_pos")


class CdcEngine:
    """Applies change-log epochs to a SnapshotTable target.

    Two apply modes:

    - ``mor`` (default, merge-on-read): validate → dedup → **append**
      delta files. No read of existing data, no join — apply cost is
      O(batch) regardless of table size (the Iceberg v2 streaming-upsert
      shape). The LSN guard moves to read time: the resolver keeps the
      max (lsn, seq) row per key, so stale/duplicate rows simply lose.
      Compaction folds deltas into base files when a bucket accumulates
      more than ``compact_delta_threshold`` delta files.
    - ``cow`` (copy-on-write): the full-outer-join merge that rewrites
      touched buckets per epoch and reports insert/update/delete/stale
      splits exactly (the batch/backfill shape).
    """

    def __init__(
        self,
        spark: SparkSession,
        table: SnapshotTable,
        epoch_store: EpochStore | None = None,
        collect_metrics: bool = True,
        mode: str = "mor",
        compact_delta_threshold: int = 16,
        compact_cluster: bool = False,
        dlq_path: str | None = None,
        valid_expr=None,
    ):
        self.spark = spark
        self.table = table
        self.epoch_store = epoch_store
        self.collect_metrics = collect_metrics
        self.mode = mode
        self.compact_delta_threshold = compact_delta_threshold
        # cluster=True makes every auto-compaction a sort-order rewrite
        # (bucket sorted by key,lsn,seq) — same write volume, and point
        # lookups then prune parquet row groups via min/max stats.
        self.compact_cluster = compact_cluster
        # dead-letter queue for rejected events (≙ skip-and-save,
        # blockchainetl/streaming/streamer_jsonl_skiper.py + env.py:43-45)
        self.dlq_path = dlq_path
        # optional entity-specific payload contract (Column); None =
        # schema-aware default (_valid_expr)
        self.valid_expr = valid_expr

    def read_state(self, version: int | None = None) -> DataFrame:
        return read_state(self.table, version=version)

    def _valid(self, df: DataFrame):
        base = self.valid_expr if self.valid_expr is not None else _valid_expr(df)
        # secondary-bucketed tables: EVERY event (deletes included) must
        # carry the bucket_key column non-null — a row without it would
        # hash to the null bucket instead of its key's bucket, and a
        # later bucket-pruned read would miss the tombstone (silent key
        # resurrection). Reject instead; rejects are counted and DLQ'd.
        m = self.table.manifest()
        bk = m.bucket_key
        if bk is not None:
            if bk not in df.columns:
                raise ValueError(
                    f"events for secondary-bucketed table {self.table.path} "
                    f"must carry the bucket_key column {bk!r}"
                )
            base = base & F.col(bk).isNotNull()
        # cluster_by (hypertable chunking) has the same contract for the
        # same reason: a tombstone without its key's cluster value would
        # land outside the key's chunk and a later chunk-pruned read
        # could miss it (silent resurrection)
        cb = m.cluster_by
        if cb is not None:
            if cb not in df.columns:
                raise ValueError(
                    f"events for cluster-chunked table {self.table.path} "
                    f"must carry the cluster_by column {cb!r}"
                )
            base = base & F.col(cb).isNotNull()
        return base

    # ------------------------------------------------------------------ api
    def apply_epoch(
        self,
        events_df: DataFrame,
        epoch_id: int,
        stats: dict[str, Any] | None = None,
        use_store_stats: bool = True,
        lineage_extra: dict[str, Any] | None = None,
    ) -> dict[str, Any] | None:
        """Apply one epoch exactly-once. Returns metrics, or None if the
        epoch was already applied (ledger skip).

        ``lineage_extra`` rides the SAME atomic commit as the data inside
        the manifest lineage — callers that must persist their own cursor
        transactionally with the apply (e.g. a cascade hop's upstream
        version range) stamp it here instead of a separate file write.

        ``stats`` (as produced by ``EpochStore.write_epoch``) carries the
        epoch's watermark + reorg markers; when provided, apply runs in a
        single Spark job. Without it, one pre-scan computes the same."""
        t0 = time.monotonic()
        m = self.table.manifest()
        if epoch_id in m.applied_epochs:
            return None

        wm = m.watermark
        prior_epochs = list(m.applied_epochs)
        if stats is None and use_store_stats and self.epoch_store is not None:
            stats = self.epoch_store.epoch_stats(epoch_id)
        own_persist = False
        if stats is None and not (
            events_df.storageLevel.useMemory or events_df.storageLevel.useDisk
        ):
            # no landed stats → the pre-scan below AND the merge/append
            # (plus the COW bucket collect) would each re-execute the
            # caller's input plan — for cascade/gate callers that plan
            # is a whole derivation (version diff, events⋈documents).
            # Materialize it once; the pre-scan's aggregation fills the
            # cache. Skipped when the caller persisted already or when
            # store stats make the pre-scan unnecessary (the store read
            # is a plain columnar scan — caching it would only copy).
            events_df = events_df.persist()
            own_persist = True
        try:
            return self._apply_prepared(
                events_df, epoch_id, stats, wm, prior_epochs, m, t0,
                lineage_extra,
            )
        finally:
            if own_persist:
                events_df.unpersist()

    def _apply_prepared(
        self,
        events_df: DataFrame,
        epoch_id: int,
        stats: dict[str, Any] | None,
        wm: dict[str, int],
        prior_epochs: list[int],
        m,
        t0: float,
        lineage_extra: dict[str, Any] | None,
    ) -> dict[str, Any] | None:
        if stats is not None and "watermark" in stats:
            pre = {
                "n_events": stats["n"],
                "lsn_min": stats["lsn_min"],
                "ls": stats["watermark"] or {"lsn": None, "seq": None},
                "pos": stats["pos_max"],
            }
            markers = stats["markers"]
        else:
            # --- ONE pre-scan: watermark + counts + (rare) reorg markers --
            row = events_df.agg(
                F.count("*").alias("n_events"),
                F.min("lsn").alias("lsn_min"),
                F.max(F.struct("lsn", "seq")).alias("ls"),
                F.max("stream_pos").alias("pos"),
                F.collect_list(
                    F.when(
                        F.col("op") == "R",
                        F.struct("stream_pos", "lsn", "rollback_to_lsn"),
                    )
                ).alias("markers"),
            ).first()
            pre = {
                "n_events": row["n_events"],
                "lsn_min": row["lsn_min"],
                "ls": row["ls"] or {"lsn": None, "seq": None},
                "pos": row["pos"],
            }
            markers = sorted(
                (r.asDict() for r in row["markers"]), key=lambda r: r["stream_pos"]
            )
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
                try:
                    self.table.rollback_to_version(v, lineage={"epoch_id": epoch_id})
                except CommitConflictError:
                    # a competitor advanced the table mid-reorg: if it
                    # applied this very epoch, the dedup contract holds;
                    # otherwise the interleaving is a genuine write-write
                    # race on a reorging table — surface it (reorg epochs
                    # must be single-writer, like the reference's one
                    # streamer per chain)
                    if epoch_id in self.table.manifest().applied_epochs:
                        return None
                    raise
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

        if markers:
            # the committed watermark must reflect only LIVE events: the
            # pre-scan max(lsn,seq) saw reorg-killed rows and R markers,
            # and a watermark past the max live lsn would make
            # latest_version_at_or_before() skip valid snapshots on a
            # later reorg (and break reconcile's watermark invariant).
            # Markers are rare, so the extra agg only runs on reorg epochs.
            row2 = batch_events.agg(
                F.max(F.struct("lsn", "seq")).alias("ls"),
                F.max("stream_pos").alias("pos"),
            ).first()
            if row2["ls"] is not None:
                pre["ls"] = row2["ls"]
                pre["pos"] = row2["pos"]
            else:
                # every event in the epoch was killed: don't advance past
                # the (possibly just rolled-back) committed watermark
                cur = self.table.manifest().watermark
                pre["ls"] = {"lsn": cur["lsn"], "seq": cur["seq"]}
                pre["pos"] = cur["pos"]

        if pre["n_events"] == 0:
            # empty epoch: ledger-only commit (exactly-once). A commit
            # conflict here is the redelivered-to-two-workers race — the
            # competitor either recorded this epoch (skip) or advanced the
            # table (retry the ledger stamp against the fresh manifest).
            for attempt in range(3):
                try:
                    self.table.replace_buckets(
                        [],
                        self.spark.createDataFrame([], self.table.manifest().schema()),
                        epoch_id=epoch_id,
                        extra_epochs=list(self.table.manifest().applied_epochs),
                        # cursor lineage must ride even a zero-row hop —
                        # cascades/indexes advance their cursors by it
                        lineage=lineage_extra,
                    )
                    break
                except CommitConflictError:
                    if epoch_id in self.table.manifest().applied_epochs:
                        return None
                    if attempt == 2:
                        raise
            return {
                "epoch_id": epoch_id, "n_events": 0, "n_insert": 0, "n_update": 0,
                "n_delete": 0, "n_stale": 0, "n_rejected": 0, "n_reorg": 0,
                "n_buckets_touched": 0, "lsn_min": None, "lsn_max": None,
                "merge_ms": int((time.monotonic() - t0) * 1000),
            }

        # --- validate (≙ consistency counters) ---------------------------
        obs = None
        if self.collect_metrics:
            from pyspark.sql import Observation

            obs = Observation()
            batch_events = batch_events.observe(
                obs,
                F.sum(F.when(~self._valid(batch_events), 1).otherwise(0)).alias("n_rejected"),
                F.count(F.lit(1)).alias("n_batch"),
            )
        if self.dlq_path is not None:
            # persist the rejected rows themselves, not just the count —
            # repairable upstream and auditable (skip-and-save semantics)
            import os as _os

            batch_events.filter(~self._valid(batch_events)).write.mode("overwrite").parquet(
                _os.path.join(self.dlq_path, f"epoch-{epoch_id:08d}")
            )
        valid = batch_events.filter(self._valid(batch_events))

        # --- last-writer (or policy fold) per key, then merge -------------
        pol = {
            c: p for c, p in (m.policies or {}).items() if c in valid.columns
        }
        if pol:
            # at-least-once redelivery guard for policy tables: rows at
            # or below the COMMITTED watermark are replays of already-
            # accumulated events — the last-writer path absorbs them
            # idempotently, but an 'add' fold would double-count. The
            # manifest is re-read so a reorg rollback above lowered the
            # bound before replayed events stream back in.
            cw = self.table.manifest().watermark
            valid = valid.filter(
                F.struct(F.col("lsn"), F.col("seq"))
                > F.struct(
                    F.lit(cw["lsn"]).cast("long"), F.lit(cw["seq"]).cast("int")
                )
            )
            ups = dedup_policy_fold(valid, pol)
        elif (
            self.mode == "mor"
            and pre["n_events"] is not None
            and pre["n_events"] <= _SEMI_DEDUP_MAX_EVENTS
        ):
            # scale-adaptive: small-enough batches dedup via the
            # narrow-shuffle + broadcast-winners two-pass (payload
            # bytes never enter an exchange); unbounded batches keep
            # the aggregate, whose memory is per-partition-bounded.
            # MOR only: an exact duplicate (doc_id, stream_pos)
            # delivery survives the pair join as two value-identical
            # rows — the delta resolver collapses them at read, but a
            # COW merge would write both, so COW keeps the aggregate.
            ups = dedup_last_writer_semi(valid)
        else:
            ups = dedup_last_writer(valid)
        new_wm = {"lsn": pre["ls"]["lsn"], "seq": pre["ls"]["seq"], "pos": pre["pos"]}
        # optimistic-concurrency retry: a concurrent writer winning our
        # version is NOT an error for the epoch — re-check the ledger
        # (the competitor may have applied this very epoch: redelivery
        # through two workers), then re-derive against the fresh state.
        # Each attempt recomputes from the current manifest, so the
        # retried merge sees the competitor's rows; conflicted data
        # files are orphans, reclaimed by GC.
        for attempt in range(3):
            try:
                if self.mode == "mor":
                    metrics = self._append(
                        ups, epoch_id=epoch_id, watermark=new_wm,
                        extra_epochs=prior_epochs, lineage_extra=lineage_extra,
                    )
                else:
                    metrics = self._merge(
                        ups, epoch_id=epoch_id, watermark=new_wm,
                        extra_epochs=prior_epochs, lineage_extra=lineage_extra,
                    )
                break
            except CommitConflictError:
                m2 = self.table.manifest()
                if epoch_id in m2.applied_epochs:
                    return None  # the competitor applied it — exactly-once
                if attempt == 2:
                    raise
                prior_epochs = list(m2.applied_epochs)
        metrics["lsn_min"] = pre["lsn_min"]
        metrics["lsn_max"] = new_wm["lsn"]
        metrics["n_events"] = pre["n_events"]
        metrics["n_reorg"] = n_reorg
        if obs is not None:
            from blockchain_etl_spark.observe import observed_get

            got = observed_get(obs)
            if got is None:
                # every row was filtered before the first action — the
                # observed subtree collapsed to an empty relation and
                # the metrics row never materialized (see observe.py).
                # Recount directly; only degenerate epochs reach this.
                metrics["n_rejected"] = batch_events.filter(
                    ~self._valid(batch_events)
                ).count()
            else:
                metrics["n_rejected"] = got["n_rejected"] or 0
        metrics["merge_ms"] = int((time.monotonic() - t0) * 1000)
        self._log_metrics(metrics)
        return metrics

    def backfill_epoch(
        self,
        events_df: DataFrame,
        epoch_id: int,
        lineage_extra: dict[str, Any] | None = None,
    ) -> dict[str, Any] | None:
        """Bulk load of FINALIZED history below the committed watermark
        — the gap-fill path (history that predates the stream cursor,
        or a range the retention GC already pruned from the change log;
        ≙ the reference re-running an export over an old block range
        into a live table, where the Postgres upsert just takes it).

        Rides ``apply_epoch`` unchanged, because the engine's ordinary
        semantics already make it safe for last-writer tables: per-key
        (lsn, seq) dominance means an old row for a present key loses
        as stale and an absent key inserts; the committed watermark
        never regresses (monotone clamp), so the redelivery guard and
        reorg-depth reasoning of the LIVE stream are untouched. What
        this method adds is the CONTRACT:

        - refused for policy tables — there, a row at or below the
          watermark is indistinguishable from an at-least-once replay,
          and folding it would double-count (apply_epoch silently drops
          such rows; a backfill that silently does nothing is worse
          than an error);
        - refused if the batch carries reorg markers — backfill is for
          finalized history; rollbacks belong to the live stream.

        Visibility: version-domain consumers (``read_changes``, cascade
        hops, MVs) SEE the backfill as an ordinary commit diff;
        WAL-position deltas (``read_since_lsn``) correctly do NOT —
        the rows' lsns are historical, below the requested floor."""
        m = self.table.manifest()
        if m.policies:
            raise ValueError(
                f"backfill into policy table {self.table.path} is unsafe: "
                "rows at/below the watermark are indistinguishable from "
                "redelivery and would double-count the folds — load into "
                "a last-writer staging table and re-derive instead"
            )
        if "op" in events_df.columns and events_df.filter(
            F.col("op") == "R"
        ).limit(1).count():
            raise ValueError(
                "backfill batches must not carry reorg markers (op='R') — "
                "backfill is for finalized history"
            )
        return self.apply_epoch(
            events_df, epoch_id, lineage_extra={
                **(lineage_extra or {}), "backfill": True,
            },
        )

    # ------------------------------------------------------------- lineage
    def _metrics_path(self) -> str:
        import os

        return os.path.join(self.table.path, "metrics.jsonl")

    def _log_metrics(self, metrics: dict[str, Any]) -> None:
        """Per-epoch lineage row (FIXTURES.md §3 lineage_metrics; ≙ the
        reference's PERF logs + done/fail dirs)."""
        import json

        with open(self._metrics_path(), "a") as f:
            f.write(json.dumps(metrics, default=str) + "\n")

    def read_metrics(self) -> DataFrame:
        import os

        if not os.path.exists(self._metrics_path()):
            raise FileNotFoundError(self._metrics_path())
        return self.spark.read.json(self._metrics_path())

    # ----------------------------------------------------- schema evolution
    def _conform_source(self, ups: DataFrame):
        """Merge incoming payload columns into the target schema and
        conform the source side; returns (ups, merged_schema,
        payload_cols, ptypes)."""
        import pyspark.sql.types as T

        m = self.table.manifest()
        incoming_payload = T.StructType(
            [
                f
                for f in ups.schema.fields
                if f.name not in ("doc_id", "op", "lsn", "seq", "stream_pos", "_b")
            ]
        )
        merged_schema, _ = merge_schemas(m.schema(), incoming_payload)
        payload_cols = [f.name for f in merged_schema.fields if f.name not in _TARGET_META]
        ptypes = {f.name: f.dataType for f in merged_schema.fields}
        ups = ups.select(
            *[c for c in ("doc_id", "op", "lsn", "seq", "stream_pos", "_b") if c in ups.columns],
            *[
                (
                    F.col(c).cast(ptypes[c])
                    if c in ups.columns
                    else F.lit(None).cast(ptypes[c])
                ).alias(c)
                for c in payload_cols
            ],
        )
        return ups, merged_schema, payload_cols, ptypes

    # --------------------------------------------------- merge-on-read path
    def _append(
        self,
        ups: DataFrame,
        *,
        epoch_id: int,
        watermark: dict[str, int],
        extra_epochs: list[int] | None = None,
        lineage_extra: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        from pyspark.sql import Observation

        ups, merged_schema, payload_cols, _ = self._conform_source(ups)
        rows = ups.select(
            "doc_id",
            *payload_cols,
            "lsn",
            "seq",
            F.lit(epoch_id).alias("updated_epoch"),
            (F.col("op") == "D").alias("deleted"),
        )
        obs = None
        if self.collect_metrics:
            obs = Observation()
            rows = rows.observe(
                obs,
                F.sum(F.when(~F.col("deleted"), 1).otherwise(0)).alias("n_upserts"),
                F.sum(F.when(F.col("deleted"), 1).otherwise(0)).alias("n_deletes"),
            )
        metrics: dict[str, Any] = {"epoch_id": epoch_id, "mode": "mor",
                                   **(lineage_extra or {})}
        self.table.append_deltas(
            rows,
            watermark=watermark,
            epoch_id=epoch_id,
            extra_epochs=extra_epochs,
            lineage=metrics,
            new_schema=merged_schema,
        )
        if obs is not None:
            from blockchain_etl_spark.observe import observed_get

            got = observed_get(obs)
            if got is None:
                # empty upsert set: the write's plan collapsed before
                # the observe node ran (see observe.py) — zero splits.
                got = {"n_upserts": 0, "n_deletes": 0}
            metrics["n_insert"] = got["n_upserts"] or 0  # split resolved at read
            metrics["n_update"] = 0
            metrics["n_delete"] = got["n_deletes"] or 0
            metrics["n_stale"] = 0
        dcounts = self.table.delta_file_counts()
        metrics["n_buckets_touched"] = len(dcounts)
        # per-BUCKET compaction policy: only buckets whose delta count
        # crossed the threshold are folded. Compacting every
        # delta-bearing bucket whenever one hot bucket crosses (the old
        # policy) rewrites cold buckets' base files over and over — under
        # hot-key skew that is write amplification proportional to table
        # size, not to the hot set. Read amplification stays bounded:
        # no bucket is ever read through more than threshold delta files.
        over = sorted(
            b for b, c in dcounts.items() if c >= self.compact_delta_threshold
        )
        if over:
            try:
                self.table.compact(buckets=over, cluster=self.compact_cluster)
                metrics["compacted"] = True
                metrics["compacted_buckets"] = over
            except CommitConflictError:
                # the EPOCH commit above already succeeded — a concurrent
                # writer merely won the next version. Letting this
                # propagate to the epoch retry loop would misread our own
                # ledger entry as "competitor applied it" and return None
                # despite a successful apply. Compaction is advisory:
                # defer to a later epoch.
                metrics["compaction_deferred"] = True
        return metrics

    # ------------------------------------------------- copy-on-write merge
    def _merge(
        self,
        ups: DataFrame,
        *,
        epoch_id: int,
        watermark: dict[str, int],
        extra_epochs: list[int] | None = None,
        lineage_extra: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        m = self.table.manifest()
        nb = m.n_buckets
        ups = ups.withColumn("_b", bucket_expr(m.bucket_col(), nb))
        ups, merged_schema, payload_cols, ptypes = self._conform_source(ups)
        new_wm = watermark

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
        pol = {c: p for c, p in (m.policies or {}).items() if c in payload_cols}

        def _pay(c):
            # column merge policies (≙ postgres_hooks): add accumulates,
            # first keeps the earliest non-null, last takes the newest
            # non-null. A tombstone CARRIES policy columns (lifetime
            # totals survive delete→reinsert — same contract as the MOR
            # fold); plain columns keep last-writer-row semantics.
            p = pol.get(c)
            s_, t_ = F.col(f"s.{c}"), F.col(f"t.{c}")
            if p is None:
                if c == m.bucket_key or c == m.cluster_by:
                    # the routing columns must survive deletes: a
                    # tombstone without its bucket_key would land in the
                    # null bucket away from its key's live rows; one
                    # without its cluster value would land outside its
                    # key's chunk and be pruned away by cluster_range
                    return F.when(takes_s, F.coalesce(s_, t_)).otherwise(t_).alias(c)
                return (
                    F.when(tag.isin("insert", "update"), s_)
                    .when(tag.isin("delete", "tombstone"), F.lit(None).cast(ptypes[c]))
                    .otherwise(t_)
                    .alias(c)
                )
            from blockchain_etl_spark.functions.hist import (
                hist_bins,
                hist_merge_pair,
            )
            from blockchain_etl_spark.functions.sketch import kmv_k, kmv_merge_pair

            if (k := kmv_k(p)) is not None:
                e = kmv_merge_pair(t_, s_, k)
            elif hist_bins(p) is not None:
                e = hist_merge_pair(t_, s_)
            elif p == "add":
                zero = F.lit(0).cast(ptypes[c])
                e = (F.coalesce(t_, zero) + F.coalesce(s_, zero)).cast(ptypes[c])
            elif p == "min":
                e = F.least(t_, s_)  # least/greatest skip nulls
            elif p == "max":
                e = F.greatest(t_, s_)
            elif p == "first":
                e = F.coalesce(t_, s_)
            else:  # last non-null
                e = F.coalesce(s_, t_)
            return F.when(takes_s, e).otherwise(t_).alias(c)

        tagged = j.select(
            F.coalesce(F.col("s.doc_id"), F.col("t.doc_id")).alias("doc_id"),
            tag.alias("_tag"),
            *[_pay(c) for c in payload_cols],
            F.when(takes_s, F.col("s.lsn")).otherwise(F.col("t.lsn")).alias("lsn"),
            F.when(takes_s, F.col("s.seq")).otherwise(F.col("t.seq")).alias("seq"),
            F.when(takes_s, F.lit(epoch_id))
            .otherwise(F.col("t.updated_epoch"))
            .alias("updated_epoch"),
            F.when(takes_s, F.col("s.op") == "D")
            .otherwise(F.col("t.deleted"))
            .alias("deleted"),
        )
        counts: dict[str, int] = {}
        if self.collect_metrics:
            # persist only when the counts collect makes this frame
            # multi-consumer — with metrics off the write is the sole
            # action and a persist would copy every merged row into the
            # block manager for nothing
            tagged = tagged.persist()
            counts = {
                r["_tag"]: r["n"]
                for r in tagged.groupBy("_tag").agg(F.count("*").alias("n")).collect()
            }
        result = tagged.drop("_tag")
        if m.zset_col is not None:
            # Z-set GC at the COW rewrite (same rule as compact()): a
            # non-tombstone group whose folded multiplicity is <= 0 is
            # logically dead — dropping it here is dead↔absent to the
            # change protocol, so the commit's logical diff is unchanged.
            result = result.filter(
                F.coalesce(F.col("deleted"), F.lit(False))
                | (F.coalesce(F.col(m.zset_col), F.lit(0)) > 0)
            )

        metrics = {
            "epoch_id": epoch_id,
            "mode": "cow",
            **(lineage_extra or {}),
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
        if self.collect_metrics:
            tagged.unpersist()
        return metrics


def merge_into(
    engine: "CdcEngine",
    source: DataFrame,
    *,
    delete_where=None,
    epoch_id: int | None = None,
    if_absent: bool = False,
) -> dict[str, Any] | None:
    """Delta-style batch ``MERGE INTO`` facade over the CDC apply path
    (the spark.sql equivalent of ``MERGE INTO t USING s ON t.k = s.k
    WHEN MATCHED [AND cond] THEN DELETE WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *``; ≙ the reference's one-shot
    Postgres upsert batches, postgres_item_exporter.py:16-169, without
    hand-written change events).

    Each source row becomes one synthetic change event AT the table's
    committed watermark LSN with a seq bump — (wm.lsn, wm.seq + 1) —
    NOT at wm.lsn + 1: a merge must never consume a future WAL
    position, or a dense-LSN tailer's next epoch (which IS wm.lsn + 1)
    would be dropped as stale by the redelivery guard. Riding the
    current lsn keeps the merge strictly newer than all committed state
    (seq decides) while leaving every future stream position untouched;
    on a fresh table the merge lands at (-1, 0) — "pre-stream seed"
    rows that any later WAL (lsn >= 0) supersedes normally. Rows
    matching ``delete_where`` (a boolean Column over the source) become
    deletes, everything else upserts — insert-vs-update splits
    naturally inside the engine (an upsert on an absent key inserts).
    Running through ``apply_epoch`` keeps every engine guarantee:
    exactly-once via the epoch ledger (a redelivered merge with the
    same ``epoch_id`` is a no-op), OCC against concurrent writers,
    column merge policies, and schema evolution — a source column the
    table lacks evolves the schema, existing rows null-backfilled.

    Default ``epoch_id``s live in a high band (``MERGE_EPOCH_BASE``)
    disjoint from tailer-assigned ids, so a merge can never mark a
    future landing epoch as already-applied; pass an explicit id to
    control idempotency across redeliveries of the same merge job.

    Like Delta, a source with duplicate keys is rejected (two rows
    merging into the same target row is order-undefined); the check is
    one cheap ``limit(1)`` aggregation. Scale: the merge itself is the
    engine's COW/MOR path — bucket-pruned full-outer join or blind
    delta append, never a driver-side loop.

    ``if_absent=True`` is ``WHEN NOT MATCHED THEN INSERT`` alone — the
    seed-from-a-state-dump path (≙ bootstrapping a reference table from
    an export without clobbering rows the live stream already wrote):
    source keys already present are dropped by a left-anti join against
    CURRENT state before the merge, so existing values — including
    policy folds — are untouched and only genuinely absent keys insert.
    Expressed as a pre-filter rather than a low (lsn, seq) because two
    successive if-absent merges must ALSO not overwrite each other, and
    equal synthetic positions would tie-break by commit recency."""
    m = engine.table.manifest()
    if if_absent:
        if delete_where is not None:
            raise ValueError(
                "if_absent inserts absent keys only — delete_where "
                "cannot apply (no matched rows are touched)"
            )
        if m.key not in source.columns:
            raise ValueError(
                f"merge_into source lacks the table key column {m.key!r}"
            )
        existing = read_state(engine.table, columns=[]).select(m.key)
        source = source.join(existing, m.key, "left_anti")
    key = m.key
    if key not in source.columns:
        raise ValueError(f"merge_into source lacks the table key column {key!r}")
    dup = (
        source.groupBy(key)
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"merge_into source has multiple rows for key {dup[0][key]!r}; "
            "MERGE requires at most one source row per target key"
        )
    wm = m.watermark
    if epoch_id is None:
        band = [e for e in m.applied_epochs if e >= MERGE_EPOCH_BASE]
        epoch_id = (max(band) + 1) if band else MERGE_EPOCH_BASE
    lsn = int(wm["lsn"])
    # the merge consumes NO stream position either — pos rides the
    # committed watermark unchanged (replay-slice bounds stay valid)
    pos = int(wm["pos"])
    op = (
        F.when(delete_where, F.lit("D")).otherwise(F.lit("U"))
        if delete_where is not None
        else F.lit("U")
    )
    tgt = m.schema()
    src_cols = set(source.columns)
    payload = []
    for fld in tgt.fields:
        if fld.name in (key, "lsn", "seq", "updated_epoch", "deleted"):
            continue
        payload.append(
            (F.col(fld.name) if fld.name in src_cols else F.lit(None)).cast(
                fld.dataType
            ).alias(fld.name)
        )
    # source-only columns ride along untouched → engine schema evolution
    extra = [
        c
        for c in source.columns
        if c not in {f.name for f in tgt.fields}
        and c not in _EVENT_META
        and c not in ("updated_epoch", "deleted")
    ]
    ev = source.select(
        F.lit(pos).cast("long").alias("stream_pos"),
        F.lit(lsn).cast("long").alias("lsn"),
        F.lit(int(wm["seq"]) + 1).cast("int").alias("seq"),
        op.alias("op"),
        F.col(key),
        *payload,
        *[F.col(c) for c in extra],
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.lit(f"merge-{epoch_id}").alias("epoch_hash"),
    )
    return engine.apply_epoch(ev, epoch_id=epoch_id, use_store_stats=False)
