"""Multi-entity pipeline: one upstream CDC table fans out into N derived
entity tables through cascade hops wired by a dependency DAG.

≙ the reference's streamer maintaining ~15 entity tables off one block
stream with dependency-driven pruning (`eth_streamer_adapter.py:354-403`
``_should_export`` — an entity is exported iff requested or needed by a
requested descendant — over the `entity_type.py:6-31` catalog). Here the
DAG nodes are engine tables and the edges are :class:`CascadeTailer`
hops, so every derived entity inherits the full CDC contract: exactly-
once through the destination ledger, crash-safe cursors riding the
destination commit, reorg convergence via upstream-version sequencing.

Three derivation shapes cover the reference's entity kinds:

- **projection** (block→transaction shape): per-row rewrite of the
  change events; op passes through.
- **filtered replica** (log→token_transfer shape): rows failing the
  predicate become DELETES downstream — an update that moves a row out
  of the filter must erase it from the derived table, exactly like a
  log that stops being a Transfer on reorg. Blind tombstones for
  never-present keys are safe: the engine's delete-of-absent-key is a
  tombstone row, and the monotonic guard keeps replays out.
- **incremental grouped aggregate** (token_transfer→token_holder
  shape): recompute ONLY the groups touched by the change range —
  affected keys come from the change rows (delete rows carry
  pre-images, so a group losing its last row is still seen), the
  recompute reads the upstream snapshot semi-joined to those groups,
  and groups with no surviving rows emit deletes. Work per hop is
  O(changes + state of touched groups), never O(table).

Scale: each hop is the same bucket-pruned incremental path as first-
stage ingest; the DAG prunes whole entity branches before any Spark
plan exists (nothing is scheduled for an entity outside the requested
closure), and Catalyst prunes columns within a hop (a derived entity
that never references ``tokens`` never reads that column — asserted in
tests via the optimized plan).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.streaming.cascade import (
    _SEQ_BITS,
    CascadeTailer,
    changes_to_events,
)
from blockchain_etl_spark.tables.snapshot import SnapshotTable

ROOT = "docs"  # the upstream table itself; not derived


def target_schema(payload: list[T.StructField]) -> T.StructType:
    """Engine target schema for a derived entity: natural key (stored as
    ``doc_id``, the engine's fixed key column) + payload + the engine's
    bookkeeping columns."""
    return T.StructType(
        [T.StructField("doc_id", T.StringType(), False)]
        + payload
        + [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("seq", T.IntegerType(), False),
            T.StructField("updated_epoch", T.LongType(), True),
            T.StructField("deleted", T.BooleanType(), False),
        ]
    )


# --------------------------------------------------------------- transforms
LONG_DOC_MIN_TOK = 40


def doc_stats_events(
    changes: DataFrame, src: SnapshotTable, v0: int, v1: int
) -> DataFrame:
    """Projection: (doc_id) → (n_tok, tok_fp, source). The token array
    itself is reduced to a 64-bit fingerprint — the derived table never
    stores the heavy column."""
    ev = changes_to_events(changes)
    payload = F.col("op") != "D"
    return ev.select(
        "stream_pos", "lsn", "seq", "op", "doc_id",
        F.when(payload, F.col("n_tok")).alias("n_tok"),
        F.when(payload, F.xxhash64(F.col("tokens"))).alias("tok_fp"),
        F.when(payload, F.col("source")).alias("source"),
        "rollback_to_lsn", "epoch_hash",
    )


def long_docs_events(
    changes: DataFrame, src: SnapshotTable, v0: int, v1: int
) -> DataFrame:
    """Filtered replica: documents with n_tok >= LONG_DOC_MIN_TOK. An
    upsert failing the predicate becomes a DELETE (the row may have
    passed it before); real deletes pass through."""
    ev = changes_to_events(changes)
    keep = F.col("n_tok") >= LONG_DOC_MIN_TOK
    op = F.when((F.col("op") != "D") & keep, F.col("op")).otherwise(F.lit("D"))
    payload = op != "D"
    return ev.select(
        "stream_pos", "lsn", "seq", op.alias("op"), "doc_id",
        F.when(payload, F.col("tokens")).alias("tokens"),
        F.when(payload, F.col("n_tok")).alias("n_tok"),
        F.when(payload, F.col("source")).alias("source"),
        "rollback_to_lsn", "epoch_hash",
    )


def source_stats_events(
    changes: DataFrame, src: SnapshotTable, v0: int, v1: int
) -> DataFrame:
    """Incremental grouped aggregate over doc_stats: per-source document
    and token counts, recomputed only for sources the change range
    touched. Affected sources are read from the change rows themselves —
    pre-image and delete rows carry the old payload, so a source losing
    its last document is still recomputed (and emitted as a delete)."""
    affected = (
        changes.select(F.col("source").alias("src_key"))
        .filter(F.col("src_key").isNotNull())
        .distinct()
    )
    # payload projection BELOW the MOR resolver: the stats aggregation
    # needs (source, n_tok) only — tok_fp never leaves the parquet footer
    live = read_state(src, version=v1, columns=["n_tok", "source"])
    agg = (
        live.join(affected, live["source"] == affected["src_key"], "left_semi")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
    )
    gone = affected.join(
        agg, affected["src_key"] == agg["source"], "left_anti"
    ).select(F.col("src_key").alias("source"))
    ups = agg.select(
        F.col("source").alias("doc_id"),
        F.lit("U").alias("op"),
        "n_docs",
        "total_tokens",
    )
    dels = gone.select(
        F.col("source").alias("doc_id"),
        F.lit("D").alias("op"),
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("total_tokens"),
    )
    lsn = F.lit(v1).cast("long")
    return ups.unionByName(dels).select(
        F.shiftleft(lsn, _SEQ_BITS).cast("long").alias("stream_pos"),
        lsn.alias("lsn"),
        F.lit(0).alias("seq"),
        "op",
        "doc_id",
        "n_docs",
        "total_tokens",
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.lit(f"cascade-v{v0}-{v1}").alias("epoch_hash"),
    )


CHUNK_WIDTH = 8


def _chunk_rows(state: DataFrame) -> DataFrame:
    """(doc_id, tokens) → one row per fixed-width chunk, keyed
    ``{doc_id}#{chunk_id:04d}`` (the engine's key column is single —
    compose parent+ordinal into it, reference item_id style)."""
    from blockchain_etl_spark.operators.tokens import chunk_tokens

    c = chunk_tokens(state.select("doc_id", "tokens"), chunk=CHUNK_WIDTH)
    return c.select(
        F.concat_ws(
            "#", F.col("doc_id"), F.lpad(F.col("chunk_id").cast("string"), 4, "0")
        ).alias("key"),
        F.col("doc_id").alias("parent_id"),
        "chunk_id",
        "chunk_tokens",
        "n_chunk_tok",
    )


def _one_to_n_events(
    changes: DataFrame,
    src: SnapshotTable,
    v0: int,
    v1: int,
    rows_fn: Callable[[DataFrame], DataFrame],
    payload: list[tuple[str, str]],
    src_columns: list[str],
) -> DataFrame:
    """Shared scaffold for the 1:N explode shape with parent-scoped
    reconciliation: ``rows_fn`` maps an upstream state slice
    (doc_id + ``src_columns``) to derived rows (key, parent_id,
    *payload); each upstream row fans into a variable number of derived
    rows, and an UPDATE can shrink the fan-out, so the hop must emit
    deletes for derived keys that no longer exist.

    Self-contained via time travel, no destination read: old keys come
    from the v0 snapshot of the affected parents, new rows from the v1
    snapshot — deletes = old \\ new keys, upserts = all new (value
    changes ride the upsert; unchanged rows are re-upserted
    idempotently, bounded by the affected parents' fan-out). Work is
    O(changed parents × fan-out/parent), never O(table)."""
    affected = (
        changes.select(F.col("doc_id").alias("pid"))
        .filter(F.col("pid").isNotNull())
        .distinct()
    )

    def rows_at(version):
        st = read_state(src, version=version, columns=src_columns)
        return rows_fn(st.join(affected, st["doc_id"] == affected["pid"], "left_semi"))

    names = [n for n, _ in payload]
    new = rows_at(v1)
    old_keys = rows_at(v0).select("key")
    gone = old_keys.join(new.select("key"), "key", "left_anti")
    ups = new.select(
        F.col("key").alias("doc_id"), F.lit("U").alias("op"), "parent_id", *names
    )
    dels = gone.select(
        F.col("key").alias("doc_id"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("parent_id"),
        *[F.lit(None).cast(t).alias(n) for n, t in payload],
    )
    lsn = F.lit(v1).cast("long")
    return ups.unionByName(dels).select(
        F.shiftleft(lsn, _SEQ_BITS).cast("long").alias("stream_pos"),
        lsn.alias("lsn"),
        F.lit(0).alias("seq"),
        "op",
        "doc_id",
        "parent_id",
        *names,
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.lit(f"cascade-v{v0}-{v1}").alias("epoch_hash"),
    )


def doc_chunks_events(
    changes: DataFrame, src: SnapshotTable, v0: int, v1: int
) -> DataFrame:
    """1:N explode with parent-scoped reconciliation — the fourth
    derivation shape (block→transactions / doc→context-window-chunks);
    see :func:`_one_to_n_events` for the reconciliation contract."""
    return _one_to_n_events(
        changes, src, v0, v1, _chunk_rows,
        payload=[
            ("chunk_id", "int"),
            ("chunk_tokens", "array<int>"),
            ("n_chunk_tok", "int"),
        ],
        src_columns=["tokens"],
    )


MH_NUM_HASHES = 8
MH_BANDS = 4


def _band_rows(state: DataFrame) -> DataFrame:
    """(doc_id, tokens) → one row per LSH band, keyed
    ``{doc_id}#b{band}`` — the corpus near-dup index maintained NEXT TO
    the corpus itself (probe side: operators/dedup.py
    lsh_index_probe). Shingles are the token ids themselves (k=1 over
    the token set); minhash/banding is the same single-base-hash plan
    as the batch operator, so index rows equal a batch recompute."""
    from blockchain_etl_spark.operators.dedup import minhash_banded

    b = minhash_banded(
        state.select(
            "doc_id",
            F.transform("tokens", lambda t: t.cast("string")).alias("shingles"),
        ),
        MH_NUM_HASHES,
        MH_BANDS,
    )
    return b.select(
        F.concat(F.col("doc_id"), F.lit("#b"), F.col("band")).alias("key"),
        F.col("doc_id").alias("parent_id"),
        "band",
        "bucket",
    )


def band_index_events(
    changes: DataFrame, src: SnapshotTable, v0: int, v1: int
) -> DataFrame:
    """Incremental LSH band index (doc → MH_BANDS rows): doc updates
    re-derive that doc's band rows only (bucket changes ride the
    upsert), deletes drop them — the ingest-time dedup index stays
    consistent with the corpus under the full CDC contract without any
    batch rebuild."""
    return _one_to_n_events(
        changes, src, v0, v1, _band_rows,
        payload=[("band", "int"), ("bucket", "string")],
        src_columns=["tokens"],
    )


def doc_history_events(
    changes: DataFrame, src: SnapshotTable, v0: int, v1: int
) -> DataFrame:
    """Append-only audit entity — the reference's history/latest table
    split (``entity_type.py``: HISTORY_BALANCE next to LATEST_BALANCE,
    one row per balance-affecting sync keyed (address, blknum)): every
    net change in the hop range becomes its own immutable row keyed
    ``{doc_id}@v{range_end:08d}``, never updated, never deleted.

    Granularity is the hop range (run the tailer per upstream commit for
    per-commit history — pacing IS the granularity dial). Reorgs need no
    special case: the upstream version history is monotonic (rollbacks
    are roll-forward commits), so corrective net diffs append under new
    version keys and the observed-transition log stays faithful.
    Redelivery is idempotent twice over: the ledger dedupes the epoch,
    and a replayed row carries the identical (key, lsn) so the guard
    drops it as stale."""
    ev = changes.filter(F.col("_change_type") != "update_preimage")
    payload = F.col("_change_type") != "delete"
    lsn = F.col("_to_version").cast("long")
    return ev.select(
        F.shiftleft(lsn, _SEQ_BITS).cast("long").alias("stream_pos"),
        lsn.alias("lsn"),
        F.lit(0).alias("seq"),
        F.lit("U").alias("op"),  # append-only: every history row upserts
        F.concat(
            F.col("doc_id"),
            F.lit("@v"),
            F.lpad(F.col("_to_version").cast("string"), 8, "0"),
        ).alias("doc_id"),
        F.col("doc_id").alias("entity_id"),
        F.col("_change_type").alias("change_type"),
        F.when(payload, F.col("n_tok")).alias("n_tok"),
        F.when(payload, F.col("source")).alias("entity_source"),
        F.col("_to_version").cast("int").alias("observed_version"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.lit(f"cascade-v{v0}-{v1}").alias("epoch_hash"),
    )


# ----------------------------------------------------------------- registry
@dataclass(frozen=True)
class EntityDef:
    name: str
    upstream: str  # parent entity (ROOT = the pipeline's source table)
    transform: Callable[[DataFrame, SnapshotTable, int, int], DataFrame] | None
    schema: T.StructType


REGISTRY: dict[str, EntityDef] = {
    e.name: e
    for e in [
        EntityDef(
            "doc_stats",
            ROOT,
            doc_stats_events,
            target_schema(
                [
                    T.StructField("n_tok", T.IntegerType(), True),
                    T.StructField("tok_fp", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
        ),
        EntityDef(
            "long_docs",
            ROOT,
            long_docs_events,
            target_schema(
                [
                    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
                    T.StructField("n_tok", T.IntegerType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
        ),
        EntityDef(
            "source_stats",
            "doc_stats",
            source_stats_events,
            target_schema(
                [
                    T.StructField("n_docs", T.LongType(), True),
                    T.StructField("total_tokens", T.LongType(), True),
                ]
            ),
        ),
        EntityDef(
            "doc_history",
            ROOT,
            doc_history_events,
            target_schema(
                [
                    T.StructField("entity_id", T.StringType(), True),
                    T.StructField("change_type", T.StringType(), True),
                    T.StructField("n_tok", T.IntegerType(), True),
                    T.StructField("entity_source", T.StringType(), True),
                    T.StructField("observed_version", T.IntegerType(), True),
                ]
            ),
        ),
        EntityDef(
            "band_index",
            ROOT,
            band_index_events,
            target_schema(
                [
                    T.StructField("parent_id", T.StringType(), True),
                    T.StructField("band", T.IntegerType(), True),
                    T.StructField("bucket", T.StringType(), True),
                ]
            ),
        ),
        EntityDef(
            "doc_chunks",
            ROOT,
            doc_chunks_events,
            target_schema(
                [
                    T.StructField("parent_id", T.StringType(), True),
                    T.StructField("chunk_id", T.IntegerType(), True),
                    T.StructField("chunk_tokens", T.ArrayType(T.IntegerType()), True),
                    T.StructField("n_chunk_tok", T.IntegerType(), True),
                ]
            ),
        ),
    ]
}


def required_entities(
    requested: list[str], registry: dict[str, EntityDef] | None = None
) -> list[str]:
    """Transitive upstream closure of the requested entities, in
    topological (upstream-first) order — the reference's
    ``_should_export`` rule: an entity is materialized iff requested or
    needed by a requested descendant; everything else is pruned before
    any plan is built."""
    registry = REGISTRY if registry is None else registry
    need: list[str] = []

    def visit(name: str) -> None:
        if name == ROOT or name in need:
            return
        if name not in registry:
            raise ValueError(f"unknown entity {name!r}")
        visit(registry[name].upstream)
        need.append(name)

    for r in requested:
        visit(r)
    return need


class EntityPipeline:
    """Fan one upstream CDC table into the requested entities' tables.

    Tables and hop cursors live under ``root_dir/<entity>``; only the
    requested closure is instantiated. ``run_once`` advances every hop
    upstream-first, so a depth-k chain converges in one call."""

    def __init__(
        self,
        spark,
        src_table: SnapshotTable,
        root_dir: str,
        entities: list[str],
        n_buckets: int = 8,
        registry: dict[str, EntityDef] | None = None,
    ):
        self.spark = spark
        self.registry = REGISTRY if registry is None else registry
        self.order = required_entities(entities, self.registry)
        self.tables: dict[str, SnapshotTable] = {ROOT: src_table}
        self.tailers: dict[str, CascadeTailer] = {}
        for name in self.order:
            d = self.registry[name]
            path = os.path.join(root_dir, name)
            t = (
                SnapshotTable(spark, path)
                if SnapshotTable(spark, path).exists()
                else SnapshotTable.create(
                    spark, path, d.schema, key="doc_id", n_buckets=n_buckets
                )
            )
            self.tables[name] = t
            self.tailers[name] = CascadeTailer(
                self.tables[d.upstream],
                CdcEngine(spark, t, collect_metrics=False),
                os.path.join(root_dir, name, "cascade-cursor.json"),
                transform=d.transform,
            )

    def run_once(self) -> dict[str, Any]:
        return {name: self.tailers[name].run_once() for name in self.order}

    def state(self, name: str) -> DataFrame:
        return read_state(self.tables[name])

    # -------------------------------------------------- consistent snapshot
    def _hop_versions(self, name: str) -> dict[int, int]:
        """upstream-version → this entity's hop-commit version, read
        off the destination's manifest lineage (every cascade hop —
        including a zero-row one — stamps ``cascade_to_version`` into
        the atomic commit). Driver-side manifest walk, bounded by the
        table's retained version history (``gc`` keeps the newest N —
        older barriers age out of pinnability with their manifests)."""
        t = self.tables[name]
        out: dict[int, int] = {}
        for v in t.versions():
            got = t.manifest(v).lineage.get(CascadeTailer._CURSOR_KEY)
            if got is not None:
                out[int(got)] = v
        return out

    def consistent_barriers(self) -> dict[int, dict[str, int]]:
        """Source versions at which the WHOLE requested closure is
        mutually consistent, each mapped to its per-entity version
        vector ``{entity: pinned_version}``.

        A source version V is a barrier iff every entity has a hop
        commit whose upstream cursor equals its parent's pin —
        transitively down the tree (parent pin of a root child is V
        itself; of a derived child, the parent's own pinned version).
        A hop that batched several upstream commits skips the interior
        versions: they are real source states but no derived version
        corresponds to them, so they are correctly NOT barriers."""
        maps = {name: self._hop_versions(name) for name in self.order}
        candidates: set[int] = set()
        for name in self.order:
            if self.registry[name].upstream == ROOT:
                candidates |= set(maps[name])
        out: dict[int, dict[str, int]] = {}
        for v in sorted(candidates):
            vec: dict[str, int] = {}
            for name in self.order:
                up = self.registry[name].upstream
                parent_pin = v if up == ROOT else vec.get(up)
                pinned = None if parent_pin is None else maps[name].get(parent_pin)
                if pinned is None:
                    vec = {}
                    break
                vec[name] = pinned
            if vec:
                out[v] = vec
        return out

    def snapshot(
        self,
        at_src_version: int | None = None,
        barriers: dict[int, dict[str, int]] | None = None,
    ) -> dict[str, int]:
        """Pin a cross-entity consistent read: the newest barrier ≤
        ``at_src_version`` (default: the newest barrier at all). The
        returned vector includes the source pin under ``ROOT``; feed
        the entity versions to :meth:`state_at`. Raises if no barrier
        qualifies (e.g. the pipeline never ran, or the manifests aged
        out). Pass a precomputed ``barriers`` dict (one
        :meth:`consistent_barriers` call walks every retained manifest
        of every entity) when the caller already holds one."""
        if barriers is None:
            barriers = self.consistent_barriers()
        ok = [
            v
            for v in barriers
            if at_src_version is None or v <= at_src_version
        ]
        if not ok:
            raise LookupError(
                f"no consistent barrier at or below {at_src_version!r} "
                f"(known barriers: {sorted(barriers)})"
            )
        v = max(ok)
        return {ROOT: v, **barriers[v]}

    def state_at(self, name: str, pins: dict[str, int]) -> DataFrame:
        """Entity state at a snapshot vector from :meth:`snapshot` —
        the same logical read as :meth:`state`, version-pinned."""
        if name == ROOT:
            return read_state(self.tables[ROOT], version=pins[ROOT])
        return read_state(self.tables[name], version=pins[name])
