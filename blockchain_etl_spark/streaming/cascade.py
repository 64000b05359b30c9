"""Cascaded ingest: tail one engine table as the change-log SOURCE of
the next (≙ the reference's multi-stage pipelines where one job's
Postgres table feeds the next job's extract — here the hop is the
table's own commit history, no bus in between).

``SnapshotTable.read_changes`` emits Delta-CDF-style rows between two
versions; ``changes_to_events`` re-shapes them into EVENT_SCHEMA so any
``CdcEngine`` can apply them unchanged; ``CascadeTailer`` holds the
version cursor (a tiny JSON file next to the destination table) and
turns "poll upstream HEAD, apply the delta, advance" into one call.

Scale shape: each hop is incremental — the manifest file-diff prunes
the change scan to touched buckets, the apply is the same O(batch)
MOR/COW path as first-stage ingest, and the cursor file makes the hop
resumable. Exactly-once composes: the epoch id is the upstream
``(from_version, to_version)`` range, deduped by the destination's
commit ledger like any other epoch.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA

# stream_pos synthesized from (lsn, seq): same total order, collision-free
# while seq < 2^20 (an LSN carrying a million intra-position events is a
# corrupt stream long before this encoding is the problem).
_SEQ_BITS = 20


def changes_to_events(changes: DataFrame, sequence_by: str = "commit_version") -> DataFrame:
    """read_changes rows → EVENT_SCHEMA change-log (I/U/D).
    ``update_preimage`` rows are bookkeeping for diff consumers, not
    events — dropped.

    ``sequence_by`` picks the (lsn, seq) domain of the emitted events —
    i.e. what the DESTINATION's monotonic guard orders by:

    - ``"commit_version"`` (default): lsn = the upstream commit version.
      The version history is monotonic even across reorgs (rollbacks are
      roll-forward commits), so a replayed key whose corrected payload
      reuses an old WAL lsn still wins downstream — this is the
      Delta-CDF-replication sequencing rule, and the only one that is
      correct for an upstream that can reorg. The destination becomes a
      replica whose lsn column lives in the upstream-version domain.
    - ``"payload"``: preserve each row's own (lsn, seq); deletes are
      sequenced at the COMMIT watermark (``_commit_lsn``/``_commit_seq``,
      the tombstone's position — the pre-image lsn would lose to the very
      row it deletes). Keeps the original WAL positions downstream, but
      is only safe when the upstream range contains no reorg rollback.
    """
    op = (
        F.when(F.col("_change_type") == "insert", F.lit("I"))
        .when(F.col("_change_type") == "update_postimage", F.lit("U"))
        .when(F.col("_change_type") == "delete", F.lit("D"))
    )
    if sequence_by == "commit_version":
        lsn = F.col("_to_version").cast("long")
        seq = F.lit(0)  # net diff: one event per key per range
    elif sequence_by == "payload":
        lsn = F.when(
            F.col("_change_type") == "delete",
            F.coalesce(F.col("_commit_lsn"), F.col("lsn") + 1),
        ).otherwise(F.col("lsn"))
        seq = F.when(
            F.col("_change_type") == "delete",
            F.coalesce(F.col("_commit_seq"), F.lit(0)),
        ).otherwise(F.col("seq"))
    else:
        raise ValueError(f"sequence_by must be commit_version|payload, got {sequence_by!r}")
    payload = F.col("_change_type") != "delete"
    # payload = every change column that is not diff bookkeeping or an
    # engine-maintained target column — an UPSTREAM SCHEMA EVOLUTION
    # (new payload column) flows through the hop and evolves the
    # destination via the engine's open payload schema, instead of being
    # silently projected away.
    bookkeeping = {
        "_change_type", "_from_version", "_to_version",
        "_commit_lsn", "_commit_seq",
        "doc_id", "lsn", "seq", "updated_epoch", "deleted",
    }
    payload_cols = [c for c in changes.columns if c not in bookkeeping]
    ev = changes.filter(F.col("_change_type") != "update_preimage").select(
        (F.shiftleft(lsn, _SEQ_BITS) + seq).cast("long").alias("stream_pos"),
        lsn.cast("long").alias("lsn"),
        seq.cast("int").alias("seq"),
        op.alias("op"),
        "doc_id",
        *[F.when(payload, F.col(c)).alias(c) for c in payload_cols],
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(
            F.lit("cascade-v"),
            F.col("_from_version").cast("string"),
            F.lit("-"),
            F.col("_to_version").cast("string"),
        ).alias("epoch_hash"),
    )
    # EVENT_SCHEMA order first, evolved payload columns appended
    base = [f.name for f in EVENT_SCHEMA.fields]
    extra = [c for c in payload_cols if c not in base]
    return ev.select(base + extra)


class CascadeTailer:
    """Polls an upstream SnapshotTable's commit history and applies the
    new changes to a downstream CdcEngine, exactly-once per version
    range.

    The destination is a REPLICA owned by this cascade: its (lsn, seq)
    guard columns live in the upstream-version domain (see
    ``changes_to_events``), so interleaving direct WAL-domain ingest
    into the same table is unsupported — WAL lsns would always win the
    monotonic guard over version-domain lsns. Chain stages table→table
    instead (each stage owns its table, like the reference's one table
    per job).

    Crash safety: the hop's upstream range is stamped INTO the
    destination's commit lineage (same atomic manifest write as the
    data), and the cursor is recovered from there when the cursor file
    is missing, corrupt, or behind. A crash between apply and cursor
    write therefore cannot lose transitions: the retry resumes from the
    version the destination actually holds — a plain re-diff from the
    stale cursor would silently skip a key the crashed apply inserted
    and the upstream deleted meanwhile.
    """

    _CURSOR_KEY = "cascade_to_version"

    def __init__(self, src_table, dst_engine, cursor_path: str, transform=None):
        """``transform(changes_df, src_table, v0, v1) -> events_df`` maps
        the upstream change rows to the DESTINATION entity's change-log
        (derived entities: projections, filtered replicas, incremental
        grouped aggregates — see streaming/pipeline.py). None = identity
        replica via :func:`changes_to_events`."""
        self.src = src_table
        self.engine = dst_engine
        self.cursor_path = cursor_path
        self.transform = transform

    def _file_cursor(self) -> int:
        """Fast-path cursor, valid only if it provably belongs to the
        CURRENT incarnation of the destination table.

        A cursor file can be stale-HIGH (destination deleted and
        recreated, or the file belongs to a different table) — max()ing
        it against the ledger would then silently skip every upstream
        change until the upstream version passes the stale value. The
        file therefore records the destination's ``table_uid``; on
        mismatch — or when the identity can't be verified — it is
        discarded and the destination's own commit lineage (authoritative
        by construction: it rides the atomic data commit) wins."""
        try:
            with open(self.cursor_path) as f:
                got = json.load(f)
            cur = int(got["version"])
        except (FileNotFoundError, ValueError, KeyError, json.JSONDecodeError):
            # missing or torn cursor file → the ledger-derived cursor
            # below is authoritative
            return 0
        dst_uid = self.engine.table.table_uid() if self.engine.table.exists() else None
        if dst_uid is None or got.get("table_uid") != dst_uid:
            return 0
        return cur

    def _ledger_cursor(self, max_walk: int = 64) -> int:
        """Newest ``cascade_to_version`` stamped in the destination's
        manifest lineage (bounded backward walk)."""
        t = self.engine.table
        if not t.exists():
            return 0
        versions = t.versions()
        for v in reversed(versions[-max_walk:]):
            got = t.manifest(v).lineage.get(self._CURSOR_KEY)
            if got is not None:
                return int(got)
        return 0

    def _cursor(self) -> int:
        return max(self._file_cursor(), self._ledger_cursor())

    def _commit_cursor(self, version: int) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"version": version, "table_uid": self.engine.table.table_uid()}, f
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.cursor_path)

    def run_once(self) -> dict[str, Any] | None:
        """Apply upstream commits since the cursor; returns apply metrics
        (None when already caught up)."""
        v0 = self._cursor()
        v1 = self.src.current_version()
        if v1 <= v0:
            return None
        changes = self.src.read_changes(v0, v1)
        if self.transform is not None:
            ev = self.transform(changes, self.src, v0, v1)
        else:
            ev = changes_to_events(changes)
        # epoch id = hash of the upstream range: stable across redelivery
        # (exactly-once still holds) and collision-free against the small
        # sequential ids the ledger may already hold from this table's
        # pre-replica life
        import hashlib

        digest = hashlib.md5(f"cascade-{v0}-{v1}".encode()).digest()
        epoch_id = int.from_bytes(digest[:8], "big") >> 1  # positive int63
        # persist the hop's events (O(changed rows)): apply_epoch
        # otherwise executes the whole upstream version diff twice —
        # once for its watermark pre-scan, once for the delta write
        ev = ev.persist()
        try:
            metrics = self.engine.apply_epoch(
                ev,
                epoch_id=epoch_id,
                lineage_extra={self._CURSOR_KEY: v1, "cascade_from_version": v0},
            )
        finally:
            ev.unpersist()
        self._commit_cursor(v1)
        return metrics if metrics is not None else {"deduped_range": [v0, v1]}
