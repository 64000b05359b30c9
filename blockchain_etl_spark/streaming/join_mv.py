"""Incrementally-maintained equi-JOIN (a join materialized view over
TWO tables' change feeds) — the bilinear differential-dataflow rule:

    Δ(A ⋈ B) = ΔA ⋈ B@old  +  A@new ⋈ ΔB

where ΔA/ΔB are SIGNED change sets (+1 insert/update_postimage, -1
delete/update_preimage) and the state sides are snapshot reads pinned
at the right versions — ΔA against B BEFORE its delta, ΔB against A
AFTER its delta, which makes the cross terms cancel exactly (a fact
inserted and a dim updated in the same hop nets one (fact, new-dim)
tuple, zero (fact, old-dim)). The MV itself is a Z-set: a policy table
keyed by the hash of the ENTIRE output tuple, ``n_rows`` an ``add``
fold holding the tuple's multiplicity, payload columns ``first`` folds
(immutable per tuple hash). Retraction is ordinary arithmetic — a
payload change retracts the old tuple (count → 0, filtered on read)
and inserts the new one.

This is the capability the reference's enrichment consumers imply
(every token-transfer consumer re-joining its table against the token
dimension on each poll; ≙ eth_token_service lookups inside the
streaming loop) but incremental and exactly-once: a hop costs
O(changed rows ⋈ touched state), never a rescan of either input or of
the MV.

Scale:

- **ΔA ⋈ B@old** — the join column IS the dim table's key, so the dim
  read is bucket-pruned to the hash buckets of ΔA's join values (the
  same pruning the COW merge uses): O(ΔA + touched dim buckets).
- **A@new ⋈ ΔB** — dim deltas are small (dimensions churn slowly), so
  ΔB broadcasts and the fact scan is one shuffle-free broadcast-hash
  join over A's live state. Without an index this leg is O(A) — the
  cost of not having a lookup by join VALUE; with ``indexed=True`` the
  MV maintains a :class:`_SideIndex` — a Z-set replica of A hash-
  bucketed by the JOIN COLUMN (``Manifest.bucket_key``) — and the leg
  reads only the index buckets of ΔB's changed keys:
  O(ΔB + touched index buckets), never a fact-table scan.
- Both legs' outputs pre-fold by tuple hash (map-side combined) before
  one blind MOR delta append.

:class:`GeneralJoinMV` generalizes to the N:M case — an equi-join on
ARBITRARY columns of two tables (neither side's join column is its
key), both sides fed by change feeds. Both sides get a ``_SideIndex``;
the hop discipline that keeps the bilinear rule exact under crashes:

    catch idx_b up to b0   (B as the MV last saw it — B@old)
    catch idx_a up to a1   (A after this hop's delta — A@new)
    leg1 = ΔA(a0,a1) ⋈ idx_b          (pruned to ΔA's join values)
    leg2 = idx_a ⋈ ΔB(b0,b1)          (pruned to ΔB's join values)
    commit MV with cursors (a1,b1); then advance idx_b to b1

``idx_b`` is advanced only AFTER the MV commit (next hop's step 0
re-heals if that trailing advance crashed), so a retry never sees
B@new where the rule needs B@old — the cross terms keep cancelling
exactly. Index catch-ups are idempotent (epoch-ledger + own lineage
cursor), so every crash window replays to the same state.

:class:`LeftJoinMV` extends the fact⋈dim case to LEFT OUTER: the
result is inner(A,B) ∪ U where U (the null-extended side) is its own
Z-set maintained by differentiating U = A ⋈ (1 − m), m the dim's
liveness indicator:

    ΔU = ΔA ⋈ (1 − m@old)  −  A@new ⋈ Δm

leg1 anti-joins ΔA against the dim state AT the old cursor (time
travel — no trailing-advance discipline needed on a versioned table);
null-join-value ΔA rows skip the anti join (SQL: null never matches,
always unmatched). leg2 reads m's TRANSITIONS from the dim CDF (net
insert = value became matched → retract its unmatched tuples; net
delete = value became unmatched → insert them) and probes a fact-side
:class:`_SideIndex` PINNED at the index version that corresponds to
A@new (``version_at`` — exact even if the index has advanced past this
hop in a crash window).

:class:`FullOuterJoinMV` completes the family: inner(A,B) ∪ U_A ∪ U_B.
U_A (fact rows with no dim) is a :class:`LeftJoinMV`; U_B (dim rows no
live fact row joins to) is the symmetric differential with the roles
of the liveness indicator swapped — m_A(v) = "some live fact row has
join value v":

    ΔU_B = ΔB ⋈ (1 − m_A@old)  −  B@new ⋈ Δm_A

leg1 anti-joins ΔB against the DISTINCT live join values of the
fact-side index pinned at A@old. leg2 needs m_A's TRANSITIONS, which
the fact CDF does not expose directly (many fact rows share a value —
liveness flips only when the value's row count crosses zero): probe
the index at the pinned versions for BOTH cursor endpoints, pruned to
ΔA's values, and set-difference the two live-value sets. Values
sharing a pruned bucket but untouched by ΔA appear in both probes and
cancel. Transitioned values then join the dim state at B@new,
bucket-pruned. Every leg is O(Δ + touched buckets).

Sequencing: the MV's guard lsn is ``a_version + b_version`` — strictly
monotone because every hop advances at least one cursor — and the hop
range rides the destination's commit lineage (same atomic write as the
data), so crash/redelivery recovery inherits the cascade contract:
the ledger-derived cursor wins over a stale or missing cursor file.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_META = ("lsn", "seq", "updated_epoch", "deleted")
_SEP = "\x1f"
_NULL = "\x00"


MV_KEEP_VERSIONS = 50


def _maybe_gc(tables, keep: int | None = None) -> None:
    """Amortized version retention for the tables an MV OWNS (its Z-set
    outputs and side indexes — never its inputs): once a table holds
    more than 2×keep manifests, trim to the last ``keep``. Every pinned
    read (``version_at``) targets cursor-adjacent versions, so keep=50
    leaves orders of magnitude of margin; without this, a long-running
    hop loop accumulates manifests and dead delta files O(hops)."""
    if keep is None:
        keep = MV_KEEP_VERSIONS
    for t in tables:
        if len(t.versions()) > 2 * keep:
            t.gc(keep_last_versions=keep)


def _sign():
    return F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))


def _empty_signed(spark: SparkSession, mv_table, out_cols: list[str]) -> DataFrame:
    """A zero-row frame shaped like a join leg's output (``out_cols`` in
    the MV's own column types plus ``_sign``) — the all-null-join-value
    hop still commits, so cursor lineage advances."""
    mtypes = {f.name: f.dataType for f in mv_table.manifest().schema().fields}
    return spark.createDataFrame(
        [],
        T.StructType(
            [T.StructField(c, mtypes[c]) for c in out_cols]
            + [T.StructField("_sign", T.IntegerType())]
        ),
    )


def _tuple_hash(cols: list[str]):
    return F.md5(
        F.concat_ws(_SEP, *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
        ])
    )


class _SideIndex:
    """Z-set secondary index of one input table: one live row per
    (join value, source key, payload) tuple, keyed by the tuple hash,
    hash-bucketed by the JOIN VALUE (``Manifest.bucket_key``) so the
    other side's delta prunes its probe to the buckets of its changed
    join values. Maintained incrementally from the source's change feed
    with its own lineage cursor (``src_to``) — catch-ups are exactly-
    once (epoch ledger keyed by the version range digest) and therefore
    idempotent across crash/retry windows."""

    def __init__(
        self,
        spark: SparkSession,
        source,
        path: str,
        name: str,
        join_col: str,
        cols: list[str],
        n_buckets: int = 8,
        derive=None,
        derive_type: T.DataType | None = None,
    ):
        """``derive`` (optional): a callable(df) -> df applied to the
        source CDF before folding, ADDING the join column as a derived
        expression over source columns — possibly 1:N (an explode; the
        ``_change_type`` column must ride through). ``join_col`` then
        names the derived column and ``derive_type`` gives its Spark
        type. This is what lets an index key off a grid cell instead
        of a stored column (range joins)."""
        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.spark = spark
        self.source = source
        self.name = name
        self.join_col = join_col
        self.cols = list(cols)
        self.derive = derive
        sm = source.manifest()
        self.src_key = sm.key
        # the index's own key is the tuple hash named doc_id (engine
        # convention) — a source key named doc_id is stored renamed
        self.key_out = self.src_key if self.src_key != "doc_id" else f"{name}_id"
        self.src_cols = [self.join_col, self.src_key, *self.cols]
        self.out_cols = [self.join_col, self.key_out, *self.cols]
        if len(set(self.src_cols)) != len(self.src_cols):
            raise ValueError(
                f"index columns must be distinct: {self.src_cols}"
            )
        reserved = {"lsn", "seq", "updated_epoch", "deleted", "n_rows"}
        clash = reserved.intersection(self.out_cols)
        if clash:
            raise ValueError(
                f"index payload columns {sorted(clash)} collide with the "
                f"index table's own meta columns — alias them in a derive "
                f"step first"
            )
        stypes = {f.name: f.dataType for f in sm.schema().fields}
        if derive is not None:
            if derive_type is None:
                raise ValueError("derive requires derive_type")
            stypes[join_col] = derive_type
        t = SnapshotTable(spark, path)
        if not t.exists():
            schema = T.StructType(
                [T.StructField("doc_id", T.StringType())]
                + [
                    T.StructField(n, stypes[c])
                    for c, n in zip(self.src_cols, self.out_cols)
                ]
                + [
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("seq", T.IntegerType()),
                    T.StructField("updated_epoch", T.LongType()),
                    T.StructField("deleted", T.BooleanType()),
                ]
            )
            t = SnapshotTable.create(
                spark, path, schema, key="doc_id", n_buckets=n_buckets,
                bucket_key=self.join_col,
                policies={"n_rows": "add",
                          **{c: "first" for c in self.out_cols}},
                zset_col="n_rows",
            )
        self.table = t
        self.engine = CdcEngine(spark, t, collect_metrics=False)

    def cursor(self, max_walk: int = 64) -> int:
        for v in reversed(self.table.versions()[-max_walk:]):
            lin = self.table.manifest(v).lineage
            if "src_to" in lin:
                return int(lin["src_to"])
        return 0

    def catch_up(self, to_version: int, changes: DataFrame | None = None) -> None:
        """Fold the source's (cursor, to_version] changes into the
        index — signed tuple arithmetic, O(Δ); no-op when current.

        ``changes``: the caller's already-computed (ideally persisted)
        ``source.read_changes(frm, to_version)`` frame — the hop that
        owns this index reads the SAME version-range diff for its own
        delta leg, and the diff (two bucket-pruned MOR reads + a
        full-outer join) is the expensive part of a hop; sharing it
        halves the hop's scan work. Used only when the index cursor is
        exactly at the caller's from-version, else read anew."""
        frm = self.cursor()
        if to_version <= frm:
            return
        d = changes if changes is not None else self.source.read_changes(
            frm, to_version
        )
        if self.derive is not None:
            d = self.derive(d)
        d = d.filter(F.col(self.join_col).isNotNull())
        folded = (
            d.select(
                *[
                    F.col(c).alias(n)
                    for c, n in zip(self.src_cols, self.out_cols)
                ],
                _sign().alias("_sign"),
            )
            .groupBy(_tuple_hash(self.out_cols).alias("doc_id"))
            .agg(
                F.sum("_sign").cast("long").alias("n_rows"),
                *[F.max(c).alias(c) for c in self.out_cols],  # constant per hash
            )
            .filter(F.col("n_rows") != 0)
        )
        ev = folded.select(
            F.lit(to_version).cast("long").alias("stream_pos"),
            F.lit(to_version).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            "doc_id",
            *self.out_cols,
            "n_rows",
        )
        digest = hashlib.md5(
            f"sideindex-{self.name}-{frm}-{to_version}".encode()
        ).digest()
        # persist the folded tuples (O(Δ) rows): apply_epoch otherwise
        # executes the whole upstream diff twice — once for its
        # watermark pre-scan, once for the delta write
        ev = ev.persist()
        try:
            self.engine.apply_epoch(
                ev,
                epoch_id=int.from_bytes(digest[:8], "big") >> 1,
                lineage_extra={"src_from": frm, "src_to": to_version},
            )
        finally:
            ev.unpersist()

    def version_at(self, src_version: int) -> int | None:
        """The index table version holding EXACTLY the source's state at
        ``src_version`` — exists for every version a ``catch_up`` was
        ever targeted at (the ``src_to`` lineage rides the commit, on
        zero-row hops too). None for src_version 0 (the empty table;
        any pre-first-commit version works). Raises if no catch_up ever
        targeted ``src_version`` — a probe there would be unsound."""
        if src_version <= 0:
            return 0
        for v in reversed(self.table.versions()):
            lin = self.table.manifest(v).lineage
            to = lin.get("src_to")
            if to is not None:
                if int(to) == src_version:
                    return v
                if int(to) < src_version:
                    break
        raise ValueError(
            f"index {self.name!r} has no commit for source version "
            f"{src_version} — catch_up({src_version}) never ran"
        )

    def state(
        self,
        prune_values: DataFrame | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Live source rows in SOURCE column naming; ``prune_values``
        (a one-column DataFrame of join values) restricts the read to
        those values' hash buckets — the indexed-probe path.
        ``version`` pins the read to an index table version (pair with
        :meth:`version_at` to probe the source's state AS OF a source
        version even after the index advanced)."""
        from blockchain_etl_spark.cdc.apply import read_state
        from blockchain_etl_spark.tables.snapshot import bucket_expr

        buckets = None
        if prune_values is not None:
            nb = self.table.manifest().n_buckets
            vcol = prune_values.columns[0]
            buckets = [
                r["_b"]
                for r in prune_values.select(
                    bucket_expr(vcol, nb).alias("_b")
                ).distinct().collect()
            ]
            if not buckets:
                return read_state(self.table, buckets=[]).filter(
                    F.lit(False)
                ).select(
                    *[
                        F.col(n).alias(c)
                        for c, n in zip(self.src_cols, self.out_cols)
                    ]
                )
        return (
            read_state(self.table, buckets=buckets, version=version)
            .filter(F.col("n_rows") > 0)
            .select(
                *[
                    F.col(n).alias(c)
                    for c, n in zip(self.src_cols, self.out_cols)
                ]
            )
        )


class _PairCursor:
    """Shared (a_version, b_version) cursor discipline for two-input
    MVs: a fast-path cursor file (atomic replace, fsync'd, bound to the
    MV's table uid) recovered from the MV's own commit lineage when
    missing or stale — the ledger is the source of truth because the
    cursor range rides the same atomic manifest write as the data."""

    mv: Any
    cursor_path: str

    def _file_cursor(self) -> tuple[int, int]:
        try:
            with open(self.cursor_path) as f:
                got = json.load(f)
            cur = (int(got["a"]), int(got["b"]))
        except (FileNotFoundError, ValueError, KeyError, json.JSONDecodeError):
            return (0, 0)
        uid = self.mv.table_uid() if self.mv.exists() else None
        if uid is None or got.get("table_uid") != uid:
            return (0, 0)
        return cur

    def _ledger_cursor(self, max_walk: int = 64) -> tuple[int, int]:
        if not self.mv.exists():
            return (0, 0)
        for v in reversed(self.mv.versions()[-max_walk:]):
            lin = self.mv.manifest(v).lineage
            if "join_a_to" in lin:
                return (int(lin["join_a_to"]), int(lin["join_b_to"]))
        return (0, 0)

    def _cursor(self) -> tuple[int, int]:
        # element-wise max is safe: both sources only move forward and
        # every commit stamps BOTH cursors
        fa, fb = self._file_cursor()
        la, lb = self._ledger_cursor()
        return (max(fa, la), max(fb, lb))

    def _commit_cursor(self, a1: int, b1: int) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"a": a1, "b": b1, "table_uid": self.mv.table_uid()}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.cursor_path)


class JoinMV(_PairCursor):
    """Incremental ``fact ⋈ dim`` on ``fact.<join_col> = dim.<key>``
    (inner join; null join values never match, like SQL). Output
    tuples carry the fact key, the join column, and the selected
    payload columns from each side (names must be disjoint).

    ``indexed=True`` maintains a fact-side :class:`_SideIndex` from
    the first hop, so the dim-delta leg probes only the index buckets
    of ΔB's keys instead of scanning the fact table. With
    ``indexed=False`` the index is AUTO-BUILT on the first hop that
    actually sees a dim delta (seeding costs the one O(fact) read the
    old silent fallback paid EVERY dim hop; the commit's lineage
    records ``fact_index_autobuilt``) — there is no full-fact-scan
    steady state either way; ``indexed=True`` merely moves the seeding
    cost to the first hop and keeps the index warm for version-pinned
    probes."""

    def __init__(
        self,
        spark: SparkSession,
        fact_table,
        dim_table,
        root: str,
        join_col: str,
        fact_cols: list[str],
        dim_cols: list[str],
        n_buckets: int = 8,
        indexed: bool = False,
    ):
        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.spark = spark
        self.fact = fact_table
        self.dim = dim_table
        self.join_col = join_col
        self.fact_cols = list(fact_cols)
        self.dim_cols = list(dim_cols)
        fm, dm = fact_table.manifest(), dim_table.manifest()
        self.fact_key, self.dim_key = fm.key, dm.key
        overlap = set([self.fact_key, join_col, *fact_cols]) & set(dim_cols)
        if overlap:
            raise ValueError(f"output column collision: {sorted(overlap)}")
        # the MV's own key is the tuple hash named doc_id (engine
        # convention) — a fact table keyed doc_id surfaces as fact_id
        self.fact_id_col = self.fact_key if self.fact_key != "doc_id" else "fact_id"
        reserved = {"doc_id", "n_rows", *_META} & set(
            [self.fact_id_col, join_col, *fact_cols, *dim_cols]
        )
        if reserved:
            raise ValueError(f"reserved output column names: {sorted(reserved)}")
        self.out_cols = [self.fact_id_col, join_col, *self.fact_cols, *self.dim_cols]
        self.cursor_path = os.path.join(root, "join_cursor.json")

        path = os.path.join(root, "mv_join")
        t = SnapshotTable(spark, path)
        if not t.exists():
            ftypes = {f.name: f.dataType for f in fm.schema().fields}
            dtypes = {f.name: f.dataType for f in dm.schema().fields}
            schema = T.StructType(
                [T.StructField("doc_id", T.StringType())]
                + [T.StructField(n, ftypes[c]) for n, c in zip(
                    (self.fact_id_col, join_col, *self.fact_cols),
                    (self.fact_key, join_col, *self.fact_cols))]
                + [T.StructField(c, dtypes[c]) for c in self.dim_cols]
                + [
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("seq", T.IntegerType()),
                    T.StructField("updated_epoch", T.LongType()),
                    T.StructField("deleted", T.BooleanType()),
                ]
            )
            t = SnapshotTable.create(
                spark, path, schema, key="doc_id", n_buckets=n_buckets,
                policies={"n_rows": "add",
                          **{c: "first" for c in self.out_cols}},
                zset_col="n_rows",
            )
        self.mv = t
        self.engine = CdcEngine(spark, t, collect_metrics=False)
        self._idx_path = os.path.join(root, "idx_fact")
        self._idx_buckets = n_buckets
        # adopt an index that exists on disk even when indexed=False —
        # a previous hop may have AUTO-BUILT it on a dim delta (below),
        # and ignoring it would re-seed on every process restart
        self.index = (
            _SideIndex(
                spark, fact_table, self._idx_path, "fact",
                join_col, self.fact_cols, n_buckets=n_buckets,
            )
            if indexed or SnapshotTable(spark, self._idx_path).exists()
            else None
        )

    # ------------------------------------------------------------ the hop
    def _out(self, side_fact, side_dim, sign) -> DataFrame:
        cols = (
            [side_fact[self.fact_key], side_fact[self.join_col]]
            + [side_fact[c] for c in self.fact_cols]
            + [side_dim[c] for c in self.dim_cols]
        )
        named = [c.alias(n) for c, n in zip(cols, self.out_cols)]
        return side_fact.join(
            side_dim, side_fact[self.join_col] == side_dim[self.dim_key], "inner"
        ).select(*named, sign.alias("_sign"))

    def run_once(self) -> dict[str, Any] | None:
        from blockchain_etl_spark.cdc.apply import read_state
        from blockchain_etl_spark.tables.snapshot import bucket_expr

        a0, b0 = self._cursor()
        a1 = self.fact.current_version()
        b1 = self.dim.current_version()
        if a1 <= a0 and b1 <= b0:
            return None
        auto_indexed = False
        if b1 > b0 and self.index is None:
            # A dim delta on a non-indexed MV used to fall back to a
            # FULL fact-state read — O(fact) per dim hop, forever, and
            # silently. Seeding the fact-side index costs the same
            # O(fact) ONCE (its first catch_up nets the whole history
            # as one changed-bucket diff), after which every dim hop is
            # an O(ΔB + touched buckets) probe — so build it now
            # instead. Persisted at the same path ``indexed=True``
            # uses; later constructors adopt it.
            self.index = _SideIndex(
                self.spark, self.fact, self._idx_path, "fact",
                self.join_col, self.fact_cols,
                n_buckets=self._idx_buckets,
            )
            auto_indexed = True
        legs = []
        cached = []
        d_a_raw = None
        if a1 > a0:
            # persist: the delta feeds the index catch-up, the bucket-id
            # collect AND the join — uncached, the version diff (two
            # MOR reads + a full-outer join) would run 3+ times
            d_a_raw = self.fact.read_changes(a0, a1).persist()
            cached.append(d_a_raw)
        if self.index is not None:
            # A@new for the ΔB leg; idempotent, so a crash between this
            # and the MV commit just replays the (empty) remainder.
            # Shares the persisted ΔA when the index cursor sits at a0.
            self.index.catch_up(
                a1,
                changes=d_a_raw if self.index.cursor() == a0 else None,
            )
        if d_a_raw is not None:
            d_a = d_a_raw.filter(F.col(self.join_col).isNotNull())
            # dim read pruned to the hash buckets of ΔA's join values
            nb = self.dim.manifest().n_buckets
            bks = [
                r["_b"]
                for r in d_a.select(
                    bucket_expr(self.join_col, nb).alias("_b")
                ).distinct().collect()
            ]
            if bks:
                b_old = read_state(self.dim, version=b0, buckets=bks)
                legs.append(self._out(d_a.alias("f"), b_old.alias("d"), _sign()))
        if b1 > b0:
            # probe only the index buckets of ΔB's keys — O(ΔB +
            # touched buckets), never a fact-table scan. The delta
            # is persisted for the same collect+join double use.
            d_b = self.dim.read_changes(b0, b1).persist()
            cached.append(d_b)
            a_new = self.index.state(prune_values=d_b.select(self.dim_key))
            legs.append(
                self._out(
                    a_new.alias("f"), F.broadcast(d_b.alias("d")), _sign()
                )
            )
        lsn = a1 + b1
        if not legs:
            # a hop can be all-null join values on the only changed side
            # (nothing to join) — still commit zero rows so the cursor
            # lineage advances (version_at pins depend on it)
            out = _empty_signed(self.spark, self.mv, self.out_cols)
        else:
            out = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
        folded = (
            out.groupBy(_tuple_hash(self.out_cols).alias("doc_id"))
            .agg(
                F.sum("_sign").cast("long").alias("n_rows"),
                *[F.max(c).alias(c) for c in self.out_cols],  # constant per hash
            )
            .filter(F.col("n_rows") != 0)
        )
        ev = folded.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            "doc_id",
            *self.out_cols,
            "n_rows",
        )
        digest = hashlib.md5(f"joinmv-{a0}-{a1}-{b0}-{b1}".encode()).digest()
        epoch_id = int.from_bytes(digest[:8], "big") >> 1
        metrics = self.engine.apply_epoch(
            ev,
            epoch_id=epoch_id,
            lineage_extra={
                "join_a_to": a1, "join_a_from": a0,
                "join_b_to": b1, "join_b_from": b0,
                **({"fact_index_autobuilt": True} if auto_indexed else {}),
            },
        )
        self._commit_cursor(a1, b1)
        _maybe_gc([self.mv] + ([self.index.table] if self.index else []))
        for df in cached:
            df.unpersist()
        return metrics if metrics is not None else {"deduped_range": [a0, a1, b0, b1]}

    def state(self) -> DataFrame:
        """Live join tuples (multiplicity > 0), one row per tuple."""
        from blockchain_etl_spark.cdc.apply import read_state

        return read_state(self.mv).filter(F.col("n_rows") > 0).select(
            *self.out_cols
        )


class GeneralJoinMV(_PairCursor):
    """Incremental N:M equi-join ``A.<a_join_col> = B.<b_join_col>``
    where NEITHER join column is its table's key (for the key-join
    case use :class:`JoinMV` — it skips one index). Both sides are fed
    by their change feeds; both get a :class:`_SideIndex` bucketed by
    their join column, so every hop is O(ΔA + ΔB + touched index
    buckets) — never a scan of either input.

    Output tuples carry both sides' keys, the join value once (under
    A's column name), and the selected payload columns; the MV is the
    same Z-set-by-tuple-hash policy table as :class:`JoinMV`. Hop
    discipline (why it stays exact under crashes) is documented in the
    module docstring."""

    def __init__(
        self,
        spark: SparkSession,
        a_table,
        b_table,
        root: str,
        a_join_col: str,
        b_join_col: str,
        a_cols: list[str],
        b_cols: list[str],
        n_buckets: int = 8,
    ):
        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.spark = spark
        self.a, self.b = a_table, b_table
        self.a_join_col, self.b_join_col = a_join_col, b_join_col
        self.a_cols, self.b_cols = list(a_cols), list(b_cols)
        am, bm = a_table.manifest(), b_table.manifest()
        self.a_key, self.b_key = am.key, bm.key
        if a_join_col == self.a_key or b_join_col == self.b_key:
            raise ValueError(
                "join column equals a side's key — use JoinMV (that side "
                "is a dimension; its own bucketing already is the index)"
            )
        # engine convention: the MV's key is the tuple hash named doc_id,
        # so a source key named doc_id surfaces renamed
        self.a_id_col = self.a_key if self.a_key != "doc_id" else "a_id"
        self.b_id_col = self.b_key if self.b_key != "doc_id" else "b_id"
        self.out_cols = [
            self.a_id_col, self.b_id_col, a_join_col,
            *self.a_cols, *self.b_cols,
        ]
        if len(set(self.out_cols)) != len(self.out_cols):
            raise ValueError(f"output column collision: {self.out_cols}")
        reserved = {"doc_id", "n_rows", *_META} & set(self.out_cols)
        if reserved:
            raise ValueError(f"reserved output column names: {sorted(reserved)}")
        self.cursor_path = os.path.join(root, "join_cursor.json")

        path = os.path.join(root, "mv_join")
        t = SnapshotTable(spark, path)
        if not t.exists():
            atypes = {f.name: f.dataType for f in am.schema().fields}
            btypes = {f.name: f.dataType for f in bm.schema().fields}
            schema = T.StructType(
                [
                    T.StructField("doc_id", T.StringType()),
                    T.StructField(self.a_id_col, atypes[self.a_key]),
                    T.StructField(self.b_id_col, btypes[self.b_key]),
                    T.StructField(a_join_col, atypes[a_join_col]),
                ]
                + [T.StructField(c, atypes[c]) for c in self.a_cols]
                + [T.StructField(c, btypes[c]) for c in self.b_cols]
                + [
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("seq", T.IntegerType()),
                    T.StructField("updated_epoch", T.LongType()),
                    T.StructField("deleted", T.BooleanType()),
                ]
            )
            t = SnapshotTable.create(
                spark, path, schema, key="doc_id", n_buckets=n_buckets,
                policies={"n_rows": "add",
                          **{c: "first" for c in self.out_cols}},
                zset_col="n_rows",
            )
        self.mv = t
        self.engine = CdcEngine(spark, t, collect_metrics=False)
        self.idx_a = _SideIndex(
            spark, a_table, os.path.join(root, "idx_a"), "a",
            a_join_col, self.a_cols, n_buckets=n_buckets,
        )
        self.idx_b = _SideIndex(
            spark, b_table, os.path.join(root, "idx_b"), "b",
            b_join_col, self.b_cols, n_buckets=n_buckets,
        )

    # ------------------------------------------------------------ the hop
    def _out(self, a_side, b_side, sign) -> DataFrame:
        cols = (
            [a_side[self.a_key], b_side[self.b_key], a_side[self.a_join_col]]
            + [a_side[c] for c in self.a_cols]
            + [b_side[c] for c in self.b_cols]
        )
        named = [c.alias(n) for c, n in zip(cols, self.out_cols)]
        return a_side.join(
            b_side,
            a_side[self.a_join_col] == b_side[self.b_join_col],
            "inner",
        ).select(*named, sign.alias("_sign"))

    def run_once(self) -> dict[str, Any] | None:
        a0, b0 = self._cursor()
        a1 = self.a.current_version()
        b1 = self.b.current_version()
        if a1 <= a0 and b1 <= b0:
            return None
        # step 0: heal idx_b exactly to B@old (no-op unless the previous
        # hop's trailing advance crashed), then bring idx_a to A@new —
        # both idempotent, so any crash window replays to the same state
        self.idx_b.catch_up(b0)
        legs = []
        cached = []
        # deltas feed the index catch-ups, the prune-bucket collects AND
        # the joins — persisted raw so the version diff (two MOR reads +
        # a full-outer join) runs once per leg, not 3+ times
        d_a_raw = d_b_raw = None
        if a1 > a0:
            d_a_raw = self.a.read_changes(a0, a1).persist()
            cached.append(d_a_raw)
        if b1 > b0:
            d_b_raw = self.b.read_changes(b0, b1).persist()
            cached.append(d_b_raw)
        self.idx_a.catch_up(
            a1, changes=d_a_raw if self.idx_a.cursor() == a0 else None
        )
        if d_a_raw is not None:
            d_a = d_a_raw.filter(F.col(self.a_join_col).isNotNull())
            b_old = self.idx_b.state(prune_values=d_a.select(self.a_join_col))
            legs.append(self._out(d_a.alias("l"), b_old.alias("r"), _sign()))
        if d_b_raw is not None:
            d_b = d_b_raw.filter(F.col(self.b_join_col).isNotNull())
            a_new = self.idx_a.state(prune_values=d_b.select(self.b_join_col))
            legs.append(self._out(a_new.alias("l"), d_b.alias("r"), _sign()))
        lsn = a1 + b1
        out = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
        folded = (
            out.groupBy(_tuple_hash(self.out_cols).alias("doc_id"))
            .agg(
                F.sum("_sign").cast("long").alias("n_rows"),
                *[F.max(c).alias(c) for c in self.out_cols],  # constant per hash
            )
            .filter(F.col("n_rows") != 0)
        )
        ev = folded.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            "doc_id",
            *self.out_cols,
            "n_rows",
        )
        digest = hashlib.md5(f"nmjoinmv-{a0}-{a1}-{b0}-{b1}".encode()).digest()
        metrics = self.engine.apply_epoch(
            ev,
            epoch_id=int.from_bytes(digest[:8], "big") >> 1,
            lineage_extra={
                "join_a_to": a1, "join_a_from": a0,
                "join_b_to": b1, "join_b_from": b0,
            },
        )
        self._commit_cursor(a1, b1)
        _maybe_gc([self.mv, self.idx_a.table, self.idx_b.table])
        # trailing advance: next hop's B@old is this hop's B@new
        self.idx_b.catch_up(
            b1, changes=d_b_raw if self.idx_b.cursor() == b0 else None
        )
        for df in cached:
            df.unpersist()
        return metrics if metrics is not None else {"deduped_range": [a0, a1, b0, b1]}

    def state(self) -> DataFrame:
        """Live join tuples (multiplicity > 0), one row per tuple."""
        from blockchain_etl_spark.cdc.apply import read_state

        return read_state(self.mv).filter(F.col("n_rows") > 0).select(
            *self.out_cols
        )


class LeftJoinMV(_PairCursor):
    """Incremental LEFT OUTER ``fact ⟕ dim`` on ``fact.<join_col> =
    dim.<key>``: an inner :class:`JoinMV` plus an unmatched-side Z-set
    maintained by ΔU = ΔA⋈(1−m@old) − A@new⋈Δm (module docstring).
    ``state()`` is the SQL left join: inner tuples ∪ unmatched fact
    rows null-extended on the dim columns. Scale: leg1 is O(ΔA +
    touched dim buckets) (anti join against a bucket-pruned,
    version-pinned dim read); leg2 is O(dim transitions + touched
    fact-index buckets) — never a scan of either input."""

    def __init__(
        self,
        spark: SparkSession,
        fact_table,
        dim_table,
        root: str,
        join_col: str,
        fact_cols: list[str],
        dim_cols: list[str],
        n_buckets: int = 8,
    ):
        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.spark = spark
        self.fact, self.dim = fact_table, dim_table
        self.join_col = join_col
        self.fact_cols = list(fact_cols)
        self.dim_cols = list(dim_cols)
        self.inner = JoinMV(
            spark, fact_table, dim_table, os.path.join(root, "inner"),
            join_col=join_col, fact_cols=fact_cols, dim_cols=dim_cols,
            n_buckets=n_buckets,
        )
        fm, dm = fact_table.manifest(), dim_table.manifest()
        self.fact_key, self.dim_key = fm.key, dm.key
        self.fact_id_col = self.inner.fact_id_col
        self.u_src_cols = [self.fact_key, join_col, *self.fact_cols]
        self.u_cols = [self.fact_id_col, join_col, *self.fact_cols]
        self.out_cols = self.inner.out_cols
        self.cursor_path = os.path.join(root, "left_cursor.json")
        self.idx = _SideIndex(
            spark, fact_table, os.path.join(root, "idx_fact"), "leftfact",
            join_col, self.fact_cols, n_buckets=n_buckets,
        )
        path = os.path.join(root, "mv_unmatched")
        t = SnapshotTable(spark, path)
        if not t.exists():
            ftypes = {f.name: f.dataType for f in fm.schema().fields}
            schema = T.StructType(
                [T.StructField("doc_id", T.StringType())]
                + [
                    T.StructField(n, ftypes[c])
                    for c, n in zip(self.u_src_cols, self.u_cols)
                ]
                + [
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("seq", T.IntegerType()),
                    T.StructField("updated_epoch", T.LongType()),
                    T.StructField("deleted", T.BooleanType()),
                ]
            )
            t = SnapshotTable.create(
                spark, path, schema, key="doc_id", n_buckets=n_buckets,
                policies={"n_rows": "add",
                          **{c: "first" for c in self.u_cols}},
                zset_col="n_rows",
            )
        self.mv = t  # the unmatched side; _PairCursor recovers from it
        self.engine = CdcEngine(spark, t, collect_metrics=False)

    def _u_named(self, df) -> list:
        return [
            df[c].alias(n) for c, n in zip(self.u_src_cols, self.u_cols)
        ]

    def run_once(self) -> dict[str, Any] | None:
        from blockchain_etl_spark.cdc.apply import read_state
        from blockchain_etl_spark.tables.snapshot import bucket_expr

        # keep the inner MV in lockstep first (its own exactly-once
        # cursor), then target ITS committed range — so the union in
        # state() is consistent after run_once() returns, and a crash
        # window where inner ran ahead replays here as one bigger hop
        self.inner.run_once()
        a1, b1 = self.inner._cursor()
        a0, b0 = self._cursor()
        if a1 <= a0 and b1 <= b0:
            return None
        legs = []
        cached = []
        d_a = None
        if a1 > a0:
            d_a = self.fact.read_changes(a0, a1).persist()
            cached.append(d_a)
        # the catch-up shares the persisted ΔA when its cursor is at a0
        self.idx.catch_up(
            a1, changes=d_a if self.idx.cursor() == a0 else None
        )
        if d_a is not None:
            nn = d_a.filter(F.col(self.join_col).isNotNull())
            bks = []
            if b0 > 0:
                nb = self.dim.manifest().n_buckets
                bks = [
                    r["_b"]
                    for r in nn.select(
                        bucket_expr(self.join_col, nb).alias("_b")
                    ).distinct().collect()
                ]
            if bks:
                live_b = read_state(
                    self.dim, version=b0, buckets=bks
                ).select(F.col(self.dim_key).alias("_mval"))
                anti = nn.join(
                    F.broadcast(live_b),
                    nn[self.join_col] == live_b["_mval"],
                    "left_anti",
                )
            else:
                anti = nn  # dim empty at b0: every fact row is unmatched
            # null join values never match — straight signed, no anti
            leg1 = anti.unionByName(
                d_a.filter(F.col(self.join_col).isNull())
            )
            legs.append(leg1.select(*self._u_named(leg1), _sign().alias("_s")))
        if b1 > b0 and a1 > 0:
            # m's NET transitions over (b0, b1]: the CDF diffs states,
            # so updates (stays-live) never appear here
            trans = (
                self.dim.read_changes(b0, b1)
                .filter(F.col("_change_type").isin("insert", "delete"))
                .select(
                    F.col(self.dim_key).alias("_mval"),
                    F.when(F.col("_change_type") == "insert", F.lit(-1))
                    .otherwise(F.lit(1))
                    .alias("_s"),
                )
                .persist()
            )
            cached.append(trans)
            a_new = self.idx.state(
                prune_values=trans.select("_mval"),
                version=self.idx.version_at(a1),
            )
            leg2 = a_new.join(
                F.broadcast(trans),
                a_new[self.join_col] == trans["_mval"],
                "inner",
            )
            legs.append(leg2.select(*self._u_named(a_new), F.col("_s")))
        lsn = a1 + b1
        metrics = None
        if legs:
            out = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
            folded = (
                out.groupBy(_tuple_hash(self.u_cols).alias("doc_id"))
                .agg(
                    F.sum("_s").cast("long").alias("n_rows"),
                    *[F.max(c).alias(c) for c in self.u_cols],
                )
                .filter(F.col("n_rows") != 0)
            )
            ev = folded.select(
                F.lit(lsn).cast("long").alias("stream_pos"),
                F.lit(lsn).cast("long").alias("lsn"),
                F.lit(0).cast("int").alias("seq"),
                F.lit("U").alias("op"),
                F.lit(None).cast("long").alias("rollback_to_lsn"),
                "doc_id",
                *self.u_cols,
                "n_rows",
            )
            digest = hashlib.md5(
                f"leftjoinmv-{a0}-{a1}-{b0}-{b1}".encode()
            ).digest()
            metrics = self.engine.apply_epoch(
                ev,
                epoch_id=int.from_bytes(digest[:8], "big") >> 1,
                lineage_extra={
                    "join_a_to": a1, "join_a_from": a0,
                    "join_b_to": b1, "join_b_from": b0,
                },
            )
        self._commit_cursor(a1, b1)
        _maybe_gc([self.mv, self.idx.table])  # inner GCs its own
        for df in cached:
            df.unpersist()
        return metrics if metrics is not None else {
            "deduped_range": [a0, a1, b0, b1]
        }

    def state(self) -> DataFrame:
        """The SQL left join: inner tuples ∪ unmatched fact rows with
        the dim columns null-extended."""
        from blockchain_etl_spark.cdc.apply import read_state

        dtypes = {f.name: f.dataType for f in self.dim.manifest().schema().fields}
        unmatched = (
            read_state(self.mv)
            .filter(F.col("n_rows") > 0)
            .select(
                *self.u_cols,
                *[
                    F.lit(None).cast(dtypes[c]).alias(c)
                    for c in self.dim_cols
                ],
            )
        )
        return self.inner.state().unionByName(unmatched)


class FullOuterJoinMV(_PairCursor):
    """Incremental FULL OUTER ``fact ⟗ dim`` on ``fact.<join_col> =
    dim.<key>``: a :class:`LeftJoinMV` (inner tuples + fact-unmatched
    Z-set) plus a dim-unmatched Z-set maintained by the symmetric rule
    ΔU_B = ΔB⋈(1−m_A@old) − B@new⋈Δm_A (module docstring). Output is
    the SQL full outer join with BOTH keys surfaced — ``dim_id`` is
    the dim key (null on fact-unmatched rows), the fact id/join/payload
    columns are null on dim-unmatched rows. Scale: the ΔB leg is
    O(ΔB + touched fact-index buckets); the Δm_A leg is O(ΔA's
    distinct values + touched index/dim buckets) — never a scan of
    either input (≙ the reference's reconciliation full-outer joins,
    eth_balance_adapter send/recv zero-fill, but incremental)."""

    def __init__(
        self,
        spark: SparkSession,
        fact_table,
        dim_table,
        root: str,
        join_col: str,
        fact_cols: list[str],
        dim_cols: list[str],
        n_buckets: int = 8,
    ):
        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.spark = spark
        self.fact, self.dim = fact_table, dim_table
        self.join_col = join_col
        self.fact_cols = list(fact_cols)
        self.dim_cols = list(dim_cols)
        self.left = LeftJoinMV(
            spark, fact_table, dim_table, os.path.join(root, "left"),
            join_col=join_col, fact_cols=fact_cols, dim_cols=dim_cols,
            n_buckets=n_buckets,
        )
        fm, dm = fact_table.manifest(), dim_table.manifest()
        self.fact_key, self.dim_key = fm.key, dm.key
        self.fact_id_col = self.left.fact_id_col
        self.dim_id_col = self.dim_key if self.dim_key != "doc_id" else "dim_id"
        self.ub_src_cols = [self.dim_key, *self.dim_cols]
        self.ub_cols = [self.dim_id_col, *self.dim_cols]
        self.out_cols = [
            self.fact_id_col, join_col, *self.fact_cols,
            self.dim_id_col, *self.dim_cols,
        ]
        if len(set(self.out_cols)) != len(self.out_cols):
            raise ValueError(f"output column collision: {self.out_cols}")
        self.cursor_path = os.path.join(root, "full_cursor.json")
        path = os.path.join(root, "mv_dim_unmatched")
        t = SnapshotTable(spark, path)
        if not t.exists():
            dtypes = {f.name: f.dataType for f in dm.schema().fields}
            schema = T.StructType(
                [T.StructField("doc_id", T.StringType())]
                + [
                    T.StructField(n, dtypes[c])
                    for c, n in zip(self.ub_src_cols, self.ub_cols)
                ]
                + [
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("seq", T.IntegerType()),
                    T.StructField("updated_epoch", T.LongType()),
                    T.StructField("deleted", T.BooleanType()),
                ]
            )
            t = SnapshotTable.create(
                spark, path, schema, key="doc_id", n_buckets=n_buckets,
                policies={"n_rows": "add",
                          **{c: "first" for c in self.ub_cols}},
                zset_col="n_rows",
            )
        self.mv = t  # the dim-unmatched side; _PairCursor recovers from it
        self.engine = CdcEngine(spark, t, collect_metrics=False)

    def _ub_named(self, df) -> list:
        return [
            df[c].alias(n) for c, n in zip(self.ub_src_cols, self.ub_cols)
        ]

    def _live_values(self, prune: DataFrame, src_version: int) -> DataFrame:
        """DISTINCT live fact join values at the pinned index version
        for ``src_version``, bucket-pruned to ``prune``'s values."""
        idx = self.left.idx
        return (
            idx.state(prune_values=prune, version=idx.version_at(src_version))
            .select(self.join_col)
            .distinct()
        )

    def run_once(self) -> dict[str, Any] | None:
        from blockchain_etl_spark.cdc.apply import read_state
        from blockchain_etl_spark.tables.snapshot import bucket_expr

        # the left MV first (its own exactly-once cursor + it advances
        # the fact-side index to a1); then target ITS committed range
        self.left.run_once()
        a1, b1 = self.left._cursor()
        a0, b0 = self._cursor()
        if a1 <= a0 and b1 <= b0:
            return None
        legs = []
        cached = []
        if b1 > b0:
            # leg1: ΔB ⋈ (1 − m_A@old) — anti vs live values at A@old
            d_b = self.dim.read_changes(b0, b1).persist()
            cached.append(d_b)
            if a0 > 0:
                live_old = self._live_values(
                    d_b.select(F.col(self.dim_key).alias(self.join_col)), a0
                ).select(F.col(self.join_col).alias("_mval"))
                anti = d_b.join(
                    F.broadcast(live_old),
                    d_b[self.dim_key] == live_old["_mval"],
                    "left_anti",
                )
            else:
                anti = d_b  # no fact rows at a0: every dim row unmatched
            legs.append(anti.select(*self._ub_named(anti), _sign().alias("_s")))
        if a1 > a0 and b1 > 0:
            # leg2: − B@new ⋈ Δm_A — transitions via two pinned probes
            vals = (
                self.fact.read_changes(a0, a1)
                .filter(F.col(self.join_col).isNotNull())
                .select(self.join_col)
                .distinct()
                .persist()
            )
            cached.append(vals)
            live_old = self._live_values(vals, a0)
            live_new = self._live_values(vals, a1)
            trans = (
                live_new.exceptAll(live_old)
                .select(F.col(self.join_col).alias("_mval"),
                        F.lit(-1).alias("_s"))  # became matched: retract
                .unionByName(
                    live_old.exceptAll(live_new)
                    .select(F.col(self.join_col).alias("_mval"),
                            F.lit(1).alias("_s"))  # became unmatched: insert
                )
                .persist()
            )
            cached.append(trans)
            nb = self.dim.manifest().n_buckets
            bks = [
                r["_b"]
                for r in trans.select(
                    bucket_expr("_mval", nb).alias("_b")
                ).distinct().collect()
            ]
            if bks:
                b_new = read_state(self.dim, version=b1, buckets=bks)
                leg2 = b_new.join(
                    F.broadcast(trans),
                    b_new[self.dim_key] == trans["_mval"],
                    "inner",
                )
                legs.append(
                    leg2.select(*self._ub_named(b_new), F.col("_s"))
                )
        lsn = a1 + b1
        metrics = None
        if legs:
            out = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
            folded = (
                out.groupBy(_tuple_hash(self.ub_cols).alias("doc_id"))
                .agg(
                    F.sum("_s").cast("long").alias("n_rows"),
                    *[F.max(c).alias(c) for c in self.ub_cols],
                )
                .filter(F.col("n_rows") != 0)
            )
            ev = folded.select(
                F.lit(lsn).cast("long").alias("stream_pos"),
                F.lit(lsn).cast("long").alias("lsn"),
                F.lit(0).cast("int").alias("seq"),
                F.lit("U").alias("op"),
                F.lit(None).cast("long").alias("rollback_to_lsn"),
                "doc_id",
                *self.ub_cols,
                "n_rows",
            )
            digest = hashlib.md5(
                f"fullouterjoinmv-{a0}-{a1}-{b0}-{b1}".encode()
            ).digest()
            metrics = self.engine.apply_epoch(
                ev,
                epoch_id=int.from_bytes(digest[:8], "big") >> 1,
                lineage_extra={
                    "join_a_to": a1, "join_a_from": a0,
                    "join_b_to": b1, "join_b_from": b0,
                },
            )
        self._commit_cursor(a1, b1)
        _maybe_gc([self.mv])  # left GCs its own + the index
        for df in cached:
            df.unpersist()
        return metrics if metrics is not None else {
            "deduped_range": [a0, a1, b0, b1]
        }

    def state(self) -> DataFrame:
        """The SQL full outer join: inner tuples (dim_id = the join
        value) ∪ fact-unmatched rows (dim side null) ∪ dim-unmatched
        rows (fact side null)."""
        from blockchain_etl_spark.cdc.apply import read_state

        ftypes = {f.name: f.dataType for f in self.fact.manifest().schema().fields}
        dtypes = {f.name: f.dataType for f in self.dim.manifest().schema().fields}
        inner = self.left.inner.state().select(
            self.fact_id_col, self.join_col, *self.fact_cols,
            F.col(self.join_col).cast(dtypes[self.dim_key])
            .alias(self.dim_id_col),
            *self.dim_cols,
        )
        u_fact = (
            read_state(self.left.mv)
            .filter(F.col("n_rows") > 0)
            .select(
                *self.left.u_cols,
                F.lit(None).cast(dtypes[self.dim_key]).alias(self.dim_id_col),
                *[F.lit(None).cast(dtypes[c]).alias(c) for c in self.dim_cols],
            )
        )
        u_dim = (
            read_state(self.mv)
            .filter(F.col("n_rows") > 0)
            .select(
                F.lit(None).cast(ftypes[self.fact_key]).alias(self.fact_id_col),
                F.lit(None).cast(ftypes[self.join_col]).alias(self.join_col),
                *[F.lit(None).cast(ftypes[c]).alias(c) for c in self.fact_cols],
                *self.ub_cols,
            )
        )
        return inner.unionByName(u_fact).unionByName(u_dim)

    def right_state(self) -> DataFrame:
        """The RIGHT OUTER view — inner tuples ∪ dim-unmatched rows —
        for free from the same maintained pieces."""
        from blockchain_etl_spark.cdc.apply import read_state

        ftypes = {f.name: f.dataType for f in self.fact.manifest().schema().fields}
        dtypes = {f.name: f.dataType for f in self.dim.manifest().schema().fields}
        inner = self.left.inner.state().select(
            self.fact_id_col, self.join_col, *self.fact_cols,
            F.col(self.join_col).cast(dtypes[self.dim_key])
            .alias(self.dim_id_col),
            *self.dim_cols,
        )
        u_dim = (
            read_state(self.mv)
            .filter(F.col("n_rows") > 0)
            .select(
                F.lit(None).cast(ftypes[self.fact_key]).alias(self.fact_id_col),
                F.lit(None).cast(ftypes[self.join_col]).alias(self.join_col),
                *[F.lit(None).cast(ftypes[c]).alias(c) for c in self.fact_cols],
                *self.ub_cols,
            )
        )
        return inner.unionByName(u_dim)


class AsofJoinMV(_PairCursor):
    """Incrementally-maintained LEFT AS-OF join: each fact row is
    joined to the LATEST history row of its key whose ``hist_ts_col``
    is ≤ the fact's ``ts_col`` (point-in-time semantics — ≙ the
    reference's block-by-timestamp resolution, graph_operations.py:
    44-120, but as a maintained MV; also the feature-store join a
    training pipeline needs for leak-free feature snapshots). History
    is an append-mostly table keyed by a surrogate id with
    ``(hist_key_col, hist_ts_col)`` payload columns.

    As-of is NOT bilinear in the history side (a new history row
    steals wins from an older one), so the hop uses the exact
    decomposition

        Δ(A ⋈asof H) = ΔA ⋈asof H@old
                     + A@new|K(ΔH) ⋈asof H@new  −  A@new|K(ΔH) ⋈asof H@old

    leg1 resolves fact changes against the history snapshot pinned at
    the old cursor. leg2 re-resolves ONLY the fact rows whose key is
    touched by ΔH (probed from the version-pinned fact-side index,
    bucket-pruned, semi-joined to ΔH's keys) against both pinned
    history snapshots and emits the signed difference — unchanged
    winners cancel in the fold. A history BACKFILL (a row inserted
    with a ``hist_ts`` in the past) therefore retroactively rewrites
    exactly the fact rows in its win window. Cost: O(ΔA + ΔH +
    touched buckets) — never a scan of either input."""

    def __init__(
        self,
        spark: SparkSession,
        fact_table,
        hist_table,
        root: str,
        join_col: str,
        ts_col: str,
        hist_key_col: str,
        hist_ts_col: str,
        fact_cols: list[str],
        dim_cols: list[str],
        n_buckets: int = 8,
    ):
        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.spark = spark
        self.fact, self.hist = fact_table, hist_table
        self.join_col, self.ts_col = join_col, ts_col
        self.hist_key_col, self.hist_ts_col = hist_key_col, hist_ts_col
        self.fact_cols = list(fact_cols)
        self.dim_cols = list(dim_cols)
        fm, hm = fact_table.manifest(), hist_table.manifest()
        self.fact_key = fm.key
        self.fact_id_col = self.fact_key if self.fact_key != "doc_id" else "fact_id"
        self.f_src_cols = [self.fact_key, join_col, ts_col, *self.fact_cols]
        self.f_out_cols = [self.fact_id_col, join_col, ts_col, *self.fact_cols]
        self.out_cols = [*self.f_out_cols, hist_ts_col, *self.dim_cols]
        if len(set(self.out_cols)) != len(self.out_cols):
            raise ValueError(f"output column collision: {self.out_cols}")
        reserved = {"doc_id", "n_rows", *_META} & set(self.out_cols)
        if reserved:
            raise ValueError(f"reserved output column names: {sorted(reserved)}")
        self.cursor_path = os.path.join(root, "asof_cursor.json")
        self.idx = _SideIndex(
            spark, fact_table, os.path.join(root, "idx_fact"), "asoffact",
            join_col, [ts_col, *self.fact_cols], n_buckets=n_buckets,
        )
        path = os.path.join(root, "mv_asof")
        t = SnapshotTable(spark, path)
        if not t.exists():
            ftypes = {f.name: f.dataType for f in fm.schema().fields}
            htypes = {f.name: f.dataType for f in hm.schema().fields}
            schema = T.StructType(
                [T.StructField("doc_id", T.StringType())]
                + [
                    T.StructField(n, ftypes[c])
                    for c, n in zip(self.f_src_cols, self.f_out_cols)
                ]
                + [T.StructField(hist_ts_col, htypes[hist_ts_col])]
                + [T.StructField(c, htypes[c]) for c in self.dim_cols]
                + [
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("seq", T.IntegerType()),
                    T.StructField("updated_epoch", T.LongType()),
                    T.StructField("deleted", T.BooleanType()),
                ]
            )
            t = SnapshotTable.create(
                spark, path, schema, key="doc_id", n_buckets=n_buckets,
                policies={"n_rows": "add",
                          **{c: "first" for c in self.out_cols}},
                zset_col="n_rows",
            )
        self.mv = t
        self.engine = CdcEngine(spark, t, collect_metrics=False)

    # ------------------------------------------------------------ pieces
    def _hist_state(self, version: int, prune: DataFrame) -> DataFrame:
        """History snapshot pinned at ``version``, bucket-pruned to
        ``prune``'s key values when the table is bucketed by the
        history key (a full pinned read otherwise — still correct)."""
        from blockchain_etl_spark.cdc.apply import read_state
        from blockchain_etl_spark.tables.snapshot import bucket_expr

        m = self.hist.manifest()
        buckets = None
        if getattr(m, "bucket_key", None) == self.hist_key_col:
            got = [
                r["_b"]
                for r in prune.dropna().select(
                    bucket_expr(prune.columns[0], m.n_buckets).alias("_b")
                ).distinct().collect()
            ]
            if not got:
                return read_state(self.hist, version=version).limit(0)
            buckets = got
        return read_state(self.hist, version=version, buckets=buckets)

    def _asof_out(self, facts: DataFrame, hist: DataFrame) -> DataFrame:
        """One output row per input fact row (``_s`` propagated): the
        fact columns plus the WINNING history row's ts + payload —
        null-extended when no history row is ≤ the fact's ts. Winner
        resolution happens per DISTINCT (join value, ts) pair, so fact
        multiplicity is preserved without row ids."""
        fjc, fts = self.join_col, self.ts_col
        hkc, htc = self.hist_key_col, self.hist_ts_col
        pairs = facts.select(fjc, fts).distinct().alias("p")
        h = hist.alias("h")
        win = (
            pairs.join(
                h,
                (F.col(f"p.{fjc}") == F.col(f"h.{hkc}"))
                & (F.col(f"h.{htc}") <= F.col(f"p.{fts}")),
                "inner",
            )
            .groupBy(
                F.col(f"p.{fjc}").alias("_wk"), F.col(f"p.{fts}").alias("_wt")
            )
            .agg(
                F.max_by(
                    F.struct(
                        F.col(f"h.{htc}").alias(htc),
                        *[F.col(f"h.{c}").alias(c) for c in self.dim_cols],
                    ),
                    # hist rows are unique per (key, ts) in a consistent
                    # snapshot; lsn/seq make any residual tie stable
                    F.struct(F.col(f"h.{htc}"), F.col("h.lsn"), F.col("h.seq")),
                ).alias("_w")
            )
        )
        # no broadcast hint: win is usually delta-sized (AQE will pick
        # a broadcast) but a giant backfill window shouldn't OOM on one
        j = facts.join(
            win,
            facts[fjc].eqNullSafe(win["_wk"]) & facts[fts].eqNullSafe(win["_wt"]),
            "left",
        )
        named = [
            facts[c].alias(n) for c, n in zip(self.f_src_cols, self.f_out_cols)
        ]
        return j.select(
            *named,
            F.col(f"_w.{htc}").alias(htc),
            *[F.col(f"_w.{c}").alias(c) for c in self.dim_cols],
            F.col("_s"),
        )

    # ------------------------------------------------------------ the hop
    def run_once(self) -> dict[str, Any] | None:
        a0, b0 = self._cursor()
        a1 = self.fact.current_version()
        b1 = self.hist.current_version()
        if a1 <= a0 and b1 <= b0:
            return None
        legs = []
        cached = []
        d_a_raw = None
        if a1 > a0:
            # raw diff persisted once: feeds the index catch-up AND the
            # ΔA leg below (the diff is the expensive half of the hop)
            d_a_raw = self.fact.read_changes(a0, a1).persist()
            cached.append(d_a_raw)
        self.idx.catch_up(
            a1, changes=d_a_raw if self.idx.cursor() == a0 else None
        )
        if d_a_raw is not None:
            d_a = d_a_raw.select(*self.f_src_cols, _sign().alias("_s"))
            h_old = self._hist_state(b0, d_a.select(self.join_col))
            legs.append(self._asof_out(d_a, h_old))
        if b1 > b0 and a1 > 0:
            keys = (
                self.hist.read_changes(b0, b1)
                .select(F.col(self.hist_key_col).alias("_hk"))
                .dropna()
                .distinct()
                .persist()
            )
            cached.append(keys)
            probe = self.idx.state(
                prune_values=keys.select(F.col("_hk").alias(self.join_col)),
                version=self.idx.version_at(a1),
            )
            facts = probe.join(
                F.broadcast(keys),
                probe[self.join_col] == keys["_hk"],
                "left_semi",
            ).persist()
            cached.append(facts)
            h_old = self._hist_state(b0, keys)
            h_new = self._hist_state(b1, keys)
            legs.append(
                self._asof_out(facts.withColumn("_s", F.lit(-1)), h_old)
            )
            legs.append(
                self._asof_out(facts.withColumn("_s", F.lit(1)), h_new)
            )
        lsn = a1 + b1
        metrics = None
        if legs:
            out = legs[0]
            for leg in legs[1:]:
                out = out.unionByName(leg)
            folded = (
                out.groupBy(_tuple_hash(self.out_cols).alias("doc_id"))
                .agg(
                    F.sum("_s").cast("long").alias("n_rows"),
                    *[F.max(c).alias(c) for c in self.out_cols],
                )
                .filter(F.col("n_rows") != 0)
            )
            ev = folded.select(
                F.lit(lsn).cast("long").alias("stream_pos"),
                F.lit(lsn).cast("long").alias("lsn"),
                F.lit(0).cast("int").alias("seq"),
                F.lit("U").alias("op"),
                F.lit(None).cast("long").alias("rollback_to_lsn"),
                "doc_id",
                *self.out_cols,
                "n_rows",
            )
            digest = hashlib.md5(
                f"asofjoinmv-{a0}-{a1}-{b0}-{b1}".encode()
            ).digest()
            metrics = self.engine.apply_epoch(
                ev,
                epoch_id=int.from_bytes(digest[:8], "big") >> 1,
                lineage_extra={
                    "join_a_to": a1, "join_a_from": a0,
                    "join_b_to": b1, "join_b_from": b0,
                },
            )
        self._commit_cursor(a1, b1)
        _maybe_gc([self.mv, self.idx.table])
        for df in cached:
            df.unpersist()
        return metrics if metrics is not None else {
            "deduped_range": [a0, a1, b0, b1]
        }

    def state(self) -> DataFrame:
        """Live as-of tuples: every live fact row exactly once, with
        the point-in-time history payload (nulls when none applies)."""
        from blockchain_etl_spark.cdc.apply import read_state

        return read_state(self.mv).filter(F.col("n_rows") > 0).select(
            *self.out_cols
        )


def _cell_of(col: str, cell_size: int):
    return F.floor(F.col(col) / F.lit(cell_size)).cast("long")


def _explode_cells(lo_col: str, hi_col: str, cell_size: int):
    """1:N derive for an interval-side index: replicate each [lo, hi)
    row into every grid cell it overlaps (hi exclusive — the last cell
    is the one holding hi-1). Degenerate/null intervals index nothing."""
    def derive(df: DataFrame) -> DataFrame:
        return (
            df.filter(
                F.col(lo_col).isNotNull()
                & F.col(hi_col).isNotNull()
                & (F.col(lo_col) < F.col(hi_col))
            )
            .withColumn(
                "_cell",
                F.explode(
                    F.sequence(
                        F.floor(F.col(lo_col) / F.lit(cell_size)).cast("long"),
                        F.floor((F.col(hi_col) - 1) / F.lit(cell_size)).cast("long"),
                    )
                ),
            )
        )
    return derive


class RangeJoinMV(_PairCursor):
    """Incrementally-maintained RANGE (interval) join: every (fact,
    interval) pair with ``lo <= fact.<val_col> < hi``, N:M, from both
    tables' change feeds. Range predicates can't hash-prune, so both
    sides are indexed on a GRID CELL (``floor(value / cell_size)``):
    the fact index keys each row by its value's cell; the interval
    index replicates each interval into every cell it overlaps (the
    classic grid decomposition — a fact's single cell meets exactly
    the replicas of the intervals containing it, so no pair duplicates
    and no post-join dedup). The join IS bilinear, so the hop is the
    standard rule with version-pinned probes:

        leg1 = ΔA ⋈ idx_B@old   (pruned to ΔA's cells)
        leg2 = idx_A@new ⋈ ΔB   (pruned to ΔB's exploded cells)

    Cost: O(ΔA + ΔB·spans + touched cells' bucket IO); interval-side
    write amplification is (hi-lo)/cell_size replicas per interval —
    pick cell_size near the median interval width."""

    def __init__(
        self,
        spark: SparkSession,
        fact_table,
        ivl_table,
        root: str,
        val_col: str,
        lo_col: str,
        hi_col: str,
        fact_cols: list[str],
        dim_cols: list[str],
        cell_size: int,
        n_buckets: int = 8,
    ):
        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        if cell_size <= 0:
            raise ValueError("cell_size must be positive")
        self.spark = spark
        self.fact, self.ivl = fact_table, ivl_table
        self.val_col, self.lo_col, self.hi_col = val_col, lo_col, hi_col
        self.fact_cols = list(fact_cols)
        self.dim_cols = list(dim_cols)
        self.cell_size = cell_size
        fm, im = fact_table.manifest(), ivl_table.manifest()
        self.fact_key, self.ivl_key = fm.key, im.key
        self.fact_id_col = self.fact_key if self.fact_key != "doc_id" else "fact_id"
        self.ivl_id_col = self.ivl_key if self.ivl_key != "doc_id" else "ivl_id"
        self.out_cols = [
            self.fact_id_col, val_col, *self.fact_cols,
            self.ivl_id_col, lo_col, hi_col, *self.dim_cols,
        ]
        if len(set(self.out_cols)) != len(self.out_cols) or "_cell" in (
            val_col, lo_col, hi_col, *fact_cols, *dim_cols
        ):
            raise ValueError(f"output column collision: {self.out_cols}")
        reserved = {"doc_id", "n_rows", *_META} & set(self.out_cols)
        if reserved:
            raise ValueError(f"reserved output column names: {sorted(reserved)}")
        self.cursor_path = os.path.join(root, "range_cursor.json")
        self.idx_a = _SideIndex(
            spark, fact_table, os.path.join(root, "idx_fact"), "rngfact",
            "_cell", [val_col, *self.fact_cols], n_buckets=n_buckets,
            derive=lambda df: df.withColumn(
                "_cell", _cell_of(val_col, cell_size)
            ),
            derive_type=T.LongType(),
        )
        self.idx_b = _SideIndex(
            spark, ivl_table, os.path.join(root, "idx_ivl"), "rngivl",
            "_cell", [lo_col, hi_col, *self.dim_cols], n_buckets=n_buckets,
            derive=_explode_cells(lo_col, hi_col, cell_size),
            derive_type=T.LongType(),
        )
        path = os.path.join(root, "mv_range")
        t = SnapshotTable(spark, path)
        if not t.exists():
            ftypes = {f.name: f.dataType for f in fm.schema().fields}
            itypes = {f.name: f.dataType for f in im.schema().fields}
            schema = T.StructType(
                [T.StructField("doc_id", T.StringType())]
                + [T.StructField(n, ftypes[c]) for c, n in zip(
                    (self.fact_key, val_col, *self.fact_cols),
                    (self.fact_id_col, val_col, *self.fact_cols))]
                + [T.StructField(n, itypes[c]) for c, n in zip(
                    (self.ivl_key, lo_col, hi_col, *self.dim_cols),
                    (self.ivl_id_col, lo_col, hi_col, *self.dim_cols))]
                + [
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("seq", T.IntegerType()),
                    T.StructField("updated_epoch", T.LongType()),
                    T.StructField("deleted", T.BooleanType()),
                ]
            )
            t = SnapshotTable.create(
                spark, path, schema, key="doc_id", n_buckets=n_buckets,
                policies={"n_rows": "add",
                          **{c: "first" for c in self.out_cols}},
                zset_col="n_rows",
            )
        self.mv = t
        self.engine = CdcEngine(spark, t, collect_metrics=False)

    def _out(self, f_side, i_side, sign) -> DataFrame:
        cols = (
            [f_side[self.fact_key], f_side[self.val_col]]
            + [f_side[c] for c in self.fact_cols]
            + [i_side[self.ivl_key], i_side[self.lo_col], i_side[self.hi_col]]
            + [i_side[c] for c in self.dim_cols]
        )
        named = [c.alias(n) for c, n in zip(cols, self.out_cols)]
        return f_side.join(
            i_side,
            (f_side["_cell"] == i_side["_cell"])
            & (i_side[self.lo_col] <= f_side[self.val_col])
            & (f_side[self.val_col] < i_side[self.hi_col]),
            "inner",
        ).select(*named, sign.alias("_sign"))

    def run_once(self) -> dict[str, Any] | None:
        a0, b0 = self._cursor()
        a1 = self.fact.current_version()
        b1 = self.ivl.current_version()
        if a1 <= a0 and b1 <= b0:
            return None
        legs = []
        cached = []
        # raw diffs persisted once: each feeds its index catch-up, the
        # cell-prune collect AND the join leg
        d_a_raw = d_b_raw = None
        if a1 > a0:
            d_a_raw = self.fact.read_changes(a0, a1).persist()
            cached.append(d_a_raw)
        if b1 > b0:
            d_b_raw = self.ivl.read_changes(b0, b1).persist()
            cached.append(d_b_raw)
        # advance both indexes first; all probes below are pinned via
        # version_at, so there is no trailing-advance discipline
        self.idx_a.catch_up(
            a1, changes=d_a_raw if self.idx_a.cursor() == a0 else None
        )
        self.idx_b.catch_up(
            b1, changes=d_b_raw if self.idx_b.cursor() == b0 else None
        )
        if d_a_raw is not None:
            d_a = (
                d_a_raw
                .filter(F.col(self.val_col).isNotNull())
                .withColumn("_cell", _cell_of(self.val_col, self.cell_size))
            )
            b_old = self.idx_b.state(
                prune_values=d_a.select("_cell"),
                version=self.idx_b.version_at(b0),
            )
            legs.append(self._out(d_a.alias("l"), b_old.alias("r"), _sign()))
        if d_b_raw is not None:
            d_b = _explode_cells(self.lo_col, self.hi_col, self.cell_size)(
                d_b_raw
            ).persist()
            cached.append(d_b)
            a_new = self.idx_a.state(
                prune_values=d_b.select("_cell"),
                version=self.idx_a.version_at(a1),
            )
            legs.append(self._out(a_new.alias("l"), d_b.alias("r"), _sign()))
        lsn = a1 + b1
        metrics = None
        if legs:
            out = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
            folded = (
                out.groupBy(_tuple_hash(self.out_cols).alias("doc_id"))
                .agg(
                    F.sum("_sign").cast("long").alias("n_rows"),
                    *[F.max(c).alias(c) for c in self.out_cols],
                )
                .filter(F.col("n_rows") != 0)
            )
            ev = folded.select(
                F.lit(lsn).cast("long").alias("stream_pos"),
                F.lit(lsn).cast("long").alias("lsn"),
                F.lit(0).cast("int").alias("seq"),
                F.lit("U").alias("op"),
                F.lit(None).cast("long").alias("rollback_to_lsn"),
                "doc_id",
                *self.out_cols,
                "n_rows",
            )
            digest = hashlib.md5(
                f"rangejoinmv-{a0}-{a1}-{b0}-{b1}".encode()
            ).digest()
            metrics = self.engine.apply_epoch(
                ev,
                epoch_id=int.from_bytes(digest[:8], "big") >> 1,
                lineage_extra={
                    "join_a_to": a1, "join_a_from": a0,
                    "join_b_to": b1, "join_b_from": b0,
                },
            )
        self._commit_cursor(a1, b1)
        _maybe_gc([self.mv, self.idx_a.table, self.idx_b.table])
        for df in cached:
            df.unpersist()
        return metrics if metrics is not None else {
            "deduped_range": [a0, a1, b0, b1]
        }

    def state(self) -> DataFrame:
        """Live (fact, interval) pairs (multiplicity > 0)."""
        from blockchain_etl_spark.cdc.apply import read_state

        return read_state(self.mv).filter(F.col("n_rows") > 0).select(
            *self.out_cols
        )
