"""Snapshot-versioned lake table with atomic manifest commits.

This is the engine's sink substrate — the role Iceberg plays in the
north star. No Iceberg/Delta jars ship in this image, so the commit
protocol is implemented directly with the same semantics:

- **Data** lives in immutable parquet files under ``data/``; a JSON
  **manifest** per version lists the live files; ``manifests/LATEST``
  is an atomically-replaced pointer (``os.replace``) — readers always
  see a complete, committed snapshot (≙ Iceberg snapshot + metadata
  pointer swap).
- **Hash-bucket partitioning**: every file belongs to one bucket
  ``pmod(xxhash64(key), n_buckets)`` (≙ Iceberg ``bucket(N, doc_id)``
  partition transform). MERGE is **copy-on-write at bucket
  granularity**: only buckets containing touched keys are read and
  rewritten, the rest of the table is carried forward by reference.
  At 10^10 rows / 4096 buckets a batch touching 1k keys rewrites at
  most 1k buckets' files, not the table.
- **Exactly-once ledger**: the manifest itself records
  ``applied_epochs`` and the ``(lsn, seq)`` watermark, so the data
  write and the commit-ledger update are ONE atomic operation — the
  failure window the reference has between COPY and the Redis result
  key (``blockchainetl/cli/load.py:208-231``) does not exist here.
- **Time travel**: old manifests are retained; ``rollback_to_version``
  commits a new manifest that points at an old snapshot's files —
  the reorg replay path (≙ ``eth_reorg_adapter.py:116-142`` delete +
  re-insert, but atomic).
- **Schema evolution**: the manifest carries a schema history; files
  remember which schema version wrote them; reads union per-schema
  file groups cast to the current schema (added columns null-backfill,
  widened types upcast) — ``mergeSchema``-aware without rewriting old
  files.

Scale notes: manifest size is O(#live files) = O(n_buckets ×
files_per_bucket); driver-side JSON handling is the same cost class as
Iceberg's avro manifests. Reads prune by bucket before Spark ever
lists a file, so point-lookup-ish merges never scan cold buckets.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BUCKET_COL = "_bucket"
_SLAB_COL = "_slab"


class CommitConflictError(RuntimeError):
    """A concurrent writer committed this version first (optimistic
    concurrency loser) — re-read the table state and retry."""

# columns whose footer stats land in the manifest (Iceberg's per-file
# min/max metrics, restricted to the ones with pruning consumers)
_STATS_COLS = ("lsn", "deleted")


def _footer_stats(
    path: str, key: str | None = None, cluster: str | None = None
) -> dict[str, Any] | None:
    """Per-file zone map read from the parquet footer — driver-side, no
    data pages touched (the same cost class as Iceberg collecting column
    metrics at write time). Records ``lsn: [min, max]``, ``deleted_any``,
    and — when ``key`` is given — ``key: [min, max]`` so point lookups
    and time-ranged maintenance can prune FILES without opening them."""
    try:
        import pyarrow.parquet as pq

        want = (
            set(_STATS_COLS)
            | ({key} if key else set())
            | ({cluster} if cluster else set())
        )
        md = pq.ParquetFile(path).metadata
        mins: dict[str, Any] = {}
        maxs: dict[str, Any] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name not in want:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    return None  # incomplete stats → no zone map at all
                mins[name] = st.min if name not in mins else min(mins[name], st.min)
                maxs[name] = st.max if name not in maxs else max(maxs[name], st.max)
        stats: dict[str, Any] = {}
        if "lsn" in mins:
            stats["lsn"] = [int(mins["lsn"]), int(maxs["lsn"])]
        if "deleted" in maxs:
            stats["deleted_any"] = bool(maxs["deleted"])
        if key and key in mins:
            stats["key"] = [str(mins[key]), str(maxs[key])]
        if cluster and cluster in mins:
            stats["cluster"] = [int(mins[cluster]), int(maxs[cluster])]
        return stats or None
    except Exception:  # noqa: BLE001 — stats are an optimization, never fatal
        return None


_CLUSTER_MAX = 2**62  # "+infinity" for half-open zone queries


def cluster_zone_overlaps(f: dict[str, Any], lo: int, hi: int) -> bool:
    """File-level chunk-pruning predicate: True iff the file can hold a
    row whose cluster value falls in ``[lo, hi]`` — files without a
    cluster zone map conservatively overlap everything. THE single copy
    of the rule: ``read()``, ``drop_chunks()``, the tests, and the IO
    bench all call it, so a change here changes all of them together."""
    cz = (f.get("stats") or {}).get("cluster")
    return not cz or not (cz[1] < lo or cz[0] > hi)


def bucket_expr(key_col: str, n_buckets: int):
    """Bucket id of a key — MUST match everywhere (write, prune, merge)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


@dataclass
class Manifest:
    version: int
    key: str
    n_buckets: int
    schema_version: int
    schemas: dict[str, str]  # schema_version (str) -> StructType json
    files: list[dict[str, Any]] = field(default_factory=list)
    watermark: dict[str, int] = field(
        default_factory=lambda: {"lsn": -1, "seq": -1, "pos": -1}
    )
    applied_epochs: list[int] = field(default_factory=list)
    parent: int | None = None
    lineage: dict[str, Any] = field(default_factory=dict)
    # column merge policies (≙ the reference's per-table upsert hooks,
    # ethereumetl/streaming/postgres_hooks.py:43-150): col → "add"
    # (counters accumulate), "min"/"max" (running extremum over
    # non-null values), "first" (keep earliest non-null), "last"
    # (take newest non-null). Absent columns keep plain last-writer-row
    # semantics. Part of the table's identity — persisted per manifest.
    policies: dict[str, str] = field(default_factory=dict)
    # SECONDARY bucketing: hash-bucket by this column instead of the key
    # (≙ Iceberg bucket(N, col) on a non-identifier column). Makes the
    # table an INDEX: reads pruned by bucket_key VALUE, not by key — the
    # lookup-by-join-value path of incremental join MVs. Contract (the
    # caller's to keep, validated where cheap): the bucket_key value is
    # functionally determined by the key and immutable per key (so a
    # key's base/delta/tombstone rows always land in ONE bucket and MOR
    # resolution inside a pruned read stays complete), and EVERY event —
    # including deletes — carries it non-null.
    bucket_key: str | None = None
    # HYPERTABLE CHUNKING (≙ TimescaleDB chunks / Iceberg days()
    # partitioning, under the hash buckets): a declared integral
    # cluster column (typically event time). Every file's manifest
    # entry carries its zone map for this column, and rewrites split
    # each bucket's base data into ``cluster_slab``-wide chunk FILES —
    # so ``read(cluster_range=...)`` prunes files and a time-ranged
    # scan of a long-lived table opens only the touched chunks (one
    # base file per bucket would otherwise span the whole history and
    # be unprunable). Contract (the caller's, validated where cheap):
    # the value is functionally determined by the key, immutable, and
    # non-null on EVERY event including deletes — a tombstone outside
    # its key's chunk could otherwise be pruned away (resurrection).
    cluster_by: str | None = None
    cluster_slab: int | None = None
    # Z-SET MULTIPLICITY (MV-owned tables only, opt-in at create()):
    # the named column is a signed tuple multiplicity under an "add"
    # fold, and a group whose folded value is <= 0 is LOGICALLY DEAD —
    # read as absent by state consumers and by the change protocol
    # (read_changes liveness), exactly like a tombstone. Declaring it
    # lets compact() physically DROP dead groups, so the table's size
    # tracks LIVE tuples instead of all-time distinct tuples under
    # churn (every retract+reinsert cycle otherwise leaves a permanent
    # multiplicity-0 row). Safe ONLY for MV-owned tables: the fold is
    # additive, redelivery dedup lives in the delta path (epoch
    # ledger / non-overlapping cascade cursors — a dropped group's
    # (lsn, seq) guard goes with it), and a re-inserted tuple's payload
    # is recomputed from current upstream state. User policy tables,
    # whose tombstones deliberately carry lifetime totals, must NOT
    # set this.
    zset_col: str | None = None

    def bucket_col(self) -> str:
        """The column rows are hash-bucketed by (key unless overridden)."""
        return self.bucket_key or self.key

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schemas[str(self.schema_version)]))

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key: str = "doc_id",
        n_buckets: int = 32,
        policies: dict[str, str] | None = None,
        bucket_key: str | None = None,
        cluster_by: str | None = None,
        cluster_slab: int | None = None,
        zset_col: str | None = None,
    ) -> "SnapshotTable":
        if policies:
            from blockchain_etl_spark.functions.hist import hist_bins
            from blockchain_etl_spark.functions.sketch import kmv_k

            fields = {f.name: f.dataType for f in schema.fields}
            bad = {
                c: p
                for c, p in policies.items()
                if c not in fields
                or (
                    p not in ("add", "min", "max", "first", "last")
                    and kmv_k(p) is None
                    and hist_bins(p) is None
                )
            }
            if bad:
                raise ValueError(f"invalid merge policies: {bad}")
            bad_kmv = {
                c: p
                for c, p in policies.items()
                if kmv_k(p) is not None
                and fields[c] != T.ArrayType(T.StringType(), True)
                and fields[c] != T.ArrayType(T.StringType(), False)
            }
            if bad_kmv:
                raise ValueError(
                    f"kmv policy columns must be array<string>: {bad_kmv}"
                )
            bad_hist = {
                c: p
                for c, p in policies.items()
                if hist_bins(p) is not None
                and fields[c] != T.ArrayType(T.LongType(), True)
                and fields[c] != T.ArrayType(T.LongType(), False)
            }
            if bad_hist:
                raise ValueError(
                    f"hist policy columns must be array<bigint>: {bad_hist}"
                )
        if bucket_key == key:
            bucket_key = None  # the default layout, not a secondary index
        if bucket_key is not None and bucket_key not in {
            f.name for f in schema.fields
        }:
            raise ValueError(
                f"bucket_key {bucket_key!r} is not a column of the schema"
            )
        if cluster_slab is not None and cluster_by is None:
            raise ValueError("cluster_slab requires cluster_by")
        if cluster_by is not None:
            ftypes = {f.name: f.dataType for f in schema.fields}
            if cluster_by not in ftypes:
                raise ValueError(
                    f"cluster_by {cluster_by!r} is not a column of the schema"
                )
            if not isinstance(
                ftypes[cluster_by], (T.LongType, T.IntegerType)
            ):
                raise ValueError(
                    f"cluster_by {cluster_by!r} must be an integral column "
                    f"(got {ftypes[cluster_by].simpleString()})"
                )
            if cluster_slab is not None and int(cluster_slab) <= 0:
                raise ValueError(f"cluster_slab must be positive, got {cluster_slab}")
        if zset_col is not None:
            ftypes = {f.name: f.dataType for f in schema.fields}
            if zset_col not in ftypes:
                raise ValueError(
                    f"zset_col {zset_col!r} is not a column of the schema"
                )
            if not isinstance(ftypes[zset_col], (T.LongType, T.IntegerType)):
                raise ValueError(
                    f"zset_col {zset_col!r} must be an integral column "
                    f"(got {ftypes[zset_col].simpleString()})"
                )
            if (policies or {}).get(zset_col) != "add":
                raise ValueError(
                    f"zset_col {zset_col!r} must carry the 'add' merge "
                    f"policy (multiplicity is a signed additive fold); got "
                    f"{(policies or {}).get(zset_col)!r}"
                )
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        t = cls(spark, path)
        m = Manifest(
            version=0,
            key=key,
            n_buckets=n_buckets,
            schema_version=0,
            schemas={"0": json.dumps(schema.jsonValue())},
            policies=dict(policies or {}),
            bucket_key=bucket_key,
            cluster_by=cluster_by,
            cluster_slab=int(cluster_slab) if cluster_slab is not None else None,
            zset_col=zset_col,
        )
        try:
            t._write_manifest(m)
        except CommitConflictError:
            # a previous create wrote v0 but crashed before the pointer
            # swap — the conflict handler healed the pointer, so the
            # table now exists and creating it is idempotent. A POPULATED
            # table at this path is a different situation entirely:
            # proceeding would hand the caller old state under a fresh
            # identity (and invalidate live cascade cursors) — refuse.
            if t.current_version() > 0:
                raise FileExistsError(
                    f"{path} already holds a table at version "
                    f"{t.current_version()} — open it with SnapshotTable("
                    f"spark, path) or remove it before create()"
                ) from None
            # idempotent completion is only safe if the existing v0 IS the
            # table we were asked to create — two racing creators with
            # different schemas/keys/layouts must not silently share one
            # table under the loser's assumed shape.
            ex = t.manifest(0)
            if (
                ex.key != key
                or ex.n_buckets != n_buckets
                or ex.bucket_key != bucket_key
                or ex.cluster_by != cluster_by
                or ex.cluster_slab
                != (int(cluster_slab) if cluster_slab is not None else None)
                or ex.zset_col != zset_col
                or ex.policies != dict(policies or {})
                or ex.schemas[str(ex.schema_version)]
                != json.dumps(schema.jsonValue())
            ):
                raise FileExistsError(
                    f"{path} holds a table created with a different shape "
                    f"(key={ex.key!r}, n_buckets={ex.n_buckets}) than "
                    f"requested (key={key!r}, n_buckets={n_buckets}) or a "
                    f"different schema — refusing idempotent create()"
                ) from None
        # creation identity: lets external cursors (cascade hops) detect
        # that "the table at this path" was deleted and recreated — their
        # saved position is then meaningless and must be discarded.
        # Kept if already present (idempotent completion of a crashed
        # create must not rotate the identity out from under consumers).
        uid_path = os.path.join(path, "manifests", "TABLE_ID")
        if not os.path.exists(uid_path):
            uid_tmp = uid_path + f".tmp-{uuid.uuid4().hex}"
            with open(uid_tmp, "w") as f:
                f.write(uuid.uuid4().hex)
                f.flush()
                os.fsync(f.fileno())
            os.replace(uid_tmp, uid_path)
        return t

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "manifests", "LATEST"))

    def table_uid(self) -> str | None:
        """Creation identity (None for tables created before this field
        existed — callers must treat that as 'cannot verify')."""
        try:
            with open(os.path.join(self.path, "manifests", "TABLE_ID")) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    # ------------------------------------------------------------- manifests
    @staticmethod
    def _monotone_watermark(
        proposed: dict[str, int] | None, current: dict[str, int]
    ) -> dict[str, int]:
        """Commit-time watermark guard: a commit may only advance the
        watermark. An OCC loser retrying after a competitor committed a
        LATER epoch re-derives its file set from the fresh manifest but
        proposes the watermark it computed before the conflict — without
        this clamp the retry would REGRESS the table watermark, breaking
        the monotonicity the version→lsn sidecar,
        ``latest_version_at_or_before`` and the reorg-depth check assume.
        (Intentional regressions — rollback commits — bypass this by
        writing their manifest directly.) Comparison is lexicographic on
        (lsn, seq), the same total order the merge guard uses."""
        if proposed is None:
            return current
        if (proposed["lsn"], proposed["seq"]) < (current["lsn"], current["seq"]):
            return current
        return proposed

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, "manifests", f"v{version:08d}.json")

    def _write_manifest(self, m: Manifest) -> None:
        """Atomic commit: CAS-create the version's manifest file, then
        advance the LATEST pointer.

        Optimistic concurrency (Iceberg's commit protocol): the manifest
        file is created with link(2) — atomic create-if-absent — so two
        writers racing to commit the SAME next version produce exactly
        one winner; the loser gets :class:`CommitConflictError` and must
        re-read the table and re-derive its commit (its data files are
        orphans, GC-able). Without the CAS, last-write-wins on the
        manifest path would silently DROP the first writer's commit.

        The pointer swap never regresses: it only advances (a writer
        whose pointer write trails a later version's leaves the newer
        pointer in place), and a conflict first heals the pointer up to
        the existing manifest — covering the window where the previous
        winner crashed between its CAS and its pointer swap.

        A crash before the pointer swap leaves the table readable at the
        previous version with a committed-but-unpublished manifest,
        healed by the next writer — never a torn state.
        """
        mp = self._manifest_path(m.version)
        tmp = mp + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(m.to_json())
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, mp)  # the CAS: fails iff the version is taken
        except FileExistsError:
            os.unlink(tmp)
            self._advance_pointer(m.version)  # heal a crashed winner's swap
            raise CommitConflictError(
                f"version {m.version} of {self.path} was committed by a "
                f"concurrent writer — re-read the table and retry the commit"
            ) from None
        os.unlink(tmp)
        self._advance_pointer(m.version)
        # version→watermark sidecar: makes latest_version_at_or_before an
        # index scan with ZERO per-version manifest reads. Crash after the
        # pointer swap but before this append is healed by the lookup's
        # backfill path.
        with open(self._index_path(), "a") as f:
            f.write(
                json.dumps({"version": m.version, "lsn": m.watermark["lsn"]}) + "\n"
            )

    def _advance_pointer(self, version: int) -> None:
        """Move LATEST forward to ``version`` if it is not already at or
        past it. The read-check-replace runs under an advisory flock so
        two committers cannot interleave check and swap — without it, a
        v5 committer preempted between check and replace could overwrite
        a v6 committer's pointer, hiding committed data until the next
        conflict healed it (read-your-writes would break for the v6
        writer). Readers never take the lock (pointer reads stay one
        open())."""
        import fcntl

        ptr = os.path.join(self.path, "manifests", "LATEST")
        lock_path = os.path.join(self.path, "manifests", ".ptr.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                with open(ptr) as f:
                    if int(f.read().strip()) >= version:
                        return
            except (FileNotFoundError, ValueError):
                pass
            tmp = ptr + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                f.write(str(version))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, ptr)

    def current_version(self) -> int:
        with open(os.path.join(self.path, "manifests", "LATEST")) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> Manifest:
        v = self.current_version() if version is None else version
        with open(self._manifest_path(v)) as f:
            return Manifest.from_json(f.read())

    def versions(self) -> list[int]:
        d = os.path.join(self.path, "manifests")
        return sorted(
            int(n[1:-5]) for n in os.listdir(d) if n.startswith("v") and n.endswith(".json")
        )

    # ------------------------------------------------------------------ read
    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        resolve: bool = True,
        min_lsn_exclusive: int | None = None,
        columns: list[str] | None = None,
        key_range: tuple[str, str] | None = None,
        cluster_range: tuple[int, int] | None = None,
    ) -> DataFrame:
        """Read a snapshot, optionally pruned to a set of buckets.

        ``columns`` projects the PAYLOAD columns before merge-on-read
        resolution. Without it the resolver's ``max(struct(...))``
        carries every payload column, which defeats Catalyst's column
        pruning at the scan (nested fields inside an aggregated struct
        are opaque to the pruner) — a wide table would be read in full
        for a two-column consumer. The projection is winner-safe: the
        last-writer winner is decided by (lsn, seq, updated_epoch),
        which are always carried. Key and bookkeeping columns are
        implicit; order is the table schema's.

        ``key_range=(lo, hi)`` (inclusive) prunes files whose key zone
        map proves no key in the range — the point-lookup path combines
        bucket pruning (which bucket) with file pruning (which of the
        bucket's base+delta files can hold the key), so a hot bucket
        with many delta files opens only the files that mention it.
        Winner-safe under merge-on-read: all of a key's rows live in its
        bucket, and a file that cannot contain the key contributes no
        row to its resolution. Files without stats are kept.

        ``min_lsn_exclusive`` additionally skips files whose zone map
        proves every row has lsn <= the bound (files without stats are
        kept). Safe under merge-on-read resolution: any key with a row
        past the bound has its last-writer winner past the bound too
        (the winner is the max (lsn, seq) row), so dropping only
        all-older files never changes a surviving key's winner.

        Files written under older schema versions are read with their own
        schema and cast to the current one (null backfill for added
        columns, upcast for widened types) — schema-on-read evolution.

        Merge-on-read: if the selection contains delta files (appended by
        streaming upserts), ``resolve=True`` collapses them to the
        last-writer row per key via a ``max(struct(order_cols, ...))``
        aggregation — one shuffle, map-side combined, the exact same
        guard ordering the copy-on-write merge uses.
        """
        m = self.manifest(version)
        cur = m.schema()
        files = m.files
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f["bucket"] in bset]
        if key_range is not None:
            lo, hi = key_range
            files = [
                f
                for f in files
                if not (f.get("stats") or {}).get("key")
                or not (f["stats"]["key"][1] < lo or f["stats"]["key"][0] > hi)
            ]
        if cluster_range is not None:
            # hypertable chunk pruning: winner-safe under the cluster_by
            # contract (the value is immutable per key and non-null on
            # every row, tombstones included — so a key whose value is
            # in range has ALL its rows in surviving files, and partially
            # read out-of-range keys are removed by the row filter below)
            if m.cluster_by is None:
                raise ValueError(
                    f"{self.path} has no cluster_by column — cluster_range "
                    f"pruning needs one declared at create()"
                )
            clo, chi = cluster_range
            files = [f for f in files if cluster_zone_overlaps(f, clo, chi)]
        if min_lsn_exclusive is not None and not m.policies:
            # winner-safe ONLY for last-writer tables: a policy table's
            # fold (e.g. an "add" running total) depends on EVERY delta
            # row of the key, so file-level lsn pruning would corrupt the
            # resolution — skip it there (the caller's row-level lsn
            # filter on the RESOLVED rows remains correct).
            files = [
                f
                for f in files
                if not (f.get("stats") or {}).get("lsn")
                or f["stats"]["lsn"][1] > min_lsn_exclusive
            ]
        if not files:
            return self.spark.createDataFrame([], cur)

        by_sv: dict[int, list[str]] = {}
        has_delta = False
        for f in files:
            by_sv.setdefault(f["schema_version"], []).append(os.path.join(self.path, f["path"]))
            if f.get("kind", "base") == "delta":
                has_delta = True

        parts: list[DataFrame] = []
        for sv, paths in sorted(by_sv.items()):
            old = T.StructType.fromJson(json.loads(m.schemas[str(sv)]))
            df = self.spark.read.schema(old).parquet(*paths)
            if sv != m.schema_version:
                df = df.select(
                    *[
                        (
                            F.col(fld.name).cast(fld.dataType)
                            if fld.name in old.fieldNames()
                            else F.lit(None).cast(fld.dataType)
                        ).alias(fld.name)
                        for fld in cur.fields
                    ]
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if columns is not None:
            must = {m.key, "lsn", "seq", "updated_epoch", "deleted"}
            if cluster_range is not None:
                must.add(m.cluster_by)
            keep = [
                f.name for f in cur.fields if f.name in must or f.name in set(columns)
            ]
            out = out.select(keep)
        if has_delta and resolve:
            out = self._resolve_last_writer(out, m)
        if cluster_range is not None:
            # row-level completion of the file prune: out-of-range keys
            # whose files survived (zones overlap) drop here, AFTER the
            # winner per key is resolved — never from partial row sets
            out = out.filter(
                F.col(m.cluster_by).between(
                    F.lit(int(cluster_range[0])), F.lit(int(cluster_range[1]))
                )
            )
            bookkeeping = {m.key, "lsn", "seq", "updated_epoch", "deleted"}
            if (
                columns is not None
                and m.cluster_by not in set(columns)
                and m.cluster_by not in bookkeeping
            ):
                # the cluster column was carried only for this filter —
                # don't leak it into the caller's requested projection
                # (but never drop an always-carried bookkeeping column)
                out = out.drop(m.cluster_by)
        return out

    def _resolve_last_writer(self, df: DataFrame, m: Manifest) -> DataFrame:
        """Collapse base+delta rows to the newest row per key, ordered by
        the table's order columns (lsn, seq) — ties broken by
        updated_epoch (newer commit wins; identical-content redeliveries
        make ties value-identical).

        With column merge POLICIES (≙ postgres_hooks upsert policies),
        policy columns fold associatively instead of taking the winner
        row's value: ``add`` sums every delta, ``first``/``last`` take
        the earliest/newest NON-NULL value by commit order. All folds
        are ordinary aggregates — map-side combined, one shuffle, and
        compaction (which writes the folded row back as a base) stays
        correct because the folds are associative."""
        order_cols = [c for c in ("lsn", "seq", "updated_epoch") if c in df.columns]
        pol = {c: p for c, p in (m.policies or {}).items() if c in df.columns}
        if not pol:
            other = [c for c in df.columns if c != m.key and c not in order_cols]
            w = F.max(
                F.struct(*[F.col(c) for c in order_cols], *[F.col(c) for c in other])
            ).alias("w")
            g = df.groupBy(m.key).agg(w)
            return g.select(
                m.key,
                *[F.col(f"w.{c}").alias(c) for c in df.columns if c != m.key],
            ).select(df.columns)
        dtypes = {f.name: f.dataType for f in df.schema.fields}
        order = [F.col(c) for c in order_cols]
        plain = [
            c
            for c in df.columns
            if c != m.key and c not in order_cols and c not in pol
        ]
        aggs = [
            F.max(F.struct(*order, *[F.col(c) for c in plain])).alias("_w")
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
                    F.min(F.when(F.col(c).isNotNull(), F.struct(*order, F.col(c))))[
                        c
                    ].alias(c)
                )
            else:  # last non-null by order
                aggs.append(
                    F.max(F.when(F.col(c).isNotNull(), F.struct(*order, F.col(c))))[
                        c
                    ].alias(c)
                )
        g = df.groupBy(m.key).agg(*aggs)
        sel = [F.col(m.key)]
        for c in df.columns:
            if c == m.key:
                continue
            if c in pol:
                sel.append(F.col(c))
            else:
                sel.append(F.col(f"_w.{c}").alias(c))
        return g.select(*sel).select(df.columns)

    def delta_file_counts(self, version: int | None = None) -> dict[int, int]:
        """bucket -> number of delta files (compaction signal)."""
        out: dict[int, int] = {}
        for f in self.manifest(version).files:
            if f.get("kind", "base") == "delta":
                out[f["bucket"]] = out.get(f["bucket"], 0) + 1
        return out

    # ----------------------------------------------------------------- write
    def _write_data(
        self,
        df: DataFrame,
        n_buckets: int,
        key: str,
        sort_cols: list[str] | None = None,
        bucket_on: str | None = None,
        cluster: str | None = None,
        slab: int | None = None,
    ) -> list[dict[str, Any]]:
        """Write rows partitioned by bucket; return file entries.

        ``sort_cols`` clusters rows inside each bucket file (an in-task
        sort, no extra shuffle). Row order is semantically free — every
        reader resolves by (lsn, seq) — but a key-sorted bucket file
        gives each parquet ROW GROUP a tight key range, so the min/max
        pushdown in point lookups and key-ranged reads skips all but
        ~one row group per multi-GB bucket file instead of scanning
        them all (the per-FILE zone map can't help there: one base file
        per bucket spans the bucket's whole key range by definition)."""
        commit_dir = f"commit-{uuid.uuid4().hex}"
        out = os.path.join(self.path, "data", commit_dir)
        w = df.withColumn(
            _BUCKET_COL, bucket_expr(bucket_on or key, n_buckets)
        ).repartition(_BUCKET_COL)
        part_cols = [_BUCKET_COL]
        if cluster is not None and slab:
            # hypertable chunking: one FILE per (bucket, slab) — the slab
            # id is a derived copy, so the cluster column itself stays in
            # the data pages (partitionBy drops only the derived column)
            w = w.withColumn(
                _SLAB_COL, F.floor(F.col(cluster) / F.lit(int(slab))).cast("long")
            )
            part_cols.append(_SLAB_COL)
        if sort_cols:
            w = w.sortWithinPartitions(*part_cols, *sort_cols)
        (
            w.write.partitionBy(*part_cols)
            .mode("overwrite")
            .parquet(out)
        )
        entries: list[dict[str, Any]] = []
        for bdir in os.listdir(out):
            if not bdir.startswith(f"{_BUCKET_COL}="):
                continue
            b = int(bdir.split("=", 1)[1])
            for dirpath, _dirs, fns in os.walk(os.path.join(out, bdir)):
                for fn in fns:
                    if fn.endswith(".parquet"):
                        full = os.path.join(dirpath, fn)
                        entries.append(
                            {
                                "path": os.path.relpath(full, self.path),
                                "bucket": b,
                                "schema_version": None,  # stamped by caller
                                "_full": full,
                            }
                        )
        # footer stats are pure I/O — a thread pool keeps commit latency
        # flat as bucket count grows (a 4096-bucket commit would other-
        # wise serialize thousands of footer reads on the driver)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as pool:
            stats = list(
                pool.map(lambda e: _footer_stats(e["_full"], key, cluster), entries)
            )
        for e, st in zip(entries, stats):
            e["stats"] = st
            del e["_full"]
        return entries

    def overwrite(self, df: DataFrame, lineage: dict[str, Any] | None = None) -> int:
        """Replace the whole table content (bootstrap / tests)."""
        m = self.manifest()
        entries = self._write_data(
            df, m.n_buckets, m.key, bucket_on=m.bucket_col(),
            cluster=m.cluster_by, slab=m.cluster_slab,
        )
        for e in entries:
            e["schema_version"] = m.schema_version
        new = Manifest(
            version=m.version + 1,
            key=m.key,
            n_buckets=m.n_buckets,
            schema_version=m.schema_version,
            schemas=m.schemas,
            files=entries,
            watermark=m.watermark,
            applied_epochs=m.applied_epochs,
            parent=m.version,
            lineage=lineage or {},
            policies=m.policies,
            bucket_key=m.bucket_key,
            cluster_by=m.cluster_by,
            cluster_slab=m.cluster_slab,
            zset_col=m.zset_col,
        )
        self._write_manifest(new)
        return new.version

    def replace_buckets(
        self,
        buckets: list[int],
        df: DataFrame,
        *,
        watermark: dict[str, int] | None = None,
        epoch_id: int | None = None,
        extra_epochs: list[int] | None = None,
        lineage: dict[str, Any] | None = None,
        new_schema: T.StructType | None = None,
    ) -> int:
        """Copy-on-write MERGE commit: rewrite only the given buckets.

        ``df`` is the complete new content of those buckets. Untouched
        buckets' files carry forward by reference. ``watermark`` /
        ``epoch_id`` land in the SAME manifest — data + ledger are one
        atomic commit.
        """
        m = self.manifest()
        schemas = dict(m.schemas)
        sv = m.schema_version
        if new_schema is not None and json.dumps(new_schema.jsonValue()) != m.schemas[str(sv)]:
            sv += 1
            schemas[str(sv)] = json.dumps(new_schema.jsonValue())

        entries = self._write_data(
            df, m.n_buckets, m.key, bucket_on=m.bucket_col(),
            cluster=m.cluster_by, slab=m.cluster_slab,
        )
        bset = set(buckets)
        for e in entries:
            e["schema_version"] = sv
            if e["bucket"] not in bset:
                raise AssertionError(
                    f"merge wrote bucket {e['bucket']} outside declared set {sorted(bset)}"
                )
        kept = [f for f in m.files if f["bucket"] not in bset]
        new = Manifest(
            version=m.version + 1,
            key=m.key,
            n_buckets=m.n_buckets,
            schema_version=sv,
            schemas=schemas,
            files=kept + entries,
            watermark=self._monotone_watermark(watermark, m.watermark),
            applied_epochs=sorted(
                set(m.applied_epochs)
                | ({epoch_id} if epoch_id is not None else set())
                | set(extra_epochs or [])
            ),
            parent=m.version,
            lineage=lineage or {},
            policies=m.policies,
            bucket_key=m.bucket_key,
            cluster_by=m.cluster_by,
            cluster_slab=m.cluster_slab,
            zset_col=m.zset_col,
        )
        self._write_manifest(new)
        return new.version

    def append_deltas(
        self,
        df: DataFrame,
        *,
        watermark: dict[str, int] | None = None,
        epoch_id: int | None = None,
        extra_epochs: list[int] | None = None,
        lineage: dict[str, Any] | None = None,
        new_schema: T.StructType | None = None,
    ) -> int:
        """Merge-on-read commit: append the rows as delta files (no read
        of existing data, no join). Readers resolve last-writer per key;
        ``compact()`` folds deltas back into base files. This is the
        streaming-upsert fast path (Iceberg v2 MOR shape): apply cost is
        O(batch), independent of table size."""
        m = self.manifest()
        schemas = dict(m.schemas)
        sv = m.schema_version
        if new_schema is not None and json.dumps(new_schema.jsonValue()) != m.schemas[str(sv)]:
            sv += 1
            schemas[str(sv)] = json.dumps(new_schema.jsonValue())
        entries = self._write_data(
            df, m.n_buckets, m.key, bucket_on=m.bucket_col(),
            cluster=m.cluster_by,
        )
        for e in entries:
            e["schema_version"] = sv
            e["kind"] = "delta"
        new = Manifest(
            version=m.version + 1,
            key=m.key,
            n_buckets=m.n_buckets,
            schema_version=sv,
            schemas=schemas,
            files=m.files + entries,
            watermark=self._monotone_watermark(watermark, m.watermark),
            applied_epochs=sorted(
                set(m.applied_epochs)
                | ({epoch_id} if epoch_id is not None else set())
                | set(extra_epochs or [])
            ),
            parent=m.version,
            lineage=lineage or {},
            policies=m.policies,
            bucket_key=m.bucket_key,
            cluster_by=m.cluster_by,
            cluster_slab=m.cluster_slab,
            zset_col=m.zset_col,
        )
        self._write_manifest(new)
        return new.version

    def compact(
        self, buckets: list[int] | None = None, cluster: bool = False
    ) -> int:
        """Fold delta files into base files for the given buckets (default:
        every bucket that has deltas). Tombstone rows are preserved — they
        keep guarding against stale replays until vacuumed.

        ``cluster=True`` additionally sorts each rewritten bucket by
        (key, lsn, seq) — Iceberg's sort-order rewrite: free at compact
        time (in-task sort of data already being rewritten), and point
        lookups / key-ranged maintenance then prune ROW GROUPS inside
        the bucket file via parquet min/max instead of scanning it.

        Tables created with ``zset_col`` (MV-owned Z-sets) additionally
        GC DEAD GROUPS here: a non-tombstone row whose folded
        multiplicity is <= 0 is logically absent (state reads and the
        change protocol both treat it as dead), so the rewrite drops it
        — the MV's physical size tracks live tuples, not all-time
        distinct tuples, under retract/reinsert churn. The commit stays
        a plain compaction: per-commit change readers skip it, and the
        ranged differ never emits dead↔absent transitions."""
        m = self.manifest()
        with_deltas = sorted(self.delta_file_counts())
        targets = with_deltas if buckets is None else [b for b in buckets if b in set(with_deltas)]
        if not targets:
            return m.version
        resolved = self.read(buckets=targets, resolve=True)
        if m.zset_col is not None:
            dead = F.coalesce(F.col(m.zset_col), F.lit(0)) <= 0
            if "deleted" in resolved.columns:
                dead = dead & ~F.coalesce(F.col("deleted"), F.lit(False))
            resolved = resolved.filter(~dead)
        entries = self._write_data(
            resolved,
            m.n_buckets,
            m.key,
            sort_cols=[m.key, "lsn", "seq"] if cluster else None,
            bucket_on=m.bucket_col(),
            cluster=m.cluster_by,
            slab=m.cluster_slab,
        )
        tset = set(targets)
        for e in entries:
            e["schema_version"] = m.schema_version
            e["kind"] = "base"
        kept = [f for f in m.files if f["bucket"] not in tset]
        new = Manifest(
            version=m.version + 1,
            key=m.key,
            n_buckets=m.n_buckets,
            schema_version=m.schema_version,
            schemas=m.schemas,
            files=kept + entries,
            watermark=m.watermark,
            applied_epochs=m.applied_epochs,
            parent=m.version,
            lineage={"compaction": {"buckets": targets}},
            policies=m.policies,
            bucket_key=m.bucket_key,
            cluster_by=m.cluster_by,
            cluster_slab=m.cluster_slab,
            zset_col=m.zset_col,
        )
        self._write_manifest(new)
        return new.version

    def rebucket(self, n_buckets: int) -> int:
        """Bucket-layout evolution: rewrite the table into ``n_buckets``
        hash buckets (a table sized for 10^8 keys needs more buckets at
        10^10 — bucket count bounds per-bucket file size, point-lookup
        read width, and compaction unit). One full rewrite commit;
        tombstones and (lsn, seq) guards are preserved, so the table's
        CDC contract is unchanged. The commit is logically empty:
        per-commit change readers skip it, and ranged ``read_changes``
        spanning it falls back to an unpruned diff (bucket ids mean
        different key sets on the two sides of the layout change)."""
        m = self.manifest()
        if n_buckets == m.n_buckets:
            return m.version
        full = self.read(resolve=True)  # keep tombstone rows
        entries = self._write_data(
            full, n_buckets, m.key, bucket_on=m.bucket_col(),
            cluster=m.cluster_by, slab=m.cluster_slab,
        )
        for e in entries:
            e["schema_version"] = m.schema_version
            e["kind"] = "base"
        new = Manifest(
            version=m.version + 1,
            key=m.key,
            n_buckets=n_buckets,
            schema_version=m.schema_version,
            schemas=m.schemas,
            files=entries,
            watermark=m.watermark,
            applied_epochs=m.applied_epochs,
            parent=m.version,
            lineage={"rebucket": {"from": m.n_buckets, "to": n_buckets}},
            policies=m.policies,
            bucket_key=m.bucket_key,
            cluster_by=m.cluster_by,
            cluster_slab=m.cluster_slab,
            zset_col=m.zset_col,
        )
        self._write_manifest(new)
        return new.version

    def clone_at(self, dst_path: str, version: int | None = None) -> "SnapshotTable":
        """Zero-copy clone of the table at a version — the dev/backfill
        branch primitive (Delta shallow clone / Iceberg snapshot ref).

        Data files are HARDLINKED (the local-filesystem equivalent of a
        manifest-reference clone on object storage: no data copied, one
        metadata op per file). Links make the clone durable against the
        source's lifecycle: source compaction/vacuum unlinks only the
        source's name — the clone's link keeps the bytes — so there is
        no "don't vacuum below the clone" coupling. The clone starts at
        version 0 with its own TABLE_ID and carries the source's
        applied-epoch ledger and watermark, so an ingest stream resumed
        against the clone keeps exactly-once semantics."""
        m = self.manifest(version)
        os.makedirs(os.path.join(dst_path, "data"), exist_ok=True)
        os.makedirs(os.path.join(dst_path, "manifests"), exist_ok=True)
        for f in m.files:
            src = os.path.join(self.path, f["path"])
            dst = os.path.join(dst_path, f["path"])
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except FileExistsError:
                # retry of a clone that crashed before its manifest write:
                # the link already points at the same immutable file —
                # idempotent, keep going (the commit is the manifest write
                # at the end, same protocol as every other commit)
                pass
            except OSError:  # cross-device — fall back to copy
                import shutil

                shutil.copy2(src, dst)
        t = SnapshotTable(self.spark, dst_path)
        new = Manifest(
            version=0,
            key=m.key,
            n_buckets=m.n_buckets,
            schema_version=m.schema_version,
            schemas=m.schemas,
            files=[dict(f) for f in m.files],
            watermark=m.watermark,
            applied_epochs=m.applied_epochs,
            parent=None,
            lineage={"cloned_from": self.path, "source_version": m.version},
            policies=m.policies,
            bucket_key=m.bucket_key,
            cluster_by=m.cluster_by,
            cluster_slab=m.cluster_slab,
            zset_col=m.zset_col,
        )
        t._write_manifest(new)
        uid_tmp = os.path.join(dst_path, "manifests", f"TABLE_ID.tmp-{uuid.uuid4().hex}")
        with open(uid_tmp, "w") as f2:
            f2.write(uuid.uuid4().hex)
            f2.flush()
            os.fsync(f2.fileno())
        os.replace(uid_tmp, os.path.join(dst_path, "manifests", "TABLE_ID"))
        return t

    def drop_chunks(self, below: int) -> int:
        """Time-based retention for a cluster-chunked table (TimescaleDB
        ``drop_chunks`` / Delta ``REPLACE WHERE`` delete, by manifest
        math alone): commit a manifest that excludes every file whose
        cluster zone map proves ALL its rows sit below ``below`` —
        dropping a month of history is a metadata operation, zero
        rewrite, files reclaimed by gc(). ≙ the reference's ledger TTL
        (load.py:45) applied to the table itself.

        Best-effort by FILE, exact after compaction: un-slabbed delta
        files mixing retained and expired rows survive whole (the
        immutable-per-key contract means a RETAINED key never loses
        rows — only files wholly below the bound drop); the next
        ``compact()`` re-slabs survivors so the following drop is
        exact. Files without stats are kept, conservatively.

        Change-feed honesty: the retention commit is an ordinary
        commit — ``read_changes`` spanning it reports the expired keys
        as deletes. Downstream MVs therefore RETRACT expired history;
        consumers that must keep lifetime aggregates across retention
        (the continuous-aggregate contract) should hop PAST their
        cursor before the source drops, or read the level above."""
        m = self.manifest()
        if m.cluster_by is None:
            raise ValueError(
                f"{self.path} has no cluster_by column — drop_chunks "
                "retention needs hypertable chunking declared at create()"
            )
        if m.policies:
            # a policy table's accumulated columns are lifetime state: a
            # key dropped by retention that later re-inserts would
            # silently restart its totals from zero — the same contract
            # vacuum_tombstones protects. Expire policy tables by
            # deriving a retained replica instead.
            raise ValueError(
                f"drop_chunks on policy table {self.path} would silently "
                "reset lifetime policy folds for keys that re-insert — "
                "refused (derive a retained replica instead)"
            )
        # Winner-safety: keys are bucket-local and carry ONE immutable
        # cluster value, but a FILE's zone spans many keys — so a file
        # wholly below the bound can still hold the NEWEST row of a key
        # whose older rows sit in a surviving, overlapping file (e.g. a
        # tombstone delta dropped while the pre-delete base row stays →
        # resurrection). A file may therefore only drop if its zone lies
        # strictly below EVERY surviving file's zone in its bucket: the
        # per-bucket effective horizon is min(below, min surviving
        # zone-min); a survivor without a zone map pins the horizon (no
        # drops in that bucket). Slab-aligned bounds after compact()
        # make the horizon == below, i.e. the drop stays exact there.
        by_bucket: dict[int, list[dict[str, Any]]] = {}
        for f in m.files:
            by_bucket.setdefault(f["bucket"], []).append(f)
        keep, dropped = [], 0
        for fs in by_bucket.values():
            if any(not (f.get("stats") or {}).get("cluster") for f in fs):
                keep.extend(fs)  # a zone-less file pins its whole bucket
                continue
            # effective horizon = the greatest cut H <= below that NO
            # file's zone straddles (fixed point, not one pass: a file
            # kept because its max >= H is itself a survivor whose min
            # must also bound H — chained overlaps lower H transitively,
            # or drops would split a key's rows across the cut). Every
            # iteration lowers H to some straddler's zone-min, so it
            # terminates in <= len(fs) steps.
            horizon = int(below)
            while True:
                straddle = [
                    f["stats"]["cluster"][0]
                    for f in fs
                    if f["stats"]["cluster"][0] < horizon
                    <= f["stats"]["cluster"][1]
                ]
                if not straddle:
                    break
                horizon = min(straddle)
            for f in fs:
                # drop == zone provably disjoint from [horizon, inf) —
                # the SAME predicate read() prunes with
                if not cluster_zone_overlaps(f, horizon, _CLUSTER_MAX):
                    dropped += 1
                else:
                    keep.append(f)
        if not dropped:
            return m.version
        new = Manifest(
            version=m.version + 1,
            key=m.key,
            n_buckets=m.n_buckets,
            schema_version=m.schema_version,
            schemas=m.schemas,
            files=keep,
            watermark=m.watermark,
            applied_epochs=m.applied_epochs,
            parent=m.version,
            lineage={"drop_chunks": {"below": int(below), "files": dropped}},
            policies=m.policies,
            bucket_key=m.bucket_key,
            cluster_by=m.cluster_by,
            cluster_slab=m.cluster_slab,
            zset_col=m.zset_col,
        )
        self._write_manifest(new)
        return new.version

    def publish_from(self, stage: "SnapshotTable") -> int:
        """Write-audit-publish (the Iceberg WAP pattern; ≙ the
        reference's staged external-table load with done/fail dirs,
        postgres_utils.py:197-306 — but atomic): adopt a staged clone's
        commits into this table in ONE manifest swap.

        Flow: ``stage = table.clone_at(stage_path)`` (hardlink fork) →
        ingest/compact/evolve into the stage → run audits against the
        stage's state → ``table.publish_from(stage)``. Readers of this
        table never see an unaudited commit; a failed audit is "delete
        the stage dir", with zero effect here.

        Guarantees:
        - **fast-forward only**: refuses (CommitConflictError) if this
          table advanced past the fork point — the audit no longer
          covers current state; re-fork and re-audit.
        - **atomic**: data files are adopted by hardlink (same-volume;
          copy fallback) BEFORE the manifest commit; the publish is the
          usual CAS manifest swap, so a crash mid-adopt retries
          idempotently and concurrent writers lose cleanly.
        - **exactly-once composes**: the stage's ``applied_epochs``
          ledger and watermark ride the published manifest, so a
          tailer redelivering a staged epoch to the published table is
          a no-op, and re-publishing the SAME stage head is too.
        - the whole staged history squashes into one commit — CDF
          readers see the net diff (the same shape a multi-version
          ``read_changes`` range produces)."""
        s_head = stage.manifest()
        lin0 = stage.manifest(0).lineage or {}
        if os.path.realpath(str(lin0.get("cloned_from", ""))) != os.path.realpath(
            self.path
        ):
            raise ValueError(
                f"stage {stage.path} was not cloned from {self.path} — "
                "publish_from only adopts commits staged on a clone of "
                "this table"
            )
        base = int(lin0["source_version"])
        token = {"stage_uid": stage.table_uid(), "stage_version": s_head.version}
        cur = self.manifest()
        if cur.lineage.get("published") == token:
            return cur.version  # redelivered publish — already adopted
        if cur.version != base:
            raise CommitConflictError(
                f"{self.path} advanced to v{cur.version} since the stage "
                f"forked at v{base} — the audit no longer covers current "
                "state; re-fork and re-audit"
            )
        if s_head.version == 0:
            return cur.version  # nothing staged
        for f in s_head.files:
            src = os.path.join(stage.path, f["path"])
            dst = os.path.join(self.path, f["path"])
            if os.path.exists(dst):
                continue  # shared since the fork (clone hardlinked it)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except FileExistsError:
                pass  # crash-retry of a previous adopt — idempotent
            except OSError:
                shutil.copy2(src, dst)
        new = Manifest(
            version=cur.version + 1,
            key=s_head.key,
            n_buckets=s_head.n_buckets,
            schema_version=s_head.schema_version,
            schemas=s_head.schemas,
            files=[dict(f) for f in s_head.files],
            watermark=s_head.watermark,
            applied_epochs=s_head.applied_epochs,
            parent=cur.version,
            lineage={
                "published": token,
                "staged_from": stage.path,
                "staged_commits": s_head.version,
            },
            policies=s_head.policies,
            bucket_key=s_head.bucket_key,
            cluster_by=s_head.cluster_by,
            cluster_slab=s_head.cluster_slab,
            zset_col=s_head.zset_col,
        )
        try:
            self._write_manifest(new)
        except CommitConflictError:
            cur2 = self.manifest()
            if cur2.lineage.get("published") == token:
                return cur2.version  # a competitor published this stage
            raise
        return new.version

    def rollback_to_version(self, version: int, lineage: dict[str, Any] | None = None) -> int:
        """Commit a new manifest pointing at an old snapshot (time travel).

        Roll-forward style: history stays linear, the reorg is itself a
        recorded commit (≙ the reference's delete+reinsert, but atomic —
        ``eth_reorg_adapter.py:116-142,301-302``).
        """
        old = self.manifest(version)
        cur = self.manifest()
        new = Manifest(
            version=cur.version + 1,
            key=old.key,
            n_buckets=old.n_buckets,
            schema_version=old.schema_version,
            schemas=old.schemas,
            files=old.files,
            watermark=old.watermark,
            applied_epochs=old.applied_epochs,
            parent=cur.version,
            lineage={**(lineage or {}), "rollback_of": cur.version, "rollback_to": version},
            policies=old.policies,
            bucket_key=old.bucket_key,
            cluster_by=old.cluster_by,
            cluster_slab=old.cluster_slab,
            zset_col=old.zset_col,
        )
        self._write_manifest(new)
        return new.version

    def _index_path(self) -> str:
        return os.path.join(self.path, "manifests", "INDEX.jsonl")

    def _version_lsn_index(self) -> list[tuple[int, int]]:
        """(version, watermark.lsn) pairs in commit order, from the
        sidecar index; versions missing from the index (pre-index tables,
        crash between pointer swap and index append) are backfilled once
        from their manifests."""
        entries: list[tuple[int, int]] = []
        try:
            with open(self._index_path()) as f:
                for line in f:
                    if line.strip():
                        d = json.loads(line)
                        entries.append((d["version"], d["lsn"]))
        except FileNotFoundError:
            pass
        known = {v for v, _ in entries}
        missing = [v for v in self.versions() if v not in known]
        if missing:
            with open(self._index_path(), "a") as f:
                for v in missing:
                    lsn = self.manifest(v).watermark["lsn"]
                    entries.append((v, lsn))
                    f.write(json.dumps({"version": v, "lsn": lsn}) + "\n")
        entries.sort()
        return entries

    def latest_version_at_or_before(self, lsn: int) -> int | None:
        """Newest version whose watermark.lsn <= lsn (for reorg replay).

        One sidecar-index read + one directory listing — no per-version
        manifest JSON parses (watermarks are NOT monotonic across
        versions because a rollback commit restores an older watermark,
        so this is a backward scan over the in-memory index, newest
        match first). GC-pruned versions are skipped via the live set."""
        live = set(self.versions())
        for v, wlsn in reversed(self._version_lsn_index()):
            if v in live and wlsn <= lsn:
                return v
        return None

    # -------------------------------------------------- incremental changes
    def changed_buckets(
        self, from_version: int, to_version: int | None = None
    ) -> list[int] | None:
        """Buckets whose logical content may differ between two versions.

        Walks the commit chain collecting the buckets of files each
        commit added or removed relative to its parent, skipping
        pure-compaction commits (file rewrites with identical logical
        state). Rollback commits need no special case: the restored old
        file paths differ from the parent's and surface their buckets
        through the same file diff. Driver-side manifest reads only —
        the same cost class as Iceberg's manifest-diff incremental scan.

        Returns ``None`` when a manifest in the range was GC'd (history
        unknown → caller must diff every bucket).
        """
        v1 = self.current_version() if to_version is None else to_version
        touched: set[int] = set()
        try:
            for v in range(from_version + 1, v1 + 1):
                m = self.manifest(v)
                if "compaction" in m.lineage:
                    continue
                if "rebucket" in m.lineage:
                    # logically empty, but bucket ids MEAN different key
                    # sets on the two sides of the layout change — a
                    # bucket-pruned diff across it would compare
                    # mismatched slices. Fall back to diff-everything.
                    return None
                parent = m.parent if m.parent is not None else v - 1
                pfiles = {f["path"]: f for f in self.manifest(parent).files}
                cfiles = {f["path"]: f for f in m.files}
                touched.update(
                    f["bucket"] for p, f in cfiles.items() if p not in pfiles
                )
                touched.update(
                    f["bucket"] for p, f in pfiles.items() if p not in cfiles
                )
        except FileNotFoundError:
            return None
        return sorted(touched)

    def read_changes(
        self,
        from_version: int,
        to_version: int | None = None,
        diff_ignore: tuple[str, ...] = ("updated_epoch",),
        buckets: list[int] | None = None,
    ) -> DataFrame:
        """Row-level change-log between two committed versions (≙ Iceberg
        incremental scan / Delta CDF ``table_changes``): the edits that
        transform state(from_version) into state(to_version), tagged
        ``_change_type`` ∈ insert | update_preimage | update_postimage |
        delete. This is how a downstream pipeline tails THIS table as a
        source — the engine both consumes and emits changelogs, so
        ingest stages cascade.

        Semantics:

        - **Liveness**: a key is live when present and not tombstoned;
          tombstone↔absent transitions emit nothing.
        - **Net per key**: a key inserted and deleted inside the range
          emits nothing (collapsed diff, not per-commit attribution;
          attribute per commit by looping adjacent versions).
        - ``diff_ignore`` columns never trigger an update row — commit
          bookkeeping (``updated_epoch``) is not a logical change.
        - delete rows carry the pre-image payload (last live values).

        Scale: only buckets touched by non-compaction commits in the
        range are read (``changed_buckets`` manifest diff); the diff is
        one full-outer hash join on the key inside those buckets, so a
        stream touching k of B buckets pays O(state of k buckets), not
        O(table). Column comparison is null-safe ``<=>`` per column —
        exact, JVM-side, no hashing shortcut.
        """
        from blockchain_etl_spark.tables.schema_util import conform

        v1 = self.current_version() if to_version is None else to_version
        if from_version > v1:
            raise ValueError(f"from_version {from_version} > to_version {v1}")
        try:
            self.manifest(from_version)
        except FileNotFoundError:
            raise ValueError(
                f"from_version {from_version} was garbage-collected (gc "
                f"retention passed while this consumer was stopped) — "
                f"incremental resume is impossible; reseed the consumer "
                f"with a full snapshot read instead"
            ) from None
        m1 = self.manifest(v1)
        schema1 = m1.schema()
        key = m1.key
        out_cols = [f.name for f in schema1.fields]
        # commit-side (lsn, seq): the NEW state's watermark for the key,
        # present on every change row including deletes (where the payload
        # carries pre-image values but the deletion itself happened at the
        # tombstone's LSN). A downstream engine replaying these changes
        # must sequence deletes by the commit LSN — the pre-image LSN
        # would lose to its own prior row under the monotonic guard.
        has_wm = "lsn" in out_cols and "seq" in out_cols
        wm_fields = (
            [
                T.StructField("_commit_lsn", T.LongType(), True),
                T.StructField("_commit_seq", T.IntegerType(), True),
            ]
            if has_wm
            else []
        )
        out_schema = T.StructType(
            [T.StructField("_change_type", T.StringType(), False)]
            + list(schema1.fields)
            + wm_fields
            + [
                T.StructField("_from_version", T.IntegerType(), False),
                T.StructField("_to_version", T.IntegerType(), False),
            ]
        )
        # callers that already ran changed_buckets (e.g. the CLI summary)
        # pass it in to skip a second manifest walk
        if buckets is None and from_version != v1:
            buckets = self.changed_buckets(from_version, v1)
        if from_version == v1 or buckets == []:
            return self.spark.createDataFrame([], out_schema)

        a = conform(self.read(version=from_version, buckets=buckets), schema1).alias("a")
        b = conform(self.read(version=v1, buckets=buckets), schema1).alias("b")
        j = a.join(b, F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer")

        def present(side: str):
            return F.col(f"{side}.{key}").isNotNull()

        def live(side: str):
            p = present(side)
            if "deleted" in out_cols:
                p = p & ~F.coalesce(F.col(f"{side}.deleted"), F.lit(False))
            if m1.zset_col is not None and m1.zset_col in out_cols:
                # Z-set tables: a group whose folded multiplicity is
                # <= 0 is logically dead — a retraction to zero reads
                # as a DELETE (pre-image carries the last live
                # multiplicity, so weighted consumers retract exactly
                # that), and compaction's physical drop of a dead group
                # is dead↔absent: invisible, like tombstone↔absent.
                p = p & (
                    F.coalesce(F.col(f"{side}.{m1.zset_col}"), F.lit(0)) > 0
                )
            return p

        def img(side: str, ctype: str):
            wm = (
                [
                    F.col("b.lsn").cast("long").alias("_commit_lsn"),
                    F.col("b.seq").cast("int").alias("_commit_seq"),
                ]
                if has_wm
                else []
            )
            return F.struct(
                F.lit(ctype).alias("_change_type"),
                *[F.col(f"{side}.{c}").alias(c) for c in out_cols],
                *wm,
            )

        diff_cols = [c for c in out_cols if c != key and c not in diff_ignore]
        same = F.lit(True)
        for c in diff_cols:
            same = same & F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))

        arr = (
            F.when(live("b") & ~live("a"), F.array(img("b", "insert")))
            .when(live("a") & ~live("b"), F.array(img("a", "delete")))
            .when(
                live("a") & live("b") & ~same,
                F.array(img("a", "update_preimage"), img("b", "update_postimage")),
            )
            .otherwise(F.lit(None))
        )
        return (
            j.select(F.explode(arr).alias("_c"))
            .select("_c.*")
            .withColumn("_from_version", F.lit(from_version))
            .withColumn("_to_version", F.lit(v1))
        )

    def read_changes_per_commit(
        self,
        from_version: int,
        to_version: int | None = None,
        diff_ignore: tuple[str, ...] = ("updated_epoch",),
    ) -> DataFrame:
        """Per-commit change attribution: the union of adjacent-version
        diffs across the range, each row stamped with its own
        ``(_from_version, _to_version)`` step. Unlike ``read_changes``,
        a key inserted-then-deleted inside the range shows BOTH events —
        this is the audit/history view (Delta CDF's per-version rows),
        where ``read_changes`` is the state-sync view (net diff).

        Pure-compaction commits are recognized as logically empty and
        skipped without a data read. Scale: each step's diff is pruned
        to ITS changed buckets, so a quiet commit costs only its own
        touched slice; the union is a lazy single plan — K commits is K
        bucket-pruned joins, not K table scans."""
        v1 = self.current_version() if to_version is None else to_version
        steps = [v for v in self.versions() if from_version <= v <= v1]
        parts: list[DataFrame] = []
        for a, b in zip(steps, steps[1:]):
            lin = self.manifest(b).lineage
            if "compaction" in lin or "rebucket" in lin:
                continue  # file rewrites with identical logical state
            parts.append(self.read_changes(a, b, diff_ignore=diff_ignore))
        if not parts:
            return self.read_changes(from_version, v1, diff_ignore=diff_ignore).limit(0)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_since_lsn(self, lsn: int) -> DataFrame:
        """Every row last written after WAL position ``lsn`` — upserts
        AND tombstones (``deleted = true`` rows are the deletions), the
        WAL-position complement of the version-based ``read_changes``.
        A downstream batch consumer that tracks only an LSN high-water
        mark calls this to pick up the delta; zone maps prune every file
        whose rows are all at or below the mark, so a mostly-quiet table
        reads only its recent files."""
        return self.read(resolve=True, min_lsn_exclusive=lsn).filter(
            F.col("lsn") > lsn
        )

    # ------------------------------------------------------------- utilities
    def vacuum_candidate_buckets(self, older_than_lsn: int) -> list[int] | None:
        """Buckets that MAY hold tombstones older than the horizon, from
        the manifest zone maps alone (no data read): a file is a
        candidate when it has any tombstone row and its min lsn is below
        the horizon. Returns None when any file lacks stats (pre-stats
        table → caller must scan)."""
        cands: set[int] = set()
        for f in self.manifest().files:
            st = f.get("stats")
            if not st or "lsn" not in st or "deleted_any" not in st:
                return None
            if st["deleted_any"] and st["lsn"][0] < older_than_lsn:
                cands.add(f["bucket"])
        return sorted(cands)

    def vacuum_tombstones(self, older_than_lsn: int) -> int:
        """Drop tombstone rows with lsn < older_than_lsn (safe once the
        reorg lag + redelivery horizon has passed). Rewrites only buckets
        that actually contain old tombstones — found via the manifest
        zone maps (per-file lsn min/max + tombstone flag), so vacuum on
        a mostly-clean 10^10-row table reads candidate buckets only, not
        the table."""
        m = self.manifest()
        if m.policies:
            # a policy table's tombstone IS state: it carries the
            # accumulated columns that a later re-insert resumes from
            # (lifetime-totals contract). Dropping it would silently
            # reset the totals — refuse instead.
            raise ValueError(
                f"{self.path} declares column merge policies "
                f"{m.policies}; tombstones carry accumulated totals and "
                f"must not be vacuumed"
            )
        if "deleted" not in [f.name for f in m.schema().fields]:
            return self.current_version()
        cand = self.vacuum_candidate_buckets(older_than_lsn)
        df = self.read(resolve=True, buckets=cand)
        old_ts = df.filter(F.col("deleted") & (F.col("lsn") < older_than_lsn))
        buckets = [
            r["b"]
            for r in old_ts.select(bucket_expr(m.bucket_col(), m.n_buckets).alias("b"))
            .distinct()
            .collect()
        ]
        if not buckets:
            return self.current_version()
        keep = self.read(buckets=buckets, resolve=True).filter(
            ~(F.col("deleted") & (F.col("lsn") < older_than_lsn))
        )
        return self.replace_buckets(
            buckets, keep, lineage={"vacuum_tombstones_below": older_than_lsn}
        )

    def gc(self, keep_last_versions: int = 50) -> dict[str, int]:
        """Delete manifests older than the last N versions and data files
        no kept manifest references. N bounds reorg time travel — keep it
        larger than the reorg lag in epochs (≙ the reference's 80-block
        watermark)."""
        versions = self.versions()
        keep = set(versions[-keep_last_versions:])
        referenced: set[str] = set()
        for v in keep:
            referenced.update(f["path"] for f in self.manifest(v).files)
        n_manifests = 0
        for v in versions:
            if v not in keep:
                os.remove(self._manifest_path(v))
                n_manifests += 1
        if n_manifests:
            # compact the version→lsn sidecar to the kept versions
            kept_entries = [(v, l) for v, l in self._version_lsn_index() if v in keep]
            tmp = self._index_path() + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                for v, l in kept_entries:
                    f.write(json.dumps({"version": v, "lsn": l}) + "\n")
            os.replace(tmp, self._index_path())
        n_files = 0
        data_root = os.path.join(self.path, "data")
        for commit_dir in os.listdir(data_root):
            cpath = os.path.join(data_root, commit_dir)
            for root, _dirs, files in os.walk(cpath):
                for fn in files:
                    rel = os.path.relpath(os.path.join(root, fn), self.path)
                    if fn.endswith(".parquet") and rel not in referenced:
                        os.remove(os.path.join(root, fn))
                        n_files += 1
            if not any(files for _r, _d, files in os.walk(cpath)):
                shutil.rmtree(cpath, ignore_errors=True)
        return {"manifests_removed": n_manifests, "files_removed": n_files}

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
