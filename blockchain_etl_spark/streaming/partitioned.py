"""Multi-partition change-log consumption (the Kafka topic shape).

A real CDC bus is a P-partition topic: **order holds only within a
partition**, a key's events always land in one partition (producer
routes by ``hash(doc_id)``), and the consumer tracks per-partition
offsets. The reference consumes a totally-ordered stream per chain
(one streamer, ``blockchainetl/streaming/streamer.py``); this module is
the engine's consumer for the partitioned shape, with the three
semantics a naive union-and-apply gets wrong:

1. **Safe watermark (holdback).** A slow partition may still deliver
   events at LSNs another partition has passed. The consumer applies
   only events from segment files wholly at or below ``safe_lsn = min
   over partitions of head_lsn`` — the classic low-watermark rule — so
   the committed table watermark never claims an LSN a straggler could
   still write under. Everything else stays in the landing dir
   (file-granular holdback: no copy, no per-row state).
2. **Positional consumption.** Within a partition, segments are
   consumed as a contiguous prefix in name order — never skipping an
   ineligible file to take a later one. This is what makes chain
   reorgs sound: a post-reorg re-emission REUSES lower LSNs, so
   eligibility must gate on *position*, not on per-event LSN
   comparisons against the applied watermark (an LSN filter would drop
   re-emissions as "already applied"). It also guarantees no doomed
   pre-marker event can arrive after its killer marker was applied:
   the marker's segment is behind it in the same partition.
3. **Replicated reorg markers.** ``R`` markers are keyless and global,
   so the producer replicates each one into every partition at its
   stream position (``split_changelog``). The consumer (a) holds a
   marker-bearing batch back until EVERY partition's copy is inside
   the eligible set (segment-prefix truncation to a fixed point) — the
   engine's replay contract dooms everything it has seen with ``lsn >
   rollback_to_lsn``, so a copy reaching it in a later batch would
   kill the previous batch's legitimate re-emissions; (b) identifies
   copies by the marker's global emit position (replicated copies
   carry the producer's ``stream_pos`` verbatim) and hands the engine
   exactly one; and (c) re-linearizes the union batch so that
   one marker still separates every partition's pre-marker events from
   its post-marker re-emissions — each event's **marker ordinal**
   (count of marker copies before it in its own partition) assigns it
   to bucket ``2·ord``; marker ``m`` gets bucket ``2m+1``. New
   ``stream_pos`` values are minted per (bucket, partition) group —
   local rank + driver-side cumulative offsets over the tiny per-group
   counts. No global sort: the engine consults cross-partition order
   only through the bucket structure (kills act on whole buckets,
   last-writer resolution is (lsn, seq), store slices split at marker
   positions), so any within-bucket interleave is admissible.
   Marker-free batches skip the ordinal window entirely — their
   positions are ARITHMETIC (per-segment base offsets from the
   already-collected segment stats + the row's within-file index),
   zero shuffles.

The consumer's cursor (last consumed segment ids, partition heads,
applied marker ids, the position-minting counter) rides
``lineage_extra`` inside the SAME atomic commit as the data —
crash-anywhere resume re-reads it from the manifest, and the epoch
ledger (epoch id = the cursor's next position, content-deterministic)
no-ops a replayed apply. No side files.

Scale: per-run driver work is O(unconsumed segments) names + one
bounded per-segment stats collect; data work is one scan of the
eligible segments (shuffle-free position mint on the marker-free fast
path; two bounded shuffles on rare marker batches), then the ordinary
bucket-pruned apply. Nothing is per-row on the driver.
"""

from __future__ import annotations

import os
import re
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA

if TYPE_CHECKING:
    from blockchain_etl_spark.cdc.apply import CdcEngine

_PART_RE = re.compile(r"^p-(\d+)$")
_SEG_RE = re.compile(r"^seg-(\d+)\.(parquet|jsonl)$")
_SEG_PATH_RE = r"(p-\d+/seg-\d+\.(?:parquet|jsonl))"
CURSOR_KEY = "partitioned_cursor"


def split_changelog(events: DataFrame, n_parts: int) -> DataFrame:
    """Producer side: route a totally-ordered change log onto P
    partitions the way a CDC producer keys a topic — non-markers by
    ``hash(doc_id) % P`` (per-key order preserved: one key, one
    partition), ``R`` markers replicated into EVERY partition at their
    stream position. Returns the events with a ``part`` column; one
    shuffle-free projection plus a P-row explode on the (rare)
    markers."""
    parts = F.sequence(F.lit(0), F.lit(n_parts - 1))
    routed = events.withColumn(
        "part",
        F.when(
            F.col("op") == "R", parts
        ).otherwise(F.array(F.pmod(F.hash("doc_id"), F.lit(n_parts)))),
    )
    return routed.select(
        *[f.name for f in EVENT_SCHEMA.fields],
        F.explode("part").alias("part"),
    )


def write_partition_segments(
    events_with_part: DataFrame,
    landing_dir: str,
    seg_id: int,
    n_parts: int | None = None,
) -> None:
    """Land one segment per partition (``p-K/seg-NNNNNNNN.parquet``).
    Segments must be written in id order per partition — the consumer
    reads them as a contiguous prefix (the Kafka segment contract).
    Pass ``n_parts`` to pre-create every partition dir: a partition
    that happens to receive no rows must still EXIST, else the
    consumer cannot tell "quiet partition" from "partition not in the
    topic" and the safe watermark would ignore it.

    Segment files are written in EMIT ORDER (rows sorted by the
    producer's ``stream_pos``) — the Kafka broker append contract: a
    partition's log IS its arrival order, and the consumer's
    arithmetic position minting reads a row's within-file index as its
    within-segment order (see ``PartitionedTailer.run_once``)."""
    if n_parts is not None:
        for p in range(n_parts):
            os.makedirs(os.path.join(landing_dir, f"p-{p}"), exist_ok=True)
    # one scan: without the persist, the distinct() plus each
    # partition's filtered write re-executes the (possibly expensive)
    # upstream plan P+1 times
    events_with_part = events_with_part.persist()
    try:
        parts = [
            r["part"]
            for r in events_with_part.select("part").distinct().collect()
        ]
        for p in sorted(parts):
            (
                events_with_part.filter(F.col("part") == p)
                .drop("part")
                .coalesce(1)
                .sortWithinPartitions("stream_pos")
                .write.mode("overwrite")
                .parquet(
                    os.path.join(landing_dir, f"p-{p}", f"seg-{seg_id:08d}.parquet")
                )
            )
    finally:
        events_with_part.unpersist()


class PartitionedTailer:
    def __init__(
        self,
        spark: SparkSession,
        landing_dir: str,
        engine: "CdcEngine",
        marker_retain_margin: int = 1000,
        n_parts: int | None = None,
        idle_partition_rounds: int | None = None,
        bus_format: str = "native",
        row_schema=None,
    ):
        self.spark = spark
        self.landing_dir = landing_dir
        self.engine = engine
        # wire format of the segments: "native" = EVENT_SCHEMA parquet;
        # "debezium"/"maxwell" = JSONL envelope streams (a partitioned
        # Debezium topic), decoded JVM-side before gating/apply — the
        # EpochStore keeps decoded native batches, so reorg replay is
        # format-agnostic (same contract as ChangeLogTailer)
        if bus_format not in ("native", "debezium", "maxwell"):
            raise ValueError(f"unknown bus_format {bus_format!r}")
        self.bus_format = bus_format
        # envelope payload schema (schema-registry contract; see
        # ChangeLogTailer.row_schema)
        self.row_schema = row_schema
        # the Kafka max.task.idle escape hatch: a partition that has
        # contributed no NEW segment for this many consecutive polls is
        # excluded from the safe-watermark min (quiet partitions must
        # not pin the frontier forever). Liveness knob, in-memory only.
        # Risk (documented): if the idle partition later delivers
        # ordinary events below the advanced watermark, last-writer
        # tables still converge (ordinary apply accepts them) but
        # policy tables drop them as redelivery. None = strict.
        self.idle_partition_rounds = idle_partition_rounds
        self._idle_counts: dict[int, int] = {}
        # applied marker ids are pruned once safe_lsn has passed their
        # lsn by this margin (all copies of a marker at lsn L arrive in
        # batches whose safe >= L, so any margin >= the bus's landing
        # raggedness is enough; generous default, ids are tiny)
        self.marker_retain_margin = marker_retain_margin
        # fixed partition count (Kafka topics don't grow partitions
        # mid-stream); None = discover from the landing dir
        self.n_parts = n_parts

    # ---- landing discovery -------------------------------------------
    def _segments(self) -> dict[int, list[str]]:
        out: dict[int, list[str]] = {}
        if not os.path.isdir(self.landing_dir):
            return out
        for name in sorted(os.listdir(self.landing_dir)):
            m = _PART_RE.match(name)
            if not m:
                continue
            p = int(m.group(1))
            segs = sorted(
                s
                for s in os.listdir(os.path.join(self.landing_dir, name))
                if _SEG_RE.match(s)
            )
            out[p] = segs
        return out

    def _read_segs(self, paths: list[str], with_ordinal: bool = False) -> DataFrame:
        """Read segment files (native parquet or envelope JSONL) into
        EVENT_SCHEMA rows tagged with ``_seg`` (partition-relative file
        id) and ``_part``. ``with_ordinal`` additionally tags native
        rows with ``_ridx`` — the row's position INSIDE its segment
        file (parquet ``_metadata.row_index``), i.e. its broker append
        order, read straight from the scan with zero shuffles. Envelope
        formats get no ``_ridx`` (text sources expose no row index; the
        mint falls back to a per-segment rank)."""
        if self.bus_format == "native":
            df = (
                self.spark.read.schema(EVENT_SCHEMA)
                .parquet(*paths)
                .withColumn("_path", F.input_file_name())
            )
            if with_ordinal:
                df = df.withColumn(
                    "_ridx", F.col("_metadata.row_index").cast("long")
                )
        else:
            from blockchain_etl_spark.sources.envelope import DECODERS

            raw = (
                self.spark.read.text(paths)
                .withColumnRenamed("value", "_v")
                .withColumn("_path", F.input_file_name())
            )
            df = DECODERS[self.bus_format](
                raw, value_col="_v", passthrough_cols=["_path"],
                row_schema=self.row_schema,
            )
        return (
            df.withColumn("_seg", F.regexp_extract("_path", _SEG_PATH_RE, 1))
            .withColumn(
                "_part",
                F.regexp_extract("_path", r"p-(\d+)/seg-", 1).cast("int"),
            )
            .drop("_path")
        )

    # ---- cursor (stored in manifest lineage) -------------------------
    def _cursor(self) -> dict[str, Any]:
        m = self.engine.table.manifest()
        v = m.version
        while v is not None and v >= 0:
            lin = (
                m.lineage if m.version == v else self.engine.table.manifest(v).lineage
            ) or {}
            if CURSOR_KEY in lin:
                return lin[CURSOR_KEY]
            v -= 1
        return {"consumed": {}, "heads": {}, "applied_markers": []}

    def prune_consumed(self) -> dict[str, Any]:
        """Landing retention (the broker side of Kafka's log cleanup):
        delete segment files already consumed per the committed cursor.
        Safe unconditionally — consumption is transactional with the
        apply, consumed segments are never re-read, and reorg replay
        serves from the engine's EpochStore (which has its own
        retention margin), not from the landing."""
        import shutil

        cur = self._cursor()
        removed = []
        for p_str, last in cur.get("consumed", {}).items():
            pdir = os.path.join(self.landing_dir, f"p-{p_str}")
            if not os.path.isdir(pdir):
                continue
            for s in os.listdir(pdir):
                m = _SEG_RE.match(s)
                if m and int(m.group(1)) <= int(last):
                    full = os.path.join(pdir, s)
                    if os.path.isdir(full):
                        shutil.rmtree(full, ignore_errors=True)
                    else:
                        try:
                            os.remove(full)
                        except OSError:
                            pass
                    removed.append(f"p-{p_str}/{s}")
        return {"segments_removed": sorted(removed)}

    def _linked_files(
        self,
        elig: dict[int, list[str]],
        stats: dict[str, Any],
        base_pos: int,
        n_parts: int,
    ) -> dict[str, Any] | None:
        """Zero-copy store landing for a native marker-free batch: the
        data files of the eligible segments, each with the absolute
        minted base position of its first row (cumulative counts in
        (partition, segment, file-name) order — the arithmetic-mint
        order), plus the write_epoch-shaped stats aggregated from the
        per-segment stats job. Returns None when a segment's parquet
        footer row count disagrees with the decoded count (corruption —
        caller falls back to the materializing write, whose permutation
        check then fails loud) or when pyarrow is unavailable."""
        try:
            import pyarrow.parquet as pq
        except ImportError:
            return None
        files: list[dict[str, Any]] = []
        acc = base_pos
        agg: dict[str, Any] = {"lsn_min": None, "lsn_max": None, "wm": None}
        n_total = 0
        for p in range(n_parts):
            for s in elig[p]:
                key = f"p-{p}/{s}"
                segdir = os.path.join(self.landing_dir, f"p-{p}", s)
                seg_n = 0
                for fn in sorted(os.listdir(segdir)):
                    if not fn.endswith(".parquet"):
                        continue
                    fp = os.path.join(segdir, fn)
                    try:
                        n = pq.ParquetFile(fp).metadata.num_rows
                    except Exception:  # noqa: BLE001 — unreadable footer
                        return None
                    if n:
                        files.append({"src": fp, "base": acc, "n": n})
                        acc += n
                        seg_n += n
                st = stats.get(key)
                st_n = int(st["n"]) if st is not None else 0
                if seg_n != st_n:
                    return None
                n_total += seg_n
                if st is not None and st["lsn_min"] is not None:
                    agg["lsn_min"] = (
                        st["lsn_min"] if agg["lsn_min"] is None
                        else min(agg["lsn_min"], st["lsn_min"])
                    )
                    agg["lsn_max"] = (
                        st["lsn_max"] if agg["lsn_max"] is None
                        else max(agg["lsn_max"], st["lsn_max"])
                    )
                    wm = (st["wm"]["lsn"], st["wm"]["seq"])
                    if agg["wm"] is None or wm > agg["wm"]:
                        agg["wm"] = wm
        if not n_total:
            return {"files": [], "stats": {}}
        return {
            "files": files,
            "stats": {
                "pos_min": base_pos,
                "pos_max": base_pos + n_total - 1,
                "lsn_min": agg["lsn_min"],
                "lsn_max": agg["lsn_max"],
                "n": n_total,
                "watermark": {
                    "lsn": agg["wm"][0],
                    "seq": agg["wm"][1],
                    "pos": base_pos + n_total - 1,
                },
                "markers": [],
            },
        }

    # ---- one consumption round ---------------------------------------
    def run_once(self, assume_complete: bool = False) -> dict[str, Any] | None:
        """One poll-and-apply round. ``assume_complete`` is
        end-of-topic semantics: no partition will deliver anything
        further, so the safe-watermark gate is waived and every pending
        segment is consumed in positional order (equivalent to the
        totally-landed batch — marker copies are then all present by
        construction); see ``run_until_drained``."""
        cur = self._cursor()
        segs = self._segments()
        if self.n_parts is not None:
            n_parts = self.n_parts
        else:
            idxs = set(segs) | {int(p) for p in cur.get("heads", {})}
            if not idxs:
                return None
            n_parts = max(idxs) + 1
            missing = [p for p in range(n_parts) if p not in idxs]
            if missing:
                # a gap means a partition dir vanished (or an external
                # producer skipped ids) — consuming around it would
                # silently ignore data; fail loud (review round 6)
                raise ValueError(
                    f"partition dirs are not contiguous: missing p-{missing} "
                    f"of 0..{n_parts - 1} — pass n_parts explicitly if the "
                    f"topic really has {n_parts} partitions"
                )
        if n_parts == 0:
            return None
        # consumed tracks the LAST consumed segment id per partition
        # (not a prefix count): landing GC may delete old segment files
        # without skewing positional accounting
        consumed = {
            str(p): int(cur.get("consumed", {}).get(str(p), -1))
            for p in range(n_parts)
        }
        heads = {str(p): int(cur.get("heads", {}).get(str(p), -1)) for p in range(n_parts)}

        pending: dict[int, list[str]] = {}
        for p in range(n_parts):
            pending[p] = [
                s
                for s in segs.get(p, [])
                if int(_SEG_RE.match(s).group(1)) > consumed[str(p)]
            ]
        if not any(pending.values()):
            return None

        # one job: per-segment stats over every pending segment
        paths = [
            os.path.join(self.landing_dir, f"p-{p}", s)
            for p, names in pending.items()
            for s in names
        ]
        raw = self._read_segs(paths)
        # marker identity: a marker is ONE global event, and the
        # producer replicates it with the same global emit position
        # into every partition (split_changelog contract) — stream_pos
        # is the discriminator (two distinct markers can share
        # (lsn, rollback, hash): e.g. two rollbacks within one block)
        seg_marker_id = F.concat_ws(
            "|",
            F.col("stream_pos").cast("string"),
            F.col("lsn").cast("string"),
            F.coalesce(F.col("rollback_to_lsn").cast("string"), F.lit("_")),
            F.coalesce(F.col("epoch_hash"), F.lit("_")),
        )
        stats = {
            r["_seg"]: r
            for r in raw.groupBy("_seg")
            .agg(
                F.max("lsn").alias("lsn_max"),
                F.min("lsn").alias("lsn_min"),
                F.max(F.struct("lsn", "seq")).alias("wm"),
                F.count(F.lit(1)).alias("n"),
                F.collect_set(
                    F.when(F.col("op") == "R", seg_marker_id)
                ).alias("marker_ids"),
            )
            .collect()
        }

        for p in range(n_parts):
            got_new = False
            for s in pending[p]:
                key = f"p-{p}/{s}"
                if key in stats:
                    heads[str(p)] = max(heads[str(p)], stats[key]["lsn_max"])
                    got_new = True
            self._idle_counts[p] = 0 if got_new else self._idle_counts.get(p, 0) + 1

        def _counts_toward_safe(p: int) -> bool:
            if (
                self.idle_partition_rounds is not None
                and self._idle_counts.get(p, 0) >= self.idle_partition_rounds
            ):
                return False
            return True

        contributing = [
            heads[str(p)] for p in range(n_parts) if _counts_toward_safe(p)
        ]
        if not contributing and not assume_complete:
            return None  # everything pending is excluded -> nothing to gate on
        safe = min(contributing) if contributing else -1
        if safe < 0 and not assume_complete:
            return None  # some live partition has produced nothing yet

        elig: dict[int, list[str]] = {}
        for p in range(n_parts):
            take: list[str] = []
            for s in pending[p]:
                st = stats.get(f"p-{p}/{s}")
                # no stats row = the segment decoded to ZERO events
                # (e.g. an all-tombstone envelope segment) — consume it,
                # it gates nothing (a missing-row break here would block
                # the partition forever; review round 6)
                if st is not None and not assume_complete and st["lsn_max"] > safe:
                    break  # positional: an ineligible segment blocks its partition
                take.append(s)
            elig[p] = take
        if assume_complete:
            safe = max([safe] + [heads[str(p)] for p in range(n_parts)])

        # marker-copy completeness: a reorg marker may only reach the
        # engine ONCE, with every partition's pre-marker prefix already
        # consumed (the engine's replay contract treats everything seen
        # before a rollback with lsn > rollback_to_lsn as doomed — a
        # copy applied in a later batch would kill the previous batch's
        # legitimate re-emissions). So if any marker's copies are not
        # ALL inside the eligible set, hold every partition back to
        # strictly before its copy; iterate to a fixed point (a
        # truncation can orphan an earlier marker's copy). Copies are
        # guaranteed landed: an eligible copy-segment implies
        # safe >= marker lsn implies every head >= marker lsn.
        applied_ids = set(cur.get("applied_markers", []))
        changed = True
        while changed:
            changed = False
            present: dict[str, set[int]] = {}
            first_at: dict[tuple[int, str], int] = {}
            for p in range(n_parts):
                for i, s in enumerate(elig[p]):
                    st = stats.get(f"p-{p}/{s}")
                    for mid in (st["marker_ids"] if st else None) or []:
                        present.setdefault(mid, set()).add(p)
                        first_at.setdefault((p, mid), i)
            for mid, ps in present.items():
                if len(ps) < n_parts and mid not in applied_ids:
                    for p in ps:
                        cut = first_at[(p, mid)]
                        if cut < len(elig[p]):
                            elig[p] = elig[p][:cut]
                            changed = True

        eligible: list[str] = []
        for p in range(n_parts):
            for s in elig[p]:
                eligible.append(f"p-{p}/{s}")
                consumed[str(p)] = int(_SEG_RE.match(s).group(1))
        if not eligible:
            return None

        batch = self._read_segs(
            [os.path.join(self.landing_dir, e) for e in eligible],
            with_ordinal=True,
        )

        # marker ids of this batch come from the seg-stats job already
        # collected — no extra pass over the data
        batch_mids = set()
        for key in eligible:
            st = stats.get(key)
            batch_mids.update((st["marker_ids"] if st else None) or [])
        new_marker_ids = sorted(batch_mids - applied_ids)
        has_markers = bool(batch_mids)

        if has_markers:
            # marker ordinal: copies of the k-th marker share ordinal k
            # in every partition (identical marker sequence by
            # construction)
            w = (
                Window.partitionBy("_part")
                .orderBy("stream_pos")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            batch = batch.withColumn(
                "_ord",
                F.coalesce(
                    F.sum(F.when(F.col("op") == "R", 1).otherwise(0)).over(w),
                    F.lit(0),
                ),
            )
            # keep ONE copy per marker (the lowest partition's), drop
            # copies of markers already applied in earlier batches
            marker_id = F.concat_ws(
                "|",
                F.col("stream_pos").cast("string"),
                F.col("lsn").cast("string"),
                F.coalesce(F.col("rollback_to_lsn").cast("string"), F.lit("_")),
                F.coalesce(F.col("epoch_hash"), F.lit("_")),
            )
            markers = (
                batch.filter(F.col("op") == "R")
                .withColumn("_mid", marker_id)
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("_mid").orderBy("_part", "stream_pos")
                    ),
                )
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            if applied_ids:
                markers = markers.filter(~F.col("_mid").isin(list(applied_ids)))
            markers = markers.drop("_mid")
            events = batch.filter(F.col("op") != "R")
            relinear = events.withColumn("_bkt", F.col("_ord") * 2).unionByName(
                markers.withColumn("_bkt", F.col("_ord") * 2 + 1)
            )

        # mint new stream positions. The engine consults cross-partition
        # order ONLY through the marker-bucket structure (kills act on
        # whole buckets; last-writer resolution is (lsn, seq); store
        # slices split at marker positions) — so WITHIN a bucket any
        # interleave is admissible and no global sort is needed: local
        # rank per (bucket, partition) group + driver-side cumulative
        # offsets over the (tiny) per-group counts. No range shuffle, no
        # sampling, deterministic by construction. The base comes from
        # the cursor's own next_pos counter — NOT the committed
        # watermark pos, which does not advance when a batch carries
        # only post-reorg re-emissions below the standing (lsn, seq)
        # watermark, and a stalled base would mint a duplicate epoch id
        # that the ledger then skips forever.
        base_pos = int(cur.get("next_pos", 0))
        # evolved payload columns decoded via row_schema flow through
        # the mint into the engine's mergeSchema apply (same contract
        # as ChangeLogTailer) — project EVENT_SCHEMA plus any extra
        # decoded columns, never the fixed EVENT_SCHEMA list alone
        _helpers = {"_seg", "_part", "_ridx", "_bkt", "_ord", "_lrk"}
        ev_names = [f.name for f in EVENT_SCHEMA.fields]
        extra_cols = [
            c for c in batch.columns
            if c not in _helpers and c not in ev_names
        ]
        if not has_markers:
            # marker-free (the overwhelmingly common batch): positions
            # are ARITHMETIC — no rank, no shuffle, no checkpoint. The
            # bus contract fixes within-partition order (segments in id
            # order, rows within a segment in broker append order), so
            # the global position of a row is
            #   base_pos + seg_base(_seg) + within-segment ordinal
            # with seg_base the cumulative eligible-segment counts in
            # (partition, segment-id) order — the per-segment counts
            # came back with the stats job already collected, one tiny
            # broadcast row per segment. This assigns EXACTLY the
            # (part, stream_pos)-rank permutation the old two-phase
            # global rank computed (a range exchange + eager
            # localCheckpoint + window + offsets join), at scan cost.
            # The ordinal is the parquet row index for native segments
            # (zero extra work); envelope segments rank within their
            # segment only — one bounded hash exchange keyed _seg.
            bases, acc = [], 0
            for p in range(n_parts):
                for s in elig[p]:
                    key = f"p-{p}/{s}"
                    st = stats.get(key)
                    bases.append((key, acc))
                    acc += int(st["n"]) if st is not None else 0
            base_df = F.broadcast(
                self.spark.createDataFrame(bases, "_seg string, _goff long")
            )
            if "_ridx" in batch.columns:
                ordered = batch
            else:
                w_seg = Window.partitionBy("_seg").orderBy("stream_pos")
                ordered = batch.withColumn(
                    "_ridx", F.row_number().over(w_seg).cast("long") - 1
                )
            out = ordered.join(base_df, "_seg").select(
                (F.col("_goff") + F.col("_ridx") + F.lit(base_pos))
                .cast("long")
                .alias("stream_pos"),
                *[c for c in ev_names if c != "stream_pos"],
                *extra_cols,
            )
        else:
            # marker batches (rare, bounded by the holdback): local
            # rank per (bucket, partition) group + driver-side offsets
            wloc = Window.partitionBy("_bkt", "_part").orderBy("stream_pos")
            local = relinear.withColumn("_lrk", F.row_number().over(wloc))
            counts = sorted(
                (
                    (r["_bkt"], r["_part"], r["n"])
                    for r in relinear.groupBy("_bkt", "_part")
                    .agg(F.count("*").alias("n"))
                    .collect()
                )
            )
            offsets, acc = [], 0
            for bkt, prt, n in counts:
                offsets.append((bkt, prt, acc))
                acc += n
            off_df = F.broadcast(
                self.spark.createDataFrame(
                    offsets, "_bkt long, _part int, _goff long"
                )
            )
            out = local.join(off_df, ["_bkt", "_part"]).select(
                (F.col("_goff") + F.col("_lrk") - 1 + F.lit(base_pos))
                .cast("long")
                .alias("stream_pos"),
                *[c for c in ev_names if c != "stream_pos"],
                *extra_cols,
            )

        epoch_id = base_pos  # content-deterministic: min new stream_pos
        keep_ids = [
            i
            for i in sorted(applied_ids | set(new_marker_ids))
            if int(i.split("|")[1]) >= safe - self.marker_retain_margin
        ]
        if self.engine.epoch_store is not None:
            store = self.engine.epoch_store
            if str(epoch_id) not in store._index():
                linked = None
                if self.bus_format == "native" and not has_markers:
                    # zero-copy landing: the eligible segment files are
                    # already the minted epoch in columnar form (their
                    # positions are base + row_index by the arithmetic
                    # mint), so HARDLINK them into the store instead of
                    # decoding + re-encoding 100% of the batch's bytes
                    # through a Spark write. Per-file row counts come
                    # from the parquet footers (driver-side, no data
                    # pages); the footer-vs-decode count cross-check
                    # below replaces the old rank-permutation detector
                    # (arithmetic positions are a permutation by
                    # construction when the counts agree).
                    linked = self._linked_files(elig, stats, base_pos, n_parts)
                if linked is not None and linked["files"]:
                    st = store.link_epoch(
                        epoch_id, linked["files"], EVENT_SCHEMA,
                        stats=linked["stats"],
                    )
                else:
                    st = store.write_epoch(epoch_id, out)
            else:
                st = store.epoch_stats(epoch_id)
            out = store.read_epoch(epoch_id)
            n_batch = int(st["n"]) if st else 0
            # free corruption detector: minted positions must be the
            # exact permutation [base, base+n) — a broken mint
            # shows up here before it can scramble reorg linearization
            if st and n_batch and (
                st["pos_min"] != base_pos or st["pos_max"] != base_pos + n_batch - 1
            ):
                raise RuntimeError(
                    f"minted stream positions are not a permutation: "
                    f"[{st['pos_min']}, {st['pos_max']}] != "
                    f"[{base_pos}, {base_pos + n_batch - 1}]"
                )
        else:
            n_batch = out.count()
        cursor = {
            "consumed": consumed,
            "heads": heads,
            "applied_markers": keep_ids,
            "safe_lsn": safe,
            # advance past this batch even when it is empty (every
            # copy of its markers was already applied): the +1 keeps
            # the next batch's epoch id distinct from this one's
            "next_pos": base_pos + max(n_batch, 1),
        }
        metrics = self.engine.apply_epoch(
            out, epoch_id, lineage_extra={CURSOR_KEY: cursor}
        )
        if metrics is not None:
            metrics["safe_lsn"] = safe
            metrics["segments_consumed"] = len(eligible)
            metrics["partitions"] = n_parts
        return metrics

    def run_until_drained(
        self, max_rounds: int = 1000, final: bool = True
    ) -> list[dict[str, Any]]:
        """Apply until nothing more is eligible. ``final=True`` is
        end-of-topic catch-up: once a strict round makes no progress,
        the remaining rounds run with ``assume_complete`` — the tail of
        a finite stream is otherwise unconsumable, because the very
        last segments' heads define the safe watermark and no future
        data will ever lift the minimum (the terminal form of the
        idle-partition stall). Continuous consumers poll ``run_once``
        (strict) instead."""
        out = []
        relaxed = False
        for _ in range(max_rounds):
            m = self.run_once(assume_complete=relaxed)
            if m is None:
                if final and not relaxed:
                    relaxed = True
                    continue
                return out
            out.append(m)
        return out
