"""Durable ordered change-log store, written in epoch-sized parquet files.

This is the engine's WAL retention (≙ the reference's Redis stream bus +
CSV files, ``blockchainetl/cli/dump.py`` + ``load.py``): the tail loop
appends epochs; the reorg path reads back slices by ``stream_pos`` to
replay from the last checkpointed LSN. An ``index.json`` maps epoch →
(stream_pos, lsn) ranges so slice reads open only the overlapping files
(file-level pruning before Spark ever lists anything).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.tables.schema_util import conform, merge_schemas


class EpochStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _index_path(self) -> str:
        return os.path.join(self.path, "index.json")

    def _index(self) -> dict[str, dict[str, Any]]:
        try:
            with open(self._index_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _write_index(self, idx: dict[str, dict[str, Any]]) -> None:
        tmp = self._index_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(idx, f, sort_keys=True)
        os.replace(tmp, self._index_path())

    def epoch_ids(self, include_pruned: bool = False) -> list[int]:
        return sorted(
            int(k)
            for k, m in self._index().items()
            if include_pruned or not m.get("pruned")
        )

    def write_epoch(self, epoch_id: int, events_df: DataFrame) -> dict[str, Any]:
        """Land one epoch. Stats (offsets, watermark, reorg markers) are
        collected by an Observation on the SAME write job — one pass over
        the data, and the engine can then apply the epoch without its own
        pre-scan (the stats play the role Kafka topic metadata plays for
        a real bus)."""
        from pyspark.sql import Observation

        out = os.path.join(self.path, f"epoch-{epoch_id:08d}.parquet")
        schema = events_df.schema
        obs = Observation()
        observed = events_df.observe(
            obs,
            F.min("stream_pos").alias("pos_min"),
            F.max("stream_pos").alias("pos_max"),
            F.min("lsn").alias("lsn_min"),
            F.max("lsn").alias("lsn_max"),
            F.max(F.struct("lsn", "seq")).alias("wm_ls"),
            F.count(F.lit(1)).alias("n"),
            F.collect_list(
                F.when(
                    F.col("op") == "R",
                    F.struct("stream_pos", "lsn", "rollback_to_lsn"),
                )
            ).alias("markers"),
        )
        observed.write.mode("overwrite").parquet(out)
        from blockchain_etl_spark.observe import observed_get

        got = observed_get(obs)
        if got is None:
            # an empty epoch landing: the write plan collapsed to an
            # empty relation and the observe node never ran (see
            # observe.py) — the aggregate over zero rows is known.
            got = {"pos_min": None, "pos_max": None, "lsn_min": None,
                   "lsn_max": None, "wm_ls": None, "n": 0, "markers": []}
        stats = {
            "pos_min": got["pos_min"],
            "pos_max": got["pos_max"],
            "lsn_min": got["lsn_min"],
            "lsn_max": got["lsn_max"],
            "n": got["n"],
            "watermark": (
                {
                    "lsn": got["wm_ls"]["lsn"],
                    "seq": got["wm_ls"]["seq"],
                    "pos": got["pos_max"],
                }
                if got["n"]
                else None
            ),
            "markers": sorted(
                (
                    {
                        "stream_pos": r["stream_pos"],
                        "lsn": r["lsn"],
                        "rollback_to_lsn": r["rollback_to_lsn"],
                    }
                    for r in got["markers"]
                ),
                key=lambda r: r["stream_pos"],
            ),
        }
        idx = self._index()
        idx[str(epoch_id)] = {
            "file": f"epoch-{epoch_id:08d}.parquet",
            "schema": json.dumps(schema.jsonValue()),
            **stats,
        }
        self._write_index(idx)
        return stats

    def link_epoch(
        self,
        epoch_id: int,
        files: list[dict[str, Any]],
        schema: T.StructType,
        stats: dict[str, Any],
    ) -> dict[str, Any]:
        """Land an epoch WITHOUT rewriting its bytes: hardlink (or, across
        filesystems, byte-copy) already-immutable parquet files into the
        store and record, per file, the stream-position BASE of its first
        row. ``read_epoch`` reconstructs ``stream_pos = base + row_index``
        at scan time — the arithmetic-mint contract of the partitioned
        consumer's marker-free path, where rows inside a file are in
        emit order and the caller computed each file's base from the
        segment counts. The store thus never pays a decode+re-encode of
        data the producer already landed in columnar form (the epoch is
        durable the moment the links exist; source deletion cannot
        un-land it — links hold their own inode reference).

        ``files``: [{"src": abs path, "base": int | None, "n": row
        count}] in consumption order — ``base: None`` means the file's
        own ``stream_pos`` column is already the epoch's positions (the
        single-log tail shape: landed epoch files need no mint) and the
        read is a plain scan. ``stats`` must carry the same keys
        ``write_epoch`` computes (n, pos/lsn bounds, watermark, markers
        — the caller's stats job already aggregated them)."""
        import shutil

        d = f"epoch-{epoch_id:08d}-linked"
        dabs = os.path.join(self.path, d)
        os.makedirs(dabs, exist_ok=True)
        linked: list[dict[str, Any]] = []
        for i, f in enumerate(files):
            name = f"f-{i:06d}-{os.path.basename(f['src'])}"
            dst = os.path.join(dabs, name)
            if not os.path.exists(dst):
                try:
                    os.link(f["src"], dst)
                except OSError:  # cross-device or FS without links
                    shutil.copy2(f["src"], dst)
            linked.append(
                {
                    "path": f"{d}/{name}",
                    "base": int(f["base"]) if f.get("base") is not None else None,
                    "n": int(f["n"]),
                }
            )
        idx = self._index()
        idx[str(epoch_id)] = {
            "linked": linked,
            "schema": json.dumps(schema.jsonValue()),
            **stats,
        }
        self._write_index(idx)
        return idx[str(epoch_id)]

    def link_native_epoch(
        self, epoch_id: int, src_path: str, schema: T.StructType
    ) -> dict[str, Any] | None:
        """Zero-copy landing of an already-positioned native epoch (a
        landed parquet file/dir whose rows carry their final
        ``stream_pos``): ONE narrow stats aggregation — the same
        aggregate ``write_epoch`` observes, over pruned columns — plus
        hardlinks, instead of decoding and re-encoding every payload
        byte through a Spark write. Returns the landed stats, or None
        when the source has no parquet data files (caller falls back to
        ``write_epoch``)."""
        files: list[dict[str, Any]] = []
        if os.path.isdir(src_path):
            for dirpath, _dirs, fns in os.walk(src_path):
                for fn in sorted(fns):
                    if fn.endswith(".parquet"):
                        files.append(
                            {"src": os.path.join(dirpath, fn), "base": None, "n": 0}
                        )
        elif src_path.endswith(".parquet"):
            files.append({"src": src_path, "base": None, "n": 0})
        if not files:
            return None
        df = self.spark.read.schema(schema).parquet(src_path)
        row = df.agg(
            F.min("stream_pos").alias("pos_min"),
            F.max("stream_pos").alias("pos_max"),
            F.min("lsn").alias("lsn_min"),
            F.max("lsn").alias("lsn_max"),
            F.max(F.struct("lsn", "seq")).alias("wm_ls"),
            F.count(F.lit(1)).alias("n"),
            F.collect_list(
                F.when(
                    F.col("op") == "R",
                    F.struct("stream_pos", "lsn", "rollback_to_lsn"),
                )
            ).alias("markers"),
        ).first()
        if not row["n"]:
            return None  # empty epoch: the plain write path handles it
        stats = {
            "pos_min": row["pos_min"],
            "pos_max": row["pos_max"],
            "lsn_min": row["lsn_min"],
            "lsn_max": row["lsn_max"],
            "n": row["n"],
            "watermark": {
                "lsn": row["wm_ls"]["lsn"],
                "seq": row["wm_ls"]["seq"],
                "pos": row["pos_max"],
            },
            "markers": sorted(
                (
                    {
                        "stream_pos": r["stream_pos"],
                        "lsn": r["lsn"],
                        "rollback_to_lsn": r["rollback_to_lsn"],
                    }
                    for r in row["markers"]
                ),
                key=lambda r: r["stream_pos"],
            ),
        }
        return self.link_epoch(epoch_id, files, schema, stats)

    def epoch_stats(self, epoch_id: int) -> dict[str, Any] | None:
        return self._index().get(str(epoch_id))

    def _schema_of(self, meta: dict[str, Any]) -> T.StructType:
        return T.StructType.fromJson(json.loads(meta["schema"]))

    def _read_meta(self, meta: dict[str, Any]) -> DataFrame:
        """One epoch's rows. Linked epochs (``link_epoch``) reconstruct
        ``stream_pos`` arithmetically: per-file base + the row's parquet
        ``_metadata.row_index`` — a projection on the scan, no shuffle;
        the base rides a broadcast keyed by the (collision-free, uuid-
        bearing) file NAME."""
        schema = self._schema_of(meta)
        if "linked" not in meta:
            return self.spark.read.schema(schema).parquet(
                os.path.join(self.path, meta["file"])
            )
        paths = [os.path.join(self.path, f["path"]) for f in meta["linked"]]
        if all(f["base"] is None for f in meta["linked"]):
            # un-minted linked epoch (single-log tail): the files carry
            # their own stream_pos — plain scan, no projection
            return self.spark.read.schema(schema).parquet(*paths)
        bases = [
            (os.path.basename(f["path"]), int(f["base"])) for f in meta["linked"]
        ]
        base_df = F.broadcast(
            self.spark.createDataFrame(bases, "_fname string, _fbase long")
        )
        df = (
            self.spark.read.schema(schema)
            .parquet(*paths)
            .withColumn("_fname", F.col("_metadata.file_name"))
            .withColumn("_ridx", F.col("_metadata.row_index").cast("long"))
        )
        return df.join(base_df, "_fname").select(
            *[
                (
                    (F.col("_fbase") + F.col("_ridx")).cast("long").alias("stream_pos")
                    if fld.name == "stream_pos"
                    else F.col(fld.name)
                )
                for fld in schema.fields
            ]
        )

    def read_epoch(self, epoch_id: int) -> DataFrame:
        return self._read_meta(self._index()[str(epoch_id)])

    def slice_metas(
        self,
        pos_lo: int,
        pos_hi: int,
        min_lsn_exclusive: int | None = None,
        skip_pruned: bool = False,
    ) -> list[dict[str, Any]]:
        """Index entries of LIVE epochs overlapping the slice. With
        ``min_lsn_exclusive``, epochs whose every event is at or below
        the bound are skipped without opening a file — the lag-window
        read opens O(lag / epoch span) files, not O(history). Empty
        epochs (no events, null ranges) never match.

        A PRUNED epoch that would have matched both filters means the
        caller's read reaches below the retention horizon — fail-loud
        by default, never a silent gap in the replay. Callers that
        deliberately operate on the retained window only (offline
        reconcile) pass ``skip_pruned=True``."""
        out: list[dict[str, Any]] = []
        for k, m in self._index().items():
            if m["pos_max"] is None:  # empty epoch: nothing to read
                continue
            if not (m["pos_max"] > pos_lo and m["pos_min"] < pos_hi):
                continue
            if min_lsn_exclusive is not None and m["lsn_max"] <= min_lsn_exclusive:
                continue
            if m.get("pruned"):
                if skip_pruned:
                    continue
                raise RuntimeError(
                    f"epoch {k} (pos {m['pos_min']}..{m['pos_max']}, "
                    f"lsn {m['lsn_min']}..{m['lsn_max']}) was pruned below the "
                    f"retention horizon — the requested slice cannot be replayed"
                )
            out.append(m)
        return out

    def index_markers(self, pos_hi: int | None = None) -> list[dict[str, Any]]:
        """All reorg markers ever landed, straight from the index —
        zero data files opened. Markers survive epoch pruning (they are
        tiny and retention keeps them in the index), so liveness
        filtering over the retained window never loses a kill."""
        out: list[dict[str, Any]] = []
        for m in self._index().values():
            for mk in m.get("markers", ()):
                if pos_hi is None or mk["stream_pos"] < pos_hi:
                    out.append(dict(mk))
        out.sort(key=lambda r: r["stream_pos"])
        return out

    def prune(self, upto_lsn: int) -> dict[str, Any]:
        """Retention GC (≙ the reference's ledger TTL + ack'd stream
        consumption): delete the data files of epochs whose EVERY event
        is at or below ``upto_lsn``. The index entry stays — minus the
        file — flagged ``pruned`` with its pos/lsn ranges and markers, so
        later reads below the horizon fail loud instead of silently
        missing events, and marker history stays available for free.

        Callers pick the horizon: a lagged tailer prunes at the
        finalized watermark minus its redelivery margin; a direct-ingest
        deployment prunes below its reorg window."""
        idx = self._index()
        pruned: list[int] = []
        for k, m in idx.items():
            # empty epochs (lsn_max None) carry no replayable events —
            # always prunable; a None comparison would otherwise crash
            if m.get("pruned") or (
                m["lsn_max"] is not None and m["lsn_max"] > upto_lsn
            ):
                continue
            import shutil

            if "linked" in m:
                # linked epochs share one store dir — drop it whole
                for d in {os.path.dirname(f["path"]) for f in m["linked"]}:
                    shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
                m.pop("linked", None)
            else:
                fp = os.path.join(self.path, m["file"])
                if os.path.exists(fp):
                    (shutil.rmtree if os.path.isdir(fp) else os.remove)(fp)
                m.pop("file", None)
            m.pop("schema", None)
            m["pruned"] = True
            pruned.append(int(k))
        if pruned:
            self._write_index(idx)
        return {"pruned_epochs": sorted(pruned), "upto_lsn": upto_lsn}

    def read_slice(
        self,
        pos_lo: int,
        pos_hi: int,
        min_lsn_exclusive: int | None = None,
        skip_pruned: bool = False,
        metas: list[dict[str, Any]] | None = None,
    ) -> DataFrame | None:
        """Events with pos_lo < stream_pos < pos_hi, pruned by epoch range
        (and, with ``min_lsn_exclusive``, by epoch lsn range — see
        ``slice_metas``). Callers that already ran ``slice_metas`` with
        the same bounds pass the result via ``metas`` to skip a second
        index scan.

        Epochs written under different (evolved) schemas are read with
        their own schema and conformed to the merged one."""
        if metas is None:
            metas = self.slice_metas(pos_lo, pos_hi, min_lsn_exclusive, skip_pruned)
        if not metas:
            return None
        merged = self._schema_of(metas[0])
        for m in metas[1:]:
            merged, _ = merge_schemas(merged, self._schema_of(m))
        parts = []
        by_schema: dict[str, list[str]] = {}
        for m in metas:
            if "linked" in m:
                # linked epochs need their per-file stream_pos projection
                parts.append(conform(self._read_meta(m), merged))
            else:
                by_schema.setdefault(m["schema"], []).append(
                    os.path.join(self.path, m["file"])
                )
        for sj, files in by_schema.items():
            df = self.spark.read.schema(
                T.StructType.fromJson(json.loads(sj))
            ).parquet(*files)
            parts.append(conform(df, merged))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.filter((F.col("stream_pos") > pos_lo) & (F.col("stream_pos") < pos_hi))
