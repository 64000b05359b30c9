"""`table_changes` — a native Python DataSource (Spark 4 DataSource API)
that tails a SnapshotTable's change feed as a Structured Streaming
source (the Delta ``readChangeFeed`` streaming shape; ≙ the reference's
downstream consumers tailing the previous job's Postgres table).

Offsets ARE table versions: ``latestOffset`` probes ``manifests/LATEST``
(one tiny file read — the chain-height probe of the table world),
optionally clamped by ``max_versions_per_batch`` (pacing = per-commit
attribution: with clamp 1, each micro-batch is exactly one upstream
commit's diff). Spark's checkpoint persists the version cursor, so
restart/replay re-plans the same immutable version range and exactly-once
composes with the engine's ledger downstream.

The diff itself runs EXECUTOR-SIDE, partitioned by bucket: each input
partition carries the two versions' file lists for one bucket (buckets
partition the key space, so a bucket's diff is self-contained), and the
reader loads both sides with pyarrow, resolves merge-on-read last-writer
per key, and emits the same insert / update_preimage / update_postimage /
delete rows ``SnapshotTable.read_changes`` computes — verified equal in
tests. Only buckets whose file sets differ become partitions, so a
commit touching k of B buckets plans k readers (manifest file-diff
pruning, driver-side).

Schema evolution: files are conformed to the range-end schema at read
time (missing columns null-backfill, same as the batch path — pandas
reindex per file). Limitation: a range spanning a ``rebucket`` falls
back to ONE partition holding all files (bucket ids pair differently
across the layout change).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_META = ["lsn", "seq", "updated_epoch", "deleted"]


@dataclass
class BucketDiff(InputPartition):
    a_files: list[str] = field(default_factory=list)
    b_files: list[str] = field(default_factory=list)
    v0: int = 0
    v1: int = 0
    key: str = "doc_id"
    schema_json: str = ""
    policies_json: str = "{}"


def _load_resolved(files: list[str], schema, key: str, policies: dict | None = None):
    """Read a bucket's base+delta files and collapse to one row per key
    — the pandas twin of SnapshotTable._resolve_last_writer: last-writer
    by (lsn, seq, updated_epoch) max (ties are value-identical by the
    engine's redelivery contract), with column merge POLICIES folded the
    same way the Spark resolver folds them (add = sum of every delta,
    first/last = earliest/newest non-null by commit order)."""
    import pandas as pd
    import pyarrow.parquet as pq

    cols = [f.name for f in schema.fields]
    if not files:
        return pd.DataFrame(columns=cols)
    frames = [pq.read_table(p).to_pandas() for p in files]
    # schema-on-read conformance: files written under older schema
    # versions lack newer payload columns — null-backfill them (the
    # pandas twin of the batch reader's conform())
    df = pd.concat(frames, ignore_index=True).reindex(columns=cols)
    order = [c for c in ("lsn", "seq", "updated_epoch") if c in df.columns]
    # na_position="first": a null order column must LOSE ties, matching
    # the Spark resolver's struct-max where null sorts smallest — pandas'
    # default (NaN last) would let a null updated_epoch WIN and diverge
    # from SnapshotTable._resolve_last_writer on mixed-null ties.
    df = df.sort_values(order, kind="stable", na_position="first")
    winner = df.drop_duplicates(key, keep="last")
    pol = {c: p for c, p in (policies or {}).items() if c in df.columns}
    if not pol:
        return winner
    winner = winner.set_index(key)
    g = df.groupby(key, sort=False)
    from blockchain_etl_spark.functions.hist import hist_bins, hist_fold_pandas
    from blockchain_etl_spark.functions.sketch import kmv_fold_pandas, kmv_k

    for c, p in pol.items():
        if (k := kmv_k(p)) is not None:
            winner[c] = g[c].agg(lambda s, _k=k: kmv_fold_pandas(s, _k))
        elif hist_bins(p) is not None:
            winner[c] = g[c].agg(hist_fold_pandas)
        elif p == "add":
            winner[c] = g[c].sum(min_count=1)
        elif p == "min":
            winner[c] = g[c].min()
        elif p == "max":
            winner[c] = g[c].max()
        elif p == "first":
            winner[c] = g[c].agg(
                lambda s: s.dropna().iloc[0] if s.dropna().size else None
            )
        else:  # last non-null by commit order (df is order-sorted)
            winner[c] = g[c].agg(
                lambda s: s.dropna().iloc[-1] if s.dropna().size else None
            )
    return winner.reset_index()


def _diff_rows(part: BucketDiff):
    schema = T.StructType.fromJson(json.loads(part.schema_json))
    pol = json.loads(part.policies_json or "{}")
    cols = [f.name for f in schema.fields]
    payload = [c for c in cols if c != part.key and c != "updated_epoch"]
    a = _load_resolved(part.a_files, schema, part.key, pol).set_index(part.key, drop=False)
    b = _load_resolved(part.b_files, schema, part.key, pol).set_index(part.key, drop=False)

    def norm(v):
        # arrays → tuples so equality is by value; NaN/None unified
        import numpy as np

        if isinstance(v, (list, tuple, np.ndarray)):
            return tuple(v)
        if v is None or (isinstance(v, float) and v != v):
            return None
        return v

    def row_out(ctype, row, commit):
        vals = [norm(row[c]) for c in cols]
        # array columns back to lists for Spark
        out = [list(v) if isinstance(v, tuple) else v for v in vals]
        return tuple([ctype] + out + [commit[0], commit[1], part.v0, part.v1])

    keys = set(a.index) | set(b.index)
    for k in sorted(keys):
        ra = a.loc[k] if k in a.index else None
        rb = b.loc[k] if k in b.index else None
        live_a = ra is not None and not bool(ra["deleted"])
        live_b = rb is not None and not bool(rb["deleted"])
        commit = (
            (int(rb["lsn"]), int(rb["seq"])) if rb is not None else (None, None)
        )
        if live_b and not live_a:
            yield row_out("insert", rb, commit)
        elif live_a and not live_b:
            yield row_out("delete", ra, commit)
        elif live_a and live_b:
            changed = any(norm(ra[c]) != norm(rb[c]) for c in payload)
            if changed:
                yield row_out("update_preimage", ra, commit)
                yield row_out("update_postimage", rb, commit)


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.start_version = int(options.get("start_version", 0))
        self.max_versions = int(options.get("max_versions_per_batch", 0))

    # -- driver-side manifest helpers (plain file IO, no SparkSession) --
    def _current_version(self) -> int:
        with open(os.path.join(self.path, "manifests", "LATEST")) as f:
            return int(f.read().strip())

    def _manifest(self, v: int) -> dict:
        with open(
            os.path.join(self.path, "manifests", f"v{v:08d}.json")
        ) as f:
            return json.load(f)

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        tip = self._current_version()
        if self.max_versions <= 0:
            return {"version": tip}
        cur = getattr(self, "_last", self.start_version)
        return {"version": max(cur, min(tip, cur + self.max_versions))}

    def partitions(self, start: dict, end: dict):
        # fold BOTH range ends into the cursor floor: on recovery Spark
        # replays the last batch's partitions() before asking for a new
        # latestOffset, and folding start means even a batch whose end we
        # never see committed still pins the floor at the checkpointed
        # start — latestOffset can then never propose an end below it.
        self._last = max(
            getattr(self, "_last", self.start_version),
            start["version"],
            end["version"],
        )
        v0, v1 = start["version"], end["version"]
        if v1 <= v0:
            return [BucketDiff(v0=v0, v1=v0, schema_json=self._schema_json(v0))]
        m0, m1 = self._manifest(v0), self._manifest(v1)
        sj = self._schema_json(v1)  # range-END schema; older files conform
        pj = json.dumps(m1.get("policies") or {})
        key = m1["key"]
        by_bucket: dict[int, tuple[list, list]] = {}
        if m0["n_buckets"] != m1["n_buckets"]:
            # rebucket inside the range: bucket ids pair differently —
            # one partition holds everything (rare, layout-change only)
            a = [os.path.join(self.path, f["path"]) for f in m0["files"]]
            b = [os.path.join(self.path, f["path"]) for f in m1["files"]]
            return [BucketDiff(a, b, v0, v1, key, sj, pj)]
        for f in m0["files"]:
            by_bucket.setdefault(f["bucket"], ([], []))[0].append(f["path"])
        for f in m1["files"]:
            by_bucket.setdefault(f["bucket"], ([], []))[1].append(f["path"])
        parts = []
        for bkt, (af, bf) in sorted(by_bucket.items()):
            if af == bf:
                continue  # identical file set → identical logical state
            parts.append(
                BucketDiff(
                    [os.path.join(self.path, p) for p in af],
                    [os.path.join(self.path, p) for p in bf],
                    v0, v1, key, sj, pj,
                )
            )
        return parts or [BucketDiff(v0=v0, v1=v1, key=key, schema_json=sj, policies_json=pj)]

    def _schema_json(self, v: int) -> str:
        m = self._manifest(v)
        return m["schemas"][str(m["schema_version"])]

    def read(self, partition: BucketDiff):
        if partition.v1 <= partition.v0:
            return iter(())
        return _diff_rows(partition)

    def commit(self, end: dict) -> None:
        self._last = max(getattr(self, "_last", self.start_version), end["version"])


class TableChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self):
        path = self.options["path"]
        with open(os.path.join(path, "manifests", "LATEST")) as f:
            v = int(f.read().strip())
        with open(os.path.join(path, "manifests", f"v{v:08d}.json")) as f:
            m = json.load(f)
        table_schema = T.StructType.fromJson(
            json.loads(m["schemas"][str(m["schema_version"])])
        )
        return T.StructType(
            [T.StructField("_change_type", T.StringType(), False)]
            + list(table_schema.fields)
            + [
                T.StructField("_commit_lsn", T.LongType(), True),
                T.StructField("_commit_seq", T.IntegerType(), True),
                T.StructField("_from_version", T.IntegerType(), False),
                T.StructField("_to_version", T.IntegerType(), False),
            ]
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return TableChangesStreamReader(self.options)
