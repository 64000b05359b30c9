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
  join over A's live state. This leg is O(A) in the worst case — the
  documented cost of not keeping a secondary index on the join column;
  it runs only on hops where the dim actually changed. (The upgrade
  path is a (join_value, fact_id) pair MV — see aggregate_mv — used as
  the secondary index; not built until a workload needs it.)
- Both legs' outputs pre-fold by tuple hash (map-side combined) before
  one blind MOR delta append.

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


def _sign():
    return F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))


def _tuple_hash(cols: list[str]):
    return F.md5(
        F.concat_ws(_SEP, *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
        ])
    )


class JoinMV:
    """Incremental ``fact ⋈ dim`` on ``fact.<join_col> = dim.<key>``
    (inner join; null join values never match, like SQL). Output
    tuples carry the fact key, the join column, and the selected
    payload columns from each side (names must be disjoint)."""

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
            )
        self.mv = t
        self.engine = CdcEngine(spark, t, collect_metrics=False)

    # ------------------------------------------------------------ cursors
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
        legs = []
        if a1 > a0:
            d_a = self.fact.read_changes(a0, a1).filter(
                F.col(self.join_col).isNotNull()
            )
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
            d_b = self.dim.read_changes(b0, b1)
            a_new = read_state(self.fact, version=a1).filter(
                F.col(self.join_col).isNotNull()
            )
            legs.append(
                self._out(
                    a_new.alias("f"), F.broadcast(d_b.alias("d")), _sign()
                )
            )
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
        digest = hashlib.md5(f"joinmv-{a0}-{a1}-{b0}-{b1}".encode()).digest()
        epoch_id = int.from_bytes(digest[:8], "big") >> 1
        metrics = self.engine.apply_epoch(
            ev,
            epoch_id=epoch_id,
            lineage_extra={
                "join_a_to": a1, "join_a_from": a0,
                "join_b_to": b1, "join_b_from": b0,
            },
        )
        self._commit_cursor(a1, b1)
        return metrics if metrics is not None else {"deduped_range": [a0, a1, b0, b1]}

    def state(self) -> DataFrame:
        """Live join tuples (multiplicity > 0), one row per tuple."""
        from blockchain_etl_spark.cdc.apply import read_state

        return read_state(self.mv).filter(F.col("n_rows") > 0).select(
            *self.out_cols
        )
