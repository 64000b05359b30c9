"""Incrementally-maintained MIN/MAX aggregate MV — the non-subtractable
half of the differential-aggregate family.

``aggregate_mv.py`` maintains SUM/COUNT groups purely from signed
deltas because those folds are subtractable: a retraction is just a
negative contribution. MIN/MAX are not — when the retracted value IS
the group's current extremum, the next-best value is simply not
derivable from the delta, only from the group's remaining rows. The
textbook treatment (differential dataflow / Materialize hierarchical
reduce, DBSP non-linear operators, Flink's retract-amenable
``MinWithRetractAggFunction``) keeps per-group auxiliary state; the
engine's shape for "the group's remaining rows, readable by group" is
the :class:`~blockchain_etl_spark.streaming.join_mv._SideIndex` — a
Z-set replica hash-bucketed by the GROUP value, maintained from the
same change feed.

Per hop (upstream version range (v0, v1]):

1. Catch the group-keyed index up to v1 (signed tuple fold, O(Δ)).
2. One map-side-combined aggregation over the CDF slice classifies
   every TOUCHED group: signed row-count delta, min/max over inserted
   values, min/max over retracted values.
3. Read the MV's current rows for the touched groups only (bucket-
   pruned point reads on the MV's own key layout).
4. **Fold or re-derive, per group**: if every retracted value lies
   strictly inside the folded extrema (``ret_min > new_min AND
   ret_max < new_max`` after folding inserts into the old state), the
   fold is exact — O(1) per group, no index read. Otherwise (the
   retraction MAY have been the extremum — equality included, since
   multiplicity is unknown) the group re-derives from the index:
   bucket-pruned probe of exactly the affected groups' buckets,
   re-aggregating only those groups' live rows.
5. Upsert the recomputed groups (count 0 → tombstone) through the
   ordinary engine apply, ``lsn = v1`` (the cascade version-domain
   rule), cursor in the commit lineage — exactly-once, crash-safe.

Scale: everything is O(changed rows + touched groups + re-derive
groups' index buckets); no hop ever rescans the source, and the only
shuffles are the delta aggregation and the touched-group join, both
keyed on the group. The index doubles storage of (group, value) — the
price every retract-capable min/max implementation pays in some form.

The reference computes these shapes by re-running grouped SQL per poll
(e.g. min/max block stats, ``eth_token_holder_adapter`` balance
extremes); here they are maintained, never recomputed.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.streaming.aggregate_mv import NULL_GROUP


class MinMaxAggMV:
    def __init__(
        self,
        spark: SparkSession,
        source,
        root: str,
        group_col: str,
        value_col: str,
        n_buckets: int = 8,
    ):
        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.streaming.join_mv import _SideIndex
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.spark = spark
        self.source = source
        self.group_col = group_col
        self.value_col = value_col
        # the index keys off a DERIVED string column: coalesce(group,
        # NULL_GROUP sentinel) cast to string. Two correctness reasons
        # (review round 6): (a) _SideIndex drops null join values (the
        # equi-join rule) but grouping tracks the null group — the
        # sentinel keeps those rows indexed; (b) bucket pruning hashes
        # the PROBE column's values, and the MV probes with the string
        # group key — a native-typed int group would hash to different
        # buckets than its string form (xxhash64 is type-sensitive),
        # silently probing the wrong files.
        self._grp_col = f"_grp_{group_col}"
        gexpr = F.coalesce(F.col(group_col).cast("string"), F.lit(NULL_GROUP))

        def _derive(df, _g=gexpr, _n=self._grp_col):
            return df.withColumn(_n, _g)

        self.index = _SideIndex(
            spark,
            source,
            os.path.join(root, "idx"),
            "mmx",
            join_col=self._grp_col,
            cols=[value_col],
            n_buckets=n_buckets,
            derive=_derive,
            derive_type=T.StringType(),
        )
        vtype = {f.name: f.dataType for f in source.manifest().schema().fields}[
            value_col
        ]
        mv_path = os.path.join(root, "mv_minmax")
        t = SnapshotTable(spark, mv_path)
        if not t.exists():
            schema = T.StructType(
                [
                    T.StructField("doc_id", T.StringType()),
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("min_v", vtype),
                    T.StructField("max_v", vtype),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("seq", T.IntegerType()),
                    T.StructField("updated_epoch", T.LongType()),
                    T.StructField("deleted", T.BooleanType()),
                ]
            )
            t = SnapshotTable.create(
                spark, mv_path, schema, key="doc_id", n_buckets=n_buckets
            )
        self.mv = t
        self.engine = CdcEngine(spark, t, collect_metrics=False)

    def cursor(self, max_walk: int = 64) -> int:
        for v in reversed(self.mv.versions()[-max_walk:]):
            lin = self.mv.manifest(v).lineage
            if "src_to" in lin:
                return int(lin["src_to"])
        return 0

    def run_once(self) -> dict[str, Any] | None:
        from blockchain_etl_spark.tables.snapshot import bucket_expr

        v1 = self.source.manifest().version
        v0 = self.cursor()
        if v1 <= v0:
            return None
        # ONE CDF slice shared by the index catch-up and the delta
        # classification below (the diff is two MOR reads + a
        # full-outer join — the expensive half of the hop); `g` (one
        # row per touched group) is persisted too, since it feeds the
        # bucket-id collect AND the fold/re-derive join.
        d = self.source.read_changes(v0, v1).persist()
        self.index.catch_up(
            v1, changes=d if self.index.cursor() == v0 else None
        )
        grp = F.coalesce(
            F.col(self.group_col).cast("string"), F.lit(NULL_GROUP)
        )
        ins = F.col("_change_type").isin("insert", "update_postimage")
        val = F.col(self.value_col)
        sign = F.when(ins, F.lit(1)).otherwise(F.lit(-1))
        g = (
            d.groupBy(grp.alias("doc_id"))
            .agg(
                F.sum(sign).cast("long").alias("n_delta"),
                F.min(F.when(ins, val)).alias("ins_min"),
                F.max(F.when(ins, val)).alias("ins_max"),
                F.min(F.when(~ins, val)).alias("ret_min"),
                F.max(F.when(~ins, val)).alias("ret_max"),
                F.sum(F.when(~ins, 1).otherwise(0)).cast("long").alias("n_ret"),
            )
            .persist()
        )

        # current MV rows for the touched groups: bucket-pruned read
        # (bucket ids of the touched groups — bounded collect, <= n_buckets)
        nb = self.mv.manifest().n_buckets
        tb = [
            r["_b"]
            for r in g.select(bucket_expr("doc_id", nb).alias("_b"))
            .distinct()
            .collect()
        ]
        if not tb:
            # empty range: still stamp the cursor so catch-ups converge
            d.unpersist()
            g.unpersist()
            self._commit_cursor_only(v0, v1)
            return {"src_from": v0, "src_to": v1, "n_groups": 0, "n_rederive": 0}
        from blockchain_etl_spark.cdc.apply import read_state

        cur = (
            read_state(self.mv, buckets=tb, columns=["n_rows", "min_v", "max_v"])
            .select(
                "doc_id",
                F.col("n_rows").alias("cur_n"),
                F.col("min_v").alias("cur_min"),
                F.col("max_v").alias("cur_max"),
            )
        )
        j = g.join(cur, "doc_id", "left")

        new_n = F.coalesce(F.col("cur_n"), F.lit(0)) + F.col("n_delta")
        fold_min = F.least(F.col("cur_min"), F.col("ins_min"))
        fold_max = F.greatest(F.col("cur_max"), F.col("ins_max"))
        # exact fold condition: every retracted value strictly inside
        # the folded extrema (equality forces re-derive: multiplicity
        # at the extremum is unknown). least/greatest are null-skipping,
        # so a brand-new group folds from its inserts alone.
        safe = (F.col("n_ret") == 0) | (
            F.col("ret_min").isNotNull()
            & fold_min.isNotNull()
            & (F.col("ret_min") > fold_min)
            & (F.col("ret_max") < fold_max)
        )
        j = j.withColumn("_new_n", new_n).withColumn("_safe", safe)

        folded = j.filter(F.col("_safe")).select(
            "doc_id",
            F.col("_new_n").alias("n_rows"),
            fold_min.alias("min_v"),
            fold_max.alias("max_v"),
        )

        redo_keys = j.filter(~F.col("_safe")).select("doc_id").persist()
        # re-derive from the group-keyed index: bucket-pruned probe of
        # ONLY the affected groups' buckets, then exact per-group agg
        live = self.index.state(
            prune_values=redo_keys.select(
                F.col("doc_id").alias(self._grp_col)
            )
        )
        rederived = (
            live.select(
                F.col(self._grp_col).alias("doc_id"),
                F.col(self.value_col).alias("_v"),
            )
            .join(redo_keys, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.min("_v").alias("min_v"),
                F.max("_v").alias("max_v"),
            )
        )
        # groups whose every row was retracted have NO index rows left:
        # re-add them as empty (anti-join), they become tombstones
        gone = (
            redo_keys.join(rederived.select("doc_id"), "doc_id", "left_anti")
            .select(
                "doc_id",
                F.lit(0).cast("long").alias("n_rows"),
                F.lit(None).cast(rederived.schema["min_v"].dataType).alias("min_v"),
                F.lit(None).cast(rederived.schema["max_v"].dataType).alias("max_v"),
            )
        )

        # persist: `out` feeds the count AND the apply; `redo_keys` two
        # joins and a count — without a cache each action re-executes
        # the whole hop plan (CDF diff + MV read + index probe)
        out = folded.unionByName(rederived).unionByName(gone).persist()
        n_groups = out.count()
        n_rederive = redo_keys.count()
        ev = out.select(
            F.lit(v1).cast("long").alias("stream_pos"),
            F.lit(v1).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.when(F.col("n_rows") > 0, F.lit("U")).otherwise(F.lit("D")).alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            "doc_id",
            "n_rows",
            "min_v",
            "max_v",
        )
        digest = hashlib.md5(f"minmaxmv-{v0}-{v1}".encode()).digest()
        self.engine.apply_epoch(
            ev,
            epoch_id=int.from_bytes(digest[:8], "big") >> 1,
            lineage_extra={"src_from": v0, "src_to": v1},
        )
        out.unpersist()
        redo_keys.unpersist()
        d.unpersist()
        g.unpersist()
        return {
            "src_from": v0,
            "src_to": v1,
            "n_groups": int(n_groups),
            "n_rederive": int(n_rederive),
        }

    def _commit_cursor_only(self, v0: int, v1: int) -> None:
        vtype = self.mv.manifest().schema()["min_v"].dataType
        schema = T.StructType(
            [
                T.StructField("stream_pos", T.LongType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("seq", T.IntegerType()),
                T.StructField("op", T.StringType()),
                T.StructField("rollback_to_lsn", T.LongType()),
                T.StructField("doc_id", T.StringType()),
                T.StructField("n_rows", T.LongType()),
                T.StructField("min_v", vtype),
                T.StructField("max_v", vtype),
            ]
        )
        digest = hashlib.md5(f"minmaxmv-{v0}-{v1}".encode()).digest()
        self.engine.apply_epoch(
            self.spark.createDataFrame([], schema),
            epoch_id=int.from_bytes(digest[:8], "big") >> 1,
            lineage_extra={"src_from": v0, "src_to": v1},
        )

    def state(self, group_col: str | None = None) -> DataFrame:
        from blockchain_etl_spark.cdc.apply import read_state

        out = read_state(self.mv, columns=["n_rows", "min_v", "max_v"]).filter(
            "n_rows > 0"
        )
        name = group_col or self.group_col
        return out.select(
            F.col("doc_id").alias(name), "n_rows", "min_v", "max_v"
        )


class TopKAggMV:
    """Incrementally-maintained per-group TOP-K values (descending) —
    the other canonical non-subtractable aggregate (Materialize TopK /
    Flink rank-with-retract). Same skeleton as :class:`MinMaxAggMV`:

    - inserts fold exactly: ``top_k(stored ∪ top_k(batch inserts))`` —
      a value outside both can never enter the result;
    - a retraction at or above the folded k-th value (equality
      included: multiplicity at the boundary is unknown) re-derives the
      group from the group-keyed index, bucket-pruned; retractions
      strictly below the k-th cannot change membership and only adjust
      the count;
    - an underfull group (fewer than k live rows) re-derives on any
      retraction — its k-th is the group minimum, so a real retraction
      always trips the boundary rule anyway.

    The per-batch insert top-k is computed with a rank window keyed on
    the group (one shuffle, spillable sort) — never a per-group
    collect_list of unbounded inserts, so a hot group cannot blow up a
    row. Values ride as ``long``."""

    def __init__(
        self,
        spark: SparkSession,
        source,
        root: str,
        group_col: str,
        value_col: str,
        k: int = 5,
        n_buckets: int = 8,
    ):
        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.streaming.join_mv import _SideIndex
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.spark = spark
        self.source = source
        self.group_col = group_col
        self.value_col = value_col
        self.k = int(k)
        # same derived string-sentinel group key as MinMaxAggMV (null
        # groups indexed; probe/bucket hashing string-vs-string)
        self._grp_col = f"_grp_{group_col}"
        gexpr = F.coalesce(F.col(group_col).cast("string"), F.lit(NULL_GROUP))

        def _derive(df, _g=gexpr, _n=self._grp_col):
            return df.withColumn(_n, _g)

        self.index = _SideIndex(
            spark,
            source,
            os.path.join(root, "idx"),
            "tpk",
            join_col=self._grp_col,
            cols=[value_col],
            n_buckets=n_buckets,
            derive=_derive,
            derive_type=T.StringType(),
        )
        mv_path = os.path.join(root, "mv_topk")
        t = SnapshotTable(spark, mv_path)
        if not t.exists():
            schema = T.StructType(
                [
                    T.StructField("doc_id", T.StringType()),
                    T.StructField("n_rows", T.LongType()),
                    T.StructField("topk", T.ArrayType(T.LongType())),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("seq", T.IntegerType()),
                    T.StructField("updated_epoch", T.LongType()),
                    T.StructField("deleted", T.BooleanType()),
                ]
            )
            t = SnapshotTable.create(
                spark, mv_path, schema, key="doc_id", n_buckets=n_buckets
            )
        self.mv = t
        self.engine = CdcEngine(spark, t, collect_metrics=False)

    def cursor(self, max_walk: int = 64) -> int:
        for v in reversed(self.mv.versions()[-max_walk:]):
            lin = self.mv.manifest(v).lineage
            if "src_to" in lin:
                return int(lin["src_to"])
        return 0

    def run_once(self) -> dict[str, Any] | None:
        from pyspark.sql import Window

        from blockchain_etl_spark.cdc.apply import read_state
        from blockchain_etl_spark.tables.snapshot import bucket_expr

        v1 = self.source.manifest().version
        v0 = self.cursor()
        if v1 <= v0:
            return None
        # shared CDF slice: catch-up + classification read one diff
        d = self.source.read_changes(v0, v1).persist()
        self.index.catch_up(
            v1, changes=d if self.index.cursor() == v0 else None
        )
        grp = F.coalesce(F.col(self.group_col).cast("string"), F.lit(NULL_GROUP))
        ins = F.col("_change_type").isin("insert", "update_postimage")
        val = F.col(self.value_col).cast("long")
        sign = F.when(ins, F.lit(1)).otherwise(F.lit(-1))
        tagged = d.select(
            grp.alias("doc_id"), ins.alias("_ins"), val.alias("_v"), sign.alias("_s")
        )
        # bounded per-group insert top-k: rank window, never an
        # unbounded collect
        wk = Window.partitionBy("doc_id").orderBy(F.desc("_v"))
        ins_topk = (
            tagged.filter("_ins")
            .withColumn("_rk", F.row_number().over(wk))
            .filter(F.col("_rk") <= self.k)
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("_v"), asc=False).alias("ins_topk"))
        )
        g = (
            tagged.groupBy("doc_id")
            .agg(
                F.sum("_s").cast("long").alias("n_delta"),
                F.max(F.when(~F.col("_ins"), F.col("_v"))).alias("ret_max"),
                F.sum(F.when(~F.col("_ins"), 1).otherwise(0))
                .cast("long")
                .alias("n_ret"),
            )
            .join(ins_topk, "doc_id", "left")
            .persist()
        )

        nb = self.mv.manifest().n_buckets
        tb = [
            r["_b"]
            for r in g.select(bucket_expr("doc_id", nb).alias("_b"))
            .distinct()
            .collect()
        ]
        if not tb:
            d.unpersist()
            g.unpersist()
            self._commit_cursor_only(v0, v1)
            return {"src_from": v0, "src_to": v1, "n_groups": 0, "n_rederive": 0}

        cur = read_state(self.mv, buckets=tb, columns=["n_rows", "topk"]).select(
            "doc_id",
            F.col("n_rows").alias("cur_n"),
            F.col("topk").alias("cur_topk"),
        )
        j = g.join(cur, "doc_id", "left")

        merged = F.slice(
            F.sort_array(
                F.concat(
                    F.coalesce(F.col("cur_topk"), F.array()),
                    F.coalesce(F.col("ins_topk"), F.array()),
                ),
                asc=False,
            ),
            1,
            self.k,
        )
        new_n = F.coalesce(F.col("cur_n"), F.lit(0)) + F.col("n_delta")
        # the folded k-th value; underfull folded sets have no k-th —
        # any retraction then re-derives
        kth = F.when(F.size(merged) >= self.k, F.element_at(merged, self.k))
        safe = (F.col("n_ret") == 0) | (
            F.col("ret_max").isNotNull()
            & kth.isNotNull()
            & (F.col("ret_max") < kth)
        )
        j = (
            j.withColumn("_new_n", new_n)
            .withColumn("_merged", merged)
            .withColumn("_safe", safe)
        )

        folded = j.filter(F.col("_safe")).select(
            "doc_id",
            F.col("_new_n").alias("n_rows"),
            F.col("_merged").alias("topk"),
        )
        redo_keys = j.filter(~F.col("_safe")).select("doc_id").persist()
        live = self.index.state(
            prune_values=redo_keys.select(F.col("doc_id").alias(self._grp_col))
        )
        lv = (
            live.select(
                F.col(self._grp_col).alias("doc_id"),
                F.col(self.value_col).cast("long").alias("_v"),
            )
            .join(redo_keys, "doc_id", "left_semi")
        )
        wr = Window.partitionBy("doc_id").orderBy(F.desc("_v"))
        rederived = (
            lv.withColumn("_rk", F.row_number().over(wr))
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sort_array(
                    F.collect_list(F.when(F.col("_rk") <= self.k, F.col("_v"))),
                    asc=False,
                ).alias("topk"),
            )
        )
        gone = redo_keys.join(
            rederived.select("doc_id"), "doc_id", "left_anti"
        ).select(
            "doc_id",
            F.lit(0).cast("long").alias("n_rows"),
            F.lit(None).cast(T.ArrayType(T.LongType())).alias("topk"),
        )

        # persist: `out` feeds the count AND the apply; `redo_keys` two
        # joins and a count — without a cache each action re-executes
        # the whole hop plan (CDF diff + MV read + index probe)
        out = folded.unionByName(rederived).unionByName(gone).persist()
        n_groups = out.count()
        n_rederive = redo_keys.count()
        ev = out.select(
            F.lit(v1).cast("long").alias("stream_pos"),
            F.lit(v1).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.when(F.col("n_rows") > 0, F.lit("U")).otherwise(F.lit("D")).alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            "doc_id",
            "n_rows",
            "topk",
        )
        digest = hashlib.md5(f"topkmv-{self.k}-{v0}-{v1}".encode()).digest()
        self.engine.apply_epoch(
            ev,
            epoch_id=int.from_bytes(digest[:8], "big") >> 1,
            lineage_extra={"src_from": v0, "src_to": v1},
        )
        out.unpersist()
        redo_keys.unpersist()
        d.unpersist()
        g.unpersist()
        return {
            "src_from": v0,
            "src_to": v1,
            "n_groups": int(n_groups),
            "n_rederive": int(n_rederive),
        }

    def _commit_cursor_only(self, v0: int, v1: int) -> None:
        schema = T.StructType(
            [
                T.StructField("stream_pos", T.LongType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("seq", T.IntegerType()),
                T.StructField("op", T.StringType()),
                T.StructField("rollback_to_lsn", T.LongType()),
                T.StructField("doc_id", T.StringType()),
                T.StructField("n_rows", T.LongType()),
                T.StructField("topk", T.ArrayType(T.LongType())),
            ]
        )
        digest = hashlib.md5(f"topkmv-{self.k}-{v0}-{v1}".encode()).digest()
        self.engine.apply_epoch(
            self.spark.createDataFrame([], schema),
            epoch_id=int.from_bytes(digest[:8], "big") >> 1,
            lineage_extra={"src_from": v0, "src_to": v1},
        )

    def state(self, group_col: str | None = None) -> DataFrame:
        from blockchain_etl_spark.cdc.apply import read_state

        out = read_state(self.mv, columns=["n_rows", "topk"]).filter("n_rows > 0")
        name = group_col or self.group_col
        return out.select(F.col("doc_id").alias(name), "n_rows", "topk")
