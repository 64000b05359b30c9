"""Micro-bench: the AsofJoinMV history-churn leg's IO bound.

The claim under test (join_mv.py AsofJoinMV): a history change
re-resolves ONLY the fact rows of history-touched keys, probed from the
version-pinned fact-side index bucket-pruned to those keys — so the
leg's read volume is O(touched keys' buckets), structural in fact
cardinality, while a naive re-resolve would rescan the fact table.

Method: for each fact size, ingest facts over N_KEYS keys with spread
event times + a 2-breakpoint history per key, build the MV (hop 1 pays
the index build), then BACKFILL a fixed 4 keys' histories (a new
breakpoint between the existing two) and time hop 2. Reported IO = the
index files in the touched keys' buckets (what the leg reads) vs the
full index footprint (what a scan would read). One JSON line per size.

Run: python tools/bench_asof_leg.py [sizes...]  (default 100k 400k 1600k)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.session import get_spark

N_KEYS = 2000
DELTA_KEYS = 4
INDEX_BUCKETS = 64

FACT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("k", T.StringType()),
    T.StructField("ets", T.LongType()),
    T.StructField("val", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])
HIST_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("hk", T.StringType()),
    T.StructField("vf", T.LongType()),
    T.StructField("weight", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])


def _fact_events(spark, n):
    return spark.range(n).select(
        F.col("id").alias("stream_pos"),
        F.lit(1).cast("long").alias("lsn"),
        F.col("id").cast("int").alias("seq"),
        F.lit("I").alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("d-"), F.col("id").cast("string")).alias("doc_id"),
        F.concat(F.lit("s-"), (F.col("id") % N_KEYS).cast("string")).alias("k"),
        (F.col("id") % 1000).cast("long").alias("ets"),
        (F.col("id") % 97).cast("long").alias("val"),
    )


def _hist_events(spark, lsn, n_keys, vf_expr):
    return spark.range(n_keys).select(
        F.lit(lsn).cast("long").alias("stream_pos"),
        F.lit(lsn).cast("long").alias("lsn"),
        F.col("id").cast("int").alias("seq"),
        F.lit("I").alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("s-"), F.col("id").cast("string"), F.lit("@"),
                 vf_expr.cast("string")).alias("doc_id"),
        F.concat(F.lit("s-"), F.col("id").cast("string")).alias("hk"),
        vf_expr.cast("long").alias("vf"),
        (F.col("id") * 10 + vf_expr).cast("long").alias("weight"),
    )


def run_config(spark, n_fact: int) -> dict:
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.streaming.join_mv import AsofJoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable, bucket_expr

    work = tempfile.mkdtemp(prefix=f"asofleg-{n_fact}-")
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), FACT_SCHEMA, key="doc_id",
        n_buckets=32,
    )
    hist = SnapshotTable.create(
        spark, os.path.join(work, "hist"), HIST_SCHEMA, key="doc_id",
        n_buckets=8, bucket_key="hk",
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    heng = CdcEngine(spark, hist, mode="cow", collect_metrics=False)
    feng.apply_epoch(_fact_events(spark, n_fact), epoch_id=1)
    heng.apply_epoch(_hist_events(spark, 1, N_KEYS, F.lit(0)), epoch_id=1)
    heng.apply_epoch(_hist_events(spark, 2, N_KEYS, F.lit(500)), epoch_id=2)
    jm = AsofJoinMV(
        spark, fact, hist, os.path.join(work, "asof"), join_col="k",
        ts_col="ets", hist_key_col="hk", hist_ts_col="vf",
        fact_cols=["val"], dim_cols=["weight"], n_buckets=INDEX_BUCKETS,
    )
    t0 = time.monotonic()
    jm.run_once()
    build_s = time.monotonic() - t0

    # the backfill: a new breakpoint between 0 and 500 for 4 fixed keys
    heng.apply_epoch(_hist_events(spark, 3, DELTA_KEYS, F.lit(250)), epoch_id=3)
    t0 = time.monotonic()
    jm.run_once()
    delta_hop_s = time.monotonic() - t0
    n_live = jm.state().count()

    idx = jm.idx.table
    nb = idx.manifest().n_buckets
    touched = {
        r["_b"]
        for r in spark.range(DELTA_KEYS)
        .select(F.concat(F.lit("s-"), F.col("id").cast("string")).alias("v"))
        .select(bucket_expr("v", nb).alias("_b"))
        .distinct()
        .collect()
    }
    leg_files = [f for f in idx.manifest().files if f["bucket"] in touched]
    all_files = list(idx.manifest().files)

    def _mb(files):
        return round(sum(
            os.path.getsize(os.path.join(idx.path, f["path"])) for f in files
        ) / 1e6, 2)

    return {
        "n_fact": n_fact,
        "hop1_build_s": round(build_s, 2),
        "backfill_hop_s": round(delta_hop_s, 2),
        "leg_files_read": len(leg_files),
        "leg_mb_read": _mb(leg_files),
        "index_files_total": len(all_files),
        "index_mb_total": _mb(all_files),
        "live_tuples": n_live,
    }


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000, 1_600_000]
    spark = get_spark(
        "bench-asof-leg", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.driver.memory": "12g"},
    )
    for n in sizes:
        print(json.dumps(run_config(spark, n)), flush=True)


if __name__ == "__main__":
    main()
