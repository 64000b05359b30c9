"""Micro-bench: the JoinMV dim-delta leg, secondary-indexed vs scan.

The claim under test (join_mv.py): without an index, a dim delta costs
O(fact state) — the leg joins ΔB against ALL live fact rows; with
``indexed=True`` it costs O(ΔB + touched index buckets). So the hop
time should GROW with fact cardinality on the scan path and stay ~flat
on the indexed path (the delta touches ≤ |ΔB| of the index's buckets).

Method: for each fact size, ingest fact (one epoch) + dim (one epoch),
run hop 1 (initial materialization — the indexed variant pays its
index build here), then reweight a FIXED 4 of the 2000 dim sources and
time hop 2 (the dim-delta leg alone; the fact cursor is current, so
the indexed variant's catch_up is a no-op). One JSON line per config.

Run: python tools/bench_index_leg.py [sizes...]   (default 100k 400k 1600k)
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

N_SOURCES = 2000
DELTA_SOURCES = 4
INDEX_BUCKETS = 64

DIM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
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
        F.array(
            (F.col("id") % 1000).cast("int"), (F.col("id") % 97).cast("int")
        ).alias("tokens"),
        F.lit(2).cast("int").alias("n_tok"),
        F.concat(F.lit("s-"), (F.col("id") % N_SOURCES).cast("string")).alias(
            "source"
        ),
        F.lit("e1").alias("epoch_hash"),
    )


def _dim_events(spark, lsn, n_sources, weight_off):
    return spark.range(n_sources).select(
        F.lit(lsn).cast("long").alias("stream_pos"),
        F.lit(lsn).cast("long").alias("lsn"),
        F.col("id").cast("int").alias("seq"),
        F.lit("U").alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("s-"), F.col("id").cast("string")).alias("doc_id"),
        (F.col("id") * 10 + weight_off).cast("long").alias("weight"),
    )


def run_config(spark, n_fact: int, indexed: bool) -> dict:
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.join_mv import JoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    work = tempfile.mkdtemp(prefix=f"idxleg-{n_fact}-{indexed}-")
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), TARGET_SCHEMA, key="doc_id",
        n_buckets=32,
    )
    dim = SnapshotTable.create(
        spark, os.path.join(work, "dim"), DIM_SCHEMA, key="doc_id", n_buckets=8
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    deng = CdcEngine(spark, dim, mode="cow", collect_metrics=False)
    feng.apply_epoch(_fact_events(spark, n_fact), epoch_id=1)
    deng.apply_epoch(_dim_events(spark, 1, N_SOURCES, 0), epoch_id=1)
    jm = JoinMV(
        spark, fact, dim, os.path.join(work, "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"],
        n_buckets=INDEX_BUCKETS, indexed=indexed,
    )
    t0 = time.monotonic()
    jm.run_once()
    build_s = time.monotonic() - t0

    # the delta: 4 of 2000 sources reweight; fact is unchanged, so the
    # indexed variant's catch_up is a cursor no-op
    deng.apply_epoch(_dim_events(spark, 2, DELTA_SOURCES, 7), epoch_id=2)
    t0 = time.monotonic()
    jm.run_once()
    delta_hop_s = time.monotonic() - t0
    n_live = jm.state().count()

    # IO the ΔB leg must read to find ΔB's fact partners — the term
    # that matters at cluster scale, where wall-clock here is dominated
    # by the ~3 s fixed commit cost: the scan path reads EVERY live
    # fact file; the indexed path reads only the index buckets the
    # changed join values hash to.
    from blockchain_etl_spark.tables.snapshot import bucket_expr

    if indexed:
        src = jm.index.table
        nb = src.manifest().n_buckets
        touched = {
            r["_b"]
            for r in spark.range(DELTA_SOURCES)
            .select(F.concat(F.lit("s-"), F.col("id").cast("string")).alias("v"))
            .select(bucket_expr("v", nb).alias("_b"))
            .distinct()
            .collect()
        }
        files = [f for f in src.manifest().files if f["bucket"] in touched]
    else:
        src = fact
        files = list(src.manifest().files)
    leg_bytes = sum(
        os.path.getsize(os.path.join(src.path, f["path"])) for f in files
    )
    return {
        "n_fact": n_fact,
        "indexed": indexed,
        "hop1_build_s": round(build_s, 2),
        "dim_delta_hop_s": round(delta_hop_s, 2),
        "leg_files_read": len(files),
        "leg_mb_read": round(leg_bytes / 1e6, 2),
        "live_tuples": n_live,
    }


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 400_000, 1_600_000]
    spark = get_spark(
        "bench-index-leg", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.driver.memory": "12g"},
    )
    for n in sizes:
        for indexed in (False, True):
            print(json.dumps(run_config(spark, n, indexed)), flush=True)


if __name__ == "__main__":
    main()
