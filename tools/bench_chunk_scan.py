"""Micro-bench: time-ranged reads on a hypertable-chunked table vs an
unchunked one, as the retained history GROWS.

The claim under test (tables/snapshot.py cluster_by/cluster_slab):
without chunking, a bucket's base data is ONE file spanning the whole
time range, so a time-ranged read opens every base file no matter how
narrow the window — cost O(history). With chunking, compaction splits
each bucket into slab-wide chunk files whose manifest zone maps prune
the read to the touched slabs — cost O(window), flat in history size.

Method: for each history size N, ingest N rows whose event time spans
the full range (immutable per key), compact, then read a FIXED-width
window. Report wall time AND the deterministic part: files opened
(from the same manifest math read() uses). One JSON line per config.

Run: python tools/bench_chunk_scan.py [sizes...]  (default 200k 800k 3200k)
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

N_BUCKETS = 16
SLABS = 32  # chunk count across the full time range
WINDOW_SLABS = 2  # fixed query window = 2 of 32 slabs

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("ets", T.LongType()),
    T.StructField("val", T.LongType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("updated_epoch", T.LongType()),
    T.StructField("deleted", T.BooleanType()),
])


def _events(spark, n, span):
    return spark.range(n).select(
        F.col("id").alias("stream_pos"),
        F.col("id").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        F.lit("I").alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("k-"), F.col("id").cast("string")).alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(span)).cast("long").alias("ets"),
        (F.col("id") % 1000).cast("long").alias("val"),
    )


def _files_for_range(table, lo, hi, pruned: bool):
    """(files opened, total files, rows inside opened files) — rows from
    parquet footers, the physical-IO denominator wall-clock can't show
    at bench scale (the window's data fits one cache line of overheads)."""
    import pyarrow.parquet as pq

    from blockchain_etl_spark.tables.snapshot import cluster_zone_overlaps

    m = table.manifest()
    kept = [
        f for f in m.files if not pruned or cluster_zone_overlaps(f, lo, hi)
    ]
    rows = sum(
        pq.ParquetFile(os.path.join(table.path, f["path"])).metadata.num_rows
        for f in kept
    )
    return len(kept), len(m.files), rows


def run_one(spark, n, chunked: bool, workdir: str):
    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    span = SLABS * 1000
    path = os.path.join(workdir, f"t-{n}-{'c' if chunked else 'u'}")
    table = SnapshotTable.create(
        spark, path, SCHEMA, key="doc_id", n_buckets=N_BUCKETS,
        cluster_by="ets" if chunked else None,
        cluster_slab=1000 if chunked else None,
    )
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(_events(spark, n, span), epoch_id=1)
    table.compact()
    lo, hi = 1000, 1000 * (1 + WINDOW_SLABS) - 1
    kw = {"cluster_range": (lo, hi)} if chunked else {}
    # warm once, then time
    for _ in range(2):
        t0 = time.monotonic()
        df = read_state(table, **kw)
        if not chunked:
            df = df.filter(F.col("ets").between(lo, hi))
        rows = df.count()
        wall = time.monotonic() - t0
    opened, total, phys_rows = _files_for_range(table, lo, hi, pruned=chunked)
    return {
        "n": n, "chunked": chunked, "rows": rows,
        "files_opened": opened, "files_total": total,
        "rows_behind_opened_files": phys_rows,
        "scan_wall_s": round(wall, 3),
    }


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [200_000, 800_000, 3_200_000]
    spark = get_spark(
        "bench-chunk-scan",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
        extra_conf={"spark.driver.memory": "8g"},
    )
    with tempfile.TemporaryDirectory() as workdir:
        for n in sizes:
            for chunked in (False, True):
                print(json.dumps(run_one(spark, n, chunked, workdir)), flush=True)


if __name__ == "__main__":
    main()
