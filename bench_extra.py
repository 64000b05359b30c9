"""Round-7 isolation benchmarks (guide §1.4): noop-sink phase timings for
the operators being optimized. NOT the driver's bench — bench.py stays
frozen; numbers from here are cited in OPTIMIZATION_r07.md only.

Subcommands:
  flagship-phase   one 4M-event epoch: store read / dedup / full apply
  mv-phase         minmax + join MV hops split into catch-up vs hop rest
  partitioned      partitioned consumer leg (same shape as bench.py's)
  query <name>...  noop-sink timing + formatted plan for catalog queries

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _tmpfs() -> str | None:
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-bench-local"
        os.makedirs(d, exist_ok=True)
        return d
    return None


def _spark(name: str):
    from blockchain_etl_spark.session import get_spark

    extra = {
        "spark.io.compression.codec": "zstd",
        "spark.sql.parquet.compression.codec": "zstd",
    }
    shm = _tmpfs()
    if shm:
        extra["spark.local.dir"] = shm
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    return get_spark(name, master=f"local[{CPUS}]",
                     shuffle_partitions=CPUS, extra_conf=extra)


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def flagship_phase() -> dict:
    """One steady-state epoch of the flagship apply, phase by phase."""
    from pyspark.sql import functions as F

    from blockchain_etl_spark.cdc.apply import CdcEngine, dedup_last_writer
    from blockchain_etl_spark.cdc.generator import generate_changelog_spark
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    spark = _spark("bench-extra-flagship")
    sc = spark.sparkContext
    n_events = int(os.environ.get("BENCH_EVENTS", "4000000"))
    workdir = tempfile.mkdtemp(prefix="bx-flag-", dir=_tmpfs() or None)
    out: dict = {"n_events": n_events}
    try:
        events = generate_changelog_spark(spark, n_events, n_docs=100_000,
                                          partitions=CPUS * 2)
        store = EpochStore(spark, os.path.join(workdir, "store"))
        store.write_epoch(0, events)
        table = SnapshotTable.create(
            spark, os.path.join(workdir, "target"), TARGET_SCHEMA,
            key="doc_id", n_buckets=max(32, CPUS),
        )
        engine = CdcEngine(spark, table, epoch_store=store, mode="mor")
        # warmup epoch on a second table (JIT)
        wtable = SnapshotTable.create(
            spark, os.path.join(workdir, "wtarget"), TARGET_SCHEMA,
            key="doc_id", n_buckets=32)
        weng = CdcEngine(spark, wtable, epoch_store=store, mode="mor")
        wev = generate_changelog_spark(spark, 400_000, n_docs=10_000,
                                      partitions=CPUS)
        ws = EpochStore(spark, os.path.join(workdir, "wstore"))
        ws.write_epoch(0, wev)
        weng.apply_epoch(ws.read_epoch(0), 0)

        ep = store.read_epoch(0)
        sc.setJobDescription("phase: store read (noop)")
        out["read_noop_sec"] = _noop(ep)
        sc.setJobDescription("phase: read+dedup (noop)")
        out["dedup_noop_sec"] = _noop(dedup_last_writer(
            ep.filter(F.col("op") != "R")))
        sc.setJobDescription("phase: full apply_epoch")
        t0 = time.monotonic()
        engine.apply_epoch(ep, 0)
        out["apply_sec"] = round(time.monotonic() - t0, 3)
        sc.setJobDescription("phase: compact")
        t0 = time.monotonic()
        table.compact()
        out["compact_sec"] = round(time.monotonic() - t0, 3)
        sc.setJobDescription(None)
    finally:
        spark.stop()
        import shutil
        shutil.rmtree(workdir, ignore_errors=True)
    return out


def mv_phase() -> dict:
    """The bench.py mv_incremental legs, with index catch-up timed
    SEPARATELY from the rest of each hop (catch_up is idempotent and
    public — running it first makes run_once's internal call a no-op)."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from blockchain_etl_spark.catalog import _changelog_valid
    from blockchain_etl_spark.cdc.apply import CdcEngine as _Eng
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA as _TS
    from blockchain_etl_spark.streaming.aggregate_mv import ZsetAggMV
    from blockchain_etl_spark.streaming.extrema_mv import MinMaxAggMV
    from blockchain_etl_spark.streaming.join_mv import JoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable as _ST

    spark = _spark("bench-extra-mv")
    sc = spark.sparkContext
    mwork = tempfile.mkdtemp(prefix="bx-mv-", dir=_tmpfs() or None)
    out: dict = {}
    try:
        ev, mid = _changelog_valid(spark, SF_DIR)
        ev = ev.persist()
        ev.count()
        mfact = _ST.create(spark, os.path.join(mwork, "fact"), _TS,
                           key="doc_id", n_buckets=16)
        mfeng = _Eng(spark, mfact, collect_metrics=False)
        dim_schema = T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField("weight", T.LongType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("updated_epoch", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ])
        mdim = _ST.create(spark, os.path.join(mwork, "dim"), dim_schema,
                          key="doc_id", n_buckets=4)
        mdeng = _Eng(spark, mdim, collect_metrics=False)
        srcs = ev.filter(F.col("source").isNotNull()).select("source").distinct()

        def _dim_ev(df, lsn, weight_col):
            return df.select(
                F.lit(lsn).cast("long").alias("stream_pos"),
                F.lit(lsn).cast("long").alias("lsn"),
                F.lit(0).cast("int").alias("seq"),
                F.lit("U").alias("op"),
                F.lit(None).cast("long").alias("rollback_to_lsn"),
                F.col("source").alias("doc_id"),
                weight_col.cast("long").alias("weight"),
            )

        jm = JoinMV(spark, mfact, mdim, os.path.join(mwork, "jm"),
                    join_col="source", fact_cols=["n_tok"],
                    dim_cols=["weight"], n_buckets=8, indexed=True)
        zagg = ZsetAggMV(spark, jm.mv, os.path.join(mwork, "zagg"),
                         group_col="source", measures={"sum_tok": "n_tok"})
        mmx = MinMaxAggMV(spark, mfact, os.path.join(mwork, "mmx"),
                          group_col="source", value_col="n_tok", n_buckets=8)
        mdeng.apply_epoch(_dim_ev(srcs, 1, F.length("source") * 10), epoch_id=1)
        mfeng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
        jm.run_once()
        zagg.run_once()
        mmx.run_once()
        # steady state: one commit each input, then hops with catch-up split
        mdeng.apply_epoch(
            _dim_ev(srcs.filter(F.length("source") % 2 == 0), 2,
                    F.length("source") * 10 + 7), epoch_id=2)
        mfeng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
        a1 = mfact.current_version()
        sc.setJobDescription("jm: index catch_up")
        t0 = time.monotonic()
        jm.index.catch_up(a1)
        out["join_catchup_sec"] = round(time.monotonic() - t0, 3)
        sc.setJobDescription("jm: hop rest")
        t0 = time.monotonic()
        jm.run_once()
        out["join_hop_rest_sec"] = round(time.monotonic() - t0, 3)
        sc.setJobDescription("zagg hop")
        t0 = time.monotonic()
        zagg.run_once()
        out["agg_hop_sec"] = round(time.monotonic() - t0, 3)
        sc.setJobDescription("mmx: index catch_up")
        t0 = time.monotonic()
        mmx.index.catch_up(mfact.current_version())
        out["minmax_catchup_sec"] = round(time.monotonic() - t0, 3)
        sc.setJobDescription("mmx: hop rest")
        t0 = time.monotonic()
        mm = mmx.run_once()
        out["minmax_hop_rest_sec"] = round(time.monotonic() - t0, 3)
        out["minmax_rederive_groups"] = (mm or {}).get("n_rederive")
        sc.setJobDescription(None)
        ev.unpersist()
    finally:
        spark.stop()
        import shutil
        shutil.rmtree(mwork, ignore_errors=True)
    return out


def partitioned(n_events: int | None = None) -> dict:
    import bench

    n = n_events or int(os.environ.get("BENCH_PARTITIONED_EVENTS", "8000000"))
    return bench.partitioned_run(CPUS, n)


def query(names: list[str], plans_dir: str | None = None) -> dict:
    from blockchain_etl_spark import catalog

    spark = _spark("bench-extra-queries")
    sc = spark.sparkContext
    out: dict = {}
    try:
        for name in names:
            fn = catalog.QUERIES[name]
            df = fn(spark, SF_DIR)
            if plans_dir:
                os.makedirs(plans_dir, exist_ok=True)
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(buf.getvalue())
            def one() -> float:
                # time fn() + noop together: some gate queries run
                # eager work (table builds, iterative propagation)
                # inside the function
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                return round(time.monotonic() - t0, 3)

            sc.setJobDescription(f"noop: {name} (cold)")
            cold = one()
            warm = []
            for i in range(3):
                sc.setJobDescription(f"noop: {name} (warm {i})")
                warm.append(one())
            out[name] = {"cold": cold, "warm": warm, "warm_min": min(warm)}
            sc.setJobDescription(None)
    finally:
        spark.stop()
    return out


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "flagship-phase"
    if cmd == "flagship-phase":
        print(json.dumps(flagship_phase()))
    elif cmd == "mv-phase":
        print(json.dumps(mv_phase()))
    elif cmd == "partitioned":
        print(json.dumps(partitioned(
            int(sys.argv[2]) if len(sys.argv) > 2 else None)))
    elif cmd == "query":
        names = [a for a in sys.argv[2:] if not a.startswith("--")]
        pd_ = None
        for a in sys.argv[2:]:
            if a.startswith("--plans="):
                pd_ = a.split("=", 1)[1]
        print(json.dumps(query(names, pd_)))
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
