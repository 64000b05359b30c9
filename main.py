"""spark-submit entry point for the CDC engine.

Cluster invocation (north rule: spark-submit --py-files on a
multi-executor cluster):

    python tools/make_pyfiles.py                       # builds dist/blockchain_etl_spark.zip
    spark-submit \
      --master yarn --deploy-mode cluster \
      --num-executors 1000 --executor-cores 4 --executor-memory 16g \
      --conf spark.sql.shuffle.partitions=4096 \
      --conf spark.sql.adaptive.enabled=true \
      --py-files dist/blockchain_etl_spark.zip \
      main.py tail --landing /data/changelog --table /lake/target_docs \
                   --store /lake/epoch_store --buckets 4096

Subcommands:
    init     create the target table
    tail     apply all pending epochs from a landing dir (micro-batch)
    stream   run the Structured Streaming driver with a checkpoint dir
    replay   batch-replay a full change-log into a fresh table
    compact  fold delta files into base files
    vacuum   drop tombstones older than an LSN
    show     print table state / manifest / metrics
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(args):
    from blockchain_etl_spark.session import get_spark

    return get_spark("blockchain-etl-spark", master=args.master or None)


def main(argv=None):
    p = argparse.ArgumentParser(prog="blockchain-etl-spark")
    p.add_argument("--master", default=None, help="override spark master (local default)")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("init")
    sp.add_argument("--table", required=True)
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--policies", default=None,
                    help='column merge policies as JSON, e.g. '
                         '\'{"n_xfers": "add", "first_seen": "first"}\' '
                         '(add | min | max | first | last | kmv<k> | '
                         'hist<b>; default last-writer rows)')
    sp.add_argument("--cluster-by", default=None,
                    help="integral column for hypertable chunking: base "
                         "rewrites split each bucket into cluster-slab-"
                         "wide chunk files and time-ranged reads prune "
                         "them via manifest zone maps (value must be "
                         "immutable per key and non-null on every event)")
    sp.add_argument("--cluster-slab", type=int, default=None,
                    help="chunk width in cluster_by units (requires "
                         "--cluster-by)")

    sp = sub.add_parser("tail")
    sp.add_argument("--landing", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--store", required=True)
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--mode", choices=["mor", "cow"], default="mor")
    sp.add_argument("--lag", type=int, default=0,
                    help="confirmation lag: hold head LSNs in a pending "
                         "overlay at <table>_pending (≙ --lag 80)")
    sp.add_argument("--retain-lsn-margin", type=int, default=None,
                    help="change-log retention: GC store epochs wholly "
                         "below watermark minus this margin (set >= the "
                         "reorg + redelivery horizon; default: retain "
                         "forever in direct mode, prune at the finalized "
                         "watermark in lag mode)")
    sp.add_argument("--bus-format", choices=["native", "debezium", "maxwell"],
                    default="native",
                    help="wire format of the landing epochs: native = "
                         "EVENT_SCHEMA parquet; debezium/maxwell = JSONL "
                         "envelope streams (epoch-N.jsonl) decoded "
                         "JVM-side before apply")
    sp.add_argument("--compact-cluster", action="store_true",
                    help="make every auto-compaction a sort-order rewrite "
                         "(bucket sorted by key,lsn,seq for row-group "
                         "pruning on point lookups)")

    sp = sub.add_parser("tail-partitioned", help="consume a P-partition "
                        "(Kafka-topic-shaped) landing: per-partition "
                        "positional segments p-K/seg-N.parquet, safe "
                        "min-head watermark, replicated reorg markers")
    sp.add_argument("--landing", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--store", required=True)
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--mode", choices=["mor", "cow"], default="mor")
    sp.add_argument("--n-parts", type=int, default=None,
                    help="fixed partition count (default: discover from "
                         "the landing dir)")
    sp.add_argument("--final", action="store_true",
                    help="end-of-topic drain: after strict rounds stall, "
                         "waive the safe-watermark gate and consume every "
                         "pending segment in positional order")
    sp.add_argument("--bus-format", choices=["native", "debezium", "maxwell"],
                    default="native",
                    help="segment wire format: native parquet or JSONL "
                         "envelope streams (a partitioned Debezium topic)")

    sp = sub.add_parser("stream")
    sp.add_argument("--landing", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--store", required=True)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--continuous", action="store_true",
                    help="keep running (default: drain available and exit)")

    sp = sub.add_parser("source-stream", help="ingest from the native "
                        "`changelog` Python DataSource (no landing dir)")
    sp.add_argument("--table", required=True)
    sp.add_argument("--store", required=True)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--tip-lsn", type=int, default=64)
    sp.add_argument("--start-lsn", type=int, default=0)

    sp = sub.add_parser("easy-etl", help="one-command dump: init-if-absent "
                        "-> tail all pending epochs -> compact -> export the "
                        "final state to --out (the reference's easy_dump/"
                        "easy_etl convenience wrapper over the same paths)")
    sp.add_argument("--landing", required=True)
    sp.add_argument("--table", required=True)
    sp.add_argument("--store", required=True)
    sp.add_argument("--out", required=True,
                    help="export directory for the final state")
    sp.add_argument("--format", choices=["parquet", "csv"], default="parquet",
                    help="csv flattens array columns to comma-joined "
                    "strings (FileSink conventions)")
    sp.add_argument("--entity", default=None,
                    help="entity name for the csv export dir layout "
                    "(default: table basename)")
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--no-compact", action="store_true",
                    help="skip the post-apply compaction")

    sp = sub.add_parser("replay")
    sp.add_argument("--events", required=True, help="parquet dir of the full change-log")
    sp.add_argument("--table", required=True)
    sp.add_argument("--buckets", type=int, default=64)

    sp = sub.add_parser("backfill", help="bulk-load FINALIZED history "
                        "below the committed watermark into a live table "
                        "(gap fill after retention / pre-cursor history): "
                        "old rows lose to present keys, absent keys insert, "
                        "the watermark never moves; refused for policy "
                        "tables and reorg-marked batches")
    sp.add_argument("--events", required=True,
                    help="parquet dir of EVENT_SCHEMA rows to load")
    sp.add_argument("--table", required=True)
    sp.add_argument("--epoch-id", type=int, required=True,
                    help="idempotency key: redelivering the same backfill "
                         "with the same id is a no-op")

    sp = sub.add_parser("reconcile")
    sp.add_argument("--table", required=True)
    sp.add_argument("--store", required=True)
    sp.add_argument("--expected-range", default=None, help="lo:hi expected LSN range")
    sp.add_argument("--no-autofix", action="store_true")

    sp = sub.add_parser("compact")
    sp.add_argument("--table", required=True)
    sp.add_argument("--cluster", action="store_true",
                    help="sort rewritten buckets by (key, lsn, seq) so "
                         "row-group min/max pruning works inside bucket "
                         "files (Iceberg sort-order rewrite)")

    sp = sub.add_parser("merge", help="Delta-style MERGE INTO: upsert a "
                        "parquet source into the table (one synthetic "
                        "epoch through the exactly-once apply path)")
    sp.add_argument("--table", required=True)
    sp.add_argument("--source", required=True,
                    help="parquet path: one row per key; columns matching "
                         "the table schema upsert, unknown columns evolve "
                         "the schema")
    sp.add_argument("--delete-where", default=None,
                    help="SQL boolean expr over source rows; matches "
                         "become deletes (e.g. \"source = 'gone'\")")
    sp.add_argument("--epoch-id", type=int, default=None,
                    help="idempotency token: redelivering the same id is "
                         "a no-op (default: next after the ledger max)")
    sp.add_argument("--mode", choices=["mor", "cow"], default="cow")
    sp.add_argument("--if-absent", action="store_true",
                    help="WHEN NOT MATCHED THEN INSERT only: seed from a "
                         "state dump without touching existing keys")

    sp = sub.add_parser("lookup", help="single-key point read: bucket + "
                        "key-zone-map file pruning + row-group pushdown")
    sp.add_argument("--table", required=True)
    sp.add_argument("--key", required=True)

    sp = sub.add_parser("rebucket", help="bucket-layout evolution: rewrite "
                        "into a new hash-bucket count")
    sp.add_argument("--table", required=True)
    sp.add_argument("--buckets", type=int, required=True)

    sp = sub.add_parser("clone", help="zero-copy clone at a version "
                        "(hardlinked data files, own identity+ledger)")
    sp.add_argument("--table", required=True)
    sp.add_argument("--dst", required=True)
    sp.add_argument("--version", type=int, default=None)

    sp = sub.add_parser("publish", help="write-audit-publish: atomically "
                        "adopt the commits staged on a clone (made with "
                        "`clone`) back into the source table — fast-"
                        "forward only, exactly-once, one manifest swap")
    sp.add_argument("--table", required=True, help="the table to publish INTO")
    sp.add_argument("--stage", required=True, help="the audited clone")

    sp = sub.add_parser("gc", help="reclaim storage: delete manifests older "
                        "than the last N versions and data files no kept "
                        "manifest references (keep N larger than the reorg "
                        "lag in epochs — it bounds time travel)")
    sp.add_argument("--table", required=True)
    sp.add_argument("--keep-last-versions", type=int, default=50)

    sp = sub.add_parser("drop-chunks", help="time-based retention on a "
                        "cluster-chunked table: drop every file wholly "
                        "below the bound by manifest math (zero rewrite; "
                        "gc reclaims the files)")
    sp.add_argument("--table", required=True)
    sp.add_argument("--below", type=int, required=True,
                    help="cluster_by bound; files whose zone max < below drop")

    sp = sub.add_parser("vacuum")
    sp.add_argument("--table", required=True)
    sp.add_argument("--older-than-lsn", type=int, required=True)

    sp = sub.add_parser("show")
    sp.add_argument("--table", required=True)
    sp.add_argument("--what", choices=["state", "manifest", "metrics"], default="manifest")
    sp.add_argument("--at-lsn", type=int, default=None,
                    help="time travel: read the newest committed snapshot "
                         "whose watermark lsn <= this bound (state/manifest)")

    sp = sub.add_parser("pipeline", help="fan a source table into derived "
                        "entity tables through the dependency DAG "
                        "(docs -> doc_stats -> source_stats, long_docs)")
    sp.add_argument("--src-table", required=True)
    sp.add_argument("--root", required=True,
                    help="directory holding the derived tables + cursors")
    sp.add_argument("--entities", required=True,
                    help="comma-separated requested entities; upstream "
                    "deps materialize automatically, the rest is pruned")
    sp.add_argument("--buckets", type=int, default=8)
    sp.add_argument("--snapshot-at", type=int, default=None,
                    help="instead of running a hop: print the consistent "
                         "cross-entity version vector pinned at the newest "
                         "barrier <= this source version (use -1 for the "
                         "newest barrier), plus per-entity pinned row counts")

    sp = sub.add_parser("cascade", help="apply an upstream table's new "
                        "commits to a downstream table (table-to-table hop)")
    sp.add_argument("--src-table", required=True)
    sp.add_argument("--dst-table", required=True)
    sp.add_argument("--cursor", required=True,
                    help="version-cursor JSON file (created on first run)")
    sp.add_argument("--buckets", type=int, default=64)
    sp.add_argument("--mode", choices=["mor", "cow"], default="mor")

    sp = sub.add_parser("mv", help="maintain a grouped-aggregate "
                        "materialized view of a table from its change "
                        "feed (differential deltas with retraction; "
                        "creates the MV policy table on first run)")
    sp.add_argument("--src-table", required=True)
    sp.add_argument("--mv-table", required=True)
    sp.add_argument("--group-col", required=True)
    sp.add_argument("--measures", default=None,
                    help='JSON {out_col: source_col} summed per group, '
                         'e.g. \'{"total_tokens": "n_tok"}\'; row count '
                         "n_rows always maintained")
    sp.add_argument("--cursor", required=True,
                    help="version-cursor JSON file (created on first run)")
    sp.add_argument("--buckets", type=int, default=8)

    sp = sub.add_parser("mv-extrema", help="maintain a per-group MIN/MAX "
                        "or TOP-K materialized view (non-subtractable "
                        "folds: boundary retractions re-derive their "
                        "group from a group-keyed index)")
    sp.add_argument("--src-table", required=True)
    sp.add_argument("--root", required=True,
                    help="MV root dir (index + MV table live under it)")
    sp.add_argument("--group-col", required=True)
    sp.add_argument("--value-col", required=True)
    sp.add_argument("--top-k", type=int, default=None,
                    help="maintain top-K values instead of min/max")
    sp.add_argument("--buckets", type=int, default=8)

    sp = sub.add_parser("mv-join", help="maintain an incremental equi-join "
                        "materialized view of two tables from their change "
                        "feeds (Δ(A⋈B) = ΔA⋈B_old + A_new⋈ΔB; creates the "
                        "MV Z-set table and any side indexes on first run)")
    sp.add_argument("--a-table", required=True, help="fact / left input")
    sp.add_argument("--b-table", required=True, help="dim / right input")
    sp.add_argument("--root", required=True,
                    help="MV root dir (holds mv_join, cursor, indexes)")
    sp.add_argument("--a-join-col", required=True)
    sp.add_argument("--b-join-col", default=None,
                    help="omit (or pass B's key) for the fact⋈dim case — "
                    "B's own bucketing is the index; pass a non-key column "
                    "for the N:M case (both sides get secondary indexes)")
    sp.add_argument("--a-cols", default="",
                    help="comma-separated A payload columns in the output")
    sp.add_argument("--b-cols", default="",
                    help="comma-separated B payload columns in the output")
    sp.add_argument("--indexed", action="store_true",
                    help="fact⋈dim only: maintain a fact-side secondary "
                    "index so the dim-delta leg probes index buckets "
                    "instead of scanning fact state")
    sp.add_argument("--how",
                    choices=["inner", "left", "full_outer", "asof", "range"],
                    default="inner",
                    help="fact⋈dim only: outer joins keep unmatched rows "
                    "null-extended via differentially-maintained "
                    "unmatched-side Z-sets; asof is the point-in-time "
                    "join (latest B row at-or-before each A row's ts); "
                    "range is the interval join (A value in B's [lo, hi))")
    sp.add_argument("--ts-col", default=None,
                    help="asof only: A's event-time column")
    sp.add_argument("--hist-key-col", default=None,
                    help="asof only: B's entity-key column (B's own key "
                    "is a surrogate history-row id)")
    sp.add_argument("--hist-ts-col", default=None,
                    help="asof only: B's valid-from column")
    sp.add_argument("--lo-col", default=None, help="range only: B's lower bound")
    sp.add_argument("--hi-col", default=None,
                    help="range only: B's exclusive upper bound")
    sp.add_argument("--cell-size", type=int, default=None,
                    help="range only: grid cell width (near the median "
                    "interval width); --a-join-col is A's VALUE column")
    sp.add_argument("--buckets", type=int, default=8)

    sp = sub.add_parser("historyize", help="SCD-2 from the change feed: "
                        "maintain an append-only liveness-flagged history "
                        "table of --src-table (one row per key per hop), "
                        "the shape mv-join --how asof consumes; rerun → "
                        "no-op (exactly-once cascade hop)")
    sp.add_argument("--src-table", required=True)
    sp.add_argument("--hist-table", required=True)
    sp.add_argument("--cursor", required=True)
    sp.add_argument("--payload-cols", default="",
                    help="comma-separated source payload columns to carry")
    sp.add_argument("--buckets", type=int, default=8)

    sp = sub.add_parser("changes", help="incremental change-log between two "
                        "table versions (tail this table as a source)")
    sp.add_argument("--table", required=True)
    sp.add_argument("--from-version", type=int, default=None)
    sp.add_argument("--to-version", type=int, default=None)
    sp.add_argument("--since-lsn", type=int, default=None,
                    help="WAL-position mode instead of version mode: rows "
                    "last written after this lsn (tombstones included)")
    sp.add_argument("--out", default=None,
                    help="write the change rows to this parquet dir "
                    "(default: print to stdout)")
    sp.add_argument("--envelope", choices=["debezium"], default=None,
                    help="emit the version-range changes as Debezium "
                         "envelope JSONL instead of rows (the engine as "
                         "a Debezium producer; pair with --out FILE)")
    sp.add_argument("--per-commit", action="store_true",
                    help="audit view: one diff per commit in the range "
                    "(insert-then-delete shows both), instead of the "
                    "net state-sync diff")

    args = p.parse_args(argv)

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA, TARGET_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.streaming.tail import ChangeLogTailer, run_structured_stream
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    spark = _spark(args)

    if args.cmd == "init":
        pol = json.loads(args.policies) if args.policies else None
        SnapshotTable.create(
            spark, args.table, TARGET_SCHEMA, n_buckets=args.buckets, policies=pol,
            cluster_by=args.cluster_by, cluster_slab=args.cluster_slab,
        )
        print(json.dumps({"created": args.table, "buckets": args.buckets,
                          "policies": pol or {},
                          "cluster_by": args.cluster_by,
                          "cluster_slab": args.cluster_slab}))
        return 0

    if args.cmd == "tail-partitioned":
        from blockchain_etl_spark.streaming.partitioned import PartitionedTailer

        table = SnapshotTable(spark, args.table)
        if not table.exists():
            SnapshotTable.create(spark, args.table, TARGET_SCHEMA, n_buckets=args.buckets)
        engine = CdcEngine(spark, table, epoch_store=EpochStore(spark, args.store),
                           mode=args.mode)
        tailer = PartitionedTailer(spark, args.landing, engine,
                                   n_parts=args.n_parts,
                                   bus_format=args.bus_format)
        if args.final:
            metrics = tailer.run_until_drained()
        else:
            metrics = []
            while True:
                m = tailer.run_once()
                if m is None:
                    break
                metrics.append(m)
        print(json.dumps({
            "applied_epochs": [m["epoch_id"] for m in metrics],
            "safe_lsn": metrics[-1].get("safe_lsn") if metrics else None,
            "metrics": metrics,
        }, default=str))
        return

    if args.cmd in ("tail", "stream"):
        table = SnapshotTable(spark, args.table)
        if not table.exists():
            SnapshotTable.create(spark, args.table, TARGET_SCHEMA, n_buckets=args.buckets)
        store = EpochStore(spark, args.store)
        engine = CdcEngine(spark, table, epoch_store=store,
                           mode=getattr(args, "mode", "mor"),
                           compact_cluster=getattr(args, "compact_cluster", False))
        if args.cmd == "tail":
            if args.lag > 0:
                from blockchain_etl_spark.streaming.lagged import LaggedTailer

                lt = LaggedTailer(spark, engine, store,
                                  args.table.rstrip("/") + "_pending", lag=args.lag,
                                  retain_lsn_margin=args.retain_lsn_margin or 0)
                results = []
                rd = ChangeLogTailer(spark, args.landing, engine,
                                     bus_format=args.bus_format)
                files = rd._epoch_files()
                for eid in rd.pending_epochs():
                    results.append(lt.process_epoch(rd._read_epoch(files[eid]), eid))
                print(json.dumps({"processed": results}, default=str))
            else:
                metrics = ChangeLogTailer(
                    spark, args.landing, engine,
                    retain_lsn_margin=args.retain_lsn_margin,
                    bus_format=args.bus_format,
                ).run_once()
                print(json.dumps({"applied_epochs": [m["epoch_id"] for m in metrics],
                                  "metrics": metrics}, default=str))
        else:
            run_structured_stream(spark, args.landing, engine, args.checkpoint,
                                  available_now=not args.continuous)
            print(json.dumps({"table_version": table.current_version()}))
        return 0

    if args.cmd == "easy-etl":
        # ≙ blockchainetl/cli/easy_dump.py:1-139 + misc/easy_etl.py:11-33:
        # one command from change-log to consumable files. The reference
        # wires provider->Streamer->FileItemExporter(+GreenPlum COPY); here
        # the same composition is init-if-absent -> ChangeLogTailer ->
        # compact -> state export (the COPY leg is the snapshot table).
        from pyspark.sql import functions as F

        table = SnapshotTable(spark, args.table)
        created = not table.exists()
        if created:
            SnapshotTable.create(spark, args.table, TARGET_SCHEMA,
                                 n_buckets=args.buckets)
        engine = CdcEngine(spark, table, epoch_store=EpochStore(spark, args.store))
        metrics = ChangeLogTailer(spark, args.landing, engine).run_once()
        if not args.no_compact:
            table.compact()
        st = read_state(table)
        entity = args.entity or os.path.basename(args.table.rstrip("/"))
        out = os.path.join(args.out, f"entity={entity}")
        if args.format == "csv":
            # arrays flatten to joined strings (FileSink conventions)
            cols = [F.concat_ws(",", F.col(n)).alias(n)
                    if d.startswith("array") else F.col(n)
                    for n, d in st.dtypes]
            st.select(*cols).write.mode("overwrite").option(
                "header", True).csv(out)
        else:
            st.write.mode("overwrite").parquet(out)
        print(json.dumps({
            "created": created,
            "applied_epochs": [m["epoch_id"] for m in metrics],
            "table_version": table.current_version(),
            "out": out,
            "format": args.format,
            "rows": table.read().filter("NOT deleted").count(),
        }, default=str))
        return 0

    if args.cmd == "source-stream":
        from blockchain_etl_spark.streaming.tail import run_source_stream

        table = SnapshotTable(spark, args.table)
        if not table.exists():
            SnapshotTable.create(spark, args.table, TARGET_SCHEMA, n_buckets=args.buckets)
        store = EpochStore(spark, args.store)
        engine = CdcEngine(spark, table, epoch_store=store)
        run_source_stream(spark, engine, args.checkpoint,
                          {"tip_lsn": args.tip_lsn, "start_lsn": args.start_lsn})
        print(json.dumps({"table_version": table.current_version(),
                          "watermark": table.manifest().watermark}))
        return 0

    if args.cmd == "pipeline":
        from blockchain_etl_spark.streaming.pipeline import EntityPipeline

        src = SnapshotTable(spark, args.src_table)
        pipe = EntityPipeline(spark, src, args.root,
                              args.entities.split(","), n_buckets=args.buckets)
        if args.snapshot_at is not None:
            at = None if args.snapshot_at < 0 else args.snapshot_at
            barriers = pipe.consistent_barriers()  # one walk, reused
            pins = pipe.snapshot(at_src_version=at, barriers=barriers)
            print(json.dumps({
                "barriers": sorted(barriers),
                "pins": pins,
                "rows": {e: pipe.state_at(e, pins).count()
                         for e in pins},
            }, default=str))
            return 0
        metrics = pipe.run_once()
        print(json.dumps({
            "materialized": pipe.order,
            "versions": {e: pipe.tables[e].current_version()
                         for e in pipe.order},
            "metrics": metrics,
        }, default=str))
        return 0
    if args.cmd == "mv":
        from blockchain_etl_spark.streaming.aggregate_mv import (
            agg_mv_transform, create_agg_mv, mv_state)
        from blockchain_etl_spark.streaming.cascade import CascadeTailer

        measures = json.loads(args.measures) if args.measures else {}
        src = SnapshotTable(spark, args.src_table)
        mv = SnapshotTable(spark, args.mv_table)
        if not mv.exists():
            mv = create_agg_mv(spark, args.mv_table, args.group_col,
                               measures, n_buckets=args.buckets)
        metrics = CascadeTailer(
            src, CdcEngine(spark, mv), args.cursor,
            transform=agg_mv_transform(args.group_col, measures),
        ).run_once()
        print(json.dumps({
            "src_version": src.current_version(),
            "mv_version": mv.current_version(),
            "live_groups": mv_state(mv).count(),
            "metrics": metrics,
        }, default=str))
        return 0
    if args.cmd == "mv-extrema":
        from blockchain_etl_spark.streaming.extrema_mv import (
            MinMaxAggMV, TopKAggMV)

        src_t = SnapshotTable(spark, args.src_table)
        if args.top_k:
            mv = TopKAggMV(spark, src_t, args.root, args.group_col,
                           args.value_col, k=args.top_k,
                           n_buckets=args.buckets)
        else:
            mv = MinMaxAggMV(spark, src_t, args.root, args.group_col,
                             args.value_col, n_buckets=args.buckets)
        metrics = mv.run_once()
        print(json.dumps({
            "src_version": src_t.current_version(),
            "live_groups": mv.state().count(),
            "metrics": metrics,
        }, default=str))
        return 0
    if args.cmd == "mv-join":
        from blockchain_etl_spark.streaming.join_mv import (
            AsofJoinMV, FullOuterJoinMV, GeneralJoinMV, JoinMV, LeftJoinMV,
        )

        a = SnapshotTable(spark, args.a_table)
        b = SnapshotTable(spark, args.b_table)
        a_cols = [c for c in args.a_cols.split(",") if c]
        b_cols = [c for c in args.b_cols.split(",") if c]
        if args.how == "asof":
            for req in ("ts_col", "hist_key_col", "hist_ts_col"):
                if getattr(args, req) is None:
                    raise SystemExit(f"--how asof requires --{req.replace('_','-')}")
            mv = AsofJoinMV(spark, a, b, args.root,
                            join_col=args.a_join_col, ts_col=args.ts_col,
                            hist_key_col=args.hist_key_col,
                            hist_ts_col=args.hist_ts_col,
                            fact_cols=a_cols, dim_cols=b_cols,
                            n_buckets=args.buckets)
        elif args.how == "range":
            from blockchain_etl_spark.streaming.join_mv import RangeJoinMV

            for req in ("lo_col", "hi_col", "cell_size"):
                if getattr(args, req) is None:
                    raise SystemExit(f"--how range requires --{req.replace('_','-')}")
            mv = RangeJoinMV(spark, a, b, args.root,
                             val_col=args.a_join_col, lo_col=args.lo_col,
                             hi_col=args.hi_col, fact_cols=a_cols,
                             dim_cols=b_cols, cell_size=args.cell_size,
                             n_buckets=args.buckets)
        elif args.b_join_col in (None, b.manifest().key):
            if args.how == "left":
                mv = LeftJoinMV(spark, a, b, args.root,
                                join_col=args.a_join_col,
                                fact_cols=a_cols, dim_cols=b_cols,
                                n_buckets=args.buckets)
            elif args.how == "full_outer":
                mv = FullOuterJoinMV(spark, a, b, args.root,
                                     join_col=args.a_join_col,
                                     fact_cols=a_cols, dim_cols=b_cols,
                                     n_buckets=args.buckets)
            else:
                mv = JoinMV(spark, a, b, args.root, join_col=args.a_join_col,
                            fact_cols=a_cols, dim_cols=b_cols,
                            n_buckets=args.buckets, indexed=args.indexed)
        elif args.how != "inner":
            raise SystemExit("--how left/full_outer requires the fact⋈dim "
                             "form (omit --b-join-col or pass B's key)")
        else:
            mv = GeneralJoinMV(spark, a, b, args.root,
                               a_join_col=args.a_join_col,
                               b_join_col=args.b_join_col,
                               a_cols=a_cols, b_cols=b_cols,
                               n_buckets=args.buckets)
        metrics = mv.run_once()
        print(json.dumps({
            "a_version": a.current_version(),
            "b_version": b.current_version(),
            "mv_version": mv.mv.current_version(),
            "live_tuples": mv.state().count(),
            "metrics": metrics,
        }, default=str))
        return 0
    if args.cmd == "cascade":
        from blockchain_etl_spark.streaming.cascade import CascadeTailer

        src = SnapshotTable(spark, args.src_table)
        dst = SnapshotTable(spark, args.dst_table)
        if not dst.exists():
            SnapshotTable.create(spark, args.dst_table, src.manifest().schema(),
                                 key=src.manifest().key, n_buckets=args.buckets)
            dst = SnapshotTable(spark, args.dst_table)
        engine = CdcEngine(spark, dst, mode=args.mode)
        metrics = CascadeTailer(src, engine, args.cursor).run_once()
        print(json.dumps({
            "src_version": src.current_version(),
            "dst_version": dst.current_version(),
            "metrics": metrics,
        }, default=str))
        return 0

    if args.cmd == "historyize":
        from blockchain_etl_spark.streaming.cascade import CascadeTailer
        from blockchain_etl_spark.streaming.history import (
            create_history_table,
            history_transform,
        )

        src = SnapshotTable(spark, args.src_table)
        payload = [c for c in args.payload_cols.split(",") if c]
        hist = SnapshotTable(spark, args.hist_table)
        if not hist.exists():
            hist = create_history_table(
                spark, args.hist_table, src, payload, n_buckets=args.buckets
            )
        engine = CdcEngine(spark, hist, collect_metrics=False)
        metrics = CascadeTailer(
            src, engine, args.cursor, transform=history_transform(payload)
        ).run_once()
        print(json.dumps({
            "src_version": src.current_version(),
            "hist_version": hist.current_version(),
            "history_rows": read_state(hist).count(),
            "metrics": metrics,
        }, default=str))
        return 0

    if args.cmd == "replay":
        from blockchain_etl_spark.cdc.replay import replay_final_state
        from pyspark.sql import functions as F

        table = SnapshotTable.create(spark, args.table, TARGET_SCHEMA, n_buckets=args.buckets)
        events = spark.read.schema(EVENT_SCHEMA).parquet(args.events)
        final = replay_final_state(events).withColumn(
            "updated_epoch", F.lit(0)
        ).withColumn("deleted", F.lit(False))
        table.overwrite(final.select([f.name for f in TARGET_SCHEMA.fields]))
        print(json.dumps({"rows": table.read().count()}))
        return 0

    if args.cmd == "backfill":
        from blockchain_etl_spark.cdc.apply import CdcEngine

        table = SnapshotTable(spark, args.table)
        if not table.exists():
            print(json.dumps({"error": f"no table at {args.table}"}))
            return 2
        eng = CdcEngine(spark, table, collect_metrics=False)
        events = spark.read.parquet(args.events)
        metrics = eng.backfill_epoch(events, epoch_id=args.epoch_id)
        print(json.dumps({
            "backfilled": metrics is not None,
            "metrics": metrics,
            "watermark": table.manifest().watermark,
            "version": table.current_version(),
        }, default=str))
        return 0

    if args.cmd == "reconcile":
        from blockchain_etl_spark.cdc.reconcile import reconcile

        engine = CdcEngine(
            spark, SnapshotTable(spark, args.table), epoch_store=EpochStore(spark, args.store)
        )
        rng = None
        if args.expected_range:
            lo, hi = args.expected_range.split(":")
            rng = (int(lo), int(hi))
        print(json.dumps(
            reconcile(engine, expected_lsn_range=rng, autofix=not args.no_autofix),
            default=str,
        ))
        return 0

    if args.cmd == "merge":
        from pyspark.sql import functions as F

        from blockchain_etl_spark.cdc.apply import merge_into

        table = SnapshotTable(spark, args.table)
        eng = CdcEngine(spark, table, mode=args.mode)
        src = spark.read.parquet(args.source)
        dw = F.expr(args.delete_where) if args.delete_where else None
        metrics = merge_into(eng, src, delete_where=dw, epoch_id=args.epoch_id,
                             if_absent=args.if_absent)
        print(json.dumps(
            {"merged": metrics is not None, "metrics": metrics,
             "table_version": table.current_version()},
            default=str))
        return 0

    table = SnapshotTable(spark, args.table)
    if args.cmd == "compact":
        v = table.compact(cluster=args.cluster)
        print(json.dumps({"version": v}))
    elif args.cmd == "lookup":
        from blockchain_etl_spark.cdc.apply import point_lookup

        rows = point_lookup(table, args.key).collect()
        print(json.dumps({"key": args.key, "found": len(rows),
                          "rows": [r.asDict() for r in rows]}, default=str))
    elif args.cmd == "rebucket":
        v = table.rebucket(args.buckets)
        print(json.dumps({"version": v, "buckets": args.buckets}))
    elif args.cmd == "clone":
        c = table.clone_at(args.dst, version=args.version)
        print(json.dumps({"cloned": args.dst,
                          "source_version": c.manifest().lineage["source_version"]}))
    elif args.cmd == "gc":
        out = table.gc(keep_last_versions=args.keep_last_versions)
        print(json.dumps({**out, "version": table.current_version()}))
    elif args.cmd == "drop-chunks":
        before = len(table.manifest().files)
        v = table.drop_chunks(args.below)
        print(json.dumps({"version": v,
                          "files_dropped": before - len(table.manifest().files),
                          "rows": table.read().filter("NOT deleted").count()}))
    elif args.cmd == "publish":
        stage = SnapshotTable(spark, args.stage)
        v = table.publish_from(stage)
        print(json.dumps({"published": True, "version": v,
                          "rows": table.read().filter("NOT deleted").count()}))
    elif args.cmd == "vacuum":
        v = table.vacuum_tombstones(args.older_than_lsn)
        print(json.dumps({"version": v}))
    elif args.cmd == "changes":
        from pyspark.sql import functions as F

        if args.since_lsn is not None:
            # the diff plan executes once for the show/write and once for
            # the stats — persist so the second action reuses it
            ch = table.read_since_lsn(args.since_lsn).persist()
            if args.out:
                ch.write.mode("overwrite").parquet(args.out)
            else:
                ch.show(50, truncate=60)
            stats = ch.agg(
                F.count("*").alias("rows"),
                F.sum(F.col("deleted").cast("int")).alias("deletes"),
            ).first()
            ch.unpersist()
            print(json.dumps({
                "since_lsn": args.since_lsn,
                "rows": stats["rows"],
                "deletes": int(stats["deletes"] or 0),
            }))
            return 0
        if args.from_version is None:
            raise SystemExit("changes: --from-version or --since-lsn required")
        changed = table.changed_buckets(args.from_version, args.to_version)
        if args.per_commit:
            ch = table.read_changes_per_commit(
                args.from_version, args.to_version
            ).persist()
        else:
            ch = table.read_changes(
                args.from_version, args.to_version, buckets=changed
            ).persist()
        if getattr(args, "envelope", None) == "debezium":
            if args.per_commit:
                raise SystemExit(
                    "changes: --envelope is defined for the netted change "
                    "feed only (drop --per-commit)"
                )
            from pyspark.sql import types as _T

            from blockchain_etl_spark.sources.envelope import cdf_to_debezium

            m_ = table.manifest()
            meta_ = {"lsn", "seq", "updated_epoch", "deleted"}
            row_schema_ = _T.StructType(
                [f for f in m_.schema().fields if f.name not in meta_]
            )
            env = cdf_to_debezium(ch, key_col=m_.key, row_schema=row_schema_)
            lines = [r["value"] for r in env.collect()]
            if args.out:
                with open(args.out, "w") as f:
                    f.write("\n".join(lines) + ("\n" if lines else ""))
            else:
                for ln in lines[:50]:
                    print(ln)
            ch.unpersist()
            print(json.dumps({
                "from_version": args.from_version,
                "to_version": args.to_version
                if args.to_version is not None else table.current_version(),
                "envelopes": len(lines),
                "out": args.out,
            }))
            return 0
        if args.out:
            ch.write.mode("overwrite").parquet(args.out)
        else:
            ch.show(50, truncate=60)
        counts = {
            r["_change_type"]: r["n"]
            for r in ch.groupBy("_change_type").agg(
                F.count("*").alias("n")).collect()
        }
        ch.unpersist()
        print(json.dumps({
            "from_version": args.from_version,
            "to_version": args.to_version
            if args.to_version is not None else table.current_version(),
            "changed_buckets": changed,
            "counts": counts,
        }))
    elif args.cmd == "show":
        at_version = None
        if getattr(args, "at_lsn", None) is not None:
            at_version = table.latest_version_at_or_before(args.at_lsn)
            if at_version is None:
                print(json.dumps({"error": f"no snapshot at or before lsn {args.at_lsn}"}))
                return 2
        if args.what == "state":
            st = read_state(table, version=at_version)
            st.show(50, truncate=60)
            print(json.dumps({"rows": st.count(), "version": at_version}))
        elif args.what == "metrics":
            CdcEngine(spark, table).read_metrics().show(50, truncate=120)
        else:
            m = table.manifest(at_version)
            print(json.dumps({
                "version": m.version, "watermark": m.watermark,
                "applied_epochs": m.applied_epochs[-20:],
                "n_files": len(m.files), "schema_version": m.schema_version,
                "lineage": m.lineage,
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
