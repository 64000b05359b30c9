"""Query catalog: every implemented operator as a (spark, sf_dir) →
DataFrame callable, with its exact-ANSI-SQL DuckDB oracle twin.

This feeds ``__spark_entry__.queries()`` / ``oracle_sql()`` — the
driver runs both sides at sf=0.01 and compares row counts, schemas and
value hashes, so every alias here matches the SQL exactly.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve against module globals
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.replay import replay_final_state
from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA
from blockchain_etl_spark.functions import text as X
from blockchain_etl_spark.operators import (
    dedup,
    multimodal,
    ordering,
    relational,
    similarity,
)

# --------------------------------------------------------------------------
# Derived change-log: a deterministic CDC event stream computed FROM the
# driver's tables (events ⋈ documents), so the DuckDB oracle can derive
# the identical stream. This is the flagship's input (BASELINE.json
# input_hint shape: doc_id, tokens:array<int32>, n_tok, source).
# --------------------------------------------------------------------------

_LSN_DIV = 4          # events per lsn
_REORG_MOD = 211      # event_id % m == r → R marker
_REORG_AT = 199
_REORG_DEPTH = 5
_INVALID_MOD = 97     # event_id % m == i → corrupted n_tok (must be rejected)
_INVALID_AT = 13
_VOCAB = 32768


def derive_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ documents → EVENT_SCHEMA change-log, fully deterministic."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = d.count()

    doc_key = (F.col("user_id") * 7 + F.col("event_id") % 13) % n_docs
    op = (
        F.when(F.col("event_id") % _REORG_MOD == _REORG_AT, F.lit("R"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type").isin("purchase", "signup"), F.lit("I"))
        .otherwise(F.lit("U"))
    )
    # tokenize each document ONCE (5k docs), not once per event (100k+):
    # the join then carries the token arrays — at scale this is the
    # dimension-side precompute that keeps the per-event path array-copy
    # only, no per-event hashing
    d_tok = d.select(
        F.col("doc_id").alias("doc_key"),
        X.tokenize(F.col("text"), vocab=_VOCAB).alias("_toks"),
        "source",
    )
    # the tokenized dim is small (n_docs rows) — broadcast it so the
    # per-event side never shuffles
    ev = e.select(
        F.col("event_id"),
        op.alias("op"),
        doc_key.alias("doc_key"),
    ).join(F.broadcast(d_tok), "doc_key", "left")

    lsn = F.expr(f"event_id div {_LSN_DIV}")
    tokens = F.col("_toks")
    payload = F.col("op").isin("I", "U")
    n_tok = (
        F.size(tokens)
        + F.when(F.col("event_id") % _INVALID_MOD == _INVALID_AT, 1).otherwise(0)
    ).cast("int")
    out = ev.select(
        F.col("event_id").alias("stream_pos"),
        lsn.cast("long").alias("lsn"),
        (F.col("event_id") % _LSN_DIV).cast("int").alias("seq"),
        "op",
        F.when(F.col("op") != "R", F.format_string("doc-%06d", F.col("doc_key"))).alias(
            "doc_id"
        ),
        F.when(payload, tokens).alias("tokens"),
        F.when(payload, n_tok).alias("n_tok"),
        F.when(payload, F.col("source")).alias("source"),
        F.when(F.col("op") == "R", F.greatest(lsn - _REORG_DEPTH, F.lit(0)))
        .cast("long")
        .alias("rollback_to_lsn"),
        F.md5(F.concat(F.lit("h"), lsn.cast("string"))).alias("epoch_hash"),
    )
    return out.select([f.name for f in EVENT_SCHEMA.fields])


# DuckDB twin of derive_changelog, as a CTE body (shared by oracles)
_CHANGELOG_CTE = f"""
  nd AS (SELECT count(*) AS n_docs FROM documents),
  raw AS (
    SELECT e.event_id,
           CASE WHEN e.event_id % {_REORG_MOD} = {_REORG_AT} THEN 'R'
                WHEN e.event_type = 'error' THEN 'D'
                WHEN e.event_type IN ('purchase','signup') THEN 'I'
                ELSE 'U' END AS op,
           (e.user_id * 7 + e.event_id % 13) % nd.n_docs AS doc_key
    FROM events e CROSS JOIN nd
  ),
  joined AS (
    SELECT r.*, d.text, d.source AS dsource
    FROM raw r LEFT JOIN documents d ON d.doc_id = r.doc_key
  ),
  changelog AS (
    SELECT event_id AS stream_pos,
           event_id // {_LSN_DIV} AS lsn,
           (event_id % {_LSN_DIV})::INT AS seq,
           op,
           CASE WHEN op <> 'R' THEN 'doc-' || lpad(doc_key::VARCHAR, 6, '0') END AS doc_id,
           CASE WHEN op IN ('I','U') THEN
             list_transform(
               list_filter(string_split_regex(text, '\\s+'), w -> w <> ''),
               w -> ((('0x' || substr(md5(w), 1, 6))::BIGINT % {_VOCAB}))::INT)
           END AS tokens,
           CASE WHEN op IN ('I','U') THEN
             (len(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''))
              + CASE WHEN event_id % {_INVALID_MOD} = {_INVALID_AT} THEN 1 ELSE 0 END)::INT
           END AS n_tok,
           CASE WHEN op IN ('I','U') THEN dsource END AS source,
           CASE WHEN op = 'R' THEN greatest(event_id // {_LSN_DIV} - {_REORG_DEPTH}, 0) END
             AS rollback_to_lsn
    FROM joined
  )
"""

_CDC_FINAL_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT *,
         min(CASE WHEN op = 'R' THEN rollback_to_lsn END)
           OVER (ORDER BY stream_pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS min_rb_after
  FROM changelog
),
live AS (
  SELECT * FROM ev
  WHERE op IN ('I','U','D')
    AND (min_rb_after IS NULL OR lsn <= min_rb_after)
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
last AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
  FROM live
)
SELECT doc_id, array_to_string(tokens, ',') AS tokens_csv, n_tok, source, lsn, seq
FROM last WHERE rn = 1 AND op <> 'D'
"""


def cdc_replay_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token arrays are serialized to a deterministic CSV string so the
    # driver's canonicalizer (pandas sort/hash) can compare them; n_tok
    # keeps the length invariant checkable.
    # R markers are derivable from the cheap events table alone — passing
    # them avoids re-executing the whole events⋈documents derivation for
    # the marker collect (measured ~2× on the flagship bench query)
    lsn = F.expr(f"event_id div {_LSN_DIV}").cast("long")
    mk = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id") % _REORG_MOD == _REORG_AT)
        .select(
            F.col("event_id").alias("stream_pos"),
            lsn.alias("lsn"),
            F.greatest(lsn - _REORG_DEPTH, F.lit(0)).cast("long").alias(
                "rollback_to_lsn"
            ),
        )
    )
    final = replay_final_state(derive_changelog(spark, sf_dir), markers_df=mk)
    return final.select(
        "doc_id",
        F.concat_ws(",", F.col("tokens").cast("array<string>")).alias("tokens_csv"),
        "n_tok",
        "source",
        "lsn",
        "seq",
    )


def partitioned_tail_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END partitioned-bus ingest (table-build demo): the derived
    changelog is routed onto a 3-partition topic the way a CDC producer
    keys one (``hash(doc_id) % 3``, reorg markers replicated to every
    partition), landed as per-partition segment files, and consumed by
    ``PartitionedTailer`` — per-partition positional consumption, safe
    (min-head) watermark holdback, marker-copy completeness, one
    deduped marker re-linearized into the union batch. The final table
    state must equal the ordinary totally-ordered replay — the same
    oracle as ``cdc_replay_final_state`` — proving the partitioned
    consumer loses nothing to reordering across partitions.
    ≙ the reference's single streamer loop (streamer.py) lifted to the
    Kafka-topic shape it cannot consume."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.streaming.partitioned import (
        PartitionedTailer,
        split_changelog,
        write_partition_segments,
    )
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev = derive_changelog(spark, sf_dir)
    routed = split_changelog(ev, 3).cache()
    max_lsn = routed.agg(F.max("lsn")).first()[0]
    work = _pid_scoped_gate_dir("partitioned-tail-gate")
    land = os.path.join(work, "land")
    # four lsn-range segments per partition. NOTE this is valid ONLY
    # because the derived changelog emits each event exactly once with
    # lsn strictly monotone in stream_pos (no post-marker re-emission —
    # its R markers void ranges without re-emitting), so lsn slicing IS
    # positional slicing here. Streams with reused LSNs (the generator)
    # must slice by stream position, as the tests do.
    w = max(max_lsn // 4, 1)
    for k in range(4):
        lo, hi = k * w, ((k + 1) * w if k < 3 else max_lsn + 1)
        write_partition_segments(
            routed.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
            land, k, n_parts=3,
        )
    t = SnapshotTable.create(
        spark, os.path.join(work, "t"), TARGET_SCHEMA, key="doc_id", n_buckets=8
    )
    eng = CdcEngine(
        spark, t,
        epoch_store=EpochStore(spark, os.path.join(work, "store")),
        collect_metrics=False,
    )
    PartitionedTailer(spark, land, eng, n_parts=3).run_until_drained()
    routed.unpersist()
    return t.read().filter("NOT deleted").select(
        "doc_id",
        F.concat_ws(",", F.col("tokens").cast("array<string>")).alias("tokens_csv"),
        "n_tok",
        "source",
        "lsn",
        "seq",
    )


def cdc_changelog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage-style per-op stats over the derived change-log (≙ the
    PERF counters, eth_streamer_adapter.py:251-256)."""
    ev = derive_changelog(spark, sf_dir)
    return ev.groupBy("op").agg(
        F.count("*").alias("n_events"),
        F.min("lsn").alias("lsn_min"),
        F.max("lsn").alias("lsn_max"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum(F.size("tokens")).alias("total_tokens"),
    )


_CDC_STATS_SQL = f"""
WITH {_CHANGELOG_CTE}
SELECT op,
       count(*) AS n_events,
       min(lsn) AS lsn_min,
       max(lsn) AS lsn_max,
       count(DISTINCT doc_id) AS n_docs,
       sum(len(tokens)) AS total_tokens
FROM changelog GROUP BY op
"""


def _pid_scoped_gate_dir(prefix: str) -> str:
    """Fresh per-process scratch dir for gate tables/caches.

    Pid-scoped: reusing one dir per process bounds the footprint to one
    copy per live process (a rerun in the same process — e.g. bench.py's
    cold+3-warm repeats — rebuilds over its own previous copy instead of
    leaking a populated dir per invocation), and GC only reclaims dirs
    whose owning process is provably dead — never a concurrent run's
    live files, however long it has been up."""
    import os
    import shutil
    import tempfile

    tmp_root = tempfile.gettempdir()
    for d in os.listdir(tmp_root):
        if d.startswith(prefix + "-"):
            try:
                owner = int(d.rsplit("-", 1)[1])
                os.kill(owner, 0)  # raises if the process is gone
            except (ValueError, ProcessLookupError):
                shutil.rmtree(os.path.join(tmp_root, d), ignore_errors=True)
            except PermissionError:
                pass  # alive under another uid — leave it

    path = os.path.join(tmp_root, f"{prefix}-{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental scan over the engine's own target table (≙ the
    downstream-cascade read: Delta CDF ``table_changes`` / Iceberg
    incremental scan — the capability that lets one ingest stage tail
    the previous stage's table instead of the upstream bus).

    Applies the derived changelog (reorg markers and the invalid-payload
    rejection path are cdc_replay_final_state's job — filtered here) to
    a real SnapshotTable in TWO copy-on-write commits split at the
    median LSN, then emits ``read_changes(v0, v1)``. The oracle twin
    recomputes the same diff relationally: last-writer state at the two
    cut points, full-outer-joined and classified.
    """
    import os
    import tempfile

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    # the same validity filter the oracle twin applies — the median split
    # must be computed over the IDENTICAL event set on both sides, or a
    # dataset whose max-lsn event is payload-invalid shifts the epoch
    # boundary by one lsn and the two states diverge
    ev = derive_changelog(spark, sf_dir).filter(
        F.col("op").isin("I", "U", "D")
        & (
            (F.col("op") == "D")
            | (F.col("tokens").isNotNull() & (F.col("n_tok") == F.size("tokens")))
        )
    )
    mid = ev.agg(F.max("lsn")).first()[0] // 2

    path = _pid_scoped_gate_dir("table-changes-gate")
    table = SnapshotTable.create(
        spark, path, TARGET_SCHEMA, key="doc_id", n_buckets=16
    )
    eng = CdcEngine(spark, table, mode="cow", collect_metrics=False)
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    v0 = table.current_version()
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    v1 = table.current_version()

    return table.read_changes(v0, v1).select(
        F.col("_change_type").alias("change_type"),
        "doc_id",
        F.concat_ws(",", F.col("tokens").cast("array<string>")).alias("tokens_csv"),
        "n_tok",
        "source",
        "lsn",
        "seq",
    )


def _changelog_valid(spark: SparkSession, sf_dir: str):
    """The gate-shared event stream: valid I/U/D events (the reorg and
    rejection paths are cdc_replay_final_state's job) + the median-LSN
    epoch split — the SAME filter/split the oracle twins encode."""
    ev = derive_changelog(spark, sf_dir).filter(
        F.col("op").isin("I", "U", "D")
        & (
            (F.col("op") == "D")
            | (F.col("tokens").isNotNull() & (F.col("n_tok") == F.size("tokens")))
        )
    )
    return ev, ev.agg(F.max("lsn")).first()[0] // 2


def _pipeline_gate(
    spark: SparkSession,
    sf_dir: str,
    prefix: str,
    entities: list[str],
    root_buckets: int = 8,
):
    """Shared scaffold for the entity-DAG gates: ingest the filtered
    changelog into a root table in TWO copy-on-write commits with a
    pipeline hop after each (the incremental path), return the pipeline."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.pipeline import EntityPipeline
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir(prefix)
    table = SnapshotTable.create(
        spark, os.path.join(work, "docs"), TARGET_SCHEMA, key="doc_id",
        n_buckets=root_buckets,
    )
    eng = CdcEngine(spark, table, mode="cow", collect_metrics=False)
    pipe = EntityPipeline(spark, table, work, entities, n_buckets=8)
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    pipe.run_once()
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    pipe.run_once()
    return pipe


def entity_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependency-DAG fan-out ≙ eth_streamer_adapter.py:354-403
    (``_should_export`` over the entity_type.py catalog): the derived
    changelog ingests into a root docs table in two commits, and an
    :class:`EntityPipeline` requested for {source_stats, long_docs}
    pulls the docs→doc_stats→source_stats chain plus the filtered
    replica through cascade hops after EACH commit — hop 2 recomputes
    only the sources the second commit touched. Returns the converged
    source_stats table; the oracle recomputes it as a grouped aggregate
    over relational last-writer state."""
    pipe = _pipeline_gate(
        spark, sf_dir, "entity-pipeline-gate", ["source_stats", "long_docs"],
        root_buckets=16,
    )
    return pipe.state("source_stats").select(
        F.col("doc_id").alias("source"), "n_docs", "total_tokens"
    )


_ENTITY_PIPELINE_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
)
SELECT source, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS total_tokens
FROM fin GROUP BY source
"""


def pipeline_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent cross-DAG time travel: after TWO ingest+hop rounds,
    pin the whole docs→doc_stats→source_stats closure at the FIRST
    barrier (every entity's hop cursor aligned at the same upstream
    version) and read the derived table as of that moment — later
    commits invisible, no table read at a version its siblings don't
    match (the multi-table consistency the reference gets for free from
    one Postgres transaction per batch, re-established here across
    independent table commits). Oracle: the stats recomputed over only
    the first half of the event stream."""
    pipe = _pipeline_gate(
        spark, sf_dir, "pipeline-snapshot-gate", ["source_stats"]
    )
    barriers = pipe.consistent_barriers()  # one manifest walk, reused
    pins = pipe.snapshot(at_src_version=min(barriers), barriers=barriers)
    return pipe.state_at("source_stats", pins).select(
        F.col("doc_id").alias("source"), "n_docs", "total_tokens"
    )


_PIPELINE_SNAPSHOT_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
mx AS (SELECT max(lsn) // 2 AS mid FROM ev),
s0 AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e, mx WHERE e.lsn <= mx.mid) WHERE rn = 1 AND op <> 'D'
)
SELECT source, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS total_tokens
FROM s0 GROUP BY source
"""


def incremental_agg_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential aggregate maintenance (the Materialize/DBSP shape;
    ≙ the reference's downstream per-source stat tables re-aggregated
    by each consumer, blockchainetl/streaming consumer loop): a grouped
    count/sum MV is maintained purely from the source table's CDF —
    each change row becomes a SIGNED delta (retraction on
    delete/update_preimage), deltas fold into a column-merge-policy
    table through cascade hops after each of two commits. The hop cost
    is O(changed rows), never O(source) or O(MV). The oracle recomputes
    the same aggregate from scratch over last-writer final state —
    parity proves insert/update/delete retraction arithmetic across
    commits."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.aggregate_mv import (
        agg_mv_transform,
        create_agg_mv,
        mv_state,
    )
    from blockchain_etl_spark.streaming.cascade import CascadeTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("agg-mv-gate")
    src = SnapshotTable.create(
        spark, os.path.join(work, "src"), TARGET_SCHEMA, key="doc_id", n_buckets=16
    )
    eng = CdcEngine(spark, src, mode="cow", collect_metrics=False)
    mv = create_agg_mv(
        spark, os.path.join(work, "mv"), "source", {"total_tokens": "n_tok"},
        n_buckets=4,
    )
    tailer = CascadeTailer(
        src,
        CdcEngine(spark, mv, collect_metrics=False),
        os.path.join(work, "mv_cursor.json"),
        transform=agg_mv_transform("source", {"total_tokens": "n_tok"}),
    )
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    tailer.run_once()
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    tailer.run_once()
    return mv_state(mv, "source").select(
        "source", F.col("n_rows").alias("n_docs"), "total_tokens"
    )


_AGG_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
)
SELECT coalesce(source, '(null)') AS source,
       count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS total_tokens
FROM fin GROUP BY 1
"""


def incremental_distinct_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental COUNT(DISTINCT) — the aggregate that does NOT
    decompose into signed sums — maintained as a two-stage MV cascade
    (distinct-reduce feeding a count-reduce, the differential-dataflow
    composition; ≙ the reference's consumers re-running COUNT(DISTINCT)
    over their whole upstream table every poll): stage 1 folds the
    source CDF into a (group, value)-pair occurrence MV, stage 2 folds
    THAT MV's CDF into per-group counts of live pairs. Each hop is
    O(changed rows); neither the source nor either MV is rescanned.
    The oracle recomputes count(distinct n_tok) from scratch over
    last-writer final state — parity proves the liveness-transition
    algebra (duplicate values collapse, last-holder retraction, value
    reappearance) across two commit rounds."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.aggregate_mv import DistinctCountMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("distinct-mv-gate")
    src = SnapshotTable.create(
        spark, os.path.join(work, "src"), TARGET_SCHEMA, key="doc_id", n_buckets=16
    )
    eng = CdcEngine(spark, src, mode="cow", collect_metrics=False)
    dc = DistinctCountMV(
        spark, src, os.path.join(work, "dc"), "source", "n_tok", n_buckets=4
    )
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    dc.run_once()
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    dc.run_once()
    return dc.state().select("source", "n_distinct")


_DISTINCT_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
)
SELECT coalesce(source, '(null)') AS source,
       count(DISTINCT n_tok)::BIGINT AS n_distinct
FROM fin GROUP BY 1
"""


def incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained equi-join (the bilinear differential
    rule Δ(A⋈B) = ΔA⋈B_old + A_new⋈ΔB; ≙ the reference's enrichment
    consumers re-joining token_transfer ⋈ token dimension on every
    poll, eth_token_service lookups in the streaming loop): a fact
    table and a dimension table each ingest two CDC epochs, with a
    JoinMV hop after each round — fact deltas join the PRE-hop dim
    snapshot (bucket-pruned on the join key), dim deltas broadcast
    against the POST-hop fact state, and the signed tuple deltas fold
    into a Z-set policy table (multiplicity add, payload first). The
    dim reweights half its rows in round 2, so every matching tuple
    must retract + reinsert. The oracle joins the two streams' final
    last-writer states from scratch."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.join_mv import JoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("join-mv-gate")
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), TARGET_SCHEMA, key="doc_id",
        n_buckets=16,
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    dim_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),  # holds the source value
        T.StructField("weight", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    dim = SnapshotTable.create(
        spark, os.path.join(work, "dim"), dim_schema, key="doc_id", n_buckets=4
    )
    deng = CdcEngine(spark, dim, mode="cow", collect_metrics=False)
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

    jm = JoinMV(
        spark, fact, dim, os.path.join(work, "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=8,
    )
    deng.apply_epoch(_dim_ev(srcs, 1, F.length("source") * 10), epoch_id=1)
    feng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    jm.run_once()
    # round 2: even-length sources reweight -> retract + reinsert
    deng.apply_epoch(
        _dim_ev(
            srcs.filter(F.length("source") % 2 == 0), 2,
            F.length("source") * 10 + 7,
        ),
        epoch_id=2,
    )
    feng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    jm.run_once()
    return jm.state().select("fact_id", "source", "n_tok", "weight")


_JOIN_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
dimw AS (
  SELECT source,
         (CASE WHEN length(source) % 2 = 0
               THEN length(source) * 10 + 7
               ELSE length(source) * 10 END)::BIGINT AS weight
  FROM (SELECT DISTINCT source FROM ev WHERE source IS NOT NULL)
)
SELECT f.doc_id AS fact_id, f.source, f.n_tok, w.weight
FROM fin f JOIN dimw w ON f.source = w.source
"""


def left_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained LEFT OUTER join (≙ the reference's
    enrichments that must keep the fact row when the dimension is
    missing — token transfers whose token metadata hasn't been fetched
    yet, eth_token_service cache misses): inner JoinMV ∪ an unmatched
    Z-set maintained by ΔU = ΔA⋈(1−m_old) − A_new⋈Δm, where m's
    transitions come from the dim CDF and A@new is probed through a
    version-pinned fact-side secondary index. The dim covers only PART
    of the sources; round 2 deletes some dims (matched → unmatched:
    null-extended rows must REAPPEAR) and late-creates others
    (unmatched → matched). Oracle: LEFT JOIN of final states."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.join_mv import LeftJoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("left-join-mv-gate")
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), TARGET_SCHEMA, key="doc_id",
        n_buckets=16,
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    dim_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("weight", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    dim = SnapshotTable.create(
        spark, os.path.join(work, "dim"), dim_schema, key="doc_id", n_buckets=4
    )
    deng = CdcEngine(spark, dim, mode="cow", collect_metrics=False)
    srcs = ev.filter(F.col("source").isNotNull()).select("source").distinct()
    ln = F.length("source")

    def _dim_ev(df, lsn, seq, op, weight_col):
        return df.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(seq).cast("int").alias("seq"),
            F.lit(op).alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.col("source").alias("doc_id"),
            weight_col.cast("long").alias("weight"),
        )

    jm = LeftJoinMV(
        spark, fact, dim, os.path.join(work, "ljm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=8,
    )
    # membership keys off the LAST character's codepoint (source
    # lengths in the testdata are near-uniform — length-mod predicates
    # would collapse the final dim set to empty)
    la = F.ascii(F.substring("source", -1, 1))
    # round 1: dims only for even-codepoint sources
    deng.apply_epoch(
        _dim_ev(srcs.filter(la % 2 == 0), 1, 0, "U", ln * 10), epoch_id=1
    )
    feng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    jm.run_once()
    # round 2: cp%4==0 dims deleted (matched -> unmatched), cp%3==0
    # dims (re)created at weight len*10+5 (some unmatched -> matched;
    # cp%12==0 is delete+reinsert inside one epoch, seq orders it)
    deng.apply_epoch(
        _dim_ev(srcs.filter(la % 4 == 0), 2, 0, "D", F.lit(None)).unionByName(
            _dim_ev(srcs.filter(la % 3 == 0), 2, 1, "U", ln * 10 + 5)
        ),
        epoch_id=2,
    )
    feng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    jm.run_once()
    return jm.state().select("fact_id", "source", "n_tok", "weight")


_LEFT_JOIN_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
dimw AS (
  SELECT source,
         (CASE WHEN ascii(right(source, 1)) % 3 = 0
               THEN length(source) * 10 + 5
               ELSE length(source) * 10 END)::BIGINT AS weight
  FROM (SELECT DISTINCT source FROM ev WHERE source IS NOT NULL)
  WHERE (ascii(right(source, 1)) % 2 = 0 AND ascii(right(source, 1)) % 4 <> 0)
     OR ascii(right(source, 1)) % 3 = 0
)
SELECT f.doc_id AS fact_id, f.source, f.n_tok, w.weight
FROM fin f LEFT JOIN dimw w ON f.source = w.source
"""


def full_outer_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained FULL OUTER join (≙ the reference's
    reconciliation joins that must surface BOTH sides' orphans —
    eth_balance_adapter's send⟗recv zero-fill, dim rows nothing refers
    to): a LeftJoinMV plus a dim-side unmatched Z-set maintained by
    ΔU_B = ΔB⋈(1−m_A@old) − B@new⋈Δm_A, fact-value liveness transitions
    probed from the version-pinned fact index at both cursor endpoints.
    The dim universe = sources ∪ 'zz#'-prefixed synthetics (guaranteed
    no fact row → always dim-unmatched); round 2 deletes/re-creates
    dims and applies the changelog's second half (fact deletions can
    flip a dim to unmatched). Oracle: FULL OUTER JOIN of final
    states."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.join_mv import FullOuterJoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("full-outer-join-mv-gate")
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), TARGET_SCHEMA, key="doc_id",
        n_buckets=16,
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    dim_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("weight", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    dim = SnapshotTable.create(
        spark, os.path.join(work, "dim"), dim_schema, key="doc_id", n_buckets=4
    )
    deng = CdcEngine(spark, dim, mode="cow", collect_metrics=False)
    srcs = ev.filter(F.col("source").isNotNull()).select("source").distinct()
    vals = srcs.unionByName(
        srcs.filter(F.length("source") % 5 == 0)
        .select(F.concat(F.lit("zz#"), F.col("source")).alias("source"))
    ).distinct()
    ln = F.length("source")

    def _dim_ev(df, lsn, seq, op, weight_col):
        return df.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(seq).cast("int").alias("seq"),
            F.lit(op).alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.col("source").alias("doc_id"),
            weight_col.cast("long").alias("weight"),
        )

    jm = FullOuterJoinMV(
        spark, fact, dim, os.path.join(work, "fjm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=8,
    )
    # membership keys off the LAST character's codepoint (lengths in
    # the testdata are near-uniform; the zz# prefix keeps the tail)
    la = F.ascii(F.substring("source", -1, 1))
    # round 1: dims only for even-codepoint values
    deng.apply_epoch(
        _dim_ev(vals.filter(la % 2 == 0), 1, 0, "U", ln * 10), epoch_id=1
    )
    feng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    jm.run_once()
    # round 2: cp%4==0 dims deleted, cp%3==0 (re)created at len*10+5;
    # the changelog's second half brings fact updates AND deletions
    deng.apply_epoch(
        _dim_ev(vals.filter(la % 4 == 0), 2, 0, "D", F.lit(None)).unionByName(
            _dim_ev(vals.filter(la % 3 == 0), 2, 1, "U", ln * 10 + 5)
        ),
        epoch_id=2,
    )
    feng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    jm.run_once()
    return jm.state().select("fact_id", "source", "n_tok", "dim_id", "weight")


_FULL_OUTER_JOIN_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
srcs AS (SELECT DISTINCT source FROM ev WHERE source IS NOT NULL),
vals AS (
  SELECT DISTINCT v FROM (
    SELECT source AS v FROM srcs
    UNION ALL
    SELECT 'zz#' || source FROM srcs WHERE length(source) % 5 = 0)
),
dimw AS (
  SELECT v AS dim_id,
         (CASE WHEN ascii(right(v, 1)) % 3 = 0
               THEN length(v) * 10 + 5
               ELSE length(v) * 10 END)::BIGINT AS weight
  FROM vals
  WHERE (ascii(right(v, 1)) % 2 = 0 AND ascii(right(v, 1)) % 4 <> 0)
     OR ascii(right(v, 1)) % 3 = 0
)
SELECT f.doc_id AS fact_id, f.source, f.n_tok, w.dim_id, w.weight
FROM fin f FULL OUTER JOIN dimw w ON f.source = w.dim_id
"""


def asof_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained LEFT AS-OF join (point-in-time: each
    fact row gets the latest history row of its key at-or-before the
    fact's event time — ≙ the reference's block-by-timestamp
    resolution, graph_operations.py:44-120, and the leak-free
    feature-snapshot join a training pipeline needs). History rows sit
    at lsn breakpoints {0, max/3, 2max/3}; the max/3 set arrives in
    round 2 as a BACKFILL, retroactively rewriting exactly the facts
    in its win window. Oracle: windowed arg-max over vf <= ets."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.streaming.join_mv import AsofJoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("asof-join-mv-gate")
    fact_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("ets", T.LongType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), fact_schema, key="doc_id",
        n_buckets=16,
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    hist_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("hk", T.StringType()),
        T.StructField("vf", T.LongType()),
        T.StructField("weight", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    hist = SnapshotTable.create(
        spark, os.path.join(work, "hist"), hist_schema, key="doc_id",
        n_buckets=4, bucket_key="hk",
    )
    heng = CdcEngine(spark, hist, mode="cow", collect_metrics=False)
    fact_ev = ev.select(
        "stream_pos", "lsn", "seq", "op", "rollback_to_lsn", "doc_id",
        "source", F.col("lsn").alias("ets"), "n_tok",
    )
    srcs = ev.filter(F.col("source").isNotNull()).select("source").distinct()
    mx = ev.agg(F.max("lsn")).collect()[0][0]
    t1, t2 = mx // 3, 2 * mx // 3
    la = F.ascii(F.substring("source", -1, 1))

    def _hist_ev(pairs, lsn):
        # pairs: (hk string, vf long); weight is a pure function of the
        # pair so duplicate upserts are value-identical
        return pairs.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.concat("hk", F.lit("@"), F.col("vf").cast("string")).alias("doc_id"),
            "hk",
            "vf",
            (F.length("hk") * 1000 + F.col("vf")).cast("long").alias("weight"),
        )

    jm = AsofJoinMV(
        spark, fact, hist, os.path.join(work, "asof"), join_col="source",
        ts_col="ets", hist_key_col="hk", hist_ts_col="vf",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=8,
    )
    base = srcs.filter(la % 3 != 0).select(
        F.col("source").alias("hk"), F.lit(0).cast("long").alias("vf")
    ).unionByName(
        srcs.select(F.col("source").alias("hk"),
                    F.lit(t2).cast("long").alias("vf"))
    ).distinct()
    heng.apply_epoch(_hist_ev(base, 1), epoch_id=1)
    feng.apply_epoch(fact_ev.filter(F.col("lsn") <= mid), epoch_id=1)
    jm.run_once()
    # round 2: the max/3 set lands LATE — a backfill between the
    # existing breakpoints — while the changelog's second half churns
    backfill = srcs.filter(la % 2 == 0).select(
        F.col("source").alias("hk"), F.lit(t1).cast("long").alias("vf")
    ).distinct()
    heng.apply_epoch(_hist_ev(backfill, 2), epoch_id=2)
    feng.apply_epoch(fact_ev.filter(F.col("lsn") > mid), epoch_id=2)
    jm.run_once()
    return jm.state().select(
        "fact_id", "source", "ets", "n_tok", "vf", "weight"
    )


_ASOF_JOIN_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
srcs AS (SELECT DISTINCT source FROM ev WHERE source IS NOT NULL),
mx AS (SELECT max(lsn) AS m FROM ev),
dimh AS (
  SELECT DISTINCT hk, vf FROM (
    SELECT source AS hk, (0)::BIGINT AS vf FROM srcs
    WHERE ascii(right(source, 1)) % 3 <> 0
    UNION ALL
    SELECT source, ((SELECT m FROM mx) // 3)::BIGINT FROM srcs
    WHERE ascii(right(source, 1)) % 2 = 0
    UNION ALL
    SELECT source, (2 * (SELECT m FROM mx) // 3)::BIGINT FROM srcs)
),
dimw AS (
  SELECT hk, vf, (length(hk) * 1000 + vf)::BIGINT AS weight FROM dimh
),
resolved AS (
  SELECT f.doc_id AS fact_id, f.source, f.lsn AS ets, f.n_tok, d.vf, d.weight,
         row_number() OVER (PARTITION BY f.doc_id ORDER BY d.vf DESC) AS rn2
  FROM fin f LEFT JOIN dimw d ON f.source = d.hk AND d.vf <= f.lsn
)
SELECT fact_id, source, ets, n_tok, vf, weight FROM resolved WHERE rn2 = 1
"""


def range_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained RANGE (interval) join on a grid-cell
    index (≙ the reference's block-height-window rules — alert
    conditions like "amount in [lo, hi)" over a sliding band, but as a
    maintained N:M MV). Facts carry v = n_tok; overlapping interval
    bands land in round 1, then round 2 deletes every other band and
    adds shifted ones while the changelog's second half churns the
    fact side. Oracle: plain BETWEEN-style theta join of final
    states."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.streaming.join_mv import RangeJoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("range-join-mv-gate")
    fact_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), fact_schema, key="doc_id",
        n_buckets=16,
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    ivl_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("lo", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("w", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    ivl = SnapshotTable.create(
        spark, os.path.join(work, "ivl"), ivl_schema, key="doc_id",
        n_buckets=4,
    )
    ieng = CdcEngine(spark, ivl, mode="cow", collect_metrics=False)
    fact_ev = ev.select(
        "stream_pos", "lsn", "seq", "op", "rollback_to_lsn", "doc_id",
        F.col("n_tok").cast("long").alias("v"), "source",
    )

    def _ivl_ev(df, lsn, op):
        return df.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.col("id").cast("int").alias("seq"),
            F.lit(op).alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.col("ivl_id").alias("doc_id"),
            F.col("lo").cast("long").alias("lo"),
            F.col("hi").cast("long").alias("hi"),
            F.col("w").cast("long").alias("w"),
        )

    jm = RangeJoinMV(
        spark, fact, ivl, os.path.join(work, "rng"), val_col="v",
        lo_col="lo", hi_col="hi", fact_cols=["source"], dim_cols=["w"],
        cell_size=8, n_buckets=8,
    )
    band_a = spark.range(16).select(
        "id", F.concat(F.lit("a"), F.col("id")).alias("ivl_id"),
        (F.col("id") * 4).alias("lo"), (F.col("id") * 4 + 6).alias("hi"),
        (F.col("id") + 100).alias("w"),
    )
    band_b = spark.range(8).select(
        "id", F.concat(F.lit("b"), F.col("id")).alias("ivl_id"),
        (F.col("id") * 8 + 2).alias("lo"), (F.col("id") * 8 + 9).alias("hi"),
        (F.col("id") + 200).alias("w"),
    )
    ieng.apply_epoch(_ivl_ev(band_a, 1, "I"), epoch_id=1)
    feng.apply_epoch(fact_ev.filter(F.col("lsn") <= mid), epoch_id=1)
    jm.run_once()
    ieng.apply_epoch(
        _ivl_ev(band_a.filter(F.col("id") % 2 == 1), 2, "D").unionByName(
            _ivl_ev(band_b, 3, "I")
        ),
        epoch_id=2,
    )
    feng.apply_epoch(fact_ev.filter(F.col("lsn") > mid), epoch_id=2)
    jm.run_once()
    return jm.state().select(
        "fact_id", "v", "source", "ivl_id", "lo", "hi", "w"
    )


_RANGE_JOIN_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
dimw AS (
  SELECT 'a' || i::VARCHAR AS ivl_id, (4 * i)::BIGINT AS lo,
         (4 * i + 6)::BIGINT AS hi, (100 + i)::BIGINT AS w
  FROM generate_series(0, 15) AS t(i) WHERE i % 2 = 0
  UNION ALL
  SELECT 'b' || i::VARCHAR, (8 * i + 2)::BIGINT, (8 * i + 9)::BIGINT,
         (200 + i)::BIGINT
  FROM generate_series(0, 7) AS t(i)
)
SELECT f.doc_id AS fact_id, f.n_tok::BIGINT AS v, f.source,
       d.ivl_id, d.lo, d.hi, d.w
FROM fin f JOIN dimw d ON d.lo <= f.n_tok AND f.n_tok < d.hi
"""


def hypertable_rollup_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time-bucket rollup (a hypertable continuous
    aggregate, TimescaleDB-style): facts with event time ``ets`` fold
    into 16-wide bucket sums, that MV's change feed folds into 64-wide
    buckets, and that one into 256-wide — three chained differential
    hops, each O(touched buckets), no level ever rescanned. A fine
    refresh at level 1 ripples up as two tiny cascades instead of a
    recompute. ``n_facts`` rides UP the cascade as an explicit measure
    (each level's own ``n_rows`` counts the level below's ROWS, which
    is history- not state-dependent). Oracle: one grouped aggregate of
    final state at the coarsest resolution."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.streaming.aggregate_mv import (
        agg_mv_transform,
        create_agg_mv,
    )
    from blockchain_etl_spark.streaming.cascade import CascadeTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("hypertable-rollup-gate")
    fact_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("ets", T.LongType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), fact_schema, key="doc_id",
        n_buckets=16,
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    fact_ev = ev.select(
        "stream_pos", "lsn", "seq", "op", "rollback_to_lsn", "doc_id",
        F.col("lsn").alias("ets"), "n_tok",
    )
    # each level's own n_rows counts the level below's ROWS (history-,
    # not state-dependent once buckets empty), so the true fact count
    # rides up as an explicit measure: level 1's n_rows IS the live
    # fact count per fine bucket, re-exported upward as n_facts
    levels = [
        ("ets DIV 16", {"sum_tok": "n_tok"}),
        ("CAST(doc_id AS LONG) DIV 4", {"sum_tok": "sum_tok",
                                        "n_facts": "n_rows"}),
        ("CAST(doc_id AS LONG) DIV 4", {"sum_tok": "sum_tok",
                                        "n_facts": "n_facts"}),
    ]
    tables, tailers = [fact], []
    for i, (grp, meas) in enumerate(levels):
        mv = create_agg_mv(
            spark, os.path.join(work, f"lvl{i + 1}"), grp, meas,
            n_buckets=4,
        )
        tailers.append(CascadeTailer(
            tables[-1], CdcEngine(spark, mv, collect_metrics=False),
            os.path.join(work, f"cur{i + 1}.json"),
            transform=agg_mv_transform(grp, meas),
        ))
        tables.append(mv)

    def _ripple():
        for t in tailers:
            t.run_once()

    feng.apply_epoch(fact_ev.filter(F.col("lsn") <= mid), epoch_id=1)
    _ripple()
    feng.apply_epoch(fact_ev.filter(F.col("lsn") > mid), epoch_id=2)
    _ripple()
    lvl3 = tables[-1]
    return (
        read_state(lvl3)
        .filter(F.col("n_facts") > 0)
        .select(
            F.col("doc_id").cast("long").alias("bucket"),
            "n_facts",
            "sum_tok",
        )
    )


_HYPERTABLE_ROLLUP_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
)
SELECT (f.lsn // 256)::BIGINT AS bucket, count(*)::BIGINT AS n_facts,
       sum(f.n_tok)::BIGINT AS sum_tok
FROM fin f GROUP BY 1
"""


def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with LOCF (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``; ≙ the reference's per-block
    windows read as regular series by the alert adapter,
    eth_alert_adapter.py — empty hours must exist for "per hour" rules
    to fire). Dense grid per key from ``sequence()+explode`` of one
    min/max row; ONE shuffle on the series key shared by the join and
    the LOCF window; integer measures (cents) so any partitioning
    reproduces the oracle bit-for-bit."""
    from blockchain_etl_spark.operators import timeseries as TS

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    prepared = e.select(
        (F.col("user_id") % 16).alias("series_key"),
        F.floor(us / F.lit(1000000.0)).alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = TS.gapfill_locf(prepared, "series_key", "sec", "cents", step=3600)
    # doubles on BOTH sides: pandas turns nullable ints into float64
    # asymmetrically (DuckDB's window output lands float64 even with
    # zero nulls) and the gate hashes dtype-strict — exact values, all
    # well under 2^53
    return out.select(
        "series_key",
        "bucket",
        F.col("measure").cast("double").alias("measure"),
        F.col("filled").cast("double").alias("filled"),
        "is_gap",
    )


_GAPFILL_LOCF_SQL = """
WITH obs AS (
  SELECT user_id % 16 AS series_key,
         (epoch_us(ts) // 1000000 // 3600) * 3600 AS bucket,
         sum(floor(value * 100)::BIGINT) AS measure
  FROM events GROUP BY 1, 2
),
rng AS (SELECT series_key, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
grid AS (
  SELECT series_key, unnest(generate_series(lo, hi, 3600)) AS bucket FROM rng
)
SELECT g.series_key, g.bucket, o.measure::DOUBLE AS measure,
       (last_value(o.measure IGNORE NULLS) OVER (
         PARTITION BY g.series_key ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS filled,
       o.measure IS NULL AS is_gap
FROM grid g LEFT JOIN obs o USING (series_key, bucket)
"""


def gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series by LINEAR interpolation (TimescaleDB
    ``interpolate``; the LOCF row's sibling): missing buckets take the
    floor'd integer lerp of the bracketing observations — exact under
    any partitioning; leading/trailing buckets without a bracketing
    pair stay null. Same one-shuffle shape as gapfill_locf."""
    from blockchain_etl_spark.operators import timeseries as TS

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    prepared = e.select(
        (F.col("user_id") % 16).alias("series_key"),
        F.floor(us / F.lit(1000000.0)).alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = TS.gapfill_interpolate(prepared, "series_key", "sec", "cents", step=3600)
    return out.select(
        "series_key",
        "bucket",
        F.col("measure").cast("double").alias("measure"),
        F.col("filled").cast("double").alias("filled"),
        "is_gap",
    )


_GAPFILL_INTERP_SQL = """
WITH obs AS (
  SELECT user_id % 16 AS series_key,
         (epoch_us(ts) // 1000000 // 3600) * 3600 AS bucket,
         sum(floor(value * 100)::BIGINT) AS measure
  FROM events GROUP BY 1, 2
),
rng AS (SELECT series_key, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
grid AS (
  SELECT series_key, unnest(generate_series(lo, hi, 3600)) AS bucket FROM rng
),
j AS (
  SELECT g.series_key, g.bucket, o.measure
  FROM grid g LEFT JOIN obs o USING (series_key, bucket)
),
br AS (
  SELECT series_key, bucket, measure,
    last_value(CASE WHEN measure IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER wback AS pb,
    last_value(CASE WHEN measure IS NOT NULL THEN measure END IGNORE NULLS)
      OVER wback AS pv,
    first_value(CASE WHEN measure IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER wfwd AS nb,
    first_value(CASE WHEN measure IS NOT NULL THEN measure END IGNORE NULLS)
      OVER wfwd AS nv
  FROM j
  WINDOW
    wback AS (PARTITION BY series_key ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wfwd AS (PARTITION BY series_key ORDER BY bucket
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT series_key, bucket, measure::DOUBLE AS measure,
       (CASE WHEN measure IS NOT NULL THEN measure
             WHEN pv IS NOT NULL AND nv IS NOT NULL
             THEN pv + floor(((nv - pv) * (bucket - pb))::DOUBLE / (nb - pb))::BIGINT
        END)::DOUBLE AS filled,
       measure IS NULL AS is_gap
FROM br
"""


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-key time-weighted average over a left-closed step
    function (TimescaleDB ``time_weight('locf', ...)``): each event's
    value holds until the next event, TWA = Σ v·Δt / span. Integer
    numerator/denominator (cents × seconds) with a (ts, event_id)
    total order so equal-timestamp ties are deterministic; one shuffle
    on the key, lead() and the aggregate share it."""
    from blockchain_etl_spark.operators import timeseries as TS

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    prepared = e.select(
        (F.col("user_id") % 16).alias("series_key"),
        F.floor(us / F.lit(1000000.0)).alias("sec"),
        F.col("event_id").alias("eid"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return TS.time_weighted_avg(prepared, "series_key", "sec", "cents", "eid")


_TIME_WEIGHTED_AVG_SQL = """
WITH ev AS (
  SELECT user_id % 16 AS series_key,
         epoch_us(ts) // 1000000 AS sec,
         event_id AS eid,
         floor(value * 100)::BIGINT AS cents
  FROM events
),
stepped AS (
  SELECT series_key, sec, cents,
         lead(sec) OVER (PARTITION BY series_key ORDER BY sec, eid) AS next_sec
  FROM ev
)
SELECT series_key,
       sum(cents * (next_sec - sec))::BIGINT AS twa_num,
       (max(next_sec) - min(sec))::BIGINT AS twa_den,
       floor(sum(cents * (next_sec - sec)) / (max(next_sec) - min(sec)))::BIGINT AS twa
FROM stepped WHERE next_sec IS NOT NULL
GROUP BY series_key
HAVING max(next_sec) > min(sec)
"""


def scd2_asof_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leak-free feature-snapshot pipeline: dim CDF → SCD-2
    historyize (append-only liveness-flagged history rows per hop) →
    incremental AS-OF join, so every fact row carries the dim row AS IT
    WAS at the fact's event time — deletes visible as dead markers
    (null payload), later rebirths only affecting later facts. Two dim
    commits (create-all at v1; reweight cp%3 / delete cp%4 at v2) each
    ripple through one historyize hop; fact ts = event lsn, so facts at
    lsn 1 see v1 payloads and lsn ≥ 2 see v2 where the key changed.
    Oracle: windowed arg-max over a reconstructed two-version
    history."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.streaming.cascade import CascadeTailer
    from blockchain_etl_spark.streaming.history import (
        create_history_table,
        history_transform,
    )
    from blockchain_etl_spark.streaming.join_mv import AsofJoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("scd2-asof-gate")
    fact_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("ets", T.LongType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), fact_schema, key="doc_id",
        n_buckets=16,
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    dim_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("weight", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    dim = SnapshotTable.create(
        spark, os.path.join(work, "dim"), dim_schema, key="doc_id", n_buckets=4
    )
    deng = CdcEngine(spark, dim, mode="cow", collect_metrics=False)
    hist = create_history_table(
        spark, os.path.join(work, "hist"), dim, ["weight"], n_buckets=4
    )
    tailer = CascadeTailer(
        dim, CdcEngine(spark, hist, collect_metrics=False),
        os.path.join(work, "hist_cursor.json"),
        transform=history_transform(["weight"]),
    )
    jm = AsofJoinMV(
        spark, fact, hist, os.path.join(work, "asof"), join_col="source",
        ts_col="ets", hist_key_col="k", hist_ts_col="vf",
        fact_cols=["n_tok"], dim_cols=["is_live", "weight"], n_buckets=8,
    )
    fact_ev = ev.select(
        "stream_pos", "lsn", "seq", "op", "rollback_to_lsn", "doc_id",
        "source", F.col("lsn").alias("ets"), "n_tok",
    )
    srcs = ev.filter(F.col("source").isNotNull()).select("source").distinct()
    ln = F.length("source")
    la = F.ascii(F.substring("source", -1, 1))

    def _dim_ev(df, lsn, seq, op, weight_col):
        return df.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(seq).cast("int").alias("seq"),
            F.lit(op).alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.col("source").alias("doc_id"),
            weight_col.cast("long").alias("weight"),
        )

    # dim v1: every source at len*10 → historyize hop (vf=1)
    deng.apply_epoch(_dim_ev(srcs, 1, 0, "U", ln * 10), epoch_id=1)
    tailer.run_once()
    feng.apply_epoch(fact_ev.filter(F.col("lsn") <= mid), epoch_id=1)
    jm.run_once()
    # dim v2: cp%4==0 deleted, cp%3==0 reweighted (+5) → hop (vf=2)
    deng.apply_epoch(
        _dim_ev(srcs.filter(la % 4 == 0), 2, 0, "D", F.lit(None)).unionByName(
            _dim_ev(srcs.filter(la % 3 == 0), 2, 1, "U", ln * 10 + 5)
        ),
        epoch_id=2,
    )
    tailer.run_once()
    feng.apply_epoch(fact_ev.filter(F.col("lsn") > mid), epoch_id=2)
    jm.run_once()
    return jm.state().select(
        "fact_id", "source", "ets", "n_tok", "vf", "is_live", "weight"
    )


_SCD2_ASOF_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
srcs AS (SELECT DISTINCT source FROM ev WHERE source IS NOT NULL),
hist AS (
  SELECT source AS k, (1)::BIGINT AS vf, TRUE AS is_live,
         (length(source) * 10)::BIGINT AS weight
  FROM srcs
  UNION ALL
  SELECT source, (2)::BIGINT,
         ascii(right(source, 1)) % 3 = 0,
         CASE WHEN ascii(right(source, 1)) % 3 = 0
              THEN (length(source) * 10 + 5)::BIGINT ELSE NULL END
  FROM srcs
  WHERE ascii(right(source, 1)) % 4 = 0 OR ascii(right(source, 1)) % 3 = 0
),
resolved AS (
  SELECT f.doc_id AS fact_id, f.source, f.lsn AS ets, f.n_tok,
         h.vf, h.is_live, h.weight,
         row_number() OVER (PARTITION BY f.doc_id ORDER BY h.vf DESC) AS rn2
  FROM fin f LEFT JOIN hist h ON f.source = h.k AND h.vf <= f.lsn
)
SELECT fact_id, source, ets, n_tok, vf, is_live, weight
FROM resolved WHERE rn2 = 1
"""


def length_histogram_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-group differential aggregate: an incrementally-
    maintained HISTOGRAM — the MV groups by an EXPRESSION over the
    source's columns (``n_tok DIV 8``: token-length octile buckets, the
    corpus length distribution every training-data pipeline tracks)
    rather than a stored column. A derived group is recomputed
    identically on CDF pre- and post-images, so an update that moves a
    document between length buckets retracts at the old bucket and
    inserts at the new one; hop cost O(changed rows). The oracle
    recomputes the bucketed histogram from scratch over last-writer
    final state."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.aggregate_mv import (
        agg_mv_transform,
        create_agg_mv,
        mv_state,
    )
    from blockchain_etl_spark.streaming.cascade import CascadeTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    GROUP = "n_tok DIV 8"
    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("len-hist-mv-gate")
    src = SnapshotTable.create(
        spark, os.path.join(work, "src"), TARGET_SCHEMA, key="doc_id", n_buckets=16
    )
    eng = CdcEngine(spark, src, mode="cow", collect_metrics=False)
    mv = create_agg_mv(
        spark, os.path.join(work, "mv"), GROUP, {"sum_tok": "n_tok"},
        n_buckets=4,
    )
    tailer = CascadeTailer(
        src,
        CdcEngine(spark, mv, collect_metrics=False),
        os.path.join(work, "mv_cursor.json"),
        transform=agg_mv_transform(GROUP, {"sum_tok": "n_tok"}),
    )
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    tailer.run_once()
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    tailer.run_once()
    return mv_state(mv).select(
        F.col("doc_id").alias("len_bucket"),
        F.col("n_rows").alias("n_docs"),
        "sum_tok",
    )


_LEN_HIST_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
)
SELECT CAST(n_tok // 8 AS VARCHAR) AS len_bucket,
       count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS sum_tok
FROM fin GROUP BY 1
"""


def unigram_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-maintained corpus VOCABULARY: per-token unigram
    occurrence counts + document frequency, folded from the documents
    table's change feed with retraction (an update retracts the old
    doc's exploded terms and inserts the new doc's; a delete retracts
    the carried pre-image) — the token-histogram / DF-table / unigram-
    LM statistics every training-data pipeline recomputes per corpus
    snapshot (and this repo's batch ``unigram_logprob``/``tfidf_terms``
    rows compute from scratch), maintained at O(changed docs × their
    tokens) per hop. Z-set liveness on occurrences: a token whose
    count folds to zero leaves the vocabulary physically. Oracle: the
    vocabulary recomputed from scratch over last-writer final state."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.aggregate_mv import (
        create_agg_mv,
        exploded_terms_transform,
        mv_state,
    )
    from blockchain_etl_spark.streaming.cascade import CascadeTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("unigram-mv-gate")
    src = SnapshotTable.create(
        spark, os.path.join(work, "src"), TARGET_SCHEMA, key="doc_id", n_buckets=16
    )
    eng = CdcEngine(spark, src, mode="cow", collect_metrics=False)
    mv = create_agg_mv(
        spark, os.path.join(work, "mv"), "term", {"n_docs": "_"},
        n_buckets=8, zset=True,
    )
    tailer = CascadeTailer(
        src,
        CdcEngine(spark, mv, collect_metrics=False),
        os.path.join(work, "mv_cursor.json"),
        transform=exploded_terms_transform("tokens"),
    )
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    tailer.run_once()
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    tailer.run_once()
    return mv_state(mv).select(
        F.col("doc_id").cast("long").alias("term"),
        F.col("n_rows").alias("n_occ"),
        "n_docs",
    )


_UNIGRAM_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
terms AS (
  SELECT doc_id, unnest(tokens) AS term FROM fin
)
SELECT term::BIGINT AS term,
       count(*)::BIGINT AS n_occ,
       count(DISTINCT doc_id)::BIGINT AS n_docs
FROM terms GROUP BY 1
"""


def reorg_agg_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A chain REORG propagated through the differential-MV layer: the
    source table ingests the RAW changelog — R rollback markers and
    contract-invalid rows included — through the engine in two MOR
    epochs, with an aggregate-MV hop after EACH epoch. The engine
    linearizes the reorg into its change feed (tombstone-then-reinsert
    with the monotonic guard), so the MV sees ordinary retractions and
    must land on the grouped aggregate of the POST-reorg final state —
    the composition the reference's pollers get implicitly by
    re-running SQL after eth_reorg_adapter rewinds
    (eth_reorg_adapter.py:102-114), here maintained differentially.
    Oracle: the batch replay rule (min-rollback-after window +
    validity contract) grouped by source."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.aggregate_mv import (
        agg_mv_transform,
        create_agg_mv,
        mv_state,
    )
    from blockchain_etl_spark.streaming.cascade import CascadeTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev = derive_changelog(spark, sf_dir)
    mid = ev.agg(F.max("lsn")).first()[0] // 2
    work = _pid_scoped_gate_dir("reorg-agg-mv-gate")
    src = SnapshotTable.create(
        spark, os.path.join(work, "src"), TARGET_SCHEMA, key="doc_id", n_buckets=16
    )
    eng = CdcEngine(spark, src, mode="mor", collect_metrics=False)
    mv = create_agg_mv(
        spark, os.path.join(work, "mv"), "source", {"sum_tok": "n_tok"},
        n_buckets=4, zset=True,
    )
    tailer = CascadeTailer(
        src,
        CdcEngine(spark, mv, collect_metrics=False),
        os.path.join(work, "mv_cursor.json"),
        transform=agg_mv_transform("source", {"sum_tok": "n_tok"}),
    )
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    tailer.run_once()
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    tailer.run_once()
    return mv_state(mv).select(
        F.col("doc_id").alias("source"),
        F.col("n_rows").alias("n_docs"),
        "sum_tok",
    )


_REORG_AGG_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT *,
         min(CASE WHEN op = 'R' THEN rollback_to_lsn END)
           OVER (ORDER BY stream_pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS min_rb_after
  FROM changelog
),
live AS (
  SELECT * FROM ev
  WHERE op IN ('I','U','D')
    AND (min_rb_after IS NULL OR lsn <= min_rb_after)
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
last AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
  FROM live
)
SELECT source, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS sum_tok
FROM last WHERE rn = 1 AND op <> 'D'
GROUP BY source
"""


def debezium_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium envelope leg of the change-log bus: the derived
    changelog is serialized into Debezium change-event envelopes
    (``{"payload": {"before","after","source","op"}}`` — the Kafka
    Connect ecosystem's public CDC format; reorg markers ride Postgres
    logical-decoding messages, op=m) and decoded back through
    ``sources/envelope.decode_debezium`` — the adapter the engine's
    ``tail --bus-format debezium`` uses to ingest a real Debezium topic
    dump (≙ the reference's adapter layer normalizing RPC shapes into
    item dicts, eth_streamer_adapter.py:60-118). Encode and decode are
    both pure ``to_json``/``from_json`` over fixed structs — JVM-side,
    codegen, no shuffle. Oracle: the changelog CTE projected directly
    (if decode drops or distorts ANY field of ANY op, parity fails).
    Deterministic 1-in-23 sample keeps the gate row-bounded."""
    from blockchain_etl_spark.sources.envelope import (
        decode_debezium,
        encode_debezium,
    )

    ev = derive_changelog(spark, sf_dir)
    dec = decode_debezium(encode_debezium(ev))
    return dec.filter(F.col("stream_pos") % 23 == 0).select(
        "stream_pos", "lsn", "seq", "op", "doc_id",
        F.array_join("tokens", ",").alias("tokens_csv"),
        "n_tok", "source", "rollback_to_lsn", "epoch_hash",
    )


_DEBEZIUM_DECODE_SQL = f"""
WITH {_CHANGELOG_CTE}
SELECT stream_pos, lsn, seq, op, doc_id,
       array_to_string(tokens, ',') AS tokens_csv,
       n_tok, source, rollback_to_lsn,
       md5('h' || lsn::VARCHAR) AS epoch_hash
FROM changelog WHERE stream_pos % 23 = 0
"""


def maxwell_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maxwell (MySQL binlog JSON) leg of the change-log bus:
    insert/update/delete rows with binlog coordinates in ``position``
    (file ≙ LSN, offset ≙ intra-block seq) and the bus offset in
    ``xid``. Maxwell has no reorg vocabulary, so the R markers are
    excluded at plan level (chains that need rollback markers use the
    Debezium op=m leg); ``epoch_hash`` is lineage-only metadata with no
    Maxwell slot and stays null. Same JVM-side from_json path."""
    from blockchain_etl_spark.sources.envelope import (
        decode_maxwell,
        encode_maxwell,
    )

    ev = derive_changelog(spark, sf_dir)
    dec = decode_maxwell(encode_maxwell(ev))
    return dec.filter(F.col("stream_pos") % 23 == 0).select(
        "stream_pos", "lsn", "seq", "op", "doc_id",
        F.array_join("tokens", ",").alias("tokens_csv"),
        "n_tok", "source", "rollback_to_lsn",
    )


_MAXWELL_DECODE_SQL = f"""
WITH {_CHANGELOG_CTE}
SELECT stream_pos, lsn, seq, op, doc_id,
       array_to_string(tokens, ',') AS tokens_csv,
       n_tok, source, CAST(NULL AS BIGINT) AS rollback_to_lsn
FROM changelog WHERE op <> 'R' AND stream_pos % 23 = 0
"""


def minmax_agg_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained per-group MIN/MAX — the NON-subtractable aggregate MV
    (table-build demo): the raw changelog ingests through the engine in
    two MOR epochs with a MinMaxAggMV hop after each. Deletes that
    retract a group's current extremum re-derive that group from the
    group-keyed secondary index (bucket-pruned probe); interior
    retractions fold in O(1). ≙ the reference's pollers re-running
    grouped min/max SQL per poll (min/max block stats shapes); here the
    answer is maintained, never recomputed. Oracle: the replay rule
    grouped by source with count/min/max over n_tok."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.extrema_mv import MinMaxAggMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev = derive_changelog(spark, sf_dir)
    mid = ev.agg(F.max("lsn")).first()[0] // 2
    work = _pid_scoped_gate_dir("minmax-agg-mv-gate")
    src = SnapshotTable.create(
        spark, os.path.join(work, "src"), TARGET_SCHEMA, key="doc_id", n_buckets=16
    )
    eng = CdcEngine(spark, src, mode="mor", collect_metrics=False)
    mv = MinMaxAggMV(
        spark, src, os.path.join(work, "mmx"),
        group_col="source", value_col="n_tok", n_buckets=4,
    )
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    mv.run_once()
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    mv.run_once()
    return mv.state().select(
        "source",
        F.col("n_rows").alias("n_docs"),
        F.col("min_v").alias("min_tok"),
        F.col("max_v").alias("max_tok"),
    )


_MINMAX_AGG_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT *,
         min(CASE WHEN op = 'R' THEN rollback_to_lsn END)
           OVER (ORDER BY stream_pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS min_rb_after
  FROM changelog
),
live AS (
  SELECT * FROM ev
  WHERE op IN ('I','U','D')
    AND (min_rb_after IS NULL OR lsn <= min_rb_after)
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
last AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
  FROM live
)
SELECT source, count(*)::BIGINT AS n_docs,
       min(n_tok)::INT AS min_tok, max(n_tok)::INT AS max_tok
FROM last WHERE rn = 1 AND op <> 'D'
GROUP BY source
"""


def topk_agg_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained per-group TOP-K values — the second non-subtractable
    aggregate MV (table-build demo; the Materialize-TopK shape): raw
    changelog through the engine in two MOR epochs, a TopKAggMV hop
    after each. Inserts fold (top_k of stored ∪ batch-top-k);
    retractions at/above the folded k-th re-derive their group from
    the group-keyed index. ≙ the reference's redis zset top-holder
    tracker re-ranked per poll (redis_top_holder_service.py); here the
    rank set is maintained differentially. Oracle: replay-rule final
    state, per-source top-5 n_tok."""
    import os

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.extrema_mv import TopKAggMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev = derive_changelog(spark, sf_dir)
    mid = ev.agg(F.max("lsn")).first()[0] // 2
    work = _pid_scoped_gate_dir("topk-agg-mv-gate")
    src = SnapshotTable.create(
        spark, os.path.join(work, "src"), TARGET_SCHEMA, key="doc_id", n_buckets=16
    )
    eng = CdcEngine(spark, src, mode="mor", collect_metrics=False)
    mv = TopKAggMV(
        spark, src, os.path.join(work, "tpk"),
        group_col="source", value_col="n_tok", k=5, n_buckets=4,
    )
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    mv.run_once()
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    mv.run_once()
    return mv.state().select(
        "source",
        F.col("n_rows").alias("n_docs"),
        F.array_join("topk", ",").alias("topk_csv"),
    )


_TOPK_AGG_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT *,
         min(CASE WHEN op = 'R' THEN rollback_to_lsn END)
           OVER (ORDER BY stream_pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS min_rb_after
  FROM changelog
),
live AS (
  SELECT * FROM ev
  WHERE op IN ('I','U','D')
    AND (min_rb_after IS NULL OR lsn <= min_rb_after)
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
last AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
  FROM live
)
SELECT source, count(*)::BIGINT AS n_docs,
       array_to_string(
         list_slice(list(n_tok::BIGINT ORDER BY n_tok DESC), 1, 5), ',') AS topk_csv
FROM last WHERE rn = 1 AND op <> 'D'
GROUP BY source
"""


def join_agg_cascade_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained GROUP BY over an incrementally-
    maintained JOIN — the reduce-after-bilinear composition
    Δγ(A ⋈ B) (≙ the reference's tracker/top-holder consumers
    re-running grouped SQL over their enriched token_transfer ⋈ token
    tables on every poll): the same fact/dim two-round churn as
    ``incremental_join_mv``, but the JoinMV runs ``indexed=True`` (the
    dim-delta leg probes the fact-side secondary index instead of
    scanning fact state) and a :class:`ZsetAggMV` hop after each join
    hop folds the join MV's OWN change feed into per-source live-tuple
    counts and multiplicity-weighted sums. Three differential stages
    chained table→table, each hop O(changes); the dim reweight in
    round 2 forces retract+reinsert churn through all three. Oracle:
    the grouped join recomputed from scratch over final states."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.aggregate_mv import ZsetAggMV
    from blockchain_etl_spark.streaming.join_mv import JoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("join-agg-cascade-gate")
    fact = SnapshotTable.create(
        spark, os.path.join(work, "fact"), TARGET_SCHEMA, key="doc_id",
        n_buckets=16,
    )
    feng = CdcEngine(spark, fact, mode="cow", collect_metrics=False)
    dim_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("weight", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    dim = SnapshotTable.create(
        spark, os.path.join(work, "dim"), dim_schema, key="doc_id", n_buckets=4
    )
    deng = CdcEngine(spark, dim, mode="cow", collect_metrics=False)
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

    jm = JoinMV(
        spark, fact, dim, os.path.join(work, "jm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=8, indexed=True,
    )
    zagg = ZsetAggMV(
        spark, jm.mv, os.path.join(work, "zagg"), "source",
        measures={"sum_tok": "n_tok"}, n_buckets=4,
    )
    deng.apply_epoch(_dim_ev(srcs, 1, F.length("source") * 10), epoch_id=1)
    feng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    jm.run_once()
    zagg.run_once()
    deng.apply_epoch(
        _dim_ev(
            srcs.filter(F.length("source") % 2 == 0), 2,
            F.length("source") * 10 + 7,
        ),
        epoch_id=2,
    )
    feng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    jm.run_once()
    zagg.run_once()
    return zagg.state().select(
        "source", F.col("n_rows").alias("n_tuples"), "sum_tok"
    )


_JOIN_AGG_CASCADE_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
dimw AS (
  SELECT source FROM (SELECT DISTINCT source FROM ev WHERE source IS NOT NULL)
)
SELECT f.source, count(*)::BIGINT AS n_tuples, sum(f.n_tok)::BIGINT AS sum_tok
FROM fin f JOIN dimw w ON f.source = w.source
GROUP BY f.source
"""


def nm_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained N:M equi-join where NEITHER side's
    join column is its key (≙ the reference's log⋈token-transfer style
    enrichments where both streams key on their own ids and meet on a
    shared attribute, eth_nft_orderbook_adapter.py:36-200 joining
    trades to transfers on (txhash-scoped) attributes): docs join a
    two-tags-per-source tag table on ``source``. Both sides ingest two
    CDC rounds with a :class:`GeneralJoinMV` hop after each — every
    hop probes only each side's :class:`_SideIndex` buckets touched by
    the OTHER side's delta join values (never a table scan; the
    secondary ``bucket_key`` layout is the index). Round 2 reweights
    the ``#b`` tag of even-length sources (retract + reinsert of every
    matching tuple) and deletes the ``#a`` tag of length%3==0 sources
    (fanout-wide retraction). The oracle joins both final last-writer
    states from scratch."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.join_mv import GeneralJoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    ev, mid = _changelog_valid(spark, sf_dir)
    work = _pid_scoped_gate_dir("nm-join-mv-gate")
    a = SnapshotTable.create(
        spark, os.path.join(work, "a"), TARGET_SCHEMA, key="doc_id",
        n_buckets=16,
    )
    aeng = CdcEngine(spark, a, mode="cow", collect_metrics=False)
    b_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),  # tag id: <source>#a|#b
        T.StructField("source", T.StringType()),
        T.StructField("tag_weight", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    b = SnapshotTable.create(
        spark, os.path.join(work, "b"), b_schema, key="doc_id", n_buckets=4
    )
    beng = CdcEngine(spark, b, mode="cow", collect_metrics=False)
    srcs = ev.filter(F.col("source").isNotNull()).select("source").distinct()

    def _tag_ev(df, lsn, op, suffix, weight_col):
        return df.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit(op).alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.concat(F.col("source"), F.lit(suffix)).alias("doc_id"),
            F.col("source"),
            weight_col.cast("long").alias("tag_weight"),
        )

    mv = GeneralJoinMV(
        spark, a, b, os.path.join(work, "mv"),
        a_join_col="source", b_join_col="source",
        a_cols=["n_tok"], b_cols=["tag_weight"], n_buckets=8,
    )
    wl = F.length("source") * 100
    beng.apply_epoch(
        _tag_ev(srcs, 1, "U", "#a", wl + 1)
        .unionByName(_tag_ev(srcs, 1, "U", "#b", wl + 2)),
        epoch_id=1,
    )
    aeng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    mv.run_once()
    # round 2: reweight even-length #b tags; delete length%3==0 #a tags
    beng.apply_epoch(
        _tag_ev(
            srcs.filter(F.length("source") % 2 == 0), 2, "U", "#b", wl + 7
        ).unionByName(
            _tag_ev(
                srcs.filter(F.length("source") % 3 == 0), 2, "D", "#a",
                F.lit(None),
            )
        ),
        epoch_id=2,
    )
    aeng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    mv.run_once()
    return mv.state().select("a_id", "b_id", "source", "n_tok", "tag_weight")


_NM_JOIN_MV_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
srcs AS (SELECT DISTINCT source FROM ev WHERE source IS NOT NULL),
tags AS (
  SELECT source || '#a' AS tag_id, source,
         (length(source) * 100 + 1)::BIGINT AS tag_weight
  FROM srcs WHERE length(source) % 3 <> 0
  UNION ALL
  SELECT source || '#b', source,
         (CASE WHEN length(source) % 2 = 0
               THEN length(source) * 100 + 7
               ELSE length(source) * 100 + 2 END)::BIGINT
  FROM srcs
)
SELECT f.doc_id AS a_id, t.tag_id AS b_id, f.source, f.n_tok, t.tag_weight
FROM fin f JOIN tags t ON f.source = t.source
"""


_TABLE_CHANGES_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
mx AS (SELECT max(lsn) // 2 AS mid FROM ev),
s0 AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e, mx WHERE e.lsn <= mx.mid) WHERE rn = 1
),
s1 AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1
),
d AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         (a.doc_id IS NOT NULL AND a.op <> 'D') AS live0,
         (b.doc_id IS NOT NULL AND b.op <> 'D') AS live1,
         -- (lsn, seq) ↔ stream_pos is a bijection, so "any state column
         -- differs" collapses to "a different event won last-writer"
         (a.stream_pos IS DISTINCT FROM b.stream_pos) AS changed,
         a.tokens AS a_tokens, a.n_tok AS a_n_tok, a.source AS a_source,
         a.lsn AS a_lsn, a.seq AS a_seq,
         b.tokens AS b_tokens, b.n_tok AS b_n_tok, b.source AS b_source,
         b.lsn AS b_lsn, b.seq AS b_seq
  FROM s0 a FULL OUTER JOIN s1 b ON a.doc_id = b.doc_id
)
SELECT 'insert' AS change_type, doc_id,
       array_to_string(b_tokens, ',') AS tokens_csv, b_n_tok AS n_tok,
       b_source AS source, b_lsn AS lsn, b_seq AS seq
FROM d WHERE live1 AND NOT live0
UNION ALL
SELECT 'delete', doc_id, array_to_string(a_tokens, ','), a_n_tok,
       a_source, a_lsn, a_seq
FROM d WHERE live0 AND NOT live1
UNION ALL
SELECT 'update_preimage', doc_id, array_to_string(a_tokens, ','), a_n_tok,
       a_source, a_lsn, a_seq
FROM d WHERE live0 AND live1 AND changed
UNION ALL
SELECT 'update_postimage', doc_id, array_to_string(b_tokens, ','), b_n_tok,
       b_source, b_lsn, b_seq
FROM d WHERE live0 AND live1 AND changed
"""


def tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → the input_hint shape (doc_id, tokens, n_tok, source)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = X.tokenize("text", vocab=_VOCAB)
    return d.select(
        F.format_string("doc-%06d", F.col("doc_id")).alias("doc_id"),
        F.concat_ws(",", toks.cast("array<string>")).alias("tokens_csv"),
        F.size(toks).alias("n_tok"),
        "source",
    )


_TOKENIZE_SQL = f"""
SELECT 'doc-' || lpad(doc_id::VARCHAR, 6, '0') AS doc_id,
       array_to_string(
         list_transform(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''),
                        w -> ((('0x' || substr(md5(w), 1, 6))::BIGINT % {_VOCAB}))::INT),
         ',') AS tokens_csv,
       len(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''))::INT AS n_tok,
       source
FROM documents
"""


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

def decimal_vsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overflow-safe big-integer aggregation (≙ ``vsum``,
    /root/reference/blockchainetl/misc/pandas_extra.py:19-22, and the
    uint256 Numeric(78)→string downcast lesson,
    item_exporter_builder.py:89,210): wei-scale decimal(38,0) values
    summed exactly, returned as strings."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    wei = (
        F.round(F.col("value") * 1_000_000).cast("decimal(20,0)").cast("decimal(38,0)")
        * F.lit(10**12).cast("decimal(13,0)")  # NOT `** 12` — pow is double
    )
    return e.groupBy("event_type").agg(
        F.sum(wei).cast("decimal(38,0)").cast("string").alias("sum_wei"),
        F.max(wei).cast("decimal(38,0)").cast("string").alias("max_wei"),
        F.count("*").alias("n"),
    )


_DECIMAL_VSUM_SQL = """
WITH w AS (
  SELECT event_type,
         round(value * 1000000)::DECIMAL(38,0) * 1000000000000::DECIMAL(38,0) AS wei
  FROM events
)
SELECT event_type,
       sum(wei)::DECIMAL(38,0)::VARCHAR AS sum_wei,
       max(wei)::DECIMAL(38,0)::VARCHAR AS max_wei,
       count(*) AS n
FROM w GROUP BY event_type
"""


def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many flatten: tokenized docs exploded to (doc_id, pos,
    token) rows (≙ block→transactions explode / TransferBatch
    posexplode, SURVEY §2.4)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = X.tokenize("text", vocab=_VOCAB)
    return (
        d.filter(F.col("doc_id") % 10 == 0)  # bounded output for the gate
        .select("doc_id", toks.alias("tokens"))
        .select("doc_id", F.posexplode("tokens").alias("pos", "token"))
    )


_EXPLODE_TOKENS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''),
                        w -> ((('0x' || substr(md5(w), 1, 6))::BIGINT % {_VOCAB}))::INT)
           AS tokens
  FROM documents WHERE doc_id % 10 = 0
),
e AS (
  SELECT doc_id, tokens,
         unnest(generate_series(0, len(tokens) - 1)) AS pos
  FROM t
)
SELECT doc_id, pos::INT AS pos, tokens[pos + 1] AS token FROM e
"""


def trace_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-error status propagation over a synthesized call forest
    (≙ trace_status_calculator.py:32-85): path depth/shape and error
    flags derive deterministically from events, so DuckDB reproduces
    the forest and the EXISTS-ancestor semantics exactly."""
    from blockchain_etl_spark.operators.tree import propagate_trace_status

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    depth = F.col("event_id") % 3
    path = F.slice(
        F.array((F.col("event_id") % 2), ((F.col("event_id") / 2).cast("long") % 2)),
        1,
        depth.cast("int"),
    )
    traces = e.select(
        "user_id",
        "event_id",
        path.alias("trace_address"),
        (F.col("event_id") % 7 == 0).alias("error"),
    )
    out = propagate_trace_status(traces, ["user_id"])
    return out.select(
        "event_id",
        F.concat_ws(",", F.col("trace_address").cast("array<string>")).alias("trace_path"),
        "status",
    )


_TRACE_STATUS_SQL = """
WITH tr AS (
  SELECT user_id, event_id,
         list_slice([event_id % 2, (event_id // 2) % 2], 1, (event_id % 3)::INT)
           AS trace_address,
         (event_id % 7 = 0) AS error
  FROM events
)
SELECT a.event_id,
       coalesce(array_to_string(a.trace_address, ','), '') AS trace_path,
       CASE WHEN a.error OR EXISTS (
         SELECT 1 FROM tr b
         WHERE b.user_id = a.user_id AND b.error
           AND len(b.trace_address) <= len(a.trace_address)
           AND b.trace_address = list_slice(a.trace_address, 1, len(b.trace_address))
       ) THEN 0 ELSE 1 END AS status
FROM tr a
"""


def rule_engine_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-DSL predicate compiled to a Catalyst expression (≙
    rule_engine parser + Rule.filter, /root/reference/rule_engine/
    parser.py:178-500, blockchainetl/alert/rule.py:25-34)."""
    from blockchain_etl_spark.functions.rules import rule_filter

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    rule = "event_type in ['purchase','signup'] and value > 50 and event_type =~ '^(p|s).*'"
    return e.filter(rule_filter(rule)).select(
        "event_id", "event_type", F.round("value", 2).alias("value")
    )


_RULE_FILTER_SQL = """
SELECT event_id, event_type, round(value, 2) AS value
FROM events
WHERE event_type IN ('purchase','signup') AND value > 50
  AND regexp_matches(event_type, '^(p|s).*')
"""


def rule_label_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_of + tag_value_usd rule UDFs end-to-end (≙ rule_udf.py:7-33 +
    alert_exporter.py:149-150): the labels dim is broadcast-joined once
    (with_labels), then the rule predicate and the risk-tag ladder run as
    pure Catalyst expressions over the joined column."""
    from blockchain_etl_spark.functions.rules import rule_filter, rule_to_sql
    from blockchain_etl_spark.operators.alerts import with_labels

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    labels = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("address"), F.col("c_mktsegment").alias("label")
    )
    tagged = with_labels(e, labels, ["user_id"])
    rule = "label_of(user_id) == 'BUILDING' and value > 100"
    tag = rule_to_sql("tag_value_usd(value, 200, 400)")
    return tagged.filter(rule_filter(rule)).select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.col("user_id_label").alias("user_label"),
        F.expr(tag).alias("risk_tag"),
    )


_RULE_LABEL_SQL = """
SELECT event_id, user_id, round(value, 2) AS value,
       c_mktsegment AS user_label,
       CASE WHEN value > 400 THEN 'Level 1 risk control alert'
            WHEN value > 200 THEN 'Level 2 risk control alert'
            ELSE '' END AS risk_tag
FROM events LEFT JOIN customer ON user_id = c_custkey
WHERE coalesce(c_mktsegment, '') = 'BUILDING' AND value > 100
"""

_TRACK_HOPS = 3
_TRACK_SEEDS = (1, 2)
_TRACK_STOP_MOD = 7


def track_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tracked-address hop expansion ≙ track_exporter.py:110-165: events
    whose source is tracked pull their counterparty into the tracked set
    at hop+1; stop-oracle addresses (here: id % {mod} == 0, standing in
    for shold_stop's known-address patterns) are recorded but never
    expanded. The value-flow edge is (user_id → props.k). Oracle twin:
    a recursive CTE with per-level dedup (UNION) and MIN(hop) — BFS
    distance equals min over all bounded walks.

    Scale: one semi join + one anti join per hop; the frontier side is
    broadcast while small. No path enumeration — work per hop is
    O(edges touching new addresses)."""
    from blockchain_etl_spark.operators.alerts import track_frontier as tf

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = ev.select(
        F.col("user_id").alias("src"),
        F.get_json_object("props", "$.k").cast("long").alias("dst"),
    )
    seeds = spark.createDataFrame([(s,) for s in _TRACK_SEEDS], "src long")
    return tf(
        edges,
        seeds,
        hops=_TRACK_HOPS,
        key="src",
        dst_col="dst",
        stop=lambda c: c % _TRACK_STOP_MOD == 0,
    ).select("address", F.col("hop").cast("int").alias("hop"), "stopped")


_TRACK_FRONTIER_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT user_id AS src,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst
  FROM events
  WHERE user_id <> CAST(json_extract_string(props, '$.k') AS BIGINT)
), fr(address, hop) AS (
  SELECT * FROM (VALUES {", ".join(f"({s}::BIGINT, 0)" for s in _TRACK_SEEDS)})
  UNION
  SELECT e.dst, fr.hop + 1
  FROM fr JOIN edges e ON e.src = fr.address
  WHERE fr.hop < {_TRACK_HOPS} AND fr.address % {_TRACK_STOP_MOD} <> 0
)
SELECT address, MIN(hop)::INT AS hop,
       address % {_TRACK_STOP_MOD} = 0 AS stopped
FROM fr GROUP BY address
"""


# ---- streaming gate rows: two availableNow runs over one checkpoint ------
# Batch boundaries are made deterministic by landing run 1 (even event_ids)
# and run 2 (odd event_ids [+ exact replays]) as one file each and running
# the SAME streaming query twice against a shared checkpoint: the watermark
# W1 = max(run-1 ts) - delay is persisted at the end of run 1 and recovered
# for run 2, so run 2's old rows are genuinely behind a durable watermark.
# That makes the event-time semantics closed-form:
#   windowed agg:  kept = run1 ∪ {run2 rows whose window END > W1};
#                  emitted = windows with END <= W2 = max(all ts) - delay
#   dedup:         emitted = run1 keys ∪ {run2 NEW keys with ts >= W1}
#                  (exact replays are dropped late (ts < W1) or as live-state
#                  duplicates (expiry ts+delay > W1) — never re-emitted)
# — both exactly reproducible in SQL, which is the oracle twin. Boundary
# ties (window end == watermark) are measure-zero: watermarks inherit the
# data's microsecond precision, window ends are hour-aligned.

_STREAM_WINDOW_H = 6
_STREAM_DELAY_H = 12


def _stream_two_runs(spark, events, transform, prefix: str, out_schema: str):
    """Land even/odd halves, run `transform` as two availableNow passes
    into a parquet sink sharing one checkpoint; return the emitted rows."""
    import os

    work = _pid_scoped_gate_dir(prefix)
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(landing)

    in_schema = "event_id long, ts timestamp, event_type string, value double"
    base = events.select("event_id", "ts", "event_type", "value")

    def run():
        stream = spark.readStream.schema(in_schema).parquet(os.path.join(landing, "*"))
        q = (
            transform(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    base.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(landing, "b0")
    )
    run()
    run2 = base.filter(F.col("event_id") % 2 == 1)
    if prefix.startswith("stream-dedup"):
        # exact redeliveries of every 10th even row — the CDC at-least-once shape
        run2 = run2.unionByName(
            base.filter((F.col("event_id") % 2 == 0) & (F.col("event_id") % 10 == 0))
        )
    run2.coalesce(1).write.parquet(os.path.join(landing, "b1"))
    run()
    return spark.read.schema(out_schema).parquet(out)


def windowed_stream_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window counts with watermark late-drop,
    driven through real Structured Streaming state + checkpoint recovery
    (≙ the reference's consumer-loop periodic aggregation, SURVEY §2.10;
    semantics per the header comment above)."""
    from blockchain_etl_spark.streaming.windowed import windowed_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = _stream_two_runs(
        spark,
        ev,
        lambda s: windowed_event_counts(
            s,
            window=f"{_STREAM_WINDOW_H} hours",
            watermark=f"{_STREAM_DELAY_H} hours",
        ),
        "stream-window-gate",
        "window_start timestamp, window_end timestamp, event_type string,"
        " n_events long, sum_value double",
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return got.select(
        F.date_format("window_start", fmt).alias("window_start"),
        F.date_format("window_end", fmt).alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


_WINDOWED_STREAM_SQL = f"""
WITH r1 AS (SELECT * FROM events WHERE event_id % 2 = 0),
w1 AS (SELECT max(ts) - INTERVAL {_STREAM_DELAY_H} HOUR AS wm FROM r1),
w2 AS (SELECT max(ts) - INTERVAL {_STREAM_DELAY_H} HOUR AS wm FROM events),
kept AS (
  SELECT ts, event_type, value FROM r1
  UNION ALL
  SELECT e.ts, e.event_type, e.value FROM events e, w1
  WHERE e.event_id % 2 = 1
    AND time_bucket(INTERVAL {_STREAM_WINDOW_H} HOUR, e.ts)
        + INTERVAL {_STREAM_WINDOW_H} HOUR > w1.wm
),
agg AS (
  SELECT time_bucket(INTERVAL {_STREAM_WINDOW_H} HOUR, ts) AS ws, event_type,
         count(*) AS n_events, round(sum(value), 2) AS sum_value
  FROM kept GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(ws + INTERVAL {_STREAM_WINDOW_H} HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type, n_events, sum_value
FROM agg, w2 WHERE ws + INTERVAL {_STREAM_WINDOW_H} HOUR <= w2.wm
"""


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup under at-least-once redelivery
    (dropDuplicatesWithinWatermark): exact replays of already-emitted
    rows are suppressed — dropped late behind the recovered watermark or
    matched against live key state — while genuinely new rows pass
    (semantics per the header comment above)."""
    from blockchain_etl_spark.streaming.windowed import dedup_within_watermark

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = _stream_two_runs(
        spark,
        ev,
        lambda s: dedup_within_watermark(
            s, ["event_id"], watermark=f"{_STREAM_DELAY_H} hours"
        ),
        "stream-dedup-gate",
        "event_id long, ts timestamp, event_type string, value double",
    )
    return got.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_type",
        F.round("value", 2).alias("value"),
    )


_STREAM_DEDUP_SQL = f"""
WITH r1 AS (SELECT * FROM events WHERE event_id % 2 = 0),
wm AS (SELECT max(ts) - INTERVAL {_STREAM_DELAY_H} HOUR AS w FROM r1)
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       event_type, round(value, 2) AS value
FROM r1
UNION ALL
SELECT e.event_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       e.event_type, round(e.value, 2) AS value
FROM events e, wm WHERE e.event_id % 2 = 1 AND e.ts >= wm.w
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = X.quality_features("text")
    return d.select("doc_id", *feats)


_TEXT_QUALITY_SQL = """
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
       length(text) AS n_chars,
       len(words)::INT AS n_words,
       length(text) / greatest(len(words), 1) AS mean_word_len,
       length(regexp_replace(text, '[^.!?,;:]', '', 'g')) / greatest(length(text), 1)
         AS punct_ratio,
       len(list_intersect(list_transform(words, x -> lower(x)),
                          ['the','and','of','to','a','in','is','that','for','it']))::DOUBLE
         / greatest(len(words), 1) AS stopword_ratio,
       len(list_distinct(words))::DOUBLE / greatest(len(words), 1) AS distinct_word_ratio
FROM w
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        X.token_count_ws("text").alias("n_ws_tokens"),
        X.token_count_bpeish("text").alias("n_bpeish_tokens"),
    )


_TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::INT AS n_ws_tokens,
       (len(regexp_extract_all(text, '[A-Za-z0-9]+'))
        + len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')))::INT AS n_bpeish_tokens
FROM documents
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        X.doc_fingerprint("text", window=4).alias("fingerprint"),
        F.md5("text").alias("content_hash"),
    )


_FINGERPRINT_SQL = """
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
sh AS (
  SELECT doc_id, text,
         CASE WHEN len(words) >= 4 THEN
           list_transform(generate_series(0, len(words) - 4),
                          i -> array_to_string(list_slice(words, i + 1, i + 4), ' '))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
)
SELECT doc_id,
       list_min(list_transform(shingles, s -> md5(s))) AS fingerprint,
       md5(text) AS content_hash
FROM sh
"""


_CHUNK = 64


def token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking of the input_hint token arrays: each
    document's tokens split into fixed-size ordered chunks (the step
    between the lake table and fixed-length training batches). Narrow
    map — slice + posexplode, zero shuffles."""
    from blockchain_etl_spark.operators import tokens as TOK

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = X.tokenize("text", vocab=_VOCAB)
    base = d.select("doc_id", toks.alias("tokens"))
    out = TOK.chunk_tokens(base, chunk=_CHUNK)
    return out.select(
        F.format_string("doc-%06d", F.col("doc_id")).alias("doc_id"),
        "chunk_id",
        F.concat_ws(",", F.col("chunk_tokens").cast("array<string>")).alias(
            "chunk_csv"
        ),
        "n_chunk_tok",
    )


_TOKEN_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''),
                        w -> ((('0x' || substr(md5(w), 1, 6))::BIGINT % {_VOCAB}))::INT)
           AS tokens
  FROM documents
),
c AS (
  SELECT doc_id, tokens, len(tokens) AS n,
         unnest(range(0, (len(tokens) + {_CHUNK} - 1) // {_CHUNK})) AS chunk_id
  FROM t WHERE len(tokens) > 0
)
SELECT 'doc-' || lpad(doc_id::VARCHAR, 6, '0') AS doc_id,
       chunk_id::INT AS chunk_id,
       array_to_string(
         list_slice(tokens, chunk_id * {_CHUNK} + 1,
                    least((chunk_id + 1) * {_CHUNK}, n)), ',') AS chunk_csv,
       (least((chunk_id + 1) * {_CHUNK}, n) - chunk_id * {_CHUNK})::INT AS n_chunk_tok
FROM c
"""


_PACK_BUDGET = 512


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous packing (concat-and-cut): documents in doc_id
    order within each source, cut every {budget} tokens; two-phase
    range-partitioned cumsum (parallelism independent of source
    cardinality), then the pack aggregation."""
    from blockchain_etl_spark.operators import tokens as TOK

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = d.select(
        "doc_id",
        "source",
        F.size(X.words("text")).alias("n_tok"),
    )
    return TOK.pack_sequences(base, budget=_PACK_BUDGET)


_SEQUENCE_PACK_SQL = f"""
WITH t AS (
  SELECT source, doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS n_tok
  FROM documents
),
p AS (
  SELECT source AS part, doc_id, n_tok,
         ((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok)
            // {_PACK_BUDGET})::BIGINT AS pack_id
  FROM t
)
SELECT part, pack_id,
       count(*) AS n_docs,
       sum(n_tok)::BIGINT AS n_tok_sum,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM p GROUP BY part, pack_id
"""


_EVAL_MOD = 37
_DECON_K = 3
_DECON_MIN_HITS = 2


def ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= min_hits
    distinct word 3-grams with the deterministic eval slice
    (doc_id % {mod} == 0). Eval n-gram set broadcasts; the only corpus
    shuffle is the map-side-combined hit count."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.decontaminate(
        d,
        eval_pred=F.col("doc_id") % _EVAL_MOD == 0,
        k=_DECON_K,
        min_hits=_DECON_MIN_HITS,
    )


_DECONTAMINATE_SQL = f"""
WITH w AS (
  SELECT doc_id, (doc_id % {_EVAL_MOD} = 0) AS is_eval,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
sh AS (
  SELECT doc_id, is_eval,
         CASE WHEN len(words) >= {_DECON_K} THEN
           list_transform(generate_series(0, len(words) - {_DECON_K}),
                          i -> array_to_string(list_slice(words, i + 1, i + {_DECON_K}), ' '))
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM w
),
g AS (SELECT doc_id, is_eval, unnest(list_distinct(shingles)) AS g FROM sh),
e AS (SELECT DISTINCT g FROM g WHERE is_eval)
SELECT doc_id, count(*) AS n_contaminated
FROM g JOIN e USING (g)
WHERE NOT is_eval
GROUP BY doc_id
HAVING count(*) >= {_DECON_MIN_HITS}
"""


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (duplicated word-bigram fraction) —
    the MassiveText-style boilerplate signal; pure array expressions,
    zero shuffles."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_grams, n_distinct = X.repetition_stats("text", k=2)
    return d.select("doc_id", n_grams, n_distinct).select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.round(1.0 - F.col("n_distinct") / F.col("n_grams"), 4).alias("rep_ratio"),
    )


_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 2 THEN
           list_transform(generate_series(0, len(words) - 2),
                          i -> array_to_string(list_slice(words, i + 1, i + 2), ' '))
         ELSE [array_to_string(words, ' ')] END AS g
  FROM w
)
SELECT doc_id,
       len(g)::INT AS n_grams,
       len(list_distinct(g))::INT AS n_distinct,
       round(1.0 - len(list_distinct(g))::DOUBLE / len(g), 4) AS rep_ratio
FROM sh
"""


_Q_MIN_TOK = 8
_Q_MIN_DISTINCT_RATIO = 0.3


def corpus_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus pipeline as ONE lazy plan:
    tokenize → exact-dedup (min doc_id per identical token sequence) →
    quality filter (length + distinct-token ratio) → benchmark
    decontamination (shared token 3-grams vs the eval slice) → fixed-
    size chunking. Each stage is an operator the catalog already gates
    individually; this row proves they compose — and that Catalyst
    fuses the composition (the dedup agg and the contamination count
    are the only shuffles; everything else is narrow)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = d.select(
        "doc_id",
        X.tokenize("text", vocab=_VOCAB).alias("tokens"),
    ).withColumn("n_tok", F.size("tokens"))

    # exact dedup: smallest doc_id represents each identical sequence
    reps = t.groupBy("tokens").agg(F.min("doc_id").alias("doc_id"))
    surv = t.join(reps.select("doc_id"), "doc_id", "left_semi")

    # quality: long enough, not token-degenerate
    q = surv.filter(
        (F.col("n_tok") >= _Q_MIN_TOK)
        & (
            F.size(F.array_distinct("tokens"))
            >= F.lit(_Q_MIN_DISTINCT_RATIO) * F.col("n_tok")
        )
    )

    # decontamination: distinct token 3-grams of the FULL eval slice
    # (pre-dedup — an eval doc always contaminates, even if its dup was
    # dropped), broadcast against candidate 3-grams. Reuses the shared
    # decontaminate operator with a token-gram expression.
    token_grams = F.transform(
        F.sequence(F.lit(0), F.col("n_tok") - _DECON_K),
        lambda i: F.concat_ws(",", F.slice("tokens", i + 1, _DECON_K).cast("array<string>")),
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    cand = q.filter(~is_eval)
    decon_in = t.filter(is_eval).unionByName(cand).filter(
        F.col("n_tok") >= _DECON_K
    )
    contaminated = dedup.decontaminate(
        decon_in, is_eval, k=_DECON_K, min_hits=_DECON_MIN_HITS, grams=token_grams
    )
    clean = cand.join(contaminated.select("doc_id"), "doc_id", "left_anti")

    from blockchain_etl_spark.operators import tokens as TOK

    out = TOK.chunk_tokens(clean, chunk=_CHUNK)
    return out.select(
        F.format_string("doc-%06d", F.col("doc_id")).alias("doc_id"),
        "chunk_id",
        F.concat_ws(",", F.col("chunk_tokens").cast("array<string>")).alias(
            "chunk_csv"
        ),
        "n_chunk_tok",
    )


_CORPUS_PREPARE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''),
                        w -> ((('0x' || substr(md5(w), 1, 6))::BIGINT % {_VOCAB}))::INT)
           AS tokens
  FROM documents
),
tn AS (SELECT doc_id, tokens, len(tokens) AS n_tok FROM t),
reps AS (SELECT min(doc_id) AS doc_id FROM tn GROUP BY tokens),
surv AS (SELECT tn.* FROM tn JOIN reps USING (doc_id)),
q AS (
  SELECT * FROM surv
  WHERE n_tok >= {_Q_MIN_TOK}
    AND len(list_distinct(tokens)) >= {_Q_MIN_DISTINCT_RATIO} * n_tok
),
eg AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
           generate_series(0, n_tok - {_DECON_K}),
           i -> array_to_string(list_slice(tokens, i + 1, i + {_DECON_K}), ',')))) AS g
  FROM tn WHERE doc_id % {_EVAL_MOD} = 0 AND n_tok >= {_DECON_K}
),
cand AS (SELECT * FROM q WHERE doc_id % {_EVAL_MOD} <> 0),
cg AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(0, n_tok - {_DECON_K}),
           i -> array_to_string(list_slice(tokens, i + 1, i + {_DECON_K}), ',')))) AS g
  FROM cand WHERE n_tok >= {_DECON_K}
),
contaminated AS (
  SELECT doc_id FROM cg JOIN eg USING (g)
  GROUP BY doc_id HAVING count(*) >= {_DECON_MIN_HITS}
),
clean AS (
  SELECT * FROM cand WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
c AS (
  SELECT doc_id, tokens, n_tok,
         unnest(range(0, (n_tok + {_CHUNK} - 1) // {_CHUNK})) AS chunk_id
  FROM clean WHERE n_tok > 0
)
SELECT 'doc-' || lpad(doc_id::VARCHAR, 6, '0') AS doc_id,
       chunk_id::INT AS chunk_id,
       array_to_string(
         list_slice(tokens, chunk_id * {_CHUNK} + 1,
                    least((chunk_id + 1) * {_CHUNK}, n_tok)), ',') AS chunk_csv,
       (least((chunk_id + 1) * {_CHUNK}, n_tok) - chunk_id * {_CHUNK})::INT AS n_chunk_tok
FROM c
"""


# --------------------------------------------------------------------------
# ABI-decode extractors end-to-end: synthesize deterministic hex logs FROM
# the events table (so DuckDB derives the identical logs), then run the
# reference-semantic extraction (WETH rewrite, weird-event rejection,
# erc1155 head-tail batch decode).
# --------------------------------------------------------------------------

from blockchain_etl_spark.operators import extractors as EXT


def _synth_eth_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → deterministic ERC20-ish logs: Transfer / WETH Deposit /
    WETH Withdrawal / unrelated-topic / anonymous / weird-data mix."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    word = lambda tag: F.concat(
        F.lit("0x" + "0" * 24), F.substring(F.md5(F.concat(F.lit(tag), eid)), 1, 40)
    )
    addr = lambda tag: F.concat(
        F.lit("0x"), F.substring(F.md5(F.concat(F.lit(tag), eid)), 1, 40)
    )
    vi = F.floor(F.col("value") * 100).cast("long")
    whex = lambda v: F.lpad(F.lower(F.hex(v)), 64, "0")
    kind = F.col("event_id") % 5
    weird = F.col("event_id") % 13 == 7
    # Deposit/Withdrawal at a NON-weth address (not rewritten → dropped)
    nonweth = F.col("event_id") % 7 == 3
    weth_addr = F.when(nonweth, addr("a")).otherwise(F.lit(EXT.WETH_TOKEN_ADDRESS))
    topics = (
        F.when(F.col("event_id") % 31 == 0, F.array().cast("array<string>"))
        .when(kind <= 1, F.array(F.lit(EXT.TRANSFER_EVENT_TOPIC), word("f"), word("t")))
        .when(kind == 2, F.array(F.lit(EXT.DEPOSIT_EVENT_TOPIC), word("f")))
        .when(kind == 3, F.array(F.lit(EXT.WITHDRAWAL_EVENT_TOPIC), word("f")))
        .otherwise(F.array(F.concat(F.lit("0x"), F.md5(F.concat(F.lit("o"), eid)))))
    )
    data = F.concat(
        F.lit("0x"), F.when(weird, F.concat(whex(vi), whex(vi + 1))).otherwise(whex(vi))
    )
    return e.select(
        "event_id",
        F.when(kind.isin(2, 3), weth_addr).otherwise(addr("a")).alias("address"),
        topics.alias("topics"),
        data.alias("data"),
    )


def log_transfer_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ EthTokenTransferExtractor end-to-end
    (token_transfer_extractor.py:62-109) over synthesized hex logs."""
    return EXT.extract_token_transfers(_synth_eth_logs(spark, sf_dir))


_SYNTH_LOGS_CTE = f"""
  ev AS (
    SELECT event_id, floor(value * 100)::BIGINT AS vi FROM events
  ),
  logs AS (
    SELECT event_id,
           CASE WHEN event_id % 5 IN (2, 3) THEN
                  CASE WHEN event_id % 7 = 3
                       THEN '0x' || substr(md5('a' || event_id::VARCHAR), 1, 40)
                       ELSE '{EXT.WETH_TOKEN_ADDRESS}' END
                ELSE '0x' || substr(md5('a' || event_id::VARCHAR), 1, 40)
           END AS address,
           CASE WHEN event_id % 31 = 0 THEN []::VARCHAR[]
                WHEN event_id % 5 <= 1 THEN
                  ['{EXT.TRANSFER_EVENT_TOPIC}',
                   '0x' || repeat('0', 24) || substr(md5('f' || event_id::VARCHAR), 1, 40),
                   '0x' || repeat('0', 24) || substr(md5('t' || event_id::VARCHAR), 1, 40)]
                WHEN event_id % 5 = 2 THEN
                  ['{EXT.DEPOSIT_EVENT_TOPIC}',
                   '0x' || repeat('0', 24) || substr(md5('f' || event_id::VARCHAR), 1, 40)]
                WHEN event_id % 5 = 3 THEN
                  ['{EXT.WITHDRAWAL_EVENT_TOPIC}',
                   '0x' || repeat('0', 24) || substr(md5('f' || event_id::VARCHAR), 1, 40)]
                ELSE ['0x' || md5('o' || event_id::VARCHAR)]
           END AS topics,
           '0x' || lpad(lower(hex(vi)), 64, '0')
                || CASE WHEN event_id % 13 = 7
                        THEN lpad(lower(hex(vi + 1)), 64, '0') ELSE '' END AS data
    FROM ev
  )
"""

_LOG_TRANSFER_SQL = f"""
WITH {_SYNTH_LOGS_CTE},
rw AS (
  SELECT event_id, lower(address) AS token_address, data,
         CASE WHEN lower(address) = '{EXT.WETH_TOKEN_ADDRESS}'
                   AND topics[1] = '{EXT.DEPOSIT_EVENT_TOPIC}'
              THEN ['{EXT.TRANSFER_EVENT_TOPIC}', '{EXT.ZERO_ADDR}', topics[2]]
              WHEN lower(address) = '{EXT.WETH_TOKEN_ADDRESS}'
                   AND topics[1] = '{EXT.WITHDRAWAL_EVENT_TOPIC}'
              THEN ['{EXT.TRANSFER_EVENT_TOPIC}', topics[2], '{EXT.ZERO_ADDR}']
              ELSE topics END AS t
  FROM logs WHERE len(topics) >= 1
),
twd AS (
  SELECT event_id, token_address,
         t || list_transform(generate_series(0, (length(data) - 2) // 64 - 1),
                             i -> substr(data, 3 + i * 64, 64)) AS w
  FROM rw
)
SELECT event_id, token_address,
       lower('0x' || right(w[2], 40)) AS from_address,
       lower('0x' || right(w[3], 40)) AS to_address,
       ('0x' || right(w[4], 16))::BIGINT AS value
FROM twd WHERE w[1] = '{EXT.TRANSFER_EVENT_TOPIC}' AND len(w) = 4
"""


def _synth_erc1155_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → deterministic ERC1155 logs: TransferSingle / TransferBatch
    (head-tail encoded, 1-3 ids) / count-mismatch batch / unrelated."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    word = lambda tag: F.concat(
        F.lit("0x" + "0" * 24), F.substring(F.md5(F.concat(F.lit(tag), eid)), 1, 40)
    )
    whex = lambda v: F.lpad(F.lower(F.hex(v)), 64, "0")
    kind = F.col("event_id") % 4
    cnt = (F.col("event_id") % 3 + 1).cast("int")
    ids = F.transform(
        F.sequence(F.lit(0), cnt - 1), lambda j: whex(F.col("event_id") * 7 + j)
    )
    vals = F.transform(
        F.sequence(F.lit(0), cnt - 1), lambda j: whex(F.col("event_id") * 11 + j)
    )
    va_cnt = F.when(kind == 3, cnt + 1).otherwise(cnt)  # kind 3: mismatch
    batch_words = F.concat(
        F.array(whex(F.lit(64)), whex(64 + 32 * (cnt + 1))),
        F.array(whex(cnt)),
        ids,
        F.array(whex(va_cnt)),
        vals,
    )
    single_words = F.array(whex(F.col("event_id") * 7), whex(F.col("event_id") * 11))
    data_words = F.when(kind == 0, single_words).otherwise(batch_words)
    topic0 = F.when(kind == 0, F.lit(EXT.TRANSFER_SINGLE_TOPIC)).otherwise(
        F.lit(EXT.TRANSFER_BATCH_TOPIC)
    )
    topics = F.when(
        F.col("event_id") % 29 == 0,
        F.array(F.concat(F.lit("0x"), F.md5(F.concat(F.lit("x"), eid)))),
    ).otherwise(F.array(topic0, word("p"), word("f"), word("t")))
    return e.select(
        "event_id",
        F.concat(F.lit("0x"), F.substring(F.md5(F.concat(F.lit("c"), eid)), 1, 40)).alias(
            "address"
        ),
        topics.alias("topics"),
        F.concat(F.lit("0x"), F.concat_ws("", data_words)).alias("data"),
    )


def erc1155_batch_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ EthErc1155TransferExtractor end-to-end
    (erc1155_transfer_extractor.py:24-123) over synthesized hex logs."""
    return EXT.extract_erc1155_transfers(_synth_erc1155_logs(spark, sf_dir))


_ERC1155_SQL = f"""
WITH ev AS (SELECT event_id, event_id % 4 AS kind, (event_id % 3 + 1)::INT AS cnt
            FROM events),
logs AS (
  SELECT event_id,
         '0x' || substr(md5('c' || event_id::VARCHAR), 1, 40) AS address,
         CASE WHEN event_id % 29 = 0
              THEN ['0x' || md5('x' || event_id::VARCHAR)]
              ELSE [CASE WHEN kind = 0 THEN '{EXT.TRANSFER_SINGLE_TOPIC}'
                         ELSE '{EXT.TRANSFER_BATCH_TOPIC}' END,
                    '0x' || repeat('0', 24) || substr(md5('p' || event_id::VARCHAR), 1, 40),
                    '0x' || repeat('0', 24) || substr(md5('f' || event_id::VARCHAR), 1, 40),
                    '0x' || repeat('0', 24) || substr(md5('t' || event_id::VARCHAR), 1, 40)]
         END AS topics,
         CASE WHEN kind = 0
              THEN [lpad(lower(hex(event_id * 7)), 64, '0'),
                    lpad(lower(hex(event_id * 11)), 64, '0')]
              ELSE [lpad(lower(hex(64)), 64, '0'),
                    lpad(lower(hex(64 + 32 * (cnt + 1))), 64, '0'),
                    lpad(lower(hex(cnt)), 64, '0')]
                   || list_transform(generate_series(0, cnt - 1),
                                     j -> lpad(lower(hex(event_id * 7 + j)), 64, '0'))
                   || [lpad(lower(hex(CASE WHEN kind = 3 THEN cnt + 1 ELSE cnt END)), 64, '0')]
                   || list_transform(generate_series(0, cnt - 1),
                                     j -> lpad(lower(hex(event_id * 11 + j)), 64, '0'))
         END AS dw
  FROM ev
),
twd AS (
  SELECT event_id, lower(address) AS token_address, topics || dw AS w
  FROM logs WHERE len(topics) >= 1
),
hdr AS (
  SELECT event_id, token_address, w,
         lower('0x' || right(w[2], 40)) AS operator,
         lower('0x' || right(w[3], 40)) AS from_address,
         lower('0x' || right(w[4], 40)) AS to_address
  FROM twd
),
single AS (
  SELECT event_id, token_address, operator, from_address, to_address,
         'TransferSingle' AS xfer_type, 0 AS id_pos, 1 AS id_cnt,
         ('0x' || right(w[5], 16))::BIGINT AS id,
         ('0x' || right(w[6], 16))::BIGINT AS value
  FROM hdr WHERE w[1] = '{EXT.TRANSFER_SINGLE_TOPIC}' AND len(w) = 6
),
batch0 AS (
  SELECT *, ('0x' || right(w[7], 16))::BIGINT::INT AS id_cnt
  FROM hdr WHERE w[1] = '{EXT.TRANSFER_BATCH_TOPIC}' AND len(w) >= 8
),
batch AS (
  SELECT event_id, token_address, operator, from_address, to_address,
         'TransferBatch' AS xfer_type, id_cnt,
         unnest(list_transform(generate_series(0, id_cnt - 1), i -> struct_pack(
           id_pos := i::INT,
           id := ('0x' || right(w[8 + i], 16))::BIGINT,
           value := ('0x' || right(w[9 + i + id_cnt], 16))::BIGINT)),
           recursive := true)
  FROM batch0
  WHERE id_cnt >= 1
    AND ('0x' || right(w[8 + id_cnt], 16))::BIGINT = id_cnt
)
SELECT event_id, token_address, operator, from_address, to_address,
       xfer_type, id_pos, id_cnt, id, value FROM single
UNION ALL
SELECT event_id, token_address, operator, from_address, to_address,
       xfer_type, id_pos, id_cnt, id, value FROM batch
"""



def _synth_erc721_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ERC721-ish Transfer logs: plain / known-ERC20-address /
    CryptoPunk-address / weird-length / anonymous mix (all four indexed
    params → 4 topics, empty data)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    word = lambda tag: F.concat(
        F.lit("0x" + "0" * 24), F.substring(F.md5(F.concat(F.lit(tag), eid)), 1, 40)
    )
    addr = lambda tag: F.concat(
        F.lit("0x"), F.substring(F.md5(F.concat(F.lit(tag), eid)), 1, 40)
    )
    vi = F.floor(F.col("value") * 100).cast("long")
    idw = F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(vi)), 64, "0"))
    kind = F.col("event_id") % 6
    address = (
        F.when(kind == 2, addr("e"))
        .when(kind == 3, F.lit(EXT.CRYPTOPUNK_TOKEN_ADDRESS))
        .otherwise(addr("a"))
    )
    topics = F.when(kind == 5, F.array().cast("array<string>")).otherwise(
        F.array(F.lit(EXT.TRANSFER_EVENT_TOPIC), word("f"), word("t"), idw)
    )
    data = F.when(
        kind == 4, F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(vi + 1)), 64, "0"))
    ).otherwise(F.lit("0x"))
    return e.select(
        "event_id", address.alias("address"), topics.alias("topics"), data.alias("data")
    )


def erc721_transfer_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ EthErc721TransferExtractor end-to-end
    (erc721_transfer_extractor.py:17-62): Transfer logs minus the known
    ERC20 set (broadcast anti join) minus the CryptoPunk contract, the
    indexed 4th topic decoded as token_id."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    erc20 = e.filter(F.col("event_id") % 6 == 2).select(
        F.concat(
            F.lit("0x"), F.substring(F.md5(F.concat(F.lit("e"), eid)), 1, 40)
        ).alias("address")
    )
    return EXT.extract_erc721_transfers(_synth_erc721_logs(spark, sf_dir), erc20)


_ERC721_SQL = f"""
WITH ev AS (
  SELECT event_id, event_id % 6 AS kind, floor(value * 100)::BIGINT AS vi
  FROM events
),
logs AS (
  SELECT event_id, kind,
         CASE WHEN kind = 2 THEN '0x' || substr(md5('e' || event_id::VARCHAR), 1, 40)
              WHEN kind = 3 THEN '{EXT.CRYPTOPUNK_TOKEN_ADDRESS}'
              ELSE '0x' || substr(md5('a' || event_id::VARCHAR), 1, 40)
         END AS address,
         CASE WHEN kind = 5 THEN []::VARCHAR[]
              ELSE ['{EXT.TRANSFER_EVENT_TOPIC}',
                    '0x' || repeat('0', 24) || substr(md5('f' || event_id::VARCHAR), 1, 40),
                    '0x' || repeat('0', 24) || substr(md5('t' || event_id::VARCHAR), 1, 40),
                    '0x' || lpad(lower(hex(vi)), 64, '0')]
         END AS topics,
         CASE WHEN kind = 4 THEN '0x' || lpad(lower(hex(vi + 1)), 64, '0')
              ELSE '0x' END AS data
  FROM ev
),
twd AS (
  SELECT event_id, lower(address) AS token_address,
         topics || list_transform(generate_series(0, (length(data) - 2) // 64 - 1),
                                  i -> substr(data, 3 + i * 64, 64)) AS w
  FROM logs WHERE len(topics) >= 1
)
SELECT event_id, token_address,
       lower('0x' || right(w[2], 40)) AS from_address,
       lower('0x' || right(w[3], 40)) AS to_address,
       ('0x' || right(w[4], 16))::BIGINT AS token_id
FROM twd
WHERE w[1] = '{EXT.TRANSFER_EVENT_TOPIC}' AND len(w) = 4
  AND token_address <> '{EXT.CRYPTOPUNK_TOKEN_ADDRESS}'
  AND token_address NOT IN (
    SELECT '0x' || substr(md5('e' || event_id::VARCHAR), 1, 40)
    FROM ev WHERE kind = 2)
"""


def _synth_punk_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → per-block CryptoPunk log sequences exercising every merge
    path: Assign / PunkTransfer@+1 / sale@+2 / bid@+1 / orphan /
    double-match."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_id") % 8 < 6
    )
    eid = F.col("event_id").cast("string")
    word = lambda tag: F.concat(
        F.lit("0x" + "0" * 24), F.substring(F.md5(F.concat(F.lit(tag), eid)), 1, 40)
    )
    vi = F.floor(F.col("value") * 100).cast("long")
    pidw = F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(vi % 10000)), 64, "0"))
    vw = F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(vi)), 64, "0"))
    zw = F.lit("0x" + "0" * 64)
    T = F.lit(EXT.TRANSFER_EVENT_TOPIC)
    PT = F.lit(EXT.PUNK_TRANSFER_EVENT_TOPIC)
    PB = F.lit(EXT.PUNK_BOUGHT_EVENT_TOPIC)
    AS_ = F.lit(EXT.ASSIGN_EVENT_TOPIC)

    def mk(li, topics, data):
        return F.struct(
            F.lit(li).cast("long").alias("log_index"),
            topics.alias("topics"),
            data.alias("data"),
        )

    transfer0 = mk(0, F.array(T, word("f"), word("t")), vw)
    transfer1 = mk(1, F.array(T, word("t"), word("g")), vw)
    punk1 = mk(1, F.array(PT, word("f"), word("t")), pidw)
    sale2 = mk(2, F.array(PB, pidw, word("f"), word("t")), vw)
    bid1 = mk(1, F.array(PB, pidw, word("f"), zw), vw)
    assign0 = mk(0, F.array(AS_, word("t")), pidw)
    orphan3 = mk(3, F.array(PT, word("f"), word("t")), pidw)
    p = F.col("event_id") % 8
    arr = (
        F.when(p == 0, F.array(assign0))
        .when(p == 1, F.array(transfer0, punk1))
        .when(p == 2, F.array(transfer0, sale2))
        .when(p == 3, F.array(transfer0, bid1))
        .when(p == 4, F.array(orphan3))
        .otherwise(F.array(transfer0, transfer1, sale2))
    )
    return e.select(
        F.col("event_id").alias("block_number"),
        F.concat(F.lit("0x"), F.md5(F.concat(F.lit("h"), eid))).alias(
            "transaction_hash"
        ),
        F.lit(0).alias("transaction_index"),
        F.lit(EXT.CRYPTOPUNK_TOKEN_ADDRESS).alias("address"),
        F.explode(arr).alias("l"),
    ).select(
        "block_number",
        "transaction_hash",
        "transaction_index",
        "address",
        F.col("l.topics").alias("topics"),
        F.col("l.data").alias("data"),
        F.col("l.log_index").alias("log_index"),
    )


def cryptopunk_transfer_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ EthCryptoPunkTransferExtractor decode + merge end-to-end
    (cryptopunk_extractor.py:36-155) over synthesized per-block log
    sequences — pandas merges re-expressed as equi hash joins."""
    return EXT.extract_cryptopunk_transfers(_synth_punk_logs(spark, sf_dir))


_CRYPTOPUNK_SQL = f"""
WITH ev AS (
  SELECT event_id, event_id % 8 AS p, floor(value * 100)::BIGINT AS vi
  FROM events WHERE event_id % 8 < 6
),
base AS (
  SELECT event_id, p,
         '0x' || repeat('0', 24) || substr(md5('f' || event_id::VARCHAR), 1, 40) AS wf,
         '0x' || repeat('0', 24) || substr(md5('t' || event_id::VARCHAR), 1, 40) AS wt,
         '0x' || repeat('0', 24) || substr(md5('g' || event_id::VARCHAR), 1, 40) AS wg,
         '0x' || lpad(lower(hex(vi % 10000)), 64, '0') AS pidw,
         '0x' || lpad(lower(hex(vi)), 64, '0') AS vw,
         '0x' || repeat('0', 64) AS zw,
         '0x' || md5('h' || event_id::VARCHAR) AS txh
  FROM ev
),
logs AS (
  SELECT event_id AS block_number, txh AS transaction_hash, 0 AS transaction_index,
         unnest(CASE p
           WHEN 0 THEN [struct_pack(li := 0::BIGINT,
                          topics := ['{EXT.ASSIGN_EVENT_TOPIC}', wt], data := pidw)]
           WHEN 1 THEN [struct_pack(li := 0::BIGINT,
                          topics := ['{EXT.TRANSFER_EVENT_TOPIC}', wf, wt], data := vw),
                        struct_pack(li := 1::BIGINT,
                          topics := ['{EXT.PUNK_TRANSFER_EVENT_TOPIC}', wf, wt], data := pidw)]
           WHEN 2 THEN [struct_pack(li := 0::BIGINT,
                          topics := ['{EXT.TRANSFER_EVENT_TOPIC}', wf, wt], data := vw),
                        struct_pack(li := 2::BIGINT,
                          topics := ['{EXT.PUNK_BOUGHT_EVENT_TOPIC}', pidw, wf, wt], data := vw)]
           WHEN 3 THEN [struct_pack(li := 0::BIGINT,
                          topics := ['{EXT.TRANSFER_EVENT_TOPIC}', wf, wt], data := vw),
                        struct_pack(li := 1::BIGINT,
                          topics := ['{EXT.PUNK_BOUGHT_EVENT_TOPIC}', pidw, wf, zw], data := vw)]
           WHEN 4 THEN [struct_pack(li := 3::BIGINT,
                          topics := ['{EXT.PUNK_TRANSFER_EVENT_TOPIC}', wf, wt], data := pidw)]
           ELSE [struct_pack(li := 0::BIGINT,
                   topics := ['{EXT.TRANSFER_EVENT_TOPIC}', wf, wt], data := vw),
                 struct_pack(li := 1::BIGINT,
                   topics := ['{EXT.TRANSFER_EVENT_TOPIC}', wt, wg], data := vw),
                 struct_pack(li := 2::BIGINT,
                   topics := ['{EXT.PUNK_BOUGHT_EVENT_TOPIC}', pidw, wf, wt], data := vw)]
         END, recursive := true)
  FROM base
),
dec AS (
  SELECT block_number, transaction_hash, transaction_index, li AS log_index,
         topics[1] AS topics_0,
         topics || list_transform(generate_series(0, (length(data) - 2) // 64 - 1),
                                  i -> substr(data, 3 + i * 64, 64)) AS w
  FROM logs
),
typed AS (
  SELECT *,
         CASE topics_0 WHEN '{EXT.PUNK_TRANSFER_EVENT_TOPIC}' THEN 4
                       WHEN '{EXT.PUNK_BOUGHT_EVENT_TOPIC}' THEN 5
                       WHEN '{EXT.TRANSFER_EVENT_TOPIC}' THEN 4
                       WHEN '{EXT.ASSIGN_EVENT_TOPIC}' THEN 3 END AS req,
         CASE topics_0 WHEN '{EXT.PUNK_TRANSFER_EVENT_TOPIC}' THEN 1
                       WHEN '{EXT.PUNK_BOUGHT_EVENT_TOPIC}' THEN 2
                       WHEN '{EXT.TRANSFER_EVENT_TOPIC}' THEN 1 END AS fi,
         CASE topics_0 WHEN '{EXT.PUNK_TRANSFER_EVENT_TOPIC}' THEN 2
                       WHEN '{EXT.PUNK_BOUGHT_EVENT_TOPIC}' THEN 3
                       WHEN '{EXT.TRANSFER_EVENT_TOPIC}' THEN 2
                       WHEN '{EXT.ASSIGN_EVENT_TOPIC}' THEN 1 END AS ti,
         CASE topics_0 WHEN '{EXT.PUNK_TRANSFER_EVENT_TOPIC}' THEN 3
                       WHEN '{EXT.PUNK_BOUGHT_EVENT_TOPIC}' THEN 1
                       WHEN '{EXT.ASSIGN_EVENT_TOPIC}' THEN 2 END AS ii
  FROM dec
),
d AS (
  SELECT block_number, transaction_hash, transaction_index, log_index, topics_0,
         '{EXT.CRYPTOPUNK_TOKEN_ADDRESS}' AS token_address,
         CASE WHEN topics_0 = '{EXT.ASSIGN_EVENT_TOPIC}' THEN '{"0x" + "0" * 40}'
              ELSE lower('0x' || right(w[fi + 1], 40)) END AS from_address,
         lower('0x' || right(w[ti + 1], 40)) AS to_address,
         CASE WHEN ii IS NOT NULL
              THEN ('0x' || right(w[ii + 1], 16))::BIGINT END AS token_id
  FROM typed WHERE req IS NOT NULL AND len(w) = req
),
s AS (
  SELECT block_number, transaction_hash, transaction_index,
         to_address AS s_to_address, log_index AS s_log_index
  FROM d WHERE topics_0 = '{EXT.TRANSFER_EVENT_TOPIC}'
)
SELECT block_number, transaction_hash, transaction_index, token_address,
       from_address, to_address, token_id, log_index FROM (
  SELECT block_number, transaction_hash, transaction_index, token_address,
         from_address, to_address AS to_address, token_id,
         log_index AS log_index
  FROM d WHERE topics_0 = '{EXT.ASSIGN_EVENT_TOPIC}'
  UNION ALL
  SELECT d.block_number, d.transaction_hash, d.transaction_index, d.token_address,
         d.from_address, s.s_to_address AS to_address, d.token_id,
         s.s_log_index AS log_index
  FROM d JOIN s ON d.block_number = s.block_number
    AND d.transaction_hash = s.transaction_hash
    AND d.transaction_index = s.transaction_index
    AND d.log_index = s.s_log_index + 1
  WHERE d.topics_0 = '{EXT.PUNK_TRANSFER_EVENT_TOPIC}'
  UNION ALL
  SELECT d.block_number, d.transaction_hash, d.transaction_index, d.token_address,
         d.from_address, s.s_to_address AS to_address, d.token_id,
         s.s_log_index AS log_index
  FROM d JOIN s ON d.block_number = s.block_number
    AND d.transaction_hash = s.transaction_hash
    AND d.transaction_index = s.transaction_index
    AND d.log_index = s.s_log_index + 2
  WHERE d.topics_0 = '{EXT.PUNK_BOUGHT_EVENT_TOPIC}'
    AND d.to_address <> '{"0x" + "0" * 40}'
  UNION ALL
  SELECT d.block_number, d.transaction_hash, d.transaction_index, d.token_address,
         d.from_address, s.s_to_address AS to_address, d.token_id,
         s.s_log_index AS log_index
  FROM d JOIN s ON d.block_number = s.block_number
    AND d.transaction_hash = s.transaction_hash
    AND d.transaction_index = s.transaction_index
    AND d.log_index = s.s_log_index + 1
  WHERE d.topics_0 = '{EXT.PUNK_BOUGHT_EVENT_TOPIC}'
)
"""



def _synth_nop_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → deterministic marketplace + ERC721-leg logs: each trade
    event (event_id % 3 ∈ {0: opensea, 1: looksrare}) emits the
    platform's order event AND the NFT Transfer of the same tx;
    % 3 == 2 rows are unrelated-topic noise the extractor must skip."""
    from blockchain_etl_spark.operators import orderbook as OB

    # the test tables arrive as ONE small parquet file → a 1-partition
    # scan would serialize the md5-heavy synthetic derivation (and every
    # branch of the union below) onto one core; at production scale the
    # log scan is wide by nature, so spread the synthetic one too
    e = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    eid = F.col("event_id").cast("string")
    vi = F.floor(F.col("value") * 100).cast("long")
    fee = F.floor(vi / 40).cast("long")
    tid = F.col("event_id") % 997
    cid = F.col("event_id") % 4
    whex = lambda v: F.lpad(F.lower(F.hex(v)), 64, "0")  # noqa: E731
    # a synthetic "address" is 8 zero nibbles + a 32-char md5 (40 hex
    # chars total); its topic word is the 64-char left-zero-padded form
    w40 = lambda tag: F.concat(  # indexed-address topic word
        F.lit("0x" + "0" * 32), F.md5(F.concat(F.lit(tag), eid))
    )
    c40 = F.when(cid == 0, F.lit("0" * 40)).otherwise(
        F.concat(F.lit("0" * 8), F.md5(F.concat(F.lit("c"), cid.cast("string"))))
    )
    junk = lambda tag: F.lpad(F.md5(F.concat(F.lit(tag), eid)), 64, "0")  # noqa: E731
    kind = F.col("event_id") % 3
    base = e.select("event_id", "value", kind.alias("kind"))

    trade = base.filter(F.col("kind") < 2).select(
        "event_id",
        F.when(
            F.col("kind") == 0,
            F.concat(F.lit("0x"), F.substring(F.md5(F.lit("ex-opensea")), 1, 40)),
        )
        .otherwise(
            F.concat(F.lit("0x"), F.substring(F.md5(F.lit("ex-looksrare")), 1, 40))
        )
        .alias("address"),
        F.when(
            F.col("kind") == 0,
            F.array(F.lit(OB.ORDERS_MATCHED_TOPIC), w40("m"), w40("t")),
        )
        .otherwise(F.array(F.lit(OB.TAKER_BID_TOPIC), w40("t"), w40("m")))
        .alias("topics"),
        # opensea data: [buy_hash, sell_hash, price, currency, fee]
        # looksrare data: [order_hash, nonce, currency, price, fee]
        F.when(
            F.col("kind") == 0,
            F.concat(F.lit("0x"), junk("b"), junk("s"), whex(vi), F.concat(F.lit("0" * 24), c40), whex(fee)),
        )
        .otherwise(
            F.concat(F.lit("0x"), junk("b"), junk("s"), F.concat(F.lit("0" * 24), c40), whex(vi), whex(fee)),
        )
        .alias("data"),
    )
    nft_leg = base.filter(F.col("kind") < 2).select(
        "event_id",
        F.concat(
            F.lit("0x"),
            F.substring(F.md5(F.concat(F.lit("n"), (F.col("event_id") % 50).cast("string"))), 1, 40),
        ).alias("address"),
        F.array(F.lit(EXT.TRANSFER_EVENT_TOPIC), w40("m"), w40("t"), whex(tid)).alias(
            "topics"
        ),
        F.lit("0x").alias("data"),
    )
    noise = base.filter(F.col("kind") == 2).select(
        "event_id",
        F.concat(F.lit("0x"), F.substring(F.md5(F.concat(F.lit("a"), eid)), 1, 40)).alias(
            "address"
        ),
        F.array(F.concat(F.lit("0x"), F.md5(F.concat(F.lit("o"), eid)))).alias("topics"),
        F.concat(F.lit("0x"), whex(vi)).alias("data"),
    )
    return trade.unionByName(nft_leg).unionByName(noise)


def nft_orderbook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ EthNftOrderbookAdapter end-to-end
    (eth_nft_orderbook_adapter.py:36-200): platform-registry trade
    extraction from logs, joined to the ERC721 transfers and
    transactions of the same tx, priced through broadcast decimals
    (≙ TokenService) and (currency, day) price (≙ PriceService) dims.
    The cid=3 currency is deliberately absent from the price dim —
    those trades carry NULL usd legs, the reference's service-miss
    path (_get_token_price → None)."""
    from blockchain_etl_spark.operators import orderbook as OB

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    logs = _synth_nop_logs(spark, sf_dir)
    orders = OB.extract_orderbooks(logs)
    transfers = EXT.extract_erc721_transfers(logs)
    txs = e.select(
        "event_id",
        F.floor(F.col("event_id") / 10).cast("long").alias("blknum"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    cur_of = lambda cid: F.when(  # noqa: E731
        cid == 0, F.lit(EXT.ZERO_ADDR)
    ).otherwise(
        F.concat(
            F.lit("0x" + "0" * 8), F.md5(F.concat(F.lit("c"), cid.cast("string")))
        )
    )
    dec_dim = spark.range(4).select(
        cur_of(F.col("id")).alias("currency"),
        (6 + (F.col("id") % 2) * 2).cast("int").alias("decimals"),
    )
    days = e.select(F.date_format("ts", "yyyy-MM-dd").alias("day")).distinct()
    price_dim = days.crossJoin(
        spark.range(3).select(F.col("id").alias("cid"))
    ).select(
        cur_of(F.col("cid")).alias("currency"),
        "day",
        (
            (F.col("cid") + 1) * 1.5
            + F.substring("day", 9, 2).cast("int") * 0.01
        ).alias("price"),
    )
    return OB.nft_orderbooks(orders, transfers, txs, dec_dim, price_dim)


_NFT_ORDERBOOK_SQL = f"""
WITH ev AS (
  SELECT event_id AS eid, floor(value * 100)::BIGINT AS vi,
         strftime(ts, '%Y-%m-%d') AS day
  FROM events
),
base AS (
  SELECT eid, vi, day, eid % 3 AS kind, (eid % 4)::INT AS cid,
         vi // 40 AS fee, eid % 997 AS tid,
         repeat('0', 8) || md5('m' || eid::VARCHAR) AS m40,
         repeat('0', 8) || md5('t' || eid::VARCHAR) AS t40,
         CASE WHEN eid % 4 = 0 THEN repeat('0', 40)
              ELSE repeat('0', 8) || md5('c' || (eid % 4)::VARCHAR) END AS c40
  FROM ev
),
trades AS (
  SELECT eid AS event_id,
         CASE WHEN kind = 0 THEN 'opensea' ELSE 'looksrare' END AS platform,
         CASE WHEN kind = 0 THEN '0x' || substr(md5('ex-opensea'), 1, 40)
              ELSE '0x' || substr(md5('ex-looksrare'), 1, 40)
         END AS exchange_address,
         '0x' || m40 AS maker, '0x' || t40 AS taker,
         '0x' || substr(md5('n' || (eid % 50)::VARCHAR), 1, 40) AS token_address,
         tid AS token_id, '0x' || m40 AS from_address, '0x' || t40 AS to_address,
         '0x' || c40 AS currency, vi AS value, fee AS fee_value,
         eid // 10 AS blknum, day, cid
  FROM base WHERE kind IN (0, 1)
),
decimals AS (
  SELECT i AS cid, (6 + (i % 2) * 2)::INT AS decimals FROM range(4) t(i)
),
prices AS (
  SELECT d.day, i AS cid,
         (i + 1) * 1.5 + substr(d.day, 9, 2)::INT * 0.01 AS price
  FROM (SELECT DISTINCT day FROM ev) d CROSS JOIN range(3) t(i)
)
SELECT t.event_id, t.platform, t.exchange_address, t.maker, t.taker,
       t.token_address, t.token_id, t.from_address, t.to_address,
       t.currency, t.value, t.fee_value, t.blknum, t.day,
       t.value / power(10, dd.decimals) * p.price AS value_usd,
       t.fee_value / power(10, dd.decimals) * p.price AS fee_value_usd
FROM trades t
LEFT JOIN decimals dd ON dd.cid = t.cid
LEFT JOIN prices p ON p.cid = t.cid AND p.day = t.day
"""


def nft_orderbook_priced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ the reference's MAINTAINED historical price lookup
    (blockchainetl/service/price_service.py:36-66
    ``get_historical_prices`` — a (token, day)→usd service the adapters
    price trades through, eth_nft_orderbook_adapter.py:159-188
    ``_calculate``): here the price dimension is a real policy table
    FED BY A PRICE CHANGE-LOG (last-wins by lsn: epoch 2 RE-prices
    every even price-day, so maintenance matters), and trades consume
    it through an incrementally-maintained AS-OF join MV — each trade
    takes the latest price row of its currency at-or-before the trade
    day, the exact lookup shape the reference's service interval
    semantics imply (a day with no quote uses the most recent prior
    quote). Currency 3 has NO price history — its trades carry NULL
    usd legs (the service-miss path, ``_get_token_price`` → None).

    Composition: priced trades = AsofJoinMV(trades ⋈asof prices) ⋈
    broadcast(decimals). Scale: the price table is bucketed BY
    CURRENCY (hist-side pruning), the MV hop is O(Δtrades + Δprices +
    touched buckets), and a re-price retroactively rewrites exactly
    the trades in its win window — never a rescan."""
    import os

    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.operators import orderbook as OB
    from blockchain_etl_spark.streaming.join_mv import AsofJoinMV
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    logs = _synth_nop_logs(spark, sf_dir)
    orders = OB.extract_orderbooks(logs)
    day_i = F.datediff(F.to_date("ts"), F.to_date(F.lit("2020-01-01")))
    days = e.select(
        "event_id", day_i.cast("long").alias("day_i")
    )
    trades = orders.join(days, "event_id").select(
        F.col("event_id").cast("string").alias("doc_id"),
        (F.col("event_id") % 4).cast("string").alias("cid"),
        "day_i",
        F.col("value").alias("val"),
        F.col("fee_value").alias("fee"),
        "platform",
    )
    work = _pid_scoped_gate_dir("nft-priced-gate")
    trade_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("cid", T.StringType()),
        T.StructField("day_i", T.LongType()),
        T.StructField("val", T.LongType()),
        T.StructField("fee", T.LongType()),
        T.StructField("platform", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    tfact = SnapshotTable.create(
        spark, os.path.join(work, "trades"), trade_schema, key="doc_id",
        n_buckets=16,
    )
    teng = CdcEngine(spark, tfact, mode="cow", collect_metrics=False)
    price_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),  # cid@pday
        T.StructField("pcid", T.StringType()),
        T.StructField("pday", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    prices = SnapshotTable.create(
        spark, os.path.join(work, "prices"), price_schema, key="doc_id",
        n_buckets=4, bucket_key="pcid",
    )
    peng = CdcEngine(spark, prices, mode="cow", collect_metrics=False)

    def _trade_ev(df, lsn):
        return df.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            "doc_id", "cid", "day_i", "val", "fee", "platform",
        )

    def _price_ev(df, lsn):
        return df.select(
            F.lit(lsn).cast("long").alias("stream_pos"),
            F.lit(lsn).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.concat("pcid", F.lit("@"), F.col("pday").cast("string")).alias(
                "doc_id"
            ),
            "pcid", "pday", "price",
        )

    # price grid: every currency 0-2 quotes at the multiples of 3
    # covering the trade-day range (each trade day D resolves as-of
    # to D - D % 3, so coverage is total for quoted currencies)
    grid = (
        trades.select((F.col("day_i") - F.col("day_i") % 3).alias("pday"))
        .distinct()
        .crossJoin(spark.range(3).select(F.col("id").cast("string").alias("pcid")))
    )
    quote_v1 = (
        (F.col("pcid").cast("int") + 1) * 1.5 + F.col("pday") * 0.01
    ).alias("price")
    jm = AsofJoinMV(
        spark, tfact, prices, os.path.join(work, "asof"), join_col="cid",
        ts_col="day_i", hist_key_col="pcid", hist_ts_col="pday",
        fact_cols=["val", "fee", "platform"], dim_cols=["price"],
        n_buckets=8,
    )
    mid = trades.agg(F.max(F.col("doc_id").cast("long"))).collect()[0][0] // 2
    peng.apply_epoch(_price_ev(grid.select("pcid", "pday", quote_v1), 1),
                     epoch_id=1)
    teng.apply_epoch(
        _trade_ev(trades.filter(F.col("doc_id").cast("long") <= mid), 1),
        epoch_id=1,
    )
    jm.run_once()
    # round 2: every EVEN price day is RE-PRICED (+0.25) — the same
    # (cid, pday) keys, last-wins by lsn — retroactively rewriting the
    # already-joined trades in each quote's win window, while the
    # second half of the trades lands
    reprice = grid.filter(F.col("pday") % 2 == 0).select(
        "pcid", "pday", (quote_v1 + 0.25).alias("price")
    )
    peng.apply_epoch(_price_ev(reprice, 2), epoch_id=2)
    teng.apply_epoch(
        _trade_ev(trades.filter(F.col("doc_id").cast("long") > mid), 2),
        epoch_id=2,
    )
    jm.run_once()
    dec_dim = spark.range(4).select(
        F.col("id").cast("string").alias("cid"),
        (6 + (F.col("id") % 2) * 2).cast("int").alias("decimals"),
    )
    pt = jm.state().join(F.broadcast(dec_dim), "cid", "left")
    usd = lambda c: (  # noqa: E731
        F.col(c) / F.pow(F.lit(10.0), F.col("decimals")) * F.col("price")
    )
    return pt.select(
        F.col("fact_id").cast("long").alias("event_id"),
        "platform", "cid", "day_i", "val", "fee",
        # double on BOTH sides: pday is null for the unpriced currency,
        # and nullable-int→pandas lands float64 asymmetrically
        F.col("pday").cast("double").alias("pday"),
        "price",
        usd("val").alias("value_usd"),
        usd("fee").alias("fee_value_usd"),
    )


_NFT_ORDERBOOK_PRICED_SQL = """
WITH ev AS (
  SELECT event_id AS eid, floor(value * 100)::BIGINT AS vi,
         date_diff('day', DATE '2020-01-01', ts::DATE)::BIGINT AS day_i
  FROM events
),
trades AS (
  SELECT eid AS event_id,
         CASE WHEN eid % 3 = 0 THEN 'opensea' ELSE 'looksrare' END AS platform,
         (eid % 4)::VARCHAR AS cid, day_i,
         vi AS val, (vi // 40)::BIGINT AS fee
  FROM ev WHERE eid % 3 IN (0, 1)
),
grid AS (
  SELECT DISTINCT (day_i - day_i % 3) AS pday, i::VARCHAR AS pcid
  FROM trades CROSS JOIN range(3) t(i)
),
prices AS (
  -- DOUBLE literals throughout: DuckDB decimal literals would give
  -- EXACT decimal math here while Spark accumulates IEEE doubles,
  -- and the 1-ulp difference flips round-to-6dp ties in the usd legs
  SELECT pcid, pday,
         (pcid::INT + 1) * 1.5::DOUBLE + pday * 0.01::DOUBLE
         + (CASE WHEN pday % 2 = 0 THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END)
         AS price
  FROM grid
),
resolved AS (
  SELECT t.event_id, t.platform, t.cid, t.day_i, t.val, t.fee,
         p.pday, p.price,
         row_number() OVER (
           PARTITION BY t.event_id ORDER BY p.pday DESC
         ) AS rn
  FROM trades t
  LEFT JOIN prices p ON p.pcid = t.cid AND p.pday <= t.day_i
)
SELECT event_id, platform, cid, day_i, val, fee, pday::DOUBLE AS pday,
       price,
       val / power(10, 6 + (cid::INT % 2) * 2) * price AS value_usd,
       fee / power(10, 6 + (cid::INT % 2) * 2) * price AS fee_value_usd
FROM resolved WHERE rn = 1
"""


def _synth_origin_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → deterministic Origin marketplace logs: event_id % 3 ∈
    {0, 1} emits a ListingCreated/ListingUpdated log whose bytes32 data
    word is the IPFS content pointer (md5-derived, so the oracle can
    re-derive the fake body's fields in SQL); % 3 == 2 rows are
    unrelated-topic noise the extractor must skip. Block numbers span
    the V1 contract epoch (placed mid-range), so BOTH contract
    versions occur."""
    from blockchain_etl_spark.operators import origin as OG

    e = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    eid = F.col("event_id")
    eids = eid.cast("string")
    w = F.concat(
        F.md5(F.concat(F.lit("i1"), eids)), F.md5(F.concat(F.lit("i2"), eids))
    )
    lid_word = F.lpad(F.lower(F.hex(eid % 313)), 64, "0")
    seller = F.concat(F.lit("0x" + "0" * 32), F.md5(F.concat(F.lit("s"), eids)))
    topic0 = F.when(
        eid % 2 == 0, F.lit(OG.LISTING_CREATED_TOPIC)
    ).otherwise(F.lit(OG.LISTING_UPDATED_TOPIC))
    listing = e.filter(eid % 3 < 2).select(
        "event_id",
        F.floor(eid / 10).cast("long").alias("blknum"),
        F.lit(OG.MARKETPLACE_V0_ADDRESS).alias("address"),
        F.array(topic0, seller, F.concat(F.lit("0x"), lid_word)).alias("topics"),
        F.concat(F.lit("0x"), w).alias("data"),
    )
    noise = e.filter(eid % 3 == 2).select(
        "event_id",
        F.floor(eid / 10).cast("long").alias("blknum"),
        F.concat(F.lit("0x"), F.substring(F.md5(F.concat(F.lit("a"), eids)), 1, 40)).alias("address"),
        F.array(F.concat(F.lit("0x"), F.md5(F.concat(F.lit("o"), eids)))).alias("topics"),
        F.concat(F.lit("0x"), w).alias("data"),
    )
    return listing.unionByName(noise)


def _origin_epoch(spark: SparkSession, sf_dir: str) -> int:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return int(e.agg(F.max("event_id")).collect()[0][0]) // 10 // 2


def origin_listings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ ExportOriginJob's marketplace-listing leg
    (export_origin_job.py:1-139 + ipfs/origin.py:125-151 +
    origin_extractor.py:44-76): log-filtered ListingCreated/Updated
    events → bytes32→base58 CID decode (Arrow-batched, matched rows
    only) → one content fetch per DISTINCT pointer (deterministic fake
    client here — no IPFS gateway in this image; the stdlib-urllib
    gateway fetcher is double-tested in tests/) → JVM-side JSON parse
    into listing rows. Fetch misses (last byte ≡ 7 mod 11) drop the
    listing — the reference's logged-and-skipped path. Contract
    version derives from the block epoch, mid-range here so both
    versions occur."""
    from blockchain_etl_spark.operators import origin as OG

    logs = _synth_origin_logs(spark, sf_dir)
    events = OG.extract_origin_listing_events(
        logs, v1_epoch_block=_origin_epoch(spark, sf_dir)
    )
    lst = OG.origin_marketplace_listings(events)
    return lst.select(
        "block_number",
        F.col("log_index").cast("long").alias("log_index"),
        "listing_id", "listing_type", "category", "subcategory",
        "language", "title", "description", "price", "currency",
        F.col("shop_ipfs_hash").isNotNull().alias("has_shop"),
    )


_ORIGIN_COMMON_CTE = """
src AS (
  SELECT event_id AS eid, (event_id // 10)::BIGINT AS blknum,
         md5('i1' || event_id::VARCHAR) || md5('i2' || event_id::VARCHAR) AS w
  FROM events WHERE event_id % 3 IN (0, 1)
),
ep AS (SELECT (max(event_id) // 10 // 2)::BIGINT AS v1 FROM events),
fetched AS (
  SELECT *,
         '1-' || (CASE WHEN blknum < (SELECT v1 FROM ep)
                       THEN '000' ELSE '001' END)
              || '-' || (eid % 313)::VARCHAR AS listing_id
  FROM src
  WHERE ('0x' || substr(w, 63, 2))::INT % 11 <> 7
)
"""

_ORIGIN_LISTINGS_SQL = f"""
WITH {_ORIGIN_COMMON_CTE}
SELECT blknum AS block_number, eid AS log_index, listing_id,
       CASE WHEN ('0x' || substr(w, 1, 1))::INT % 2 = 0
            THEN 'unit' ELSE 'fractional' END AS listing_type,
       'cat-' || substr(w, 1, 1) AS category,
       'sub-' || substr(w, 2, 1) AS subcategory,
       CASE WHEN ('0x' || substr(w, 3, 1))::INT % 3 <> 0
            THEN 'en' ELSE 'zh' END AS language,
       'Listing ' || substr(w, 1, 8) AS title,
       substr(w, 1, 16) AS description,
       (('0x' || substr(w, 3, 4))::BIGINT)::VARCHAR AS price,
       CASE (('0x' || substr(w, 7, 2))::INT % 3)
            WHEN 0 THEN 'ETH' WHEN 1 THEN 'DAI'
            ELSE 'fiat-USD' END AS currency,
       ('0x' || substr(w, 9, 2))::INT % 5 = 0 AS has_shop
FROM fetched
"""


def origin_shop_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ the shop-product leg (ipfs/origin.py:26-122): listings whose
    content carries a ``shopIpfsHash`` get ONE products fetch per
    distinct shop pointer, exploded JVM-side into product rows plus
    variant rows (parent_external_id set) — the reference's
    per-product data.json walk composed behind the one-pointer fetch
    interface."""
    from blockchain_etl_spark.operators import origin as OG

    logs = _synth_origin_logs(spark, sf_dir)
    events = OG.extract_origin_listing_events(
        logs, v1_epoch_block=_origin_epoch(spark, sf_dir)
    )
    lst = OG.origin_marketplace_listings(events)
    return OG.origin_shop_products(lst).select(
        "block_number",
        F.col("log_index").cast("long").alias("log_index"),
        "listing_id", "product_id", "ipfs_path", "external_id",
        "parent_external_id", "title", "price", "currency", "option1",
    )


_ORIGIN_SHOP_SQL = f"""
WITH {_ORIGIN_COMMON_CTE},
shops AS (
  SELECT * FROM fetched WHERE ('0x' || substr(w, 9, 2))::INT % 5 = 0
)
SELECT blknum AS block_number, eid AS log_index, listing_id,
       listing_id || '-p0' AS product_id,
       'shop-' || w || '/p0' AS ipfs_path,
       (('0x' || substr(w, 1, 4))::BIGINT)::VARCHAR AS external_id,
       NULL::VARCHAR AS parent_external_id,
       'Product p0-' || substr(w, 1, 6) AS title,
       (('0x' || substr(w, 5, 4))::BIGINT)::VARCHAR AS price,
       'fiat-USD' AS currency, NULL::VARCHAR AS option1
FROM shops
UNION ALL
SELECT blknum, eid, listing_id,
       listing_id || '-p1',
       'shop-' || w || '/p1',
       NULL::VARCHAR, NULL::VARCHAR,
       'Product p1-' || substr(w, 1, 6),
       (('0x' || substr(w, 9, 4))::BIGINT)::VARCHAR,
       'fiat-USD', NULL::VARCHAR
FROM shops
UNION ALL
SELECT blknum, eid, listing_id,
       listing_id || '-v1',
       'shop-' || w || '/p1',
       (('0x' || substr(w, 13, 4))::BIGINT)::VARCHAR,
       NULL::VARCHAR,
       'Variant v1-' || substr(w, 1, 6),
       (('0x' || substr(w, 17, 4))::BIGINT)::VARCHAR,
       'fiat-USD', 'o-' || substr(w, 21, 1)
FROM shops
"""


def balance_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ the composed balance pipeline (eth_balance_adapter.py:339-524 +
    eth_block_reward_service.py): send/recv trace legs (one agg each,
    min_by/max_by first-last), fee aggregation, era-schedule block +
    uncle rewards, full-outer merged per address with zero-fill and the
    net value column — the pieces running_balance /
    full_outer_sendrecv / holder_detail_agg prove separately, composed
    into ONE lazy plan the way the reference's adapter composes them
    per block batch."""
    from blockchain_etl_spark.operators import balances as BAL

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    uid = F.col("user_id")
    vi = F.floor(F.col("value") * 100).cast("long")
    addr_u = lambda expr: F.concat(  # noqa: E731
        F.lit("0x"), F.md5(F.concat(F.lit("u"), expr.cast("string")))
    )
    traces = e.select(
        F.md5(F.concat(F.lit("x"), eid.cast("string"))).alias("txhash"),
        F.floor(eid / 10).cast("long").alias("blknum"),
        (eid % 10).alias("txpos"),
        addr_u(uid % 40).alias("from_address"),
        addr_u((uid + eid) % 40).alias("to_address"),
        vi.alias("value"),
        F.col("ts").alias("_st"),
    )
    fees = e.select(
        addr_u(uid % 40).alias("from_address"),
        F.floor(vi / 20).cast("long").alias("fee_value"),
    )
    blk = F.col("blknum")
    mnr = lambda expr: F.concat(  # noqa: E731
        F.lit("0x"), F.md5(F.concat(F.lit("mnr"), expr.cast("string")))
    )
    blocks = (
        e.select(F.floor(eid / 10).cast("long").alias("blknum"))
        .distinct()
        .select(
            "blknum",
            mnr(blk % 10).alias("miner"),
            F.when(blk % 7 == 3, F.lit(1)).otherwise(F.lit(0)).alias("n_uncles"),
            (blk % 3 + 1).alias("uncle_delta"),
            mnr((blk + 1) % 10).alias("uncle_miner"),
        )
    )
    return BAL.export_balances(traces, fees, blocks)


_BALANCE_PIPELINE_SQL = """
WITH ev AS (
  SELECT event_id AS eid, user_id AS uid, floor(value * 100)::BIGINT AS vi, ts
  FROM events
),
traces AS (
  SELECT md5('x' || eid::VARCHAR) AS txhash,
         eid // 10 AS blknum, eid % 10 AS txpos,
         '0x' || md5('u' || (uid % 40)::VARCHAR) AS from_address,
         '0x' || md5('u' || ((uid + eid) % 40)::VARCHAR) AS to_address,
         vi AS value, ts AS _st, eid
  FROM ev
),
outg AS (
  SELECT from_address AS address, sum(value)::BIGINT AS out_value,
         count(DISTINCT txhash) AS out_txs, count(DISTINCT blknum) AS out_blocks,
         count(*) AS out_xfers,
         arg_min(blknum, eid) AS out_1th_blknum,
         strftime(arg_min(_st, eid), '%Y-%m-%d') AS out_1th_st,
         arg_max(blknum, eid) AS out_nth_blknum,
         strftime(arg_max(_st, eid), '%Y-%m-%d') AS out_nth_st
  FROM traces GROUP BY 1
),
ving AS (
  SELECT to_address AS address, sum(value)::BIGINT AS vin_value,
         count(DISTINCT txhash) AS vin_txs, count(DISTINCT blknum) AS vin_blocks,
         count(*) AS vin_xfers,
         arg_min(blknum, eid) AS vin_1th_blknum,
         strftime(arg_min(_st, eid), '%Y-%m-%d') AS vin_1th_st,
         arg_max(blknum, eid) AS vin_nth_blknum,
         strftime(arg_max(_st, eid), '%Y-%m-%d') AS vin_nth_st
  FROM traces GROUP BY 1
),
fees AS (
  SELECT '0x' || md5('u' || (uid % 40)::VARCHAR) AS address,
         sum(vi // 20)::BIGINT AS fee_value
  FROM ev GROUP BY 1
),
blk AS (
  SELECT blknum,
         '0x' || md5('mnr' || (blknum % 10)::VARCHAR) AS miner,
         CASE WHEN blknum % 7 = 3 THEN 1 ELSE 0 END AS n_uncles,
         blknum % 3 + 1 AS uncle_delta,
         '0x' || md5('mnr' || ((blknum + 1) % 10)::VARCHAR) AS uncle_miner,
         CASE WHEN blknum < 100 THEN 6400
              WHEN blknum < 250 THEN 3200 ELSE 1600 END AS static
  FROM (SELECT DISTINCT eid // 10 AS blknum FROM ev)
),
cnb_rows AS (
  SELECT miner AS address, blknum,
         static + (static // 32) * n_uncles AS reward
  FROM blk
  UNION ALL
  SELECT uncle_miner, blknum, ((8 - uncle_delta) * static) // 8
  FROM blk WHERE n_uncles > 0
),
cnb AS (
  SELECT address, sum(reward)::BIGINT AS cnb_value,
         count(DISTINCT blknum) AS cnb_blocks
  FROM cnb_rows GROUP BY 1
)
SELECT coalesce(o.address, v.address, f.address, c.address) AS address,
       coalesce(out_value, 0)::BIGINT AS out_value,
       coalesce(out_txs, 0)::BIGINT AS out_txs,
       coalesce(out_blocks, 0)::BIGINT AS out_blocks,
       coalesce(out_xfers, 0)::BIGINT AS out_xfers,
       out_1th_blknum, out_1th_st, out_nth_blknum, out_nth_st,
       coalesce(vin_value, 0)::BIGINT AS vin_value,
       coalesce(vin_txs, 0)::BIGINT AS vin_txs,
       coalesce(vin_blocks, 0)::BIGINT AS vin_blocks,
       coalesce(vin_xfers, 0)::BIGINT AS vin_xfers,
       vin_1th_blknum, vin_1th_st, vin_nth_blknum, vin_nth_st,
       coalesce(fee_value, 0)::BIGINT AS fee_value,
       coalesce(cnb_value, 0)::BIGINT AS cnb_value,
       coalesce(cnb_blocks, 0)::BIGINT AS cnb_blocks,
       (coalesce(vin_value, 0) + coalesce(cnb_value, 0)
        - coalesce(out_value, 0) - coalesce(fee_value, 0))::BIGINT AS value
FROM outg o
FULL JOIN ving v ON v.address = o.address
FULL JOIN fees f ON f.address = coalesce(o.address, v.address)
FULL JOIN cnb c ON c.address = coalesce(o.address, v.address, f.address)
"""


def address_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ ProfileService.get_profile
    (blockchainetl/service/profile_service.py:15-53): per address, an
    ``erc20`` row aggregating its token_latest_balances rows and an
    ``ether`` row aggregating its latest_balances rows — count(*) plus
    vin/out tx, transfer and value sums, NULLs coerced to 0 (the
    service's Decimal/None loop). The reference answers one address at
    a time against Postgres behind a 60 s TTL cache; here the inputs
    are the SAME maintained tables the engine already proves
    (``balance_pipeline`` = latest_balances; token_balances = the
    per-(address, token) fold), and the profile is the full table —
    two map-side-combinable aggregations and a union, a point read is
    a key lookup. Miner-only addresses appear with zero vin/out legs,
    exactly as they do in the reference's latest_balances."""
    from blockchain_etl_spark.operators import balances as BAL

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    uid = F.col("user_id")
    vi = F.floor(F.col("value") * 100).cast("long")
    addr_u = lambda expr: F.concat(  # noqa: E731
        F.lit("0x"), F.md5(F.concat(F.lit("u"), expr.cast("string")))
    )
    traces = e.select(
        F.md5(F.concat(F.lit("x"), eid.cast("string"))).alias("txhash"),
        F.floor(eid / 10).cast("long").alias("blknum"),
        (eid % 10).alias("txpos"),
        addr_u(uid % 40).alias("from_address"),
        addr_u((uid + eid) % 40).alias("to_address"),
        vi.alias("value"),
        F.col("ts").alias("_st"),
    )
    fees = e.select(
        addr_u(uid % 40).alias("from_address"),
        F.floor(vi / 20).cast("long").alias("fee_value"),
    )
    blk = F.col("blknum")
    mnr = lambda expr: F.concat(  # noqa: E731
        F.lit("0x"), F.md5(F.concat(F.lit("mnr"), expr.cast("string")))
    )
    blocks = (
        e.select(F.floor(eid / 10).cast("long").alias("blknum"))
        .distinct()
        .select(
            "blknum",
            mnr(blk % 10).alias("miner"),
            F.when(blk % 7 == 3, F.lit(1)).otherwise(F.lit(0)).alias("n_uncles"),
            (blk % 3 + 1).alias("uncle_delta"),
            mnr((blk + 1) % 10).alias("uncle_miner"),
        )
    )
    latest = BAL.export_balances(traces, fees, blocks)
    transfers = e.select(
        F.concat(
            F.lit("0x"), F.md5(F.concat(F.lit("t"), (eid % 7).cast("string")))
        ).alias("token_address"),
        addr_u(uid % 40).alias("from_address"),
        addr_u((uid * 3 + eid) % 40).alias("to_address"),
        vi.alias("value"),
        F.md5(F.concat(F.lit("xt"), eid.cast("string"))).alias("txhash"),
    )
    tok_latest = BAL.token_balances(transfers)
    return BAL.address_profiles(latest, tok_latest).orderBy("typo", "address")


_ADDRESS_PROFILE_SQL = """
WITH ev AS (
  SELECT event_id AS eid, user_id AS uid, floor(value * 100)::BIGINT AS vi
  FROM events
),
traces AS (
  SELECT md5('x' || eid::VARCHAR) AS txhash,
         eid // 10 AS blknum,
         '0x' || md5('u' || (uid % 40)::VARCHAR) AS from_address,
         '0x' || md5('u' || ((uid + eid) % 40)::VARCHAR) AS to_address,
         vi AS value
  FROM ev
),
outg AS (
  SELECT from_address AS address, sum(value)::BIGINT AS out_value,
         count(DISTINCT txhash) AS out_txs, count(*) AS out_xfers
  FROM traces GROUP BY 1
),
ving AS (
  SELECT to_address AS address, sum(value)::BIGINT AS vin_value,
         count(DISTINCT txhash) AS vin_txs, count(*) AS vin_xfers
  FROM traces GROUP BY 1
),
cnb AS (
  SELECT DISTINCT '0x' || md5('mnr' || ((eid // 10) % 10)::VARCHAR) AS address
  FROM ev
  UNION
  SELECT DISTINCT '0x' || md5('mnr' || (((eid // 10) + 1) % 10)::VARCHAR)
  FROM ev WHERE (eid // 10) % 7 = 3
),
lb AS (
  SELECT coalesce(o.address, v.address, c.address) AS address,
         coalesce(vin_txs, 0) AS vin_txs, coalesce(out_txs, 0) AS out_txs,
         coalesce(vin_xfers, 0) AS vin_xfers,
         coalesce(out_xfers, 0) AS out_xfers,
         coalesce(vin_value, 0) AS vin_value,
         coalesce(out_value, 0) AS out_value
  FROM outg o
  FULL JOIN ving v ON v.address = o.address
  FULL JOIN cnb c ON c.address = coalesce(o.address, v.address)
),
xfr AS (
  SELECT '0x' || md5('t' || (eid % 7)::VARCHAR) AS token_address,
         '0x' || md5('u' || (uid % 40)::VARCHAR) AS from_address,
         '0x' || md5('u' || ((uid * 3 + eid) % 40)::VARCHAR) AS to_address,
         vi AS value, md5('xt' || eid::VARCHAR) AS txhash
  FROM ev
),
tout AS (
  SELECT from_address AS address, token_address,
         sum(value)::BIGINT AS out_value,
         count(DISTINCT txhash) AS out_txs, count(*) AS out_xfers
  FROM xfr GROUP BY 1, 2
),
tvin AS (
  SELECT to_address AS address, token_address,
         sum(value)::BIGINT AS vin_value,
         count(DISTINCT txhash) AS vin_txs, count(*) AS vin_xfers
  FROM xfr GROUP BY 1, 2
),
toklb AS (
  SELECT coalesce(o.address, v.address) AS address,
         coalesce(vin_txs, 0) AS vin_txs, coalesce(out_txs, 0) AS out_txs,
         coalesce(vin_xfers, 0) AS vin_xfers,
         coalesce(out_xfers, 0) AS out_xfers,
         coalesce(vin_value, 0) AS vin_value,
         coalesce(out_value, 0) AS out_value
  FROM tout o
  FULL JOIN tvin v ON v.address = o.address
    AND v.token_address = o.token_address
),
prof AS (
  SELECT 'erc20' AS typo, address, count(*)::BIGINT AS n_rows,
         sum(vin_txs)::BIGINT AS vin_txs, sum(out_txs)::BIGINT AS out_txs,
         sum(vin_xfers)::BIGINT AS vin_xfers,
         sum(out_xfers)::BIGINT AS out_xfers,
         sum(vin_value)::BIGINT AS vin_value,
         sum(out_value)::BIGINT AS out_value
  FROM toklb GROUP BY address
  UNION ALL
  SELECT 'ether', address, count(*)::BIGINT,
         sum(vin_txs)::BIGINT, sum(out_txs)::BIGINT,
         sum(vin_xfers)::BIGINT, sum(out_xfers)::BIGINT,
         sum(vin_value)::BIGINT, sum(out_value)::BIGINT
  FROM lb GROUP BY address
)
SELECT * FROM prof ORDER BY typo, address
"""


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real subword tokenization (VERDICT r4 #7): greedy BPE encode over
    the fixed public merge table (functions/bpe.py) — distinct words
    encoded once through an Arrow UDF, joined back, reassembled in word
    order into the input_hint shape. The DuckDB twin replays the SAME
    greedy algorithm as a recursive CTE over the same merge ranks, so
    the parity check proves the encoder itself, not just plumbing."""
    from blockchain_etl_spark.functions import bpe as BPE

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.format_string("doc-%06d", F.col("doc_id")).alias("doc_id"),
        "source",
        "text",
    )
    enc = BPE.bpe_encode_docs(d, carry=["source"])
    return enc.select(
        "doc_id",
        F.concat_ws(",", F.col("tokens").cast("array<string>")).alias("tokens_csv"),
        "n_tok",
        "source",
    )


def _bpe_sql() -> str:
    from blockchain_etl_spark.functions.bpe import MERGES

    pairs = "[" + ", ".join(f"'{a}|{b}'" for a, b in MERGES) + "]"
    results = "[" + ", ".join(f"'{a}{b}'" for a, b in MERGES) + "]"
    return f"""
WITH RECURSIVE
d AS (
  SELECT 'doc-' || lpad(doc_id::VARCHAR, 6, '0') AS doc_id, source,
         regexp_extract_all(text, '[a-z]+') AS wl
  FROM documents
),
dw AS (
  SELECT doc_id, source, unnest(wl) AS word, generate_subscripts(wl, 1) AS pos
  FROM d
),
words AS (SELECT DISTINCT word FROM dw),
init AS (SELECT word, string_split(word, '') AS syms FROM words),
enc AS (
  SELECT word, syms, 0 AS it FROM init
  UNION ALL
  SELECT word,
         list_slice(syms, 1, pos - 1)
           || [syms[pos] || syms[pos + 1]]
           || list_slice(syms, pos + 2, len(syms)),
         it + 1
  FROM (
    SELECT word, syms, it,
           CASE WHEN list_aggregate(rnks, 'min') IS NULL THEN NULL
                ELSE list_position(rnks, list_aggregate(rnks, 'min')) END AS pos
    FROM (
      SELECT word, syms, it,
             list_transform(range(1, len(syms)),
               i -> nullif(list_position({pairs},
                                         syms[i] || '|' || syms[i + 1]), 0)) AS rnks
      FROM enc
    )
  )
  WHERE pos IS NOT NULL AND it < length(word)
),
final AS (SELECT word, arg_max(syms, it) AS syms FROM enc GROUP BY word),
wtok AS (
  SELECT word,
         list_transform(syms, s ->
           CASE WHEN length(s) = 1 THEN strpos('abcdefghijklmnopqrstuvwxyz', s) - 1
                ELSE 25 + list_position({results}, s) END) AS ids
  FROM final
)
SELECT doc_id,
       array_to_string(flatten(list(ids ORDER BY pos)), ',') AS tokens_csv,
       len(flatten(list(ids ORDER BY pos)))::INT AS n_tok,
       source
FROM dw JOIN wtok USING (word)
GROUP BY doc_id, source
"""


def holder_policy_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-driven column merge policies (≙ the token_holders upsert
    hooks, postgres_hooks.py:43-96: counters += , first_* keep
    existing, last_* take incoming): a policy table ingests holder
    delta events over two MOR epochs with a compaction in between —
    ``add`` columns accumulate across batches and through the fold,
    ``first``/``last`` keep the earliest/newest non-null, tombstoned
    keys hide until re-inserted. The oracle recomputes the same folds
    as grouped aggregates over the flat event stream."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    vi = F.floor(F.col("value") * 100).cast("long")
    op = F.when(eid % 37 == 5, F.lit("D")).otherwise(F.lit("I"))
    non_d = op != "D"
    ev = e.select(
        eid.cast("long").alias("stream_pos"),
        eid.cast("long").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        op.alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("h-"), (F.col("user_id") % 50).cast("string")).alias("doc_id"),
        F.when(non_d, F.lit(1)).cast("long").alias("n_xfers"),
        F.when(non_d, vi).alias("amount"),
        F.when(non_d, F.floor(eid / 10)).cast("long").alias("first_blknum"),
        F.when(non_d, vi).alias("last_value"),
    )
    mid = e.agg(F.max("event_id")).first()[0] // 2
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_xfers", T.LongType()),
        T.StructField("amount", T.LongType()),
        T.StructField("first_blknum", T.LongType()),
        T.StructField("last_value", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    path = _pid_scoped_gate_dir("holder-policy-gate")
    table = SnapshotTable.create(
        spark, path, schema, key="doc_id", n_buckets=8,
        policies={
            "n_xfers": "add", "amount": "add",
            "first_blknum": "first", "last_value": "last",
        },
    )
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    table.compact()  # fold must survive base+delta recombination
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    return read_state(table).select(
        "doc_id", "n_xfers", "amount", "first_blknum", "last_value"
    )


_HOLDER_POLICY_SQL = """
WITH ev AS (
  SELECT event_id AS eid,
         'h-' || (user_id % 50)::VARCHAR AS doc_id,
         CASE WHEN event_id % 37 = 5 THEN 'D' ELSE 'I' END AS op,
         floor(value * 100)::BIGINT AS vi,
         event_id // 10 AS blk
  FROM events
),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN op <> 'D' THEN 1 END)::BIGINT AS n_xfers,
         sum(CASE WHEN op <> 'D' THEN vi END)::BIGINT AS amount,
         arg_min(blk, eid) FILTER (WHERE op <> 'D') AS first_blknum,
         arg_max(vi, eid) FILTER (WHERE op <> 'D') AS last_value,
         arg_max(op, eid) AS last_op
  FROM ev GROUP BY doc_id
)
SELECT doc_id, n_xfers, amount, first_blknum, last_value
FROM agg WHERE last_op <> 'D'
"""


def minmax_policy_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-extremum column merge policies (``min`` / ``max``; ≙ the
    reference's LEAST/GREATEST upsert hooks — postgres_hooks.py
    token_holders' first/last are order-based, while price floors /
    high-water marks need value-based extrema): a policy table ingests
    holder deltas over two MOR epochs with a compaction in between —
    ``min``/``max`` columns fold to the lifetime extremum over non-null
    values, associatively (base+delta recombination and the in-batch
    pre-fold must produce the same extremum), and tombstones carry them
    across delete→reinsert like ``add`` totals. The oracle recomputes
    grouped min/max over the flat event stream."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    vi = F.floor(F.col("value") * 100).cast("long")
    op = F.when(eid % 37 == 5, F.lit("D")).otherwise(F.lit("I"))
    non_d = op != "D"
    ev = e.select(
        eid.cast("long").alias("stream_pos"),
        eid.cast("long").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        op.alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("h-"), (F.col("user_id") % 50).cast("string")).alias("doc_id"),
        F.when(non_d, F.lit(1)).cast("long").alias("n_xfers"),
        F.when(non_d & (eid % 3 != 0), vi).alias("low_value"),  # nulls skip
        F.when(non_d & (eid % 3 != 0), vi).alias("high_value"),
    )
    mid = e.agg(F.max("event_id")).first()[0] // 2
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_xfers", T.LongType()),
        T.StructField("low_value", T.LongType()),
        T.StructField("high_value", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    path = _pid_scoped_gate_dir("minmax-policy-gate")
    table = SnapshotTable.create(
        spark, path, schema, key="doc_id", n_buckets=8,
        policies={"n_xfers": "add", "low_value": "min", "high_value": "max"},
    )
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    table.compact()  # extremum must survive base+delta recombination
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    return read_state(table).select(
        "doc_id", "n_xfers", "low_value", "high_value"
    )


_MINMAX_POLICY_SQL = """
WITH ev AS (
  SELECT event_id AS eid,
         'h-' || (user_id % 50)::VARCHAR AS doc_id,
         CASE WHEN event_id % 37 = 5 THEN 'D' ELSE 'I' END AS op,
         CASE WHEN event_id % 3 <> 0
              THEN floor(value * 100)::BIGINT END AS vi
  FROM events
),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN op <> 'D' THEN 1 END)::BIGINT AS n_xfers,
         min(vi) FILTER (WHERE op <> 'D') AS low_value,
         max(vi) FILTER (WHERE op <> 'D') AS high_value,
         arg_max(op, eid) AS last_op
  FROM ev GROUP BY doc_id
)
SELECT doc_id, n_xfers, low_value, high_value
FROM agg WHERE last_op <> 'D'
"""


def clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable chunking end to end (≙ the reference's blknum-ranged
    DB scans, eth_alert_adapter.py:113-168, served there by a Postgres
    index; TimescaleDB chunk-exclusion shape): an engine table declared
    ``cluster_by=ets, cluster_slab`` ingests two MOR epochs and
    compacts — the rewrite splits every hash bucket into slab-wide
    chunk files — then a time-ranged read prunes to the touched chunks
    via manifest zone maps alone and returns the mid-window state. The
    oracle replays last-writer state over the flat stream with the same
    time filter. Values are updated ACROSS epochs while ``ets`` stays
    immutable per key — the winner-safety contract the pruning rides."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    op = F.when(eid % 41 == 7, F.lit("D")).otherwise(F.lit("I"))
    non_d = op != "D"
    # event time: immutable per key (derived from the key), spread over
    # 0..9959 at every SF (event_id-derived keys — user_id cardinality
    # is only 15 at sf0.001)
    key_n = F.col("event_id") % 120
    ets = ((key_n * 83) % 9960).cast("long")
    ev = e.select(
        eid.cast("long").alias("stream_pos"),
        eid.cast("long").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        op.alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("c-"), key_n.cast("string")).alias("doc_id"),
        ets.alias("ets"),
        F.when(non_d, F.floor(F.col("value") * 100)).cast("long").alias("val"),
    )
    mid = e.agg(F.max("event_id")).first()[0] // 2
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("ets", T.LongType()),
        T.StructField("val", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    path = _pid_scoped_gate_dir("clustered-scan-gate")
    table = SnapshotTable.create(
        spark, path, schema, key="doc_id", n_buckets=8,
        cluster_by="ets", cluster_slab=1000,
    )
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    table.compact()  # chunk-splitting rewrite
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    lo, hi = 2000, 4999  # 3 of 10 slabs
    return read_state(table, cluster_range=(lo, hi)).select(
        "doc_id", "ets", "val"
    )


_CLUSTERED_SCAN_SQL = """
WITH ev AS (
  SELECT event_id AS eid,
         'c-' || (event_id % 120)::VARCHAR AS doc_id,
         (((event_id % 120) * 83) % 9960)::BIGINT AS ets,
         CASE WHEN event_id % 41 = 7 THEN 'D' ELSE 'I' END AS op,
         CASE WHEN event_id % 41 <> 7
              THEN floor(value * 100)::BIGINT END AS val
  FROM events
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY eid DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
)
SELECT doc_id, ets, val FROM fin WHERE ets BETWEEN 2000 AND 4999
"""


def chunk_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_chunks retention end to end (TimescaleDB ``drop_chunks``;
    ≙ the reference's ledger TTL, load.py:45, applied to the table):
    a chunked table ingests, compacts (slab-aligned layout), then
    expires every chunk below a slab-aligned bound by MANIFEST MATH —
    zero rewrite — and the surviving state must equal the oracle's
    last-writer replay filtered to the retained window. The bound is
    slab-aligned so the file-granular drop is exact."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    op = F.when(eid % 41 == 7, F.lit("D")).otherwise(F.lit("I"))
    non_d = op != "D"
    key_n = F.col("event_id") % 120
    ets = ((key_n * 83) % 9960).cast("long")
    ev = e.select(
        eid.cast("long").alias("stream_pos"),
        eid.cast("long").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        op.alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("c-"), key_n.cast("string")).alias("doc_id"),
        ets.alias("ets"),
        F.when(non_d, F.floor(F.col("value") * 100)).cast("long").alias("val"),
    )
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("ets", T.LongType()),
        T.StructField("val", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    path = _pid_scoped_gate_dir("chunk-retention-gate")
    table = SnapshotTable.create(
        spark, path, schema, key="doc_id", n_buckets=8,
        cluster_by="ets", cluster_slab=1000,
    )
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(ev, epoch_id=1)
    table.compact()  # slab-aligned chunk layout
    table.drop_chunks(below=4000)
    return read_state(table).select("doc_id", "ets", "val")


_CHUNK_RETENTION_SQL = """
WITH ev AS (
  SELECT event_id AS eid,
         'c-' || (event_id % 120)::VARCHAR AS doc_id,
         (((event_id % 120) * 83) % 9960)::BIGINT AS ets,
         CASE WHEN event_id % 41 = 7 THEN 'D' ELSE 'I' END AS op,
         CASE WHEN event_id % 41 <> 7
              THEN floor(value * 100)::BIGINT END AS val
  FROM events
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY eid DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
)
SELECT doc_id, ets, val FROM fin WHERE ets >= 4000
"""


def backfill_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical backfill below the committed watermark (≙ re-running
    an export over an old block range into a live Postgres table —
    the upsert just takes it): the LIVE half of the stream (shifted to
    high lsns) commits first and fixes the watermark; the HISTORICAL
    half then loads through ``backfill_epoch`` with its original low
    lsns — absent keys insert, keys the live stream already wrote keep
    their live values (stale history loses), and the watermark never
    moves. Oracle: last-writer over the UNION of both halves in lsn
    order — i.e. load order must not matter."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    op = F.when(eid % 43 == 9, F.lit("D")).otherwise(F.lit("I"))
    non_d = op != "D"
    mid = e.agg(F.max("event_id")).first()[0] // 2
    # live half rides a +10^6 lsn shift (a stream that started at the
    # midpoint); the historical half keeps original lsns
    lsn = F.when(eid > mid, eid + 1000000).otherwise(eid).cast("long")
    ev = e.select(
        lsn.alias("stream_pos"),
        lsn.alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        op.alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("b-"), (eid % 150).cast("string")).alias("doc_id"),
        F.when(non_d, F.floor(F.col("value") * 100)).cast("long").alias("val"),
        F.when(non_d, F.col("event_type")).alias("etype"),
    )
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("etype", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    path = _pid_scoped_gate_dir("backfill-gate")
    table = SnapshotTable.create(spark, path, schema, key="doc_id", n_buckets=8)
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(ev.filter(F.col("lsn") > 1000000), epoch_id=1)  # live first
    wm = dict(table.manifest().watermark)
    eng.backfill_epoch(ev.filter(F.col("lsn") <= 1000000), epoch_id=2)
    assert dict(table.manifest().watermark) == wm, "backfill moved the watermark"
    return read_state(table).select("doc_id", "val", "etype")


_BACKFILL_SQL = """
WITH ev AS (
  SELECT CASE WHEN event_id > (SELECT max(event_id) // 2 FROM events)
              THEN event_id + 1000000 ELSE event_id END AS lsn,
         'b-' || (event_id % 150)::VARCHAR AS doc_id,
         CASE WHEN event_id % 43 = 9 THEN 'D' ELSE 'I' END AS op,
         CASE WHEN event_id % 43 <> 9
              THEN floor(value * 100)::BIGINT END AS val,
         CASE WHEN event_id % 43 <> 9 THEN event_type END AS etype
  FROM events
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
)
SELECT doc_id, val, etype FROM fin
"""


def wap_publish_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish end to end (≙ the reference's staged
    external-table load with done/fail dirs, postgres_utils.py:197-306,
    made atomic): epoch 1 lands in the base table; epoch 2 is staged on
    a hardlink CLONE, compacted there, audited (row-count sanity), and
    adopted by ``publish_from`` in one CAS manifest swap — the oracle's
    last-writer replay over the FULL stream must match the published
    state, proving the staged path loses nothing."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    op = F.when(eid % 39 == 3, F.lit("D")).otherwise(F.lit("I"))
    non_d = op != "D"
    ev = e.select(
        eid.cast("long").alias("stream_pos"),
        eid.cast("long").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        op.alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("w-"), (eid % 130).cast("string")).alias("doc_id"),
        F.when(non_d, F.floor(F.col("value") * 100)).cast("long").alias("val"),
    )
    mid = e.agg(F.max("event_id")).first()[0] // 2
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    import os as _os

    work = _pid_scoped_gate_dir("wap-publish-gate")
    table = SnapshotTable.create(
        spark, _os.path.join(work, "base"), schema, key="doc_id", n_buckets=8
    )
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    stage = table.clone_at(_os.path.join(work, "stage"))
    s_eng = CdcEngine(spark, stage, mode="mor", collect_metrics=False)
    s_eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    stage.compact()
    assert read_state(stage).limit(1).count() == 1  # the "audit"
    table.publish_from(stage)
    return read_state(table).select("doc_id", "val")


_WAP_PUBLISH_SQL = """
WITH ev AS (
  SELECT event_id AS eid,
         'w-' || (event_id % 130)::VARCHAR AS doc_id,
         CASE WHEN event_id % 39 = 3 THEN 'D' ELSE 'I' END AS op,
         CASE WHEN event_id % 39 <> 3
              THEN floor(value * 100)::BIGINT END AS val
  FROM events
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY eid DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
)
SELECT doc_id, val FROM fin
"""


def kmv_policy_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-COUNT(DISTINCT) as a MERGEABLE column policy (``kmv<k>``,
    the bottom-k sketch of Bar-Yossef et al. 2002; ≙ the reference's
    holder/uniqueness counter hooks, postgres_hooks.py:43-96, where the
    exact ``add`` counter over-counts revisits): each event carries a
    single-hash sketch of its user; the engine's policy fold unions
    sketches per key across two MOR epochs with a compaction between —
    deterministic (md5, no RNG), so the oracle rebuilds the identical
    sketch and the identical floor'd estimate as one grouped aggregate
    over the flat event stream. Tombstoned keys carry their sketch
    across delete→reinsert like ``add`` totals."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.functions.sketch import (
        kmv_estimate,
        kmv_item,
    )
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    k = 32
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    op = F.when(eid % 37 == 5, F.lit("D")).otherwise(F.lit("I"))
    non_d = op != "D"
    # the distinct entity: a synthetic visitor id with cardinality well
    # above k in some groups (estimator path) and below in none-to-few
    ev = e.select(
        eid.cast("long").alias("stream_pos"),
        eid.cast("long").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        op.alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("k-"), (F.col("user_id") % 24).cast("string")).alias("doc_id"),
        F.when(non_d, F.lit(1)).cast("long").alias("n_events"),
        F.when(non_d, kmv_item(F.floor(F.col("value") * 1000).cast("long"))).alias(
            "uniq"
        ),
    )
    mid = e.agg(F.max("event_id")).first()[0] // 2
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("uniq", T.ArrayType(T.StringType())),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    path = _pid_scoped_gate_dir("kmv-policy-gate")
    table = SnapshotTable.create(
        spark, path, schema, key="doc_id", n_buckets=8,
        policies={"n_events": "add", "uniq": f"kmv{k}"},
    )
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    table.compact()  # sketch union must survive base+delta recombination
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    st = read_state(table)
    return st.select(
        "doc_id",
        "n_events",
        F.size("uniq").cast("long").alias("n_sketch"),
        kmv_estimate(F.col("uniq"), k).alias("est_distinct"),
        F.concat_ws(",", "uniq").alias("sketch_csv"),
    )


def _kmv_policy_sql() -> str:
    from blockchain_etl_spark.functions.sketch import kmv_estimate_sql

    k = 32
    est = kmv_estimate_sql("uniq", k)
    return f"""
WITH ev AS (
  SELECT event_id AS eid,
         'k-' || (user_id % 24)::VARCHAR AS doc_id,
         CASE WHEN event_id % 37 = 5 THEN 'D' ELSE 'I' END AS op,
         md5(floor(value * 1000)::BIGINT::VARCHAR) AS h
  FROM events
),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN op <> 'D' THEN 1 END)::BIGINT AS n_events,
         list_slice(list_sort(list_distinct(list(h) FILTER (WHERE op <> 'D'))),
                    1, {k}) AS uniq,
         arg_max(op, eid) AS last_op
  FROM ev GROUP BY doc_id
)
SELECT doc_id, n_events, len(uniq)::BIGINT AS n_sketch,
       {est} AS est_distinct,
       array_to_string(uniq, ',') AS sketch_csv
FROM agg WHERE last_op <> 'D'
"""


def hist_policy_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-key QUANTILES as a mergeable column policy
    (``hist<b>``, a fixed-width count histogram folded element-wise; ≙
    the reference's percentile panels recomputed per poll from raw
    history — rule thresholds like ``tag_value_usd`` compare against
    distribution cuts the reference has to re-aggregate): each event
    carries a one-hot bin sketch of its value; the engine's policy fold
    sums sketches per key across two MOR epochs with a compaction
    between. Deterministic integer adds, so the oracle rebuilds the
    identical bins — and the identical inverted-CDF p50/p95 — as one
    grouped aggregate over the flat event stream. Tombstoned keys carry
    their histogram across delete→reinsert like ``add`` totals."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.functions.hist import (
        hist_item,
        hist_quantile_bin,
        hist_total,
    )
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    b = 8
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    op = F.when(eid % 37 == 5, F.lit("D")).otherwise(F.lit("I"))
    non_d = op != "D"
    # bin = clamped 125-wide cut of the integerized value (the same
    # floor(value*1000) integerization the kmv row proved engine-equal)
    v = F.floor(F.col("value") * 1000).cast("long")
    bin_ = F.least(F.lit(b - 1), F.floor(v / 125)).cast("int")
    ev = e.select(
        eid.cast("long").alias("stream_pos"),
        eid.cast("long").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        op.alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(F.lit("h-"), (F.col("user_id") % 24).cast("string")).alias("doc_id"),
        F.when(non_d, F.lit(1)).cast("long").alias("n_events"),
        F.when(non_d, hist_item(bin_, b)).alias("lat"),
    )
    mid = e.agg(F.max("event_id")).first()[0] // 2
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("lat", T.ArrayType(T.LongType())),
        T.StructField("lsn", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("updated_epoch", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    path = _pid_scoped_gate_dir("hist-policy-gate")
    table = SnapshotTable.create(
        spark, path, schema, key="doc_id", n_buckets=8,
        policies={"n_events": "add", "lat": f"hist{b}"},
    )
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    table.compact()  # bin sums must survive base+delta recombination
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    st = read_state(table)
    return st.select(
        "doc_id",
        "n_events",
        hist_total(F.col("lat")).alias("n_obs"),
        hist_quantile_bin(F.col("lat"), 0.5).alias("p50_bin"),
        hist_quantile_bin(F.col("lat"), 0.95).alias("p95_bin"),
        F.concat_ws(",", "lat").alias("hist_csv"),
    )


def _hist_policy_sql() -> str:
    from blockchain_etl_spark.functions.hist import hist_quantile_bin_sql

    b = 8
    bins = ", ".join(
        f"count(*) FILTER (WHERE op <> 'D' AND bin = {i})" for i in range(b)
    )
    p50 = hist_quantile_bin_sql("lat", 0.5)
    p95 = hist_quantile_bin_sql("lat", 0.95)
    return f"""
WITH ev AS (
  SELECT event_id AS eid,
         'h-' || (user_id % 24)::VARCHAR AS doc_id,
         CASE WHEN event_id % 37 = 5 THEN 'D' ELSE 'I' END AS op,
         least({b - 1}, floor(value * 1000)::BIGINT // 125) AS bin
  FROM events
),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN op <> 'D' THEN 1 END)::BIGINT AS n_events,
         [{bins}]::BIGINT[] AS lat,
         arg_max(op, eid) AS last_op
  FROM ev GROUP BY doc_id
)
SELECT doc_id, n_events, list_sum(lat)::BIGINT AS n_obs,
       {p50} AS p50_bin, {p95} AS p95_bin,
       array_to_string(lat, ',') AS hist_csv
FROM agg WHERE last_op <> 'D'
"""


def nft_tokenid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ EthNftTokenidAdapter (eth_nft_tokenid_adapter.py:188-313 +
    postgres_hooks.py:12-40): per (token_address, token_id) turnover /
    minted / burned counters with first-transfer (mint) and
    last-transfer context — the reference computes the batch aggregate
    in pandas and relies on per-column upsert hooks to accumulate
    across batches; here the SAME accumulation is the table's declared
    column merge policies, applied through the engine over two MOR
    epochs. The oracle recomputes the lifetime stats as one grouped
    aggregate over the flat transfer stream."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    vi = F.floor(F.col("value") * 100).cast("long")
    blk = F.floor(eid / 10).cast("long")
    is_mint = eid % 5 == 0
    is_burn = eid % 11 == 3
    waddr = lambda tag, expr: F.concat(  # noqa: E731
        F.lit("0x"), F.md5(F.concat(F.lit(tag), expr.cast("string")))
    )
    frm = F.when(is_mint, F.lit(EXT.ZERO_ADDR)).otherwise(
        waddr("w", F.col("user_id") % 30)
    )
    to = F.when(is_burn, F.lit(EXT.ZERO_ADDR)).otherwise(
        waddr("w", (F.col("user_id") + eid) % 30)
    )
    ev = e.select(
        eid.cast("long").alias("stream_pos"),
        eid.cast("long").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        F.lit("I").alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.concat(
            waddr("n", eid % 20), F.lit("#"), (eid % 31).cast("string")
        ).alias("doc_id"),
        F.lit(1).cast("long").alias("turnover"),
        F.when(is_mint, F.lit(1)).cast("long").alias("minted_count"),
        F.when(is_mint, vi).alias("minted_value"),
        F.when(is_burn, F.lit(1)).cast("long").alias("burned_count"),
        F.when(is_burn, vi).alias("burned_value"),
        blk.alias("minted_blknum"),
        F.when(is_mint, to).otherwise(frm).alias("mint_address"),
        blk.alias("xfered_blknum"),
        to.alias("last_owner"),
    )
    mid = e.agg(F.max("event_id")).first()[0] // 2
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("turnover", T.LongType()),
            T.StructField("minted_count", T.LongType()),
            T.StructField("minted_value", T.LongType()),
            T.StructField("burned_count", T.LongType()),
            T.StructField("burned_value", T.LongType()),
            T.StructField("minted_blknum", T.LongType()),
            T.StructField("mint_address", T.StringType()),
            T.StructField("xfered_blknum", T.LongType()),
            T.StructField("last_owner", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("updated_epoch", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )
    path = _pid_scoped_gate_dir("nft-tokenid-gate")
    table = SnapshotTable.create(
        spark, path, schema, key="doc_id", n_buckets=8,
        policies={
            "turnover": "add", "minted_count": "add", "minted_value": "add",
            "burned_count": "add", "burned_value": "add",
            "minted_blknum": "first", "mint_address": "first",
            "xfered_blknum": "last", "last_owner": "last",
        },
    )
    eng = CdcEngine(spark, table, mode="mor", collect_metrics=False)
    eng.apply_epoch(ev.filter(F.col("lsn") <= mid), epoch_id=1)
    eng.apply_epoch(ev.filter(F.col("lsn") > mid), epoch_id=2)
    return read_state(table).select(
        "doc_id",
        "turnover",
        F.coalesce("minted_count", F.lit(0)).alias("minted_count"),
        F.coalesce("minted_value", F.lit(0)).alias("minted_value"),
        F.coalesce("burned_count", F.lit(0)).alias("burned_count"),
        F.coalesce("burned_value", F.lit(0)).alias("burned_value"),
        "minted_blknum",
        "mint_address",
        "xfered_blknum",
        "last_owner",
    )


_NFT_TOKENID_SQL = """
WITH ev AS (
  SELECT event_id AS eid, user_id AS uid,
         floor(value * 100)::BIGINT AS vi,
         event_id // 10 AS blk,
         event_id % 5 = 0 AS is_mint,
         event_id % 11 = 3 AS is_burn
  FROM events
),
x AS (
  SELECT eid, vi, blk, is_mint, is_burn,
         '0x' || md5('n' || (eid % 20)::VARCHAR) || '#' || (eid % 31)::VARCHAR
           AS doc_id,
         CASE WHEN is_mint THEN '0x0000000000000000000000000000000000000000'
              ELSE '0x' || md5('w' || (uid % 30)::VARCHAR) END AS frm,
         CASE WHEN is_burn THEN '0x0000000000000000000000000000000000000000'
              ELSE '0x' || md5('w' || ((uid + eid) % 30)::VARCHAR) END AS tto
  FROM ev
)
SELECT doc_id,
       count(*)::BIGINT AS turnover,
       coalesce(sum(CASE WHEN is_mint THEN 1 END), 0)::BIGINT AS minted_count,
       coalesce(sum(CASE WHEN is_mint THEN vi END), 0)::BIGINT AS minted_value,
       coalesce(sum(CASE WHEN is_burn THEN 1 END), 0)::BIGINT AS burned_count,
       coalesce(sum(CASE WHEN is_burn THEN vi END), 0)::BIGINT AS burned_value,
       arg_min(blk, eid) AS minted_blknum,
       arg_min(CASE WHEN is_mint THEN tto ELSE frm END, eid) AS mint_address,
       arg_max(blk, eid) AS xfered_blknum,
       arg_max(tto, eid) AS last_owner
FROM x GROUP BY doc_id
"""


def utxo_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTXO input enrichment ≙ the reference's UPDATE..FROM self-join
    (/root/reference/bitcoinetl/streaming/enrich.py:16-34): each input
    (isin=true, address NULL) is filled with address/value/vout_type
    from the previous output it spends (a.pxhash = b.txhash AND
    a.vout_idx = b.vout_idx, b.isin=false, b.address NOT NULL); inputs
    whose parent output is unknown stay NULL ('missing').

    Scale: a shuffle hash join keyed on (pxhash, vout_idx) — tx hashes
    are uniform so no skew; at 100 TB both sides live in the same
    bucketed layout (tables/bucketed.py) so the join co-locates with
    zero Exchange. The MERGE-shaped commit of this fill over the
    snapshot table is tests/test_snapshot_table.py::
    test_utxo_enrich_merge_over_snapshot."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    vi = F.floor(F.col("value") * 100).cast("long")
    outs = e.select(
        F.md5(F.concat(F.lit("x"), eid)).alias("txhash"),
        (F.col("event_id") % 3).alias("vout_idx"),
        F.concat(
            F.lit("0x"), F.substring(F.md5(F.concat(F.lit("o"), eid)), 1, 40)
        ).alias("address"),
        vi.alias("value"),
        F.when(F.col("event_id") % 2 == 0, "p2pkh").otherwise("p2sh").alias(
            "vout_type"
        ),
    )
    ins = e.filter(F.col("event_id") >= 10).select(
        "event_id",
        F.when(
            F.col("event_id") % 17 == 0,
            F.md5(F.concat(F.lit("bogus"), eid)),
        )
        .otherwise(F.md5(F.concat(F.lit("x"), (F.col("event_id") - 10).cast("string"))))
        .alias("pxhash"),
        ((F.col("event_id") - 10) % 3).alias("vout_idx"),
    )
    j = ins.join(
        outs, (ins.pxhash == outs.txhash) & (ins.vout_idx == outs.vout_idx), "left"
    )
    return j.select(
        "event_id",
        "pxhash",
        ins.vout_idx.alias("vout_idx"),
        "address",
        "value",
        "vout_type",
        F.when(F.col("address").isNull(), "missing").otherwise("filled").alias(
            "status"
        ),
    )


_UTXO_ENRICH_SQL = """
WITH ev AS (SELECT event_id, floor(value * 100)::BIGINT AS vi FROM events),
outs AS (
  SELECT md5('x' || event_id::VARCHAR) AS txhash,
         event_id % 3 AS vout_idx,
         '0x' || substr(md5('o' || event_id::VARCHAR), 1, 40) AS address,
         vi AS value,
         CASE WHEN event_id % 2 = 0 THEN 'p2pkh' ELSE 'p2sh' END AS vout_type
  FROM ev
),
ins AS (
  SELECT event_id,
         CASE WHEN event_id % 17 = 0 THEN md5('bogus' || event_id::VARCHAR)
              ELSE md5('x' || (event_id - 10)::VARCHAR) END AS pxhash,
         (event_id - 10) % 3 AS vout_idx
  FROM ev WHERE event_id >= 10
)
SELECT i.event_id, i.pxhash, i.vout_idx, o.address, o.value, o.vout_type,
       CASE WHEN o.address IS NULL THEN 'missing' ELSE 'filled' END AS status
FROM ins i LEFT JOIN outs o
  ON i.pxhash = o.txhash AND i.vout_idx = o.vout_idx
"""


def utxo_block_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTXO block scan → vin/vout explode (≙ btc export_blocks_job tx
    fan-out, /root/reference/bitcoinetl/jobs/export_blocks_job.py +
    vin/vout mappers): each tx carries an input array (refs to prior
    txhashes) and an output array (indexed values+addresses); both
    explode to one row per (tx, side, idx) — posexplode, no shuffle."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id").cast("string")
    vi = F.floor(F.col("value") * 100).cast("long")
    txh = F.md5(F.concat(F.lit("x"), eid))
    n_out = (F.col("event_id") % 3).cast("int")  # sequence(0, n_out) → n_out+1 outs
    vouts = F.transform(
        F.sequence(F.lit(0), n_out),
        lambda i: F.struct(
            i.cast("int").alias("idx"),
            F.concat(
                F.lit("0x"),
                F.substring(
                    F.md5(F.concat(F.lit("o"), eid, F.lit("_"), i.cast("string"))),
                    1,
                    40,
                ),
            ).alias("address"),
            (vi + i).alias("value"),
        ),
    )
    ref = lambda off: F.md5(F.concat(F.lit("x"), (F.col("event_id") - off).cast("string")))
    vins = F.when(
        F.col("event_id") >= 5,
        F.array(
            F.struct(F.lit(0).cast("int").alias("idx"), ref(5).alias("pxhash")),
            F.struct(F.lit(1).cast("int").alias("idx"), ref(3).alias("pxhash")),
        ),
    ).otherwise(F.array().cast("array<struct<idx:int,pxhash:string>>"))
    base = e.select("event_id", txh.alias("txhash"), vins.alias("vins"), vouts.alias("vouts"))
    vin_rows = base.select(
        "txhash",
        F.lit(True).alias("isin"),
        F.explode("vins").alias("v"),
    ).select(
        "txhash",
        "isin",
        F.col("v.idx").alias("idx"),
        F.col("v.pxhash").alias("pxhash"),
        F.lit(None).cast("string").alias("address"),
        F.lit(None).cast("long").alias("value"),
    )
    vout_rows = base.select(
        "txhash",
        F.lit(False).alias("isin"),
        F.explode("vouts").alias("v"),
    ).select(
        "txhash",
        "isin",
        F.col("v.idx").alias("idx"),
        F.lit(None).cast("string").alias("pxhash"),
        F.col("v.address").alias("address"),
        F.col("v.value").alias("value"),
    )
    return vin_rows.unionByName(vout_rows)


_UTXO_BLOCK_SCAN_SQL = """
WITH ev AS (SELECT event_id, floor(value * 100)::BIGINT AS vi FROM events),
vout_i AS (
  SELECT event_id, vi, unnest(generate_series(0, event_id % 3)) AS i FROM ev
),
vout AS (
  SELECT md5('x' || event_id::VARCHAR) AS txhash, false AS isin, i::INT AS idx,
         NULL::VARCHAR AS pxhash,
         '0x' || substr(md5('o' || event_id::VARCHAR || '_' || i::VARCHAR), 1, 40)
             AS address,
         vi + i AS value
  FROM vout_i
),
vin_i AS (
  SELECT event_id, unnest([0, 1]) AS i FROM ev WHERE event_id >= 5
),
vin AS (
  SELECT md5('x' || event_id::VARCHAR) AS txhash, true AS isin, i::INT AS idx,
         CASE WHEN i = 0 THEN md5('x' || (event_id - 5)::VARCHAR)
              ELSE md5('x' || (event_id - 3)::VARCHAR) END AS pxhash,
         NULL::VARCHAR AS address, NULL::BIGINT AS value
  FROM vin_i
)
SELECT txhash, isin, idx, pxhash, address, value FROM vin
UNION ALL
SELECT txhash, isin, idx, pxhash, address, value FROM vout
"""

# --------------------------------------------------------------------------
# Unbounded-depth call-tree flatten: synthetic heap-shaped geth trace
# forest (JSON), flattened by the mapInPandas DFS; DuckDB twin derives the
# identical rows with a recursive CTE (no JSON) — comparing the two
# validates the decode end to end.
# --------------------------------------------------------------------------


def call_tree_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ _iterate_geth_trace recursion (trace_mapper.py:149-290) at
    arbitrary depth. Forest shape per event: n = 1 + event_id % 7 nodes
    in binary-heap layout (node i's children are 2i+1, 2i+2)."""
    import hashlib
    import json as _json

    from blockchain_etl_spark.operators.tree import flatten_geth_traces

    @F.pandas_udf("string")
    def synth(eids: pd.Series) -> pd.Series:
        def h(tag: str, e: int, i: int) -> str:
            return "0x" + hashlib.md5(f"{tag}{e}-{i}".encode()).hexdigest()[:40]

        def node(e: int, i: int, n: int) -> dict:
            return {
                "type": ["call", "staticcall", "delegatecall"][i % 3],
                "from": h("n", e, i),
                "to": h("m", e, i),
                "value": e * 100 + i,
                "error": (e + i) % 11 == 0,
                "calls": [node(e, j, n) for j in (2 * i + 1, 2 * i + 2) if j < n],
            }

        return eids.map(lambda e: _json.dumps(node(int(e), 0, 1 + int(e) % 7)))

    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id") % 20 == 0)
        .select("event_id", synth("event_id").alias("trace_json"))
    )
    flat = flatten_geth_traces(e, json_col="trace_json", id_cols=("event_id",))
    return flat.select(
        "event_id",
        F.concat_ws(",", F.col("trace_address").cast("array<string>")).alias(
            "path_csv"
        ),
        "call_type",
        "from_address",
        "to_address",
        "value",
        "error",
        "n_children",
        "depth",
    )


_CALL_TREE_SQL = """
WITH RECURSIVE ev AS (
  SELECT event_id, (1 + event_id % 7)::INT AS n FROM events WHERE event_id % 20 = 0
),
nodes AS (
  SELECT event_id, n, 0 AS i, ''::VARCHAR AS path_csv, 0 AS depth FROM ev
  UNION ALL
  SELECT p.event_id, p.n, 2 * p.i + 1 + o.o AS i,
         CASE WHEN p.path_csv = '' THEN o.o::VARCHAR
              ELSE p.path_csv || ',' || o.o::VARCHAR END,
         p.depth + 1
  FROM nodes p, (SELECT unnest([0, 1]) AS o) o
  WHERE 2 * p.i + 1 + o.o < p.n
)
SELECT event_id, path_csv,
       CASE i % 3 WHEN 0 THEN 'call' WHEN 1 THEN 'staticcall'
            ELSE 'delegatecall' END AS call_type,
       '0x' || substr(md5('n' || event_id::VARCHAR || '-' || i::VARCHAR), 1, 40)
         AS from_address,
       '0x' || substr(md5('m' || event_id::VARCHAR || '-' || i::VARCHAR), 1, 40)
         AS to_address,
       event_id * 100 + i AS value,
       (event_id + i) % 11 = 0 AS error,
       least(greatest(n - (2 * i + 1), 0), 2)::INT AS n_children,
       depth
FROM nodes
"""


def trace_union_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trace scan ∪ synthetic genesis rows (≙ export_traces_job's union of
    scanned traces with synthetic genesis/daofork transfer rows,
    ethereumetl/jobs/export_traces_job.py + eth_special_trace.py): the
    synthetic side is a literal dimension unioned under the same schema."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_id") % 50 == 0
    )
    traces = e.select(
        F.format_string("trace-%d", "event_id").alias("trace_id"),
        F.lit("call").alias("trace_type"),
        F.floor(F.col("value") * 100).cast("long").alias("value_c"),
    )
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    genesis = r.select(
        F.format_string("genesis-%d", "r_regionkey").alias("trace_id"),
        F.lit("genesis").alias("trace_type"),
        (F.col("r_regionkey") * 1000 + 7).cast("long").alias("value_c"),
    )
    return traces.unionByName(genesis)


_TRACE_UNION_SQL = """
SELECT 'trace-' || event_id::VARCHAR AS trace_id, 'call' AS trace_type,
       floor(value * 100)::BIGINT AS value_c
FROM events WHERE event_id % 50 = 0
UNION ALL
SELECT 'genesis-' || r_regionkey::VARCHAR, 'genesis', (r_regionkey * 1000 + 7)::BIGINT
FROM region
"""


def receipt_missing_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-receipt backfill (≙ the receipt scan's missing-txhash fill,
    export_receipts_job.py + check/fill semantics): every order key gets a
    row — joined receipts where present, 'backfilled' placeholders where
    the receipt side has no match."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("total")
    )
    rc = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count("*").alias("n_items"))
    )
    j = o.join(rc, "k", "left")
    return j.select(
        "k",
        F.round("total", 2).alias("total"),
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        F.when(F.col("n_items").isNull(), "backfilled").otherwise("ok").alias("status"),
    )


_RECEIPT_FILL_SQL = """
SELECT o_orderkey AS k, round(o_totalprice, 2) AS total,
       coalesce(n_items, 0) AS n_items,
       CASE WHEN n_items IS NULL THEN 'backfilled' ELSE 'ok' END AS status
FROM orders LEFT JOIN (
  SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY l_orderkey
) r ON o_orderkey = l_orderkey
"""


# --------------------------------------------------------------------------
# Bytecode contract classifier end-to-end: synthetic EVM dispatchers
# (pure column-expression synthesis — PUSH2 noise + PUSH4 selector runs),
# classified by the mapInPandas scanner + JVM selector-set predicates.
# The DuckDB twin derives the expected classification from the same
# event_id rule.
# --------------------------------------------------------------------------


def _synth_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → synthetic contract rows (event_id, address, bytecode):
    PUSH2 noise + PUSH4 selector-run dispatchers per kind = event_id % 4
    (0: full erc20, 1: erc721, 2: partial erc20, 3: empty)."""
    from blockchain_etl_spark.operators import contracts as C

    run = lambda sigs: "".join("63" + C.sighash(s)[2:] for s in sigs)
    erc20 = run(C.ERC20_REQUIRED)
    erc721 = run(["balanceOf(address)", "ownerOf(uint256)", "approve(address,uint256)",
                  "transferFrom(address,address,uint256)"])
    partial = run(["totalSupply()", "transfer(address,uint256)"])
    noise = "616301" + "5b00"  # PUSH2 0x6301 (looks like PUSH4!) + JUMPDEST STOP
    kind = F.col("event_id") % 4
    bytecode = (
        F.when(kind == 0, F.lit("0x" + noise + erc20))
        .when(kind == 1, F.lit("0x" + noise + erc721))
        .when(kind == 2, F.lit("0x" + noise + partial))
        .otherwise(F.lit("0x"))
    )
    eid = F.col("event_id").cast("string")
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_id") % 10 == 0)
        .select(
            "event_id",
            F.concat(
                F.lit("0x"), F.substring(F.md5(F.concat(F.lit("c"), eid)), 1, 40)
            ).alias("address"),
            bytecode.alias("bytecode"),
        )
    )


def contract_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """≙ EthContractService.get_contract classification
    (eth_contract_service.py:38-140)."""
    from blockchain_etl_spark.operators import contracts as C

    out = C.classify_contracts(_synth_contracts(spark, sf_dir).drop("address"))
    return out.select(
        "event_id",
        F.concat_ws(",", "function_sighashes").alias("sighashes_csv"),
        F.size("function_sighashes").alias("n_sig"),
        "is_erc20",
        "is_erc721",
    )


def extract_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contract → token composition ≙ extract_tokens_job.py +
    EthTokenService.get_token (/root/reference/ethereumetl/jobs/
    extract_tokens_job.py, eth_token_service.py:45-160): classify
    bytecode → keep is_erc20/is_erc721 → resolve metadata through the
    cached token dim (anti-join misses → fetch → broadcast enrich) →
    token rows with symbol/name/decimals/total_supply.

    Scale: classification is a narrow map over the contract scan; the
    token dim is ≪ the contract stream so the metadata join broadcasts;
    the only shuffle is the dim-side distinct over new addresses."""
    from blockchain_etl_spark.operators import contracts as C
    from blockchain_etl_spark.sources.token_service import TokenDimService

    classified = C.classify_contracts(_synth_contracts(spark, sf_dir))
    tok = classified.filter(F.col("is_erc20") | F.col("is_erc721")).select(
        "event_id", "address", "is_erc20", "is_erc721"
    )
    svc = TokenDimService(spark, _pid_scoped_gate_dir("tokdim-extract-gate"))
    dim = svc.resolve(tok, addr_col="address")
    d = F.broadcast(
        dim.select(
            F.col("address").alias("__addr"),
            "symbol",
            "name",
            "decimals",
            "total_supply",
        )
    )
    return (
        tok.join(d, F.lower(F.col("address")) == F.col("__addr"))
        .select(
            "event_id", "address", "symbol", "name", "decimals",
            "total_supply", "is_erc20", "is_erc721",
        )
    )


_EXTRACT_TOKENS_SQL = """
WITH c AS (
  SELECT event_id, event_id % 4 AS kind,
         '0x' || substr(md5('c' || event_id::VARCHAR), 1, 40) AS address
  FROM events WHERE event_id % 10 = 0 AND event_id % 4 IN (0, 1)
)
SELECT event_id, address,
       upper(substr(md5(address), 1, 6)) AS symbol,
       'Token ' || substr(md5(address), 1, 8) AS name,
       ('0x' || substr(md5(address), 9, 2))::INT % 24 AS decimals,
       (('0x' || substr(md5(address), 11, 10))::BIGINT)::VARCHAR AS total_supply,
       kind = 0 AS is_erc20,
       kind = 1 AS is_erc721
FROM c
"""


def _contract_classify_sql() -> str:
    from blockchain_etl_spark.operators import contracts as C

    csv20 = ",".join(sorted(C.sighash(s) for s in C.ERC20_REQUIRED))
    csv721 = ",".join(
        sorted(
            C.sighash(s)
            for s in ["balanceOf(address)", "ownerOf(uint256)",
                      "approve(address,uint256)",
                      "transferFrom(address,address,uint256)"]
        )
    )
    csvpart = ",".join(
        sorted(C.sighash(s) for s in ["totalSupply()", "transfer(address,uint256)"])
    )
    return f"""
        SELECT event_id,
               CASE event_id % 4 WHEN 0 THEN '{csv20}' WHEN 1 THEN '{csv721}'
                    WHEN 2 THEN '{csvpart}' ELSE '' END AS sighashes_csv,
               (CASE event_id % 4 WHEN 0 THEN {len(set(C.ERC20_REQUIRED))}
                     WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 0 END)::INT AS n_sig,
               event_id % 4 = 0 AS is_erc20,
               event_id % 4 = 1 AS is_erc721
        FROM events WHERE event_id % 10 = 0
    """


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: emails and phone-like digit groups
    replaced by typed placeholders, per-doc removal counts as the audit
    signal. The synthetic corpus carries no natural PII, so a
    deterministic contact line (derived from doc_id, identically in the
    oracle) is appended first — the regex engines, not the data, are
    what the gate checks. Pure regexp projections, zero shuffle."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.concat(
        F.col("text"),
        F.lit(" contact doc"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    cols = X.redact_pii(t)
    return d.select(
        "doc_id",
        cols["n_emails"].alias("n_emails"),
        cols["n_phones"].alias("n_phones"),
        F.md5(cols["redacted"]).alias("redacted_md5"),
    )


_PII_REDACT_SQL = f"""
WITH t AS (
  SELECT doc_id,
         text || ' contact doc' || doc_id::VARCHAR || '@example.com or 555-'
              || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{X.EMAIL_RE}'))::INT AS n_emails,
       len(regexp_extract_all(regexp_replace(t, '{X.EMAIL_RE}', '<EMAIL>', 'g'),
                              '{X.PHONE_RE}'))::INT AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{X.EMAIL_RE}', '<EMAIL>', 'g'),
                          '{X.PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM t
"""


_SAMPLE_RATES = {"src0": 0.9, "src1": 0.5, "src2": 0.25}
_SAMPLE_DEFAULT = 0.05


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source corpus sampling (hash-threshold
    Bernoulli): source weighting for corpus assembly with reproducible
    membership — no rand(), no shuffle, and unlisted sources fall to a
    default rate. See operators/sampling.py for the scale notes."""
    from blockchain_etl_spark.operators.sampling import stratified_sample as ss

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ss(d, _SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT).select(
        "doc_id", "source"
    )


_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.25, "src2": 0.125, "src3": 0.125}


def domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture sampling: realize target domain shares at the
    largest achievable sample size (binding source = least data per
    unit weight; everything else down-samples to match). Deterministic
    hash-threshold membership — rerun-stable, zero data-path shuffle;
    the per-source counts are one bounded-dim aggregation. See
    operators/sampling.py:mixture_rates."""
    from blockchain_etl_spark.operators.sampling import mixture_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mixture_sample(d, _MIX_WEIGHTS).select("doc_id", "source")


def _mixture_sql() -> str:
    vals = ", ".join(f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items()))
    return f"""
WITH w(source, wt) AS (VALUES {vals}),
counts AS (
  SELECT source, count(*)::DOUBLE AS n FROM documents
  WHERE source IN (SELECT source FROM w) GROUP BY source
),
nmax AS (SELECT min(c.n / w.wt) AS nm FROM counts c JOIN w USING (source)),
rates AS (
  SELECT c.source,
         floor(least(1.0, (w.wt * nmax.nm) / c.n) * 10000)::BIGINT AS t
  FROM counts c JOIN w USING (source) CROSS JOIN nmax
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON r.source = d.source
WHERE ('0x' || substr(md5('mix' || d.doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < r.t
"""


def _sample_sql() -> str:
    whens = "\n         ".join(
        f"WHEN '{s}' THEN {int(r * 10000)}" for s, r in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, source FROM documents
WHERE ('0x' || substr(md5('samp' || doc_id::VARCHAR), 1, 8))::BIGINT % 10000
    < CASE source {whens} ELSE {int(_SAMPLE_DEFAULT * 10000)} END
"""


_SESSION_GAP_US = 8 * 3600 * 1_000_000  # 8 h — ~median inter-event gap


def global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle: every document gets a
    0-based position in a reproducible uniform permutation
    (md5-salted key), computed with the two-phase global rank — no
    single-task ORDER BY window anywhere (see operators/ordering.py).
    Downstream shard assignment is then pure arithmetic on ``pos``."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return ordering.global_shuffle(d).select("doc_id", "pos")


_GLOBAL_SHUFFLE_SQL = """
SELECT doc_id,
       (row_number() OVER (ORDER BY md5('gshuf' || doc_id::VARCHAR), doc_id)
        - 1)::BIGINT AS pos
FROM documents
"""


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule: stage = document-length difficulty bucket,
    global position = (stage asc, deterministic shuffle within stage).
    The stage expression is a codegen'd CASE; the position is the same
    two-phase rank as global_shuffle — parallelism independent of stage
    cardinality (a per-stage window would funnel each stage through one
    task)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    stage = (
        F.when(F.col("n_chars") < 200, 0)
        .when(F.col("n_chars") < 400, 1)
        .otherwise(2)
    )
    return ordering.curriculum_order(d, stage).select("doc_id", "stage", "pos")


_CURRICULUM_SQL = """
WITH s AS (
  SELECT doc_id,
         CASE WHEN n_chars < 200 THEN 0
              WHEN n_chars < 400 THEN 1 ELSE 2 END AS stage
  FROM documents
)
SELECT doc_id, stage::INT AS stage,
       (row_number() OVER (ORDER BY stage, md5('curr' || doc_id::VARCHAR),
                           doc_id) - 1)::BIGINT AS pos
FROM s
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the event stream: a new session
    starts when a user's inter-event gap exceeds the threshold; one
    output row per session with integer-exact bounds (no float columns
    — value-hash-stable). One shuffle on user_id; the lag flag and the
    running session counter share a single window spec, so Catalyst
    plans ONE Window node. Hot-key caveat: a pathological single user
    serializes through one task — the gap chain is inherently
    sequential per user (the general salting kit in operators/skew.py
    does not apply); real deployments shard by (user, day) first."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the parquet column is TIMESTAMP_NTZ; the session timezone is
    # pinned to UTC (session.py), so the LTZ cast is value-faithful and
    # unix_micros matches DuckDB's epoch_us on the naive timestamp
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0)
    sess = e.withColumn(
        "session_seq", F.sum(new_sess).over(w).cast("long")
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        (F.max(us) - F.min(us)).alias("dur_us"),
    )


def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gaps-and-islands semantics as ``sessionize`` but through
    Spark's NATIVE session-window operator (``F.session_window``) in
    batch mode — the operator the streaming twin
    (streaming/windowed.py ``session_window_agg``) runs state-store-
    backed. Emitting both keeps the two formulations provably aligned:
    boundary behavior is merge-on-exact-gap (an event exactly ``gap``
    after the previous one joins the session; a strictly larger gap
    splits), verified here against the lag-based oracle. Bounds come
    out as unix micros (integer-exact, hash-stable); session_end is
    Spark's closed bound last-ts + gap."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp_ltz")
    return (
        e.groupBy(
            F.session_window(ts, "8 hours").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "first_event",
        )
    )


_SESSION_WINDOW_NATIVE_SQL = f"""
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
s AS (
  SELECT user_id, event_id, us,
         sum(CASE WHEN gap IS NULL OR gap > {_SESSION_GAP_US}
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, min(us) AS session_start_us,
       max(us) + {_SESSION_GAP_US} AS session_end_us,
       count(*)::BIGINT AS n_events, min(event_id) AS first_event
FROM s GROUP BY user_id, sid
"""


_SESSIONIZE_SQL = f"""
WITH o AS (
  SELECT user_id, event_id, ts,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
s AS (
  SELECT user_id, event_id, ts,
         sum(CASE WHEN gap IS NULL OR gap > {_SESSION_GAP_US}
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
  FROM o
)
SELECT user_id, session_seq, count(*)::BIGINT AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event,
       (max(epoch_us(ts)) - min(epoch_us(ts)))::BIGINT AS dur_us
FROM s GROUP BY user_id, session_seq
"""


_KMEANS_SQL = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * 1000000)::BIGINT) AS iv
  FROM embeddings
),
seeds AS (
  SELECT vec_id - {similarity.KM_SEED_BASE} AS cid, iv AS siv
  FROM e WHERE vec_id >= {similarity.KM_SEED_BASE}
    AND vec_id < {similarity.KM_SEED_BASE + similarity.KM_K}
),
sa AS (
  SELECT e.vec_id, e.iv, seeds.cid,
         list_sum(list_transform(generate_series(1, len(e.iv)),
                                 i -> e.iv[i] * seeds.siv[i]))::BIGINT AS d
  FROM e CROSS JOIN seeds
),
a1 AS (
  SELECT vec_id, iv, cid AS cid1 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rk
    FROM sa) WHERE rk = 1
),
sums AS (
  SELECT cid1, i AS pos, sum(iv[i])::BIGINT AS s
  FROM a1, unnest(generate_series(1, len(iv))) AS t(i)
  GROUP BY cid1, i
),
cent AS (
  SELECT cid1 AS cid, list(s ORDER BY pos) AS csum FROM sums GROUP BY cid1
),
cnt AS (SELECT cid1 AS cid, count(*) AS n FROM a1 GROUP BY cid1),
sa2 AS (
  SELECT a1.vec_id, a1.cid1, c.cid,
         list_sum(list_transform(generate_series(1, len(a1.iv)),
                                 i -> a1.iv[i] * c.csum[i]))::BIGINT::DOUBLE
           / cnt.n AS d2
  FROM a1 CROSS JOIN cent c JOIN cnt ON cnt.cid = c.cid
)
SELECT vec_id, cid1, cid AS cid2 FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 DESC, cid) AS rk
  FROM sa2) WHERE rk = 1
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: MinHash-LSH candidate pairs →
    connected components by hash-min label propagation → every sampled
    doc labeled with its duplicate-cluster canonical id (min reachable
    doc id; singletons label themselves). The cluster step that turns
    pairwise dedup output into "keep one per cluster". Oracle twin: a
    recursive-CTE transitive closure with MIN over the reachable set —
    the same fixpoint the propagation converges to."""
    from blockchain_etl_spark.operators.dedup import connected_components

    pairs = dedup.minhash_lsh_pairs(spark, sf_dir)
    nodes = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("node"))
    )
    return connected_components(pairs, nodes=nodes).select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


def _dedup_components_sql(num_hashes: int = 8, bands: int = 4, sample_mod: int = 5) -> str:
    return f"""
WITH RECURSIVE {_minhash_banded_cte(num_hashes, bands, sample_mod)},
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
esym AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id % {sample_mod} = 0
  UNION
  SELECT e.x, reach.r FROM reach JOIN esym e ON e.y = reach.node
)
SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node
"""


def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, term) TF-IDF — the keyword/weighting primitive under
    corpus search and topical filtering. tf and df are EXACT integers;
    only the final score multiplies by ln((N+1)/(df+1)) and rounds to
    6 dp (a 1-ulp libm divergence flipping a rounded digit is
    measure-zero — no ranking rides on the float).

    Scale: tf is one explode + (doc, term) hash agg (map-side combined);
    df reuses tf's output (already one row per (doc, term)) with a
    second agg on term; the df join shuffles on term — at web scale the
    term dim is heavy-tailed and AQE's skew split handles the head
    (stopword-class terms)."""
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
    )
    n_docs = d.count()
    w = d.select("doc_id", F.explode(X.words("text")).alias("term"))
    tf = w.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    score = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)), 6
    )
    return tf.join(df_, "term").select(
        "doc_id", "term", "tf", "df", score.alias("tfidf")
    )


_TFIDF_SQL = """
WITH d AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
n AS (SELECT count(*) AS n_docs FROM d),
w AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS term
  FROM d
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, tf.term, tf.tf, df.df,
       round(tf.tf * ln((n.n_docs + 1)::DOUBLE / (df.df + 1)), 6) AS tfidf
FROM tf JOIN df USING (term), n
"""


def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how
    many distinct word 3-grams they share — the corpus-level signal
    behind "is split A leaking into split B" checks (the decontamination
    op's aggregate cousin). All integer counts, no floats.

    Scale: distinct (source, gram) is one agg; the pair join is
    gram⋈gram — blocked by the gram itself (a join key with bounded
    per-key cardinality = #sources, so the join output is ≤ S² per gram,
    never quadratic in docs)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = d.select(
        "source", F.explode(X.shingles("text", k=3)).alias("gram")
    ).distinct()
    a = g.select(F.col("source").alias("src_a"), "gram")
    b = g.select(F.col("source").alias("src_b"), "gram")
    return (
        a.join(b, "gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("shared_grams"))
    )


_SOURCE_OVERLAP_SQL = """
WITH w AS (
  SELECT source,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
g AS (
  SELECT DISTINCT source, unnest(
    CASE WHEN len(words) >= 3 THEN
      list_transform(generate_series(0, len(words) - 3),
                     i -> array_to_string(list_slice(words, i + 1, i + 3), ' '))
    ELSE [array_to_string(words, ' ')] END) AS gram
  FROM w
)
SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_grams
FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2
"""


def entity_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1:N derived-entity shape end-to-end (block→transactions /
    doc→context-window-chunks): a doc_chunks table is maintained off the
    root CDC table through cascade hops with parent-scoped
    reconciliation — an update that shrinks a document DELETES its
    surplus chunks downstream (old chunk keys from the v0 snapshot, new
    from v1; see streaming/pipeline.py doc_chunks_events). Two commits,
    hop after each; the oracle chunks the relational last-writer state
    directly — equality proves the incremental hops converge to the
    batch recompute."""
    pipe = _pipeline_gate(spark, sf_dir, "entity-chunks-gate", ["doc_chunks"])
    return pipe.state("doc_chunks").select(
        F.col("doc_id").alias("chunk_key"),
        "parent_id",
        "chunk_id",
        F.concat_ws(",", F.col("chunk_tokens").cast("array<string>")).alias(
            "chunk_csv"
        ),
        "n_chunk_tok",
    )


def _entity_chunks_sql(width: int) -> str:
    return f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
c AS (
  SELECT doc_id, tokens, len(tokens) AS n,
         unnest(range(0, (len(tokens) + {width} - 1) // {width})) AS chunk_id
  FROM fin WHERE len(tokens) > 0
)
SELECT doc_id || '#' || lpad(chunk_id::VARCHAR, 4, '0') AS chunk_key,
       doc_id AS parent_id,
       chunk_id::INT AS chunk_id,
       array_to_string(
         list_slice(tokens, chunk_id * {width} + 1,
                    least((chunk_id + 1) * {width}, n)), ',') AS chunk_csv,
       (least((chunk_id + 1) * {width}, n) - chunk_id * {width})::INT AS n_chunk_tok
FROM c
"""


def entity_band_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest-time dedup index as a DERIVED ENTITY: an LSH band
    table (doc → 4 band rows, keyed ``{doc}#b{band}``) maintained off
    the root CDC table through cascade hops — doc updates re-derive
    only that doc's bands, deletes drop them (parent-scoped
    reconciliation, streaming/pipeline.py band_index_events). Two
    commits, hop after each; the oracle recomputes the bands from
    relational last-writer state — equality proves the incremental
    index converges to a batch rebuild, so lsh_index_probe can trust
    it without ever rebuilding."""
    pipe = _pipeline_gate(spark, sf_dir, "entity-band-index-gate", ["band_index"])
    return pipe.state("band_index").select(
        F.col("doc_id").alias("band_key"), "parent_id", "band", "bucket"
    )


def _entity_band_index_sql(num_hashes: int = 8, bands: int = 4) -> str:
    from blockchain_etl_spark.functions.text import _MH_MOD, minhash_coeffs

    rows = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes)
    mins = ",\n         ".join(
        f"min(({a} * h + {b}) % {_MH_MOD}) AS m{s}"
        for s, (a, b) in enumerate(coeffs)
    )
    band_rows = "\n  UNION ALL ".join(
        "SELECT doc_id, {bnd} AS band, md5({expr}) AS bucket FROM sig".format(
            bnd=bnd,
            expr=" || '|' || ".join(
                f"m{bnd * rows + r}::VARCHAR" for r in range(rows)
            ),
        )
        for bnd in range(bands)
    )
    return f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
fin AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
w AS (
  SELECT doc_id, ('0x' || substr(md5(tok::VARCHAR), 1, 15))::BIGINT % {_MH_MOD} AS h
  FROM (SELECT doc_id, unnest(tokens) AS tok FROM fin)
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM w GROUP BY doc_id
),
banded AS (
  {band_rows}
)
SELECT doc_id || '#b' || band AS band_key, doc_id AS parent_id,
       band::INT AS band, bucket
FROM banded
"""


def entity_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only history entity next to the latest-state root table
    (≙ HISTORY_BALANCE vs LATEST_BALANCE, entity_type.py:24-31): two
    root commits, a history hop after each — every observed net change
    becomes an immutable row keyed (entity, observed version). The
    oracle rebuilds the same log relationally: state at the mid-LSN cut
    emits as version-1 inserts; the mid→end diff (insert / update
    post-image / delete, pre-images excluded) emits at version 2."""
    pipe = _pipeline_gate(spark, sf_dir, "entity-history-gate", ["doc_history"])
    return pipe.state("doc_history").select(
        F.col("doc_id").alias("hist_key"),
        "entity_id",
        "change_type",
        "n_tok",
        "entity_source",
        "observed_version",
    )


_ENTITY_HISTORY_SQL = f"""
WITH {_CHANGELOG_CTE},
ev AS (
  SELECT * FROM changelog
  WHERE op IN ('I','U','D')
    AND (op = 'D' OR (tokens IS NOT NULL AND n_tok = len(tokens)))
),
mx AS (SELECT max(lsn) // 2 AS mid FROM ev),
s0 AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e, mx WHERE e.lsn <= mx.mid) WHERE rn = 1 AND op <> 'D'
),
s1 AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY doc_id ORDER BY stream_pos DESC) AS rn
    FROM ev e) WHERE rn = 1 AND op <> 'D'
),
hop2 AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         a.doc_id IS NOT NULL AS in0, b.doc_id IS NOT NULL AS in1,
         (a.stream_pos IS DISTINCT FROM b.stream_pos) AS changed,
         b.n_tok AS b_n_tok, b.source AS b_source
  FROM s0 a FULL OUTER JOIN s1 b ON a.doc_id = b.doc_id
)
SELECT doc_id || '@v00000001' AS hist_key, doc_id AS entity_id,
       'insert' AS change_type, n_tok, source AS entity_source,
       1 AS observed_version
FROM s0
UNION ALL
SELECT doc_id || '@v00000002', doc_id, 'insert', b_n_tok, b_source, 2
FROM hop2 WHERE in1 AND NOT in0
UNION ALL
SELECT doc_id || '@v00000002', doc_id, 'update_postimage', b_n_tok, b_source, 2
FROM hop2 WHERE in0 AND in1 AND changed
UNION ALL
SELECT doc_id || '@v00000002', doc_id, 'delete', NULL, NULL, 2
FROM hop2 WHERE in0 AND NOT in1
"""


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score (the CCNet-style LM filter's
    stand-in): per-doc mean negative log-probability under the corpus's
    own unigram distribution — boilerplate/common-word docs score low,
    rare-garbage docs score high; both tails get filtered.

    Exactness: counts are integers; log((total+V)/(count+1)) is one libm
    call on an exact ratio, summed per doc then rounded — same
    float-safety class as tfidf (no ranking rides on the float).

    Scale: corpus counts are one (word) agg; the doc-side join is on the
    word dim (heavy-tailed → AQE skew split); per-doc mean is a second
    agg. Three shuffles total, all map-side combined."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = d.select("doc_id", F.explode(X.words("text")).alias("word"))
    counts = w.groupBy("word").agg(F.count("*").alias("c"))
    tot_row = counts.agg(
        F.sum("c").alias("t"), F.count("*").alias("v")
    ).first()
    total, vocab = int(tot_row["t"]), int(tot_row["v"])
    nlp = F.log(F.lit(float(total + vocab)) / (F.col("c") + 1))
    return (
        w.join(counts, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.avg(nlp), 6).alias("mean_nlp"),
        )
    )


_UNIGRAM_SQL = """
WITH w AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS word
  FROM documents
),
c AS (SELECT word, count(*) AS c FROM w GROUP BY word),
t AS (SELECT sum(c) AS total, count(*) AS vocab FROM c)
SELECT w.doc_id, count(*) AS n_words,
       round(avg(ln((t.total + t.vocab)::DOUBLE / (c.c + 1))), 6) AS mean_nlp
FROM w JOIN c USING (word), t
GROUP BY w.doc_id
"""


_LANGID_TOP_K = 100


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-n-gram language ID (Cavnar-Trenkle profile ranking,
    the classic pre-neural langid and still the fastText fallback):
    train the top-K trigram profile per language on the labeled 80%
    split (doc_id % 5 != 0), then classify each held-out doc by summed
    rank weight (K+1-rank) of its distinct trigrams against each
    profile; argmax with deterministic (score DESC, lang ASC)
    tie-break. Integer scores end to end — hash-stable.

    Scale: profiles are tiny (n_langs × K rows) → broadcast to the
    doc-gram side; the gram explode is ~3 rows/char but reduces through
    a distinct and a map-side-combined sum before anything wide; the
    per-doc argmax window touches ≤ n_langs rows per doc. No UDF — the
    trigram explode is transform(sequence(...)) over substring, kept
    off the hot path (interpreted higher-order fn, acceptable in a
    batch profile job; the streaming hot paths use scalar accessors
    per the round-5 rule)."""
    from pyspark.sql import Window

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.length("text") >= 3
    )
    tri = F.expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
    )
    grams = d.select("doc_id", "lang", F.explode(tri).alias("tri"))
    K = _LANGID_TOP_K
    rankw = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tri"))
    prof = (
        grams.filter(F.col("doc_id") % 5 != 0)
        .groupBy("lang", "tri")
        .agg(F.count("*").alias("c"))
        .withColumn("rank", F.row_number().over(rankw))
        .filter(F.col("rank") <= K)
        .select("lang", "tri", (F.lit(K + 1) - F.col("rank")).cast("long").alias("weight"))
    )
    docg = (
        grams.filter(F.col("doc_id") % 5 == 0).select("doc_id", "tri").distinct()
    )
    scores = (
        docg.join(F.broadcast(prof), "tri")
        .groupBy("doc_id", "lang")
        .agg(F.sum("weight").alias("score"))
    )
    pick = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    return (
        scores.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "score")
    )


_LANGID_SQL = f"""
WITH g AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, length(text) - 2),
                               i -> substr(text, i, 3))) AS tri
  FROM documents WHERE length(text) >= 3
),
pc AS (
  SELECT lang, tri, count(*) AS c FROM g
  WHERE doc_id % 5 <> 0 GROUP BY lang, tri
),
prof AS (
  SELECT lang, tri,
         ({_LANGID_TOP_K} + 1 - row_number()
            OVER (PARTITION BY lang ORDER BY c DESC, tri))::BIGINT AS weight
  FROM pc
  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY c DESC, tri)
          <= {_LANGID_TOP_K}
),
dg AS (SELECT DISTINCT doc_id, tri FROM g WHERE doc_id % 5 = 0),
sc AS (
  SELECT dg.doc_id, prof.lang, sum(prof.weight)::BIGINT AS score
  FROM dg JOIN prof USING (tri) GROUP BY dg.doc_id, prof.lang
)
SELECT doc_id, lang AS pred_lang, score
FROM sc
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) = 1
"""


def dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduped-corpus OUTPUT: near-dup clustering's canonical
    representatives — one doc per duplicate cluster (the min doc id,
    which IS the component label), singletons kept as themselves. This
    is the row set a training run actually reads after dedup; the
    cluster sizes ride along as the dedup report.

    Edges require >= 2 shared LSH bands (the precision dial: one shared
    band at this corpus's tiny vocabulary connects nearly everything —
    band-count thresholding is the standard banded-LSH precision/recall
    trade)."""
    from blockchain_etl_spark.operators.dedup import connected_components

    pairs = dedup.minhash_lsh_pairs(spark, sf_dir).filter(
        F.col("n_shared_bands") >= 2
    )
    nodes = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("node"))
    )
    comp = connected_components(pairs, nodes=nodes)
    sizes = comp.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        comp.filter(F.col("node") == F.col("label"))
        .join(sizes, "label")
        .select(F.col("node").alias("doc_id"), "cluster_size")
    )


def _dedup_keeplist_sql(num_hashes: int = 8, bands: int = 4, sample_mod: int = 5) -> str:
    return f"""
WITH RECURSIVE {_minhash_banded_cte(num_hashes, bands, sample_mod)},
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
esym AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id % {sample_mod} = 0
  UNION
  SELECT e.x, reach.r FROM reach JOIN esym e ON e.y = reach.node
),
comp AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
sizes AS (SELECT label, count(*) AS cluster_size FROM comp GROUP BY label)
SELECT node AS doc_id, cluster_size
FROM comp JOIN sizes USING (label) WHERE node = label
"""


_SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}


def corpus_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment + per-(source, split)
    counts — the split step every training pipeline runs after dedup
    and filtering. A row's split is a pure function of its key (md5
    hash ranges), so re-runs and backfills agree with no coordination
    and documents never migrate between splits as other data changes —
    the leakage-safety property the decontamination ops assume."""
    from blockchain_etl_spark.operators.sampling import assign_splits

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = assign_splits(d.select("doc_id", "source"), _SPLIT_FRACTIONS)
    return out.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc")
    )


def _corpus_splits_sql() -> str:
    names = sorted(_SPLIT_FRACTIONS)
    cases, lo = [], 0
    for n in names[:-1]:
        lo += int(_SPLIT_FRACTIONS[n] * 10000)
        cases.append(f"WHEN h < {lo} THEN '{n}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"""
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8))::BIGINT
           % 10000 AS h
  FROM documents
)
SELECT source, {case} AS split, count(*) AS n_docs, min(doc_id) AS min_doc
FROM h GROUP BY 1, 2
"""


def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length quartiles + counts — the distribution
    profile corpus reports lead with (length filters are set from these
    numbers). EXACT percentiles (Spark ``percentile`` = linear
    interpolation = DuckDB ``quantile_cont``, bit-identical on integer
    inputs — verified, not assumed).

    Scale note: exact percentile is a full sort per group — fine for
    per-source profiling (few groups, heavy combine); at 10^10 rows per
    group switch to ``percentile_approx`` (t-digest) and drop the
    oracle row to a tolerance check."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = F.size(X.words("text"))
    return (
        d.select("source", n.alias("n_words"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.percentile("n_words", F.lit(0.25)), 6).alias("q25"),
            F.round(F.percentile("n_words", F.lit(0.5)), 6).alias("q50"),
            F.round(F.percentile("n_words", F.lit(0.75)), 6).alias("q75"),
            F.max("n_words").alias("max_words"),
        )
    )


_LENGTH_QUANTILES_SQL = """
WITH n AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_words
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(quantile_cont(n_words, 0.25), 6) AS q25,
       round(quantile_cont(n_words, 0.5), 6) AS q50,
       round(quantile_cont(n_words, 0.75), 6) AS q75,
       max(n_words)::INT AS max_words
FROM n GROUP BY source
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

# NOTE on ordering: the round driver verifies only the FIRST 50 entries of
# this dict against the DuckDB oracle (CORRECTNESS_r{N}).  Rows that have
# never had a driver-verified round — plus rows new this round — are placed
# inside the 50-entry window; rows that have been driver-green for 2+
# consecutive rounds rotate to the tail (they stay covered by the local
# parity suite in tests/test_catalog_parity.py, which runs ALL entries).
QUERIES: dict[str, callable] = {
    # ---- driver window (first 50), r6 rotation: flagship pinned;
    # the 3 rows new this round take their first driver check; the 10
    # r5-continuation rows (kmv_policy_table ... scd2_asof_pipeline)
    # stay for a second driver round per the r5 verdict; the remaining
    # 36 slots go to the longest-driver-unverified block (last driver
    # check r4 — running_balance ... rule_label_alert). Rows driver-
    # green in r5 rotate to the tail; the local parity suite still
    # covers every row each round.
    "cdc_replay_final_state": cdc_replay_final_state,
    "nft_orderbook_priced": nft_orderbook_priced,
    "origin_listings": origin_listings,
    "origin_shop_products": origin_shop_products,
    "address_profile": address_profile,
    "kmv_policy_table": kmv_policy_table,
    "hist_policy_table": hist_policy_table,
    "unigram_mv": unigram_mv,
    "reorg_agg_mv": reorg_agg_mv,
    "debezium_decode": debezium_decode,
    "maxwell_decode": maxwell_decode,
    "partitioned_tail_state": partitioned_tail_state,
    "minmax_agg_mv": minmax_agg_mv,
    "topk_agg_mv": topk_agg_mv,
    "clustered_scan": clustered_scan,
    "chunk_retention": chunk_retention,
    "backfill_gap_fill": backfill_gap_fill,
    "wap_publish_table": wap_publish_table,
    "gapfill_locf": gapfill_locf,
    "gapfill_interp": gapfill_interp,
    "time_weighted_avg": time_weighted_avg,
    "pipeline_snapshot": pipeline_snapshot,
    "scd2_asof_pipeline": scd2_asof_pipeline,
    "running_balance": relational.running_balance,
    "item_id_stamping": relational.item_id_stamping,
    "flatten_list_fields": relational.flatten_list_fields,
    "hex_decode": relational.hex_decode,
    "explode_tokens": explode_tokens,
    "decimal_vsum": decimal_vsum,
    "exact_dedup": dedup.exact_dedup,
    "text_quality": text_quality,
    "token_counts": token_counts,
    "doc_fingerprints": doc_fingerprints,
    "entity_pipeline": entity_pipeline,
    "entity_chunks": entity_chunks,
    "embedding_near_dup": similarity.embedding_near_dup,
    "brute_topk": similarity.brute_topk,
    "ann_lsh_topk": similarity.ann_lsh_topk,
    "ann_ivf_topk": similarity.ann_ivf_topk,
    "binary_features": multimodal.binary_features,
    "kmeans_refine": similarity.kmeans_refine,
    "dedup_components": dedup_components,
    "tfidf_terms": tfidf_terms,
    "source_overlap": source_overlap,
    "length_quantiles": length_quantiles,
    "unigram_logprob": unigram_logprob,
    "dedup_keeplist": dedup_keeplist,
    "domain_mixture": domain_mixture,
    "corpus_splits": corpus_splits,
    "windowed_stream_counts": windowed_stream_counts,
    "stream_dedup": stream_dedup,
    "track_frontier": track_frontier,
    "cdc_changelog_stats": cdc_changelog_stats,
    "table_changes": table_changes,
    "tokenize_docs": tokenize_docs,
    "broadcast_dim_join": relational.broadcast_dim_join,
    "trace_status": trace_status,
    "rule_engine_filter": rule_engine_filter,
    "rule_label_alert": rule_label_alert,
    # ---- next in line for the r7 window (driver-last-seen r4) ----
    "erc1155_batch_decode": erc1155_batch_decode,
    "erc721_transfer_extract": erc721_transfer_extract,
    "cryptopunk_transfer_extract": cryptopunk_transfer_extract,
    "utxo_enrich": utxo_enrich,
    "utxo_block_scan": utxo_block_scan,
    "call_tree_flatten": call_tree_flatten,
    "contract_classify": contract_classify,
    "extract_tokens": extract_tokens,
    "receipt_missing_fill": receipt_missing_fill,
    "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
    "simhash_buckets": dedup.simhash_buckets,
    "simhash_near_pairs": dedup.simhash_near_pairs,
    "ngram_jaccard_blocks": dedup.ngram_jaccard_blocks,
    "token_chunking": token_chunking,
    "sequence_packing": sequence_packing,
    "ngram_decontaminate": ngram_decontaminate,
    "repetition_ratio": repetition_ratio,
    "corpus_prepare": corpus_prepare,
    "srp_bucket_histogram": similarity.srp_bucket_histogram,
    "stratified_sample": stratified_sample,
    "entity_history": entity_history,
    "frame_sample": multimodal.frame_sample,
    "resize_bytes": multimodal.resize_bytes,
    # ---- tail: driver-green r5 ----
    "nft_orderbook": nft_orderbook,
    "balance_pipeline": balance_pipeline,
    "bpe_encode": bpe_encode,
    "holder_policy_table": holder_policy_table,
    "minmax_policy_table": minmax_policy_table,
    "nft_tokenid_stats": nft_tokenid_stats,
    "pii_redact": pii_redact,
    "lsh_index_probe": dedup.lsh_index_probe,
    "entity_band_index": entity_band_index,
    "global_shuffle": global_shuffle,
    "curriculum_order": curriculum_order,
    "sessionize": sessionize,
    "session_window_native": session_window_native,
    "lang_id_ngram": lang_id_ngram,
    "incremental_agg_mv": incremental_agg_mv,
    "incremental_distinct_mv": incremental_distinct_mv,
    "incremental_join_mv": incremental_join_mv,
    "nm_join_mv": nm_join_mv,
    "join_agg_cascade_mv": join_agg_cascade_mv,
    "left_join_mv": left_join_mv,
    "full_outer_join_mv": full_outer_join_mv,
    "asof_join_mv": asof_join_mv,
    "range_join_mv": range_join_mv,
    "hypertable_rollup_mv": hypertable_rollup_mv,
    "length_histogram_mv": length_histogram_mv,
    "holder_detail_agg": relational.holder_detail_agg,
    "asof_lookup": relational.asof_lookup,
    "full_outer_sendrecv": relational.full_outer_sendrecv,
    "incremental_source_stats": relational.incremental_source_stats,
    "dedup_checker_invariant": relational.dedup_checker_invariant,
    "log_transfer_extract": log_transfer_extract,
    "trace_union_synthetic": trace_union_synthetic,
    "join_mismatch_diagnostics": relational.join_mismatch_diagnostics,
    "enrich_join": relational.enrich_join,
    "missing_anti_join": relational.missing_anti_join,
    "prev_event_join": relational.prev_event_join,
    "tpch_q1": relational.tpch_q1,
    "partition_rank": relational.partition_rank,
    "topk_per_group": relational.topk_per_group,
}


def _planes_sql_literal() -> str:
    planes = similarity.srp_planes()
    return (
        "["
        + ", ".join("[" + ", ".join(f"{x!r}" for x in p) + "]::DOUBLE[]" for p in planes)
        + "]"
    )


def _srp_bucket_sql_expr(vec: str, planes: list[list[float]] | None = None) -> str:
    if planes is None:
        planes = similarity.srp_planes()
    terms = []
    for p in planes:
        lit = "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec}::DOUBLE[], {lit}) "
            f">= 0 THEN 1 ELSE 0 END)"
        )
    # fold bits MSB-first: b0*2^(n-1) + ...
    n = len(terms)
    parts = [f"{t} * {2 ** (n - 1 - i)}" for i, t in enumerate(terms)]
    return "(" + " + ".join(parts) + ")"


def oracle_sqls() -> dict[str, str]:
    bucket = _srp_bucket_sql_expr("embedding")
    return {
        "cdc_replay_final_state": _CDC_FINAL_SQL,
        "cdc_changelog_stats": _CDC_STATS_SQL,
        "table_changes": _TABLE_CHANGES_SQL,
        "entity_pipeline": _ENTITY_PIPELINE_SQL,
        "entity_chunks": _entity_chunks_sql(8),
        "entity_history": _ENTITY_HISTORY_SQL,
        "tokenize_docs": _TOKENIZE_SQL,
        "enrich_join": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   o_custkey AS cust_key, o_orderdate AS order_date
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """,
        "broadcast_dim_join": """
            SELECT r_name AS region, n_name AS nation,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "missing_anti_join": """
            SELECT o_orderkey FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        """,
        "join_mismatch_diagnostics": """
            WITH o AS (SELECT DISTINCT o_orderkey AS k FROM orders),
                 li AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
                 d AS (
                   SELECT k, 'left_only' AS side FROM o
                   WHERE k NOT IN (SELECT k FROM li)
                   UNION ALL
                   SELECT k, 'right_only' AS side FROM li
                   WHERE k NOT IN (SELECT k FROM o)
                 )
            SELECT side, count(*) AS n_keys, min(k) AS min_key, max(k) AS max_key
            FROM d GROUP BY side
        """,
        "full_outer_sendrecv": """
            WITH send AS (
              SELECT user_id, round(sum(value), 2) AS out_value, count(*) AS out_cnt
              FROM events WHERE event_type = 'purchase' GROUP BY user_id
            ),
            recv AS (
              SELECT user_id, round(sum(value), 2) AS in_value, count(*) AS in_cnt
              FROM events WHERE event_type = 'signup' GROUP BY user_id
            )
            SELECT coalesce(send.user_id, recv.user_id) AS user_id,
                   coalesce(out_value, 0.0) AS out_value,
                   coalesce(out_cnt, 0) AS out_cnt,
                   coalesce(in_value, 0.0) AS in_value,
                   coalesce(in_cnt, 0) AS in_cnt
            FROM send FULL OUTER JOIN recv ON send.user_id = recv.user_id
        """,
        "prev_event_join": """
            SELECT event_id, user_id, round(value, 2) AS value,
                   round(lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2)
                     AS prev_value,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                     AS prev_type
            FROM events
        """,
        "holder_detail_agg": """
            SELECT l_suppkey AS supp_key,
                   count(DISTINCT l_orderkey) AS n_orders,
                   round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n_items,
                   arg_min(l_orderkey,
                           strftime(l_shipdate, '%Y%m%d') || lpad(l_orderkey::VARCHAR, 10, '0')
                             || lpad(l_linenumber::VARCHAR, 4, '0')) AS first_order,
                   arg_max(l_orderkey,
                           strftime(l_shipdate, '%Y%m%d') || lpad(l_orderkey::VARCHAR, 10, '0')
                             || lpad(l_linenumber::VARCHAR, 4, '0')) AS last_order,
                   strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
                   strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship
            FROM lineitem GROUP BY l_suppkey
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                     AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "dedup_checker_invariant": """
            SELECT event_type,
                   count(event_id) AS n,
                   count(DISTINCT event_id) AS n_distinct,
                   max(event_id) - min(event_id) + 1 AS range_span
            FROM events GROUP BY event_type
        """,
        "incremental_source_stats": """
            SELECT event_type,
                   min(event_id) AS first_lsn,
                   max(event_id) AS last_lsn,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type
        """,
        "partition_rank": """
            SELECT event_id, user_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rank,
                   count(*) OVER (PARTITION BY user_id) AS rank_count
            FROM events
        """,
        "topk_per_group": """
            SELECT user_id, event_id, round(value, 2) AS value, rk
            FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rk
              FROM events
            ) WHERE rk <= 3
        """,
        "running_balance": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         2) AS running_value
            FROM events
        """,
        "asof_lookup": """
            SELECT user_id,
                   max(event_id) AS asof_event_id,
                   round(arg_max(value, event_id), 2) AS asof_value,
                   arg_max(event_type, event_id) AS asof_type
            FROM events WHERE event_id <= 500 GROUP BY user_id
        """,
        "item_id_stamping": """
            SELECT event_id,
                   md5('event' || '_' || event_id::VARCHAR || '_' || event_type) AS item_id,
                   strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS item_timestamp
            FROM events
        """,
        "flatten_list_fields": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
              FROM documents
            )
            SELECT doc_id,
                   words[1] AS word0, words[2] AS word1,
                   words[3] AS word2, words[4] AS word3,
                   len(words)::INT AS n_words,
                   array_to_string(list_slice(words, 1, 4), ',') AS first4_joined
            FROM w
        """,
        "hex_decode": """
            SELECT event_id,
                   substr(md5(event_id::VARCHAR), 1, 12) AS hex_str,
                   ('0x' || substr(md5(event_id::VARCHAR), 1, 12))::BIGINT AS dec_value
            FROM events
        """,
        "exact_dedup": """
            WITH u AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text
              FROM documents WHERE doc_id % 7 = 0
            )
            SELECT md5(text) AS content_hash,
                   min(doc_id) AS keep_doc_id,
                   count(*) AS n_dups
            FROM u GROUP BY md5(text) HAVING count(*) > 1
        """,
        "minhash_lsh_pairs": _minhash_sql(),
        "simhash_buckets": _simhash_sql(),
        "simhash_near_pairs": _simhash_near_pairs_sql(),
        "ngram_jaccard_blocks": _ngram_jaccard_sql(),
        "trace_status": _TRACE_STATUS_SQL,
        "rule_engine_filter": _RULE_FILTER_SQL,
        "rule_label_alert": _RULE_LABEL_SQL,
        "track_frontier": _TRACK_FRONTIER_SQL,
        "windowed_stream_counts": _WINDOWED_STREAM_SQL,
        "stream_dedup": _STREAM_DEDUP_SQL,
        "kmeans_refine": _KMEANS_SQL,
        "dedup_components": _dedup_components_sql(),
        "tfidf_terms": _TFIDF_SQL,
        "source_overlap": _SOURCE_OVERLAP_SQL,
        "length_quantiles": _LENGTH_QUANTILES_SQL,
        "unigram_logprob": _UNIGRAM_SQL,
        "dedup_keeplist": _dedup_keeplist_sql(),
        "pii_redact": _PII_REDACT_SQL,
        "stratified_sample": _sample_sql(),
        "domain_mixture": _mixture_sql(),
        "lsh_index_probe": _lsh_probe_sql(),
        "entity_band_index": _entity_band_index_sql(),
        "global_shuffle": _GLOBAL_SHUFFLE_SQL,
        "curriculum_order": _CURRICULUM_SQL,
        "sessionize": _SESSIONIZE_SQL,
        "session_window_native": _SESSION_WINDOW_NATIVE_SQL,
        "lang_id_ngram": _LANGID_SQL,
        "incremental_agg_mv": _AGG_MV_SQL,
        "incremental_distinct_mv": _DISTINCT_MV_SQL,
        "incremental_join_mv": _JOIN_MV_SQL,
        "nm_join_mv": _NM_JOIN_MV_SQL,
        "join_agg_cascade_mv": _JOIN_AGG_CASCADE_SQL,
        "left_join_mv": _LEFT_JOIN_MV_SQL,
        "full_outer_join_mv": _FULL_OUTER_JOIN_MV_SQL,
        "asof_join_mv": _ASOF_JOIN_MV_SQL,
        "range_join_mv": _RANGE_JOIN_MV_SQL,
        "hypertable_rollup_mv": _HYPERTABLE_ROLLUP_SQL,
        "gapfill_locf": _GAPFILL_LOCF_SQL,
        "gapfill_interp": _GAPFILL_INTERP_SQL,
        "time_weighted_avg": _TIME_WEIGHTED_AVG_SQL,
        "pipeline_snapshot": _PIPELINE_SNAPSHOT_SQL,
        "scd2_asof_pipeline": _SCD2_ASOF_SQL,
        "length_histogram_mv": _LEN_HIST_MV_SQL,
        "unigram_mv": _UNIGRAM_MV_SQL,
        "reorg_agg_mv": _REORG_AGG_MV_SQL,
        "debezium_decode": _DEBEZIUM_DECODE_SQL,
        "maxwell_decode": _MAXWELL_DECODE_SQL,
        "partitioned_tail_state": _CDC_FINAL_SQL,
        "minmax_agg_mv": _MINMAX_AGG_MV_SQL,
        "topk_agg_mv": _TOPK_AGG_MV_SQL,
        "minmax_policy_table": _MINMAX_POLICY_SQL,
        "kmv_policy_table": _kmv_policy_sql(),
        "hist_policy_table": _hist_policy_sql(),
        "clustered_scan": _CLUSTERED_SCAN_SQL,
        "chunk_retention": _CHUNK_RETENTION_SQL,
        "backfill_gap_fill": _BACKFILL_SQL,
        "wap_publish_table": _WAP_PUBLISH_SQL,
        "corpus_splits": _corpus_splits_sql(),
        "explode_tokens": _EXPLODE_TOKENS_SQL,
        "decimal_vsum": _DECIMAL_VSUM_SQL,
        "log_transfer_extract": _LOG_TRANSFER_SQL,
        "erc1155_batch_decode": _ERC1155_SQL,
        "erc721_transfer_extract": _ERC721_SQL,
        "cryptopunk_transfer_extract": _CRYPTOPUNK_SQL,
        "nft_orderbook": _NFT_ORDERBOOK_SQL,
        "nft_orderbook_priced": _NFT_ORDERBOOK_PRICED_SQL,
        "origin_listings": _ORIGIN_LISTINGS_SQL,
        "origin_shop_products": _ORIGIN_SHOP_SQL,
        "address_profile": _ADDRESS_PROFILE_SQL,
        "balance_pipeline": _BALANCE_PIPELINE_SQL,
        "bpe_encode": _bpe_sql(),
        "holder_policy_table": _HOLDER_POLICY_SQL,
        "nft_tokenid_stats": _NFT_TOKENID_SQL,
        "utxo_enrich": _UTXO_ENRICH_SQL,
        "utxo_block_scan": _UTXO_BLOCK_SCAN_SQL,
        "call_tree_flatten": _CALL_TREE_SQL,
        "contract_classify": _contract_classify_sql(),
        "extract_tokens": _EXTRACT_TOKENS_SQL,
        "trace_union_synthetic": _TRACE_UNION_SQL,
        "receipt_missing_fill": _RECEIPT_FILL_SQL,
        "text_quality": _TEXT_QUALITY_SQL,
        "token_counts": _TOKEN_COUNTS_SQL,
        "doc_fingerprints": _FINGERPRINT_SQL,
        "token_chunking": _TOKEN_CHUNK_SQL,
        "sequence_packing": _SEQUENCE_PACK_SQL,
        "ngram_decontaminate": _DECONTAMINATE_SQL,
        "repetition_ratio": _REPETITION_SQL,
        "corpus_prepare": _CORPUS_PREPARE_SQL,
        "brute_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
            scored AS (
              SELECT query_id, neighbor_id,
                     round(list_dot_product(qv, cv) / (sqrt(list_sum(list_transform(qv, v -> v * v))) * sqrt(list_sum(list_transform(cv, v -> v * v)))), 6)
                       AS sim
              FROM c CROSS JOIN q WHERE query_id <> neighbor_id
            )
            SELECT query_id, neighbor_id, sim, rk FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rk
              FROM scored
            ) WHERE rk <= 10
        """,
        "srp_bucket_histogram": f"""
            SELECT {bucket} AS bucket, count(*) AS n_vecs, min(vec_id) AS min_vec_id
            FROM embeddings GROUP BY 1
        """,
        "ann_lsh_topk": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket
                       FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_dot_product(q.qv, e.v) / (sqrt(list_sum(list_transform(q.qv, v -> v * v))) * sqrt(list_sum(list_transform(e.v, v -> v * v)))), 6)
                       AS sim
              FROM e JOIN q ON e.bucket = q.bucket WHERE q.query_id <> e.vec_id
            )
            SELECT query_id, neighbor_id, sim, rk FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rk
              FROM scored
            ) WHERE rk <= 10
        """,
        "ann_ivf_topk": f"""
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v,
                     list_transform(embedding::DOUBLE[],
                                    x -> floor(x * 1000000)::BIGINT) AS iv
              FROM embeddings
            ),
            cents AS (
              SELECT vec_id - {similarity.IVF_CENTROID_BASE} AS cid, iv AS civ
              FROM e WHERE vec_id >= {similarity.IVF_CENTROID_BASE}
                AND vec_id < {similarity.IVF_CENTROID_BASE + similarity.IVF_N_CENTROIDS}
            ),
            sa AS (
              SELECT e.vec_id, e.v, cents.cid,
                     list_sum(list_transform(generate_series(1, len(e.iv)),
                                             i -> e.iv[i] * cents.civ[i]))::BIGINT
                       AS cdot
              FROM e CROSS JOIN cents
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cdot DESC, cid) AS crk
              FROM sa
            ),
            assign AS (SELECT vec_id, v, cid FROM ranked WHERE crk <= 1),
            probes AS (
              SELECT vec_id AS query_id, v AS qv, cid FROM ranked
              WHERE vec_id < 5 AND crk <= {similarity.IVF_NPROBE}
            ),
            scored AS (
              SELECT query_id, a.vec_id AS neighbor_id,
                     max(round(list_dot_product(qv, a.v) / (sqrt(list_sum(list_transform(qv, x -> x * x))) * sqrt(list_sum(list_transform(a.v, x -> x * x)))), 6))
                       AS sim
              FROM assign a JOIN probes p ON a.cid = p.cid
              WHERE p.query_id <> a.vec_id
              GROUP BY query_id, a.vec_id
            )
            SELECT query_id, neighbor_id, sim, rk FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id) AS rk
              FROM scored
            ) WHERE rk <= 10
        """,
        "embedding_near_dup": _embedding_near_dup_sql(),
        "binary_features": """
            SELECT doc_id,
                   length(text)::INT AS n_bytes,
                   ascii(substr(text, 1, 1)) AS first_byte,
                   ascii(substr(text, length(text), 1)) AS last_byte,
                   list_reduce(list_transform(generate_series(1, length(text)),
                                              i -> ascii(substr(text, i, 1))::BIGINT),
                               (a, b) -> a + b) AS byte_sum
            FROM documents
        """,
        # frame sampling twin: every 3rd 32-byte chunk; byte == ascii code
        # because the synthetic corpus is ASCII (same assumption as
        # binary_features above)
        "frame_sample": """
            WITH d AS (
              SELECT doc_id, text, length(text) AS n,
                     ((length(text) + 31) // 32)::INT AS n_frames
              FROM documents
            )
            SELECT doc_id, frame_idx::INT AS frame_idx, n_frames,
                   list_reduce(
                     list_transform(
                       generate_series(1 + frame_idx * 32,
                                       least((frame_idx + 1) * 32, n)),
                       i -> ascii(substr(text, i::INT, 1))::BIGINT),
                     (a, b) -> a + b) AS frame_checksum
            FROM d, unnest(range(0, n_frames, 3)) AS t(frame_idx)
        """,
        "resize_bytes": """
            SELECT doc_id, length(text)::INT AS n_bytes,
                   CASE WHEN length(text) = 0 THEN 0 ELSE
                     list_reduce(
                       list_transform(generate_series(0, 15),
                         i -> ascii(substr(text,
                                ((i * length(text)) // 16 + 1)::INT, 1))::BIGINT),
                       (a, b) -> a + b) END AS resized_checksum
            FROM documents
        """,
    }


def _minhash_banded_cte(num_hashes: int, bands: int, sample_mod: int) -> str:
    """Shared CTE body: documents → k=1 shingles → ONE md5 base hash per
    shingle → per-seed integer-mix minhash (exact twin of
    dedup.minhash_banded) → (doc_id, band, bucket)."""
    from blockchain_etl_spark.functions.text import _MH_MOD, minhash_coeffs

    rows = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes)
    mins = ",\n                 ".join(
        f"min(({a} * h + {b}) % {_MH_MOD}) AS m{s}"
        for s, (a, b) in enumerate(coeffs)
    )
    band_rows = "\n          UNION ALL ".join(
        "SELECT doc_id, {bnd} AS band, md5({expr}) AS bucket FROM sig".format(
            bnd=bnd,
            expr=" || '|' || ".join(
                f"m{bnd * rows + r}::VARCHAR" for r in range(rows)
            ),
        )
        for bnd in range(bands)
    )
    return f"""
        d AS (
          SELECT doc_id, source, lang,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
          FROM documents WHERE doc_id % {sample_mod} = 0
        ),
        shing AS (
          SELECT doc_id, source, lang,
                 CASE WHEN len(words) >= 1 THEN
                   list_transform(generate_series(0, len(words) - 1),
                                  i -> array_to_string(list_slice(words, i + 1, i + 1), ' '))
                 ELSE [array_to_string(words, ' ')] END AS shingles,
                 list_distinct(words) AS wset
          FROM d
        ),
        w AS (
          SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT % {_MH_MOD} AS h
          FROM (SELECT doc_id, unnest(shingles) AS g FROM shing)
        ),
        sig AS (
          SELECT doc_id,
                 {mins}
          FROM w GROUP BY doc_id
        ),
        banded AS (
          {band_rows}
        )"""


def _minhash_sql(num_hashes: int = 8, bands: int = 4, sample_mod: int = 5) -> str:
    return f"""
        WITH {_minhash_banded_cte(num_hashes, bands, sample_mod)}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    """


def _lsh_probe_sql(
    num_hashes: int = 8, bands: int = 4, sample_mod: int = 3, batch_mod: int = 10
) -> str:
    bm = sample_mod * batch_mod
    return f"""
        WITH {_minhash_banded_cte(num_hashes, bands, sample_mod)}
        SELECT a.doc_id AS new_doc, b.doc_id AS dup_doc,
               count(*) AS n_shared_bands
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id % {bm} = 0 AND b.doc_id % {bm} <> 0
        GROUP BY a.doc_id, b.doc_id
    """


def _embedding_near_dup_sql(n_bands: int = 2) -> str:
    planes = similarity.srp_planes(similarity.N_PLANES * n_bands)
    band_selects = []
    for b in range(n_bands):
        expr = _srp_bucket_sql_expr(
            "embedding", planes[b * similarity.N_PLANES : (b + 1) * similarity.N_PLANES]
        )
        band_selects.append(
            f"SELECT vec_id, iv, nrm, {b} AS band, {expr} AS bucket FROM e"
        )
    banded = "\n              UNION ALL ".join(band_selects)
    return f"""
        WITH e AS (
          SELECT vec_id, embedding,
                 list_transform(embedding::DOUBLE[], x -> floor(x * 1000000)::BIGINT) AS iv,
                 list_sum(list_transform(
                   list_transform(embedding::DOUBLE[], x -> floor(x * 1000000)::BIGINT),
                   x -> x * x))::BIGINT AS nrm
          FROM embeddings
        ),
        banded AS (
              {banded}
        ),
        pairs AS (
          SELECT a.band, a.bucket,
                 list_sum(list_transform(generate_series(1, len(a.iv)),
                                         i -> a.iv[i] * b.iv[i]))::BIGINT AS dot,
                 a.nrm AS na, b.nrm AS nb
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
        SELECT band, bucket, count(*) AS n_pairs,
               sum(CASE WHEN dot > 0
                         AND 100 * (dot::HUGEINT * dot) >= 81 * (na::HUGEINT * nb)
                        THEN 1 ELSE 0 END)::BIGINT AS n_near_dups,
               max(dot) AS max_dot
        FROM pairs GROUP BY band, bucket
    """


def _ngram_jaccard_sql(num_hashes: int = 8, bands: int = 4, sample_mod: int = 10) -> str:
    return f"""
        WITH {_minhash_banded_cte(num_hashes, bands, sample_mod)},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        p AS (
          SELECT da.source, da.lang,
                 len(list_intersect(da.wset, db.wset)) AS inter,
                 len(list_distinct(da.wset || db.wset)) AS uni
          FROM cand
          JOIN shing da ON da.doc_id = cand.doc_a
          JOIN shing db ON db.doc_id = cand.doc_b
        )
        SELECT source, lang,
               count(*) AS n_pairs,
               sum(CASE WHEN 2 * inter >= uni THEN 1 ELSE 0 END)::BIGINT AS n_near_dups,
               sum(inter)::BIGINT AS sum_intersect,
               sum(uni)::BIGINT AS sum_union
        FROM p GROUP BY source, lang
    """


def _simhash_near_pairs_sql(radius: int = 3, sample_mod: int = 2) -> str:
    return f"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
          FROM documents WHERE doc_id % {sample_mod} = 0
        ),
        sh AS (
          SELECT doc_id,
                 list_reduce(list_transform(generate_series(0, 31), j ->
                   CASE WHEN list_reduce(list_transform(words, ft ->
                          CASE WHEN (('0x' || substr(md5(ft), j // 4 + 1, 1))::INT
                                     // (2 ** (3 - j % 4))::INT) % 2 = 1
                               THEN 1 ELSE -1 END),
                          (a, b) -> a + b) > 0
                        THEN (2::BIGINT ** (31 - j))::BIGINT ELSE 0 END),
                   (a, b) -> a + b) AS sh_hi,
                 list_reduce(list_transform(generate_series(32, 63), j ->
                   CASE WHEN list_reduce(list_transform(words, ft ->
                          CASE WHEN (('0x' || substr(md5(ft), j // 4 + 1, 1))::INT
                                     // (2 ** (3 - j % 4))::INT) % 2 = 1
                               THEN 1 ELSE -1 END),
                          (a, b) -> a + b) > 0
                        THEN (2::BIGINT ** (63 - j))::BIGINT ELSE 0 END),
                   (a, b) -> a + b) AS sh_lo
          FROM w
        ),
        blocked AS (
          SELECT doc_id, sh_hi, sh_lo, b.blk,
                 CASE b.blk
                   WHEN 0 THEN sh_lo & 65535
                   WHEN 1 THEN (sh_lo >> 16) & 65535
                   WHEN 2 THEN sh_hi & 65535
                   ELSE (sh_hi >> 16) & 65535
                 END AS val
          FROM sh, (SELECT unnest([0, 1, 2, 3]) AS blk) b
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          a.sh_hi AS ha_hi, a.sh_lo AS ha_lo,
                          b.sh_hi AS hb_hi, b.sh_lo AS hb_lo
          FROM blocked a JOIN blocked b
            ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               (bit_count(xor(ha_hi, hb_hi)) + bit_count(xor(ha_lo, hb_lo)))::INT
                   AS hamming
        FROM pairs
        WHERE bit_count(xor(ha_hi, hb_hi)) + bit_count(xor(ha_lo, hb_lo))
              <= {radius}
    """


def _simhash_sql() -> str:
    return """
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 list_reduce(list_transform(generate_series(0, 31), j ->
                   CASE WHEN list_reduce(list_transform(words, ft ->
                          CASE WHEN (('0x' || substr(md5(ft), j // 4 + 1, 1))::INT
                                     // (2 ** (3 - j % 4))::INT) % 2 = 1
                               THEN 1 ELSE -1 END),
                          (a, b) -> a + b) > 0
                        THEN (2::BIGINT ** (31 - j))::BIGINT ELSE 0 END),
                   (a, b) -> a + b) AS simhash
          FROM w
        )
        SELECT simhash, count(*) AS n_docs, min(doc_id) AS keep_doc_id
        FROM sh GROUP BY simhash
    """
