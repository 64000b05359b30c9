"""Incrementally-maintained GROUP-BY aggregate (a materialized view
over the table's change feed) — the differential-dataflow shape:
every CDF row becomes a SIGNED delta (+1 for insert/update_postimage,
-1 for delete/update_preimage), deltas are pre-aggregated per group,
and the destination is a column-merge-policy table whose ``add`` fold
accumulates them across hops. Retractions come for free: an update
that MOVES a row between groups emits -1 at the old group and +1 at
the new one; a delete subtracts the preimage's measures.

This is the capability the reference's downstream count/stats tables
imply (each consumer re-aggregating its upstream Postgres table; ≙
blockchainetl/streaming consumer loop + postgres_hooks counters) but
incremental: a hop costs O(changed rows in the version range) — never
a rescan of the source — and composes with every engine guarantee
through ``CascadeTailer`` (exactly-once per version range via the
ledger, crash-safe cursor in the commit lineage, OCC).

Sequencing: each hop's delta events carry lsn = the upstream
``to_version`` (the cascade version-domain rule) and seq 0 — hop
ranges never overlap (ledger-recovered cursor), so the destination's
monotonic guard sees strictly increasing lsns per group.

Engine convention: the key column of every engine-applied table is
NAMED ``doc_id`` (values arbitrary — here the group value); the MV
follows it, and ``mv_state`` aliases the key back to the group name.

Groups whose lifetime count returns to zero stay as zero-valued rows
in the hop itself (the fold cannot know "this group is gone" without
reading the MV — and MUST not, or the hop would cost O(MV));
``mv_state`` filters them on read, the same way tombstones are
filtered. Tables created with ``zset=True`` additionally GC those dead
groups at COMPACTION (``zset_col`` — the physical size then tracks
live groups, not all-time groups, under churn), which is safe exactly
when ``n_rows > 0`` is the group's liveness and downstream consumers
use liveness/weighted algebra.

Scale: the delta aggregation is one map-side-combined shuffle on the
group key over the hop's change rows; hot groups partial-aggregate
before the exchange. The MV apply is a blind MOR delta append —
O(groups touched this hop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_GROUP = "(null)"


def changes_to_agg_deltas(
    changes: DataFrame,
    group_col: str,
    measures: dict[str, str] | None = None,
    *,
    lsn: int,
) -> DataFrame:
    """CDF rows → one signed policy-fold delta event per touched group.

    ``measures`` maps output column -> source column summed (as long)
    with the sign; the row count delta ``n_rows`` is always emitted.
    ``group_col`` may be any SQL EXPRESSION over the source's columns
    (e.g. ``"n_tok DIV 8"`` for a histogram MV) — a derived group is
    recomputed identically on pre- and post-images, so retraction
    algebra is unaffected. Null group values fold into the
    ``NULL_GROUP`` sentinel (a string key column cannot hold a null
    key). Net-zero groups (e.g. an update that stays within its group)
    are dropped before the apply.
    """
    measures = measures or {}
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    # a measure source may be any SQL EXPRESSION over the row (e.g.
    # "n_tok * n_tok" for a sum-of-squares — with sum and n_rows that
    # is a maintained VARIANCE); expressions evaluate identically on
    # pre- and post-images, so retraction algebra is unaffected
    aggs = [F.sum(sign).cast("long").alias("n_rows")] + [
        F.sum(sign * F.coalesce(F.expr(src).cast("long"), F.lit(0)))
        .cast("long")
        .alias(out)
        for out, src in measures.items()
    ]
    g = (
        changes.groupBy(
            F.coalesce(F.expr(group_col).cast("string"), F.lit(NULL_GROUP)).alias(
                "doc_id"
            )
        )
        .agg(*aggs)
    )
    nonzero = F.col("n_rows") != 0
    for out in measures:
        nonzero = nonzero | (F.col(out) != 0)
    return g.filter(nonzero).select(
        F.lit(lsn).cast("long").alias("stream_pos"),
        F.lit(lsn).cast("long").alias("lsn"),
        F.lit(0).cast("int").alias("seq"),
        F.lit("U").alias("op"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.col("doc_id"),
        F.col("n_rows"),
        *[F.col(out) for out in measures],
    )


def agg_mv_transform(group_col: str, measures: dict[str, str] | None = None):
    """``CascadeTailer(transform=...)`` factory: maintain a grouped
    aggregate of the upstream table instead of a replica."""

    def _t(changes: DataFrame, _src, _v0: int, v1: int) -> DataFrame:
        return changes_to_agg_deltas(changes, group_col, measures, lsn=v1)

    return _t


def exploded_terms_transform(array_col: str = "tokens"):
    """``CascadeTailer(transform=...)`` factory: maintain the corpus
    VOCABULARY from the change feed — one MV group per distinct element
    of an array column, with two signed measures per term:

    - ``n_rows``: total occurrences (the unigram count — a term
      appearing twice in a doc contributes 2), doubling as the Z-set
      liveness multiplicity (a term whose occurrences fold to zero is
      out of the vocabulary and GC-able);
    - ``n_docs``: document frequency (distinct docs containing the
      term — the DF leg of TF-IDF / unigram-LM stats).

    Retraction algebra: an insert explodes the post-image (+1 each), a
    delete explodes the carried pre-image (−1 each), an update retracts
    the old doc's terms and inserts the new doc's — so the MV equals
    the from-scratch vocabulary of live docs after every hop, at hop
    cost O(changed docs × their tokens), never a corpus scan. This is
    the stats layer every training-data pipeline recomputes per
    snapshot (token histograms, DF tables, unigram LMs) maintained
    differentially instead.

    Scale: the explode fans out only the CHANGED rows; the per-term
    fold is the same map-side-combined groupBy the agg MV uses, and
    term skew (stopwords) is bounded by the signed pre-aggregation —
    one delta row per (term, hop) regardless of occurrence count."""

    def _t(changes: DataFrame, _src, _v0: int, v1: int) -> DataFrame:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        ex = changes.select(
            sign.alias("_s"),
            F.col("doc_id").alias("_d"),
            F.explode(F.col(array_col)).alias("_term"),
        ).select(
            "_s", "_d",
            F.coalesce(F.col("_term").cast("string"), F.lit(NULL_GROUP))
            .alias("_term"),
        )
        occ = ex.groupBy("_term").agg(F.sum("_s").cast("long").alias("n_rows"))
        dfq = (
            ex.distinct()  # one (sign, doc, term) vote per image
            .groupBy("_term")
            .agg(F.sum("_s").cast("long").alias("n_docs"))
        )
        g = occ.join(dfq, "_term").filter(
            (F.col("n_rows") != 0) | (F.col("n_docs") != 0)
        )
        return g.select(
            F.lit(v1).cast("long").alias("stream_pos"),
            F.lit(v1).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.col("_term").alias("doc_id"),
            F.col("n_rows"),
            F.col("n_docs"),
        )

    return _t


def create_agg_mv(
    spark: SparkSession,
    path: str,
    group_col: str,
    measures: dict[str, str] | None = None,
    n_buckets: int = 8,
    zset: bool = False,
):
    """Create the MV's policy table: key column ``doc_id`` (the engine
    key-name convention) holding the group value as string, every
    aggregate column an ``add`` fold. ``group_col`` is accepted for
    call-site symmetry; the stored key name is always ``doc_id``.

    ``zset=True`` declares ``n_rows`` a Z-set multiplicity
    (``zset_col``): groups folded to zero are logically DEAD — read as
    deletes in the change feed and physically dropped at compaction —
    so the MV's size tracks live groups under churn. Opt in ONLY when
    ``n_rows > 0`` IS the group's liveness AND every downstream
    consumer uses liveness/weighted retraction algebra
    (``zset_agg_transform`` / ``distinct_count_transform``). The
    rollup-cascade shape must NOT set it: an intermediate level's
    ``n_rows`` counts the level below's all-time rows (liveness rides
    in ``n_facts``), and its CDF is consumed unweighted."""
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    cols = ["n_rows", *(measures or {})]
    schema = T.StructType(
        [T.StructField("doc_id", T.StringType())]
        + [T.StructField(c, T.LongType()) for c in cols]
        + [
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("updated_epoch", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )
    return SnapshotTable.create(
        spark,
        path,
        schema,
        key="doc_id",
        n_buckets=n_buckets,
        policies={c: "add" for c in cols},
        zset_col="n_rows" if zset else None,
    )


PAIR_SEP = "\x1f"


def _pair_key(group_col: str, value_col: str):
    """Unambiguous composite key for a (group, value) pair: the group
    is length-prefixed, so neither side containing the separator can
    alias another pair (``len(g) ':' g SEP v`` decodes uniquely)."""
    g = F.coalesce(F.col(group_col).cast("string"), F.lit(NULL_GROUP))
    return F.concat(
        F.length(g).cast("string"), F.lit(":"), g, F.lit(PAIR_SEP),
        F.col(value_col).cast("string"),
    )


def distinct_pair_transform(group_col: str, value_col: str):
    """Stage-1 transform of the exact incremental COUNT(DISTINCT):
    source CDF → signed occurrence deltas per (group, value) pair.

    Rows with a null value are dropped first — SQL ``count(distinct
    x)`` ignores NULLs, so a null must neither create a pair nor
    retract one. The pair MV's ``n_rows`` is the pair's live
    occurrence count; the group value rides along as a ``first``-fold
    payload column so stage 2 never has to decode the composite key.
    """

    def _t(changes: DataFrame, _src, _v0: int, v1: int) -> DataFrame:
        ch = changes.filter(F.col(value_col).isNotNull())
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        grp = F.coalesce(F.col(group_col).cast("string"), F.lit(NULL_GROUP))
        g = (
            ch.groupBy(_pair_key(group_col, value_col).alias("doc_id"))
            .agg(
                F.sum(sign).cast("long").alias("n_rows"),
                F.max(grp).alias("grp"),  # constant per pair key
            )
            .filter(F.col("n_rows") != 0)
        )
        return g.select(
            F.lit(v1).cast("long").alias("stream_pos"),
            F.lit(v1).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.col("doc_id"),
            F.col("grp"),
            F.col("n_rows"),
        )

    return _t


def distinct_count_transform():
    """Stage-2 transform: pair-MV CDF → per-group distinct-count
    deltas. A pair contributes to its group's count exactly while its
    occurrence count is positive, so the delta is the LIVENESS
    transition, not the occurrence arithmetic: each CDF row adds
    ``sign * (n_rows > 0)`` — a post-image of a pair that just became
    live is +1, the pre-image of a pair that was live is -1, and a
    pair whose count moved 3 → 2 nets to zero. The pair MV is a Z-set
    (``zset_col``): a pair dying reads as a ``delete`` carrying the
    last live pre-image, a rebirth as an ``insert``, and compaction's
    physical drop of a dead pair is invisible (dead↔absent) — the same
    liveness algebra covers every case."""

    def _t(changes: DataFrame, _src, _v0: int, v1: int) -> DataFrame:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        live = (F.col("n_rows") > 0).cast("long")
        g = (
            changes.groupBy(F.col("grp").alias("doc_id"))
            .agg(F.sum(sign * live).cast("long").alias("n_rows"))
            .filter(F.col("n_rows") != 0)
        )
        return g.select(
            F.lit(v1).cast("long").alias("stream_pos"),
            F.lit(v1).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.col("doc_id"),
            F.col("n_rows"),
        )

    return _t


def create_pair_mv(spark: SparkSession, path: str, n_buckets: int = 8):
    """Stage-1 table: key = composite (group, value) pair, ``n_rows``
    an ``add`` fold (occurrence count), ``grp`` a ``first`` fold (the
    decoded group, immutable per key). A Z-set: a pair at zero
    occurrences is dead (``n_rows > 0`` IS its liveness), stage 2's
    liveness algebra reads the transition either way, and compaction
    may drop dead pairs."""
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("grp", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("updated_epoch", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )
    return SnapshotTable.create(
        spark, path, schema, key="doc_id", n_buckets=n_buckets,
        policies={"n_rows": "add", "grp": "first"},
        zset_col="n_rows",
    )


class DistinctCountMV:
    """Exact incremental ``COUNT(DISTINCT value) GROUP BY group`` as a
    two-stage cascade of aggregate MVs — the differential-dataflow
    composition (a distinct-reduce feeding a count-reduce; ≙ the
    reference's consumers re-running ``COUNT(DISTINCT ...)`` over their
    whole upstream Postgres table on every poll):

        source CDF ──pairs──▶ MV1[(group,value) → occurrences]
        MV1 CDF ──liveness──▶ MV2[group → n live pairs] = the answer

    Each hop costs O(changed rows in the hop's version range); neither
    the source, MV1, nor MV2 is ever rescanned. Both hops inherit every
    engine guarantee (exactly-once ledger cursor, OCC, crash-safe
    lineage cursor) from :class:`CascadeTailer`. Scale: stage 1
    shuffles the hop's changes once on the pair key, stage 2 once on
    the group — both map-side combined; MV1's cardinality is the
    number of DISTINCT pairs (bounded by source rows), bucket-hashed.
    """

    def __init__(
        self,
        spark: SparkSession,
        src_table,
        root: str,
        group_col: str,
        value_col: str,
        n_buckets: int = 8,
    ):
        import os

        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.streaming.cascade import CascadeTailer
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.group_col = group_col
        pairs_path = os.path.join(root, "mv_pairs")
        mv_path = os.path.join(root, "mv_distinct")
        self.pairs = (
            SnapshotTable(spark, pairs_path)
            if SnapshotTable(spark, pairs_path).exists()
            else create_pair_mv(spark, pairs_path, n_buckets=n_buckets)
        )
        self.mv = (
            SnapshotTable(spark, mv_path)
            if SnapshotTable(spark, mv_path).exists()
            else create_agg_mv(spark, mv_path, group_col, n_buckets=n_buckets)
        )
        self._hop1 = CascadeTailer(
            src_table,
            CdcEngine(spark, self.pairs, collect_metrics=False),
            os.path.join(root, "pairs_cursor.json"),
            transform=distinct_pair_transform(group_col, value_col),
        )
        self._hop2 = CascadeTailer(
            self.pairs,
            CdcEngine(spark, self.mv, collect_metrics=False),
            os.path.join(root, "distinct_cursor.json"),
            transform=distinct_count_transform(),
        )

    def run_once(self) -> dict:
        return {"pairs": self._hop1.run_once(), "distinct": self._hop2.run_once()}

    def state(self) -> DataFrame:
        """group, n_distinct — groups with zero live values read absent."""
        return mv_state(self.mv, self.group_col).withColumnRenamed(
            "n_rows", "n_distinct"
        )


def zset_agg_transform(group_col: str, measures: dict[str, str] | None = None):
    """Grouped aggregate over a Z-SET source — a join-MV-style table
    whose ``n_rows`` column is each tuple's multiplicity, not a plain
    row set. Each CDF row contributes ``sign * n_rows`` to its group's
    live-tuple count and ``sign * n_rows * measure`` to each sum:

    - a multiplicity-k tuple counts k times (the N:M fanout case);
    - a tuple whose multiplicity transitions 1 → 0 surfaces in the
      Z-set's CDF as an UPDATE (dead tuples are never physically
      deleted — the fold can't know without reading the MV), and the
      weighting retracts it exactly once: pre-image −1·1, post-image
      +1·0;
    - redelivered/transient negatives cancel by the same algebra.

    This is the reduce-after-bilinear composition Δγ(A ⋈ B): chain a
    :class:`CascadeTailer` with this transform onto a ``JoinMV`` /
    ``GeneralJoinMV`` table and the grouped aggregate of a streaming
    join stays exact under inserts, updates, and deletes on BOTH join
    inputs — each hop O(changed tuples), no rescans anywhere."""
    measures = measures or {}

    def _t(changes: DataFrame, _src, _v0: int, v1: int) -> DataFrame:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        w = sign * F.coalesce(F.col("n_rows"), F.lit(0))
        aggs = [F.sum(w).cast("long").alias("n_rows")] + [
            F.sum(w * F.coalesce(F.col(src).cast("long"), F.lit(0)))
            .cast("long")
            .alias(out)
            for out, src in measures.items()
        ]
        g = changes.groupBy(
            F.coalesce(F.col(group_col).cast("string"), F.lit(NULL_GROUP)).alias(
                "doc_id"
            )
        ).agg(*aggs)
        nonzero = F.col("n_rows") != 0
        for out in measures:
            nonzero = nonzero | (F.col(out) != 0)
        return g.filter(nonzero).select(
            F.lit(v1).cast("long").alias("stream_pos"),
            F.lit(v1).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("U").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.col("doc_id"),
            F.col("n_rows"),
            *[F.col(out) for out in measures],
        )

    return _t


class ZsetAggMV:
    """Grouped-aggregate MV over a Z-set table (a join MV), maintained
    from its change feed — the stage that turns an incrementally-
    maintained JOIN into an incrementally-maintained GROUP BY over the
    join, Δγ(A ⋈ B) (≙ the reference's consumers re-running grouped
    SQL over their enriched Postgres tables on every poll, e.g. the
    top-holder / count trackers over token_transfer ⋈ token). One
    :class:`CascadeTailer` hop per call: O(tuples changed in the
    version range), one map-side-combined shuffle on the group key."""

    def __init__(
        self,
        spark: SparkSession,
        zset_table,
        root: str,
        group_col: str,
        measures: dict[str, str] | None = None,
        n_buckets: int = 8,
    ):
        import os

        from blockchain_etl_spark.cdc.apply import CdcEngine
        from blockchain_etl_spark.streaming.cascade import CascadeTailer
        from blockchain_etl_spark.tables.snapshot import SnapshotTable

        self.group_col = group_col
        mv_path = os.path.join(root, "mv_zagg")
        self.mv = (
            SnapshotTable(spark, mv_path)
            if SnapshotTable(spark, mv_path).exists()
            else create_agg_mv(
                spark, mv_path, group_col, measures, n_buckets=n_buckets,
                zset=True,  # n_rows = live tuple count IS group liveness
            )
        )
        self._hop = CascadeTailer(
            zset_table,
            CdcEngine(spark, self.mv, collect_metrics=False),
            os.path.join(root, "zagg_cursor.json"),
            transform=zset_agg_transform(group_col, measures),
        )

    def run_once(self) -> dict | None:
        return self._hop.run_once()

    def state(self) -> DataFrame:
        """group, n_rows (live tuple count), measure sums."""
        return mv_state(self.mv, self.group_col)


def mv_state(table, group_col: str | None = None) -> DataFrame:
    """The MV's live rows: groups whose lifetime count folded back to
    zero are gone from the source and read as absent here. Pass
    ``group_col`` to alias the engine-convention ``doc_id`` key back
    to the source column's name."""
    from blockchain_etl_spark.cdc.apply import read_state

    out = read_state(table).filter(F.col("n_rows") > 0)
    if group_col and group_col != "doc_id":
        out = out.withColumnRenamed("doc_id", group_col)
    return out
