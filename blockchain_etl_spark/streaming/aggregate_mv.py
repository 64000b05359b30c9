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
(the fold cannot know "this group is gone" without reading the MV —
and MUST not, or the hop would cost O(MV)); ``mv_state`` filters them
on read, the same way tombstones are filtered.

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
    Null group values fold into the ``NULL_GROUP`` sentinel (a string
    key column cannot hold a null key). Net-zero groups (e.g. an
    update that stays within its group) are dropped before the apply.
    """
    measures = measures or {}
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    aggs = [F.sum(sign).cast("long").alias("n_rows")] + [
        F.sum(sign * F.coalesce(F.col(src).cast("long"), F.lit(0)))
        .cast("long")
        .alias(out)
        for out, src in measures.items()
    ]
    g = (
        changes.groupBy(
            F.coalesce(F.col(group_col).cast("string"), F.lit(NULL_GROUP)).alias(
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


def create_agg_mv(
    spark: SparkSession,
    path: str,
    group_col: str,
    measures: dict[str, str] | None = None,
    n_buckets: int = 8,
):
    """Create the MV's policy table: key column ``doc_id`` (the engine
    key-name convention) holding the group value as string, every
    aggregate column an ``add`` fold. ``group_col`` is accepted for
    call-site symmetry; the stored key name is always ``doc_id``."""
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
    )


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
