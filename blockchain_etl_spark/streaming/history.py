"""SCD-2 "historyize": turn any table's change feed into an append-only
HISTORY table — one row per (key, hop) state transition, liveness
flagged — exactly the shape :class:`~blockchain_etl_spark.streaming.
join_mv.AsofJoinMV` consumes as its history side. The composition

    dim CDF → historyize → AsofJoinMV(fact.ts)

is the leak-free feature-snapshot pipeline: every fact row joined to
the dim row AS IT WAS at the fact's time (≙ the reference's
block-by-timestamp resolution, graph_operations.py:44-120, extended to
every dimension's full change history rather than one live snapshot).

Each :class:`~blockchain_etl_spark.streaming.cascade.CascadeTailer`
hop nets the upstream's (v0, v1] changes, so history granularity is
the hop, stamped ``vf = v1`` (the upstream commit version — monotone
across reorgs because rollbacks are roll-forward commits):

- insert / update_postimage → a LIVE history row with the new payload
- delete                    → a DEAD marker (payload null-extended)
- update_preimage           → nothing (superseded by the post-image)

The history table is append-only with surrogate key ``<key>@<vf>`` —
unique because the net diff yields at most one transition per key per
hop — and hash-bucketed by the entity key so as-of probes prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def create_history_table(
    spark: SparkSession,
    path: str,
    source,
    payload_cols: list[str],
    key_out: str = "k",
    n_buckets: int = 8,
):
    """The destination table ``history_transform`` feeds: ``doc_id`` =
    ``<key>@<vf>``, the entity key under ``key_out``, ``vf`` (upstream
    commit version), ``is_live``, and the payload columns."""
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    sm = source.manifest()
    stypes = {f.name: f.dataType for f in sm.schema().fields}
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField(key_out, stypes[sm.key]),
            T.StructField("vf", T.LongType()),
            T.StructField("is_live", T.BooleanType()),
        ]
        + [T.StructField(c, stypes[c]) for c in payload_cols]
        + [
            T.StructField("lsn", T.LongType()),
            T.StructField("seq", T.IntegerType()),
            T.StructField("updated_epoch", T.LongType()),
            T.StructField("deleted", T.BooleanType()),
        ]
    )
    return SnapshotTable.create(
        spark, path, schema, key="doc_id", n_buckets=n_buckets,
        bucket_key=key_out,
    )


def history_transform(payload_cols: list[str], key_out: str = "k"):
    """``CascadeTailer(transform=...)`` factory producing history-table
    events from the upstream change feed (module docstring)."""

    def _t(changes: DataFrame, src, _v0: int, v1: int) -> DataFrame:
        key = src.manifest().key
        live = changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(
            F.col(key).alias(key_out),
            F.lit(True).alias("is_live"),
            *[F.col(c) for c in payload_cols],
        )
        dead = changes.filter(F.col("_change_type") == "delete").select(
            F.col(key).alias(key_out),
            F.lit(False).alias("is_live"),
            # a dead marker records WHEN the key stopped existing, not
            # its last payload — null-extended so as-of consumers see
            # the delete exactly like SQL's unmatched side
            *[
                F.lit(None).cast(changes.schema[c].dataType).alias(c)
                for c in payload_cols
            ],
        )
        rows = live.unionByName(dead)
        return rows.select(
            F.lit(v1).cast("long").alias("stream_pos"),
            F.lit(v1).cast("long").alias("lsn"),
            F.lit(0).cast("int").alias("seq"),
            F.lit("I").alias("op"),
            F.lit(None).cast("long").alias("rollback_to_lsn"),
            F.concat(
                F.col(key_out).cast("string"), F.lit("@"),
                F.lit(v1).cast("string")
            ).alias("doc_id"),
            key_out,
            F.lit(v1).cast("long").alias("vf"),
            "is_live",
            *payload_cols,
        )

    return _t
