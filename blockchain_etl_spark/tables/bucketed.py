"""Spark bucketed tables — co-located joins without a shuffle.

The engine's own SnapshotTable buckets by md5(key) for file pruning and
point lookups; SPARK bucketing (``bucketBy`` + ``saveAsTable``) is the
complementary layout for repeated BIG⋈BIG joins: both sides written with
the same bucket count on the join key expose ``HashPartitioning`` to
Catalyst, so the sort-merge join plans with ZERO Exchange on either side
— at 100 TB that deletes the dominant shuffle of every enrich pipeline
run (tx⋈receipt, transfer⋈token, input⋈prev-output) that repeats per
batch against the same dimensions.

(≙ the reference's repeated per-batch DB-side joins, e.g. the UTXO
input⋈previous-output SQL self-join, bitcoinetl enrich — re-expressed as
a write-once layout decision instead of a per-query shuffle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a Spark bucketed (and optionally sorted) table. Sorting
    within buckets lets the sort-merge join skip its sort too."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with bucketing
    metadata present Catalyst plans SortMergeJoin with no Exchange.
    Callers should verify once with ``assert_no_shuffle``."""
    return spark.table(left).join(spark.table(right), key, how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange — the
    co-location contract check (cheap; run it in tests/CI, not per query)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # any hash/range Exchange breaks co-location; a BroadcastExchange of
    # a small side is fine
    bad = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    if bad:
        raise AssertionError(
            "co-located join plan contains a shuffle Exchange:\n" + "\n".join(bad)
        )
