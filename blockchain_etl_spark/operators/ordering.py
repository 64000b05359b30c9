"""Global ordering operators for training-corpus assembly: deterministic
global shuffle and curriculum ordering.

Training pipelines need a reproducible TOTAL ORDER over the corpus —
"shuffle the dataset" before packing/sharding, or "order by difficulty
stage" for curriculum schedules (≙ the reference's deterministic
item_id/sort conventions, blockchainetl/jobs/exporters: stable output
order for diffable exports; here lifted to corpus scale).

The naive plan — ``row_number() OVER (ORDER BY key)`` — is a SINGLE
TASK at 10^10 rows (a global window has no partial aggregation). Both
operators instead compute the global 0-based position with the same
two-phase scheme as :func:`blockchain_etl_spark.operators.tokens.
pack_sequences`:

1. ``repartitionByRange`` on the order key — contiguous key ranges in
   ascending partition-id order (Spark's RangePartitioner samples the
   key distribution, so ranges are balanced even on skewed keys).
2. A per-range ``row_number`` window keyed on the captured range id —
   no task ever sees more than ~1/n_parts of the data.
3. Per-range counts (one tiny row per range) → exclusive prefix
   offsets → broadcast back. Global pos = local rank + range offset.

The shuffle key itself is ``md5(salt || doc_id)`` — rerun-stable,
seed-controlled via the salt, uniformly distributed (so the range
partitioner needs no skew handling), and exactly reproducible in the
DuckDB oracle (hex strings compare lexicographically in both engines).
No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_order_rank(
    df: DataFrame,
    key_cols: list[Column | str],
    n_parts: int | None = None,
    out_col: str = "pos",
) -> DataFrame:
    """Append a 0-based global rank by ``key_cols`` (must be a total
    order — include a unique tiebreak column) without a single-task
    global window. Two shuffles (range + per-range window hash), both
    bounded at ~1/n_parts of the data per task; the offsets frame is
    one row per range."""
    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    keys = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    named = df.select(
        "*", *[k.alias(f"_k{i}") for i, k in enumerate(keys)]
    )
    knames = [f"_k{i}" for i in range(len(keys))]
    # the ranged frame feeds TWO subplans (per-range counts and the
    # final join). RangePartitioner boundaries come from a SAMPLE, and
    # if the exchange is not reused (observe()/write wrappers and AQE
    # re-plans break reuse), each branch re-samples DIFFERENT
    # boundaries — offsets computed for one layout, local ranks for
    # another, and the "rank" silently stops being a permutation. An
    # eager localCheckpoint freezes one materialization (the same cost
    # class as the sort-shuffle itself) so both branches read the same
    # partitioning.
    ranged = (
        named.repartitionByRange(n_parts, *knames)
        .withColumn("_rid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wl = Window.partitionBy("_rid").orderBy(*knames)
    local = ranged.withColumn("_lrk", F.row_number().over(wl))
    # one row per range: the unpartitioned window is over n_parts rows
    wo = Window.orderBy("_rid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_rid")
        .agg(F.count("*").alias("_rn"))
        .withColumn("_off", F.coalesce(F.sum("_rn").over(wo), F.lit(0)))
        .select("_rid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_rid")
        .withColumn(out_col, (F.col("_lrk") + F.col("_off") - 1).cast("long"))
        .drop("_rid", "_lrk", "_off", *knames)
    )


def shuffle_key(key: Column | str, salt: str = "gshuf") -> Column:
    """Deterministic shuffle key: md5(salt || key). Changing the salt
    reshuffles; the same salt replays the same order on any cluster."""
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(salt), k.cast("string")))


def global_shuffle(
    docs: DataFrame,
    salt: str = "gshuf",
    id_col: str = "doc_id",
    n_parts: int | None = None,
) -> DataFrame:
    """(id, ...) → (id, pos): a reproducible uniform permutation of the
    corpus. Downstream sharding is then ``pos % n_shards`` /
    ``pos // shard_size`` — deterministic shard files with no further
    shuffle."""
    keyed = docs.withColumn("_sk", shuffle_key(id_col, salt))
    ranked = global_order_rank(keyed, ["_sk", id_col], n_parts=n_parts)
    return ranked.drop("_sk")


def curriculum_order(
    docs: DataFrame,
    stage_col: Column,
    salt: str = "curr",
    id_col: str = "doc_id",
    n_parts: int | None = None,
) -> DataFrame:
    """Curriculum schedule: a global position ordered by (stage, then a
    deterministic shuffle within each stage) — easy stages first, rows
    inside a stage in reproducible random order. One pass of the same
    two-phase rank; the stage expression stays a codegen'd column."""
    keyed = docs.withColumn("stage", stage_col.cast("int")).withColumn(
        "_sk", shuffle_key(id_col, salt)
    )
    ranked = global_order_rank(keyed, ["stage", "_sk", id_col], n_parts=n_parts)
    return ranked.drop("_sk")
