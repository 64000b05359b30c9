"""Skew-handling primitives (north star: salted repartitioning on
hash(doc_id) + AQE skew-join splitting).

Where skew is already solved for free in this engine:

- **Aggregations** (last-writer dedup, holder stats): ordinary
  ``groupBy().agg()`` runs a map-side partial aggregation, so a hot
  key collapses to one row per input partition before the shuffle —
  the generator's 0.1%-keys/30%-events scenario never concentrates on
  one reducer.
- **Joins**: AQE skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled``, on in ``session.py``)
  splits oversized partitions of the COW merge join at runtime.

Where it is NOT free: **windows**. ``row_number().over(partitionBy
(hot_key))`` ships every row of the hot key to one task — no partial
aggregation exists for rank. The salted two-phase forms below fix the
two window shapes the reference uses (top-k per key, first/last
per key):

phase 1: rank within (key, salt) — parallel across ``n_salts`` tasks,
         keep each salt's top-k (a superset of the global top-k);
phase 2: rank the surviving ≤ k × n_salts rows per key — tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salt_col(n_salts: int, *cols) -> F.Column:
    """Deterministic salt from row content (falls back to random-free
    spreading via xxhash64 over the given columns)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group under heavy group skew.

    ``order_cols``: list of Columns/names, descending-significant first
    (pass e.g. ``[F.desc("value"), F.asc("id")]``). Result carries
    ``rk`` (1-based).
    """
    salt_src = salt_on or [c for c in df.columns if c not in group_cols][:1]
    salted = df.withColumn("_salt", salt_col(n_salts, *[F.col(c) for c in salt_src]))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .drop("_rk1", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return survivors.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") <= k)


def salted_first_last(
    df: DataFrame,
    group_cols: list[str],
    order_key: F.Column,
    payload_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """First/last payload per group under skew — two-level min_by/max_by
    (aggregations partial-combine, so this is belt-and-braces for
    extreme cases where even partial-agg rows are huge)."""
    salted = df.withColumn("_salt", salt_col(n_salts, order_key))
    part = salted.groupBy(*group_cols, "_salt").agg(
        F.min_by(F.struct(*payload_cols), order_key).alias("_first"),
        F.max_by(F.struct(*payload_cols), order_key).alias("_last"),
        F.min(order_key).alias("_min_k"),
        F.max(order_key).alias("_max_k"),
    )
    out = part.groupBy(*group_cols).agg(
        F.min_by("_first", F.col("_min_k")).alias("first"),
        F.max_by("_last", F.col("_max_k")).alias("last"),
    )
    return out
