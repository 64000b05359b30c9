"""Salted window operators: identical results to the naive window on a
heavily skewed key distribution (one key holds ~50% of rows)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from blockchain_etl_spark.operators.skew import salted_first_last, salted_topk_per_group


def _skewed(spark, n=20_000):
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("key"),
        F.col("id"),
        (F.xxhash64("id") % 1000).alias("value"),
    )


def test_salted_topk_matches_naive(spark):
    df = _skewed(spark)
    order = [F.desc("value"), F.asc("id")]
    naive = (
        df.withColumn("rk", F.row_number().over(Window.partitionBy("key").orderBy(*order)))
        .filter(F.col("rk") <= 5)
    )
    salted = salted_topk_per_group(df, ["key"], order, k=5, n_salts=8, salt_on=["id"])
    a = {(r["key"], r["rk"], r["id"]) for r in naive.collect()}
    b = {(r["key"], r["rk"], r["id"]) for r in salted.collect()}
    assert a == b
    hot = [t for t in b if t[0] == "HOT"]
    assert len(hot) == 5


def test_salted_first_last_matches_naive(spark):
    df = _skewed(spark, n=5000)
    naive = df.groupBy("key").agg(
        F.min_by(F.struct("id", "value"), F.col("id")).alias("first"),
        F.max_by(F.struct("id", "value"), F.col("id")).alias("last"),
    )
    salted = salted_first_last(df, ["key"], F.col("id"), ["id", "value"], n_salts=8)
    a = {(r["key"], tuple(r["first"]), tuple(r["last"])) for r in naive.collect()}
    b = {(r["key"], tuple(r["first"]), tuple(r["last"])) for r in salted.collect()}
    assert a == b
