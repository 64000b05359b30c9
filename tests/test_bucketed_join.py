"""Spark bucketBy co-located joins: both sides pre-bucketed on the join
key → SortMergeJoin with ZERO shuffle Exchange."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_etl_spark.tables.bucketed import (
    assert_no_shuffle,
    colocated_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    o = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS total")
    li = spark.range(0, 30_000).selectExpr("id % 10000 AS k", "id AS item")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    write_bucketed(o, "b_orders", "k", n_buckets=8)
    write_bucketed(li, "b_items", "k", n_buckets=8)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "b_orders", "b_items", "k")
        assert_no_shuffle(j)  # bucketing metadata satisfied the distribution
        assert j.count() == 30_000

        # control: the same join over plain parquet DOES shuffle — the
        # assert helper must catch it
        plain = o.join(li, "k")
        with pytest.raises(AssertionError):
            assert_no_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")
