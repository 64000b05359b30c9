"""Relational operator surface — reference §2.5-2.8 parity, re-expressed
as Catalyst plans over the driver's TPC-H-ish tables.

Each function takes (spark, sf_dir) and returns a DataFrame; the DuckDB
oracle twin lives in ``catalog.py``. Column aliases match the oracle SQL
exactly (the driver's compare hashes values under sorted column names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blockchain_etl_spark.functions import ids


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ----------------------------------------------------------------- joins
def enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Child⋈parent enrich: lineitem pulls order fields — the shape of
    ``enrich_transactions`` (tx ⋈ receipt / log ⋈ block,
    /root/reference/ethereumetl/streaming/enrich.py:122-171).
    Cardinality invariant |result| == |left| holds because o_orderkey is
    a key — asserted by the count parity with the oracle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("o_custkey").alias("cust_key"),
            F.col("o_orderdate").alias("order_date"),
        )
    )


def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dims with explicit broadcast (≙ per-batch block-side
    joins forced broadcast, SURVEY §2.5): revenue per region/nation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def missing_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with no lineitem (≙ missing-block anti-join,
    /root/reference/ethereumetl/jobs/checkers/block_checker.py:28-59)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select("o_orderkey")


def join_mismatch_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality mismatch diagnostics: the left_only/right_only
    key set differences the reference computes when an enrich join
    doesn't line up (``_handle_not_matched_error``,
    /root/reference/ethereumetl/streaming/enrich.py:42-69, diffs at
    :60-63) — as anti-joins with a side tag."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k")).distinct()
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k")).distinct()
    left_only = o.join(li, "k", "left_anti").withColumn("side", F.lit("left_only"))
    right_only = li.join(o, "k", "left_anti").withColumn("side", F.lit("right_only"))
    return left_only.unionByName(right_only).groupBy("side").agg(
        F.count("*").alias("n_keys"), F.min("k").alias("min_key"), F.max("k").alias("max_key")
    )


def full_outer_sendrecv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Send-side ⋈ recv-side full outer with zero-fill (≙ out/vin outer
    merge, /root/reference/ethereumetl/streaming/eth_balance_adapter.py:475-510):
    per user, purchase totals vs refund-ish totals."""
    e = _t(spark, sf_dir, "events")
    send = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("out_value"), F.count("*").alias("out_cnt"))
    )
    recv = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("in_value"), F.count("*").alias("in_cnt"))
    )
    # alias both sides: they share lineage from the same base scan, and an
    # un-aliased USING join on same-lineage attrs trips Spark's
    # trivially-true-predicate warning
    return (
        send.alias("snd").join(recv.alias("rcv"), "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("out_value", F.lit(0.0)).alias("out_value"),
            F.coalesce("out_cnt", F.lit(0)).alias("out_cnt"),
            F.coalesce("in_value", F.lit(0.0)).alias("in_value"),
            F.coalesce("in_cnt", F.lit(0)).alias("in_cnt"),
        )
    )


def prev_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event joined to the SAME user's previous event (≙ UTXO input
    ⋈ previous output, /root/reference/bitcoinetl/streaming/enrich.py:16-49 —
    a self-join on the prior row, here via lag())."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


# ------------------------------------------------------------ aggregates
def holder_detail_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The holder-detail aggregate shape (per key: nunique, sums, counts,
    first/last event tuple — /root/reference/ethereumetl/streaming/
    eth_token_holder_adapter.py:201-308). Three reference joins collapse
    into ONE groupBy with min_by/max_by over a deterministic order key."""
    li = _t(spark, sf_dir, "lineitem")
    ordk = F.concat(
        F.date_format("l_shipdate", "yyyyMMdd"),
        F.lpad(F.col("l_orderkey").cast("string"), 10, "0"),
        F.lpad(F.col("l_linenumber").cast("string"), 4, "0"),
    )
    return li.groupBy(F.col("l_suppkey").alias("supp_key")).agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_items"),
        F.min_by(F.col("l_orderkey"), ordk).alias("first_order"),
        F.max_by(F.col("l_orderkey"), ordk).alias("last_order"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_ship"),
    )


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the canonical groupBy-agg plan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def dedup_checker_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count == distinct == (max-min+1) invariant per group (≙ block
    checker, /root/reference/ethereumetl/jobs/checkers/block_checker.py:7-26,95-114)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.countDistinct("event_id").alias("n_distinct"),
        (F.max("event_id") - F.min("event_id") + 1).alias("range_span"),
    )


def incremental_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source first/last-LSN + counter stats — the M7 derived
    aggregate (≙ token_holders first/last/counter MERGE policies,
    /root/reference/ethereumetl/streaming/postgres_hooks.py:43-96)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.min("event_id").alias("first_lsn"),
        F.max("event_id").alias("last_lsn"),
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# --------------------------------------------------------------- windows
def partition_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number + per-group count attached to every row (≙
    ``partition_rank``, /root/reference/blockchainetl/misc/pandas_extra.py:7-16)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    wc = Window.partitionBy("user_id")
    return e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rank"),
        F.count("*").over(wc).alias("rank_count"),
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user (≙ top-holders zset top-k,
    SURVEY §2.6) — rank + filter."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", F.round("value", 2).alias("value"), "rk")
    )


def running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-mode running balance: cumulative sum per user over the
    event order (≙ history_balance cumsum, SURVEY §2.7)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time as-of: each user's latest event at or before a fixed
    LSN (≙ old-balance lookup ORDER BY blknum DESC LIMIT 1,
    /root/reference/ethereumetl/streaming/eth_balance_adapter.py:64-77).
    Expressed as filter + max_by — no per-key point lookups at scale."""
    e = _t(spark, sf_dir, "events")
    cutoff = 500
    return (
        e.filter(F.col("event_id") <= cutoff)
        .groupBy("user_id")
        .agg(
            F.max("event_id").alias("asof_event_id"),
            F.round(F.max_by("value", "event_id"), 2).alias("asof_value"),
            F.max_by("event_type", "event_id").alias("asof_type"),
        )
    )


# -------------------------------------------------- projections / functions
def item_id_stamping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """item_id md5 stamping + RFC3339 item_timestamp (≙
    eth_item_id_calculator.py:105-108 / eth_item_timestamp_calculator.py:45-46)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        ids.item_id("event", F.col("event_id").cast("string"), "event_type").alias("item_id"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("item_timestamp"),
    )


def flatten_list_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array flatten to fixed columns + count + joined string (≙
    ListField/ListCount/ListToString converters,
    /root/reference/blockchainetl/jobs/exporters/converters/
    list_field_item_converter.py:34-59): words of each document →
    word0..word3, n_words, first4_joined."""
    d = _t(spark, sf_dir, "documents")
    w = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    return d.select(
        "doc_id",
        F.get(w, 0).alias("word0"),  # null-safe OOB (ANSI mode)
        F.get(w, 1).alias("word1"),
        F.get(w, 2).alias("word2"),
        F.get(w, 3).alias("word3"),
        F.size(w).alias("n_words"),
        F.concat_ws(",", F.slice(w, 1, 4)).alias("first4_joined"),
    )


def hex_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hex→dec tolerant decode parity (≙ blockchainetl/utils.py:45-58),
    over synthetic hex derived from md5 so the oracle sees identical input."""
    e = _t(spark, sf_dir, "events")
    h = F.substring(F.md5(F.col("event_id").cast("string")), 1, 12)
    return e.select(
        "event_id",
        h.alias("hex_str"),
        F.conv(h, 16, 10).cast("long").alias("dec_value"),
    )
