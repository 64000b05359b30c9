"""Plan-shape assertions (pushdown, broadcast, codegen) and the
range-fetch source."""

from pyspark.sql import functions as F

from blockchain_etl_spark.operators.relational import broadcast_dim_join
from blockchain_etl_spark.plans import (
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_spans,
)
from blockchain_etl_spark.sources import fetch_lsn_range

SF = "/root/testdata/sf0.001"


def test_filter_pushes_to_parquet_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_orderkey") == 42)
        .select("l_orderkey", "l_quantity")
    )
    pf = pushed_filters(df)
    assert any("l_orderkey" in f for f in pf), pf
    # column pruning: only the two selected columns reach the scan
    from blockchain_etl_spark.plans import physical_plan

    plan = physical_plan(df)
    assert "l_extendedprice" not in plan


def test_small_dims_go_broadcast(spark):
    df = broadcast_dim_join(spark, SF)
    assert has_broadcast_join(df)


def test_hot_path_is_codegen(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert wholestage_codegen_spans(df) >= 1


def test_fetch_lsn_range_source(spark):
    df = fetch_lsn_range(spark, 0, 20, events_per_lsn=4, partitions=4)
    rows = df.collect()
    assert len(rows) == 80
    assert {r["lsn"] for r in rows} == set(range(20))
    # deterministic: same range fetches identical content
    again = fetch_lsn_range(spark, 0, 20, events_per_lsn=4, partitions=2).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
    # payload invariant holds for I/U
    bad = df.filter(
        (F.col("op") != "D") & (F.col("n_tok") != F.size("tokens"))
    ).count()
    assert bad == 0


def test_adaptive_range_fetcher_halves_and_regrows():
    """No Spark needed: the control loop is driver-side by design."""
    from blockchain_etl_spark.sources.changelog_source import AdaptiveRangeFetcher

    calls = []
    fail_big = {"armed": True}

    def fetch(lo, hi):
        calls.append((lo, hi))
        if fail_big["armed"] and hi - lo > 4:
            raise RuntimeError("range too large for upstream")
        return f"df[{lo},{hi})"

    f = AdaptiveRangeFetcher(fetch, max_batch=16, min_batch=1, grow_after=2)
    chunks = []
    it = f.run(0, 40)
    for start, end, df in it:
        chunks.append((start, end))
        if end >= 20:
            fail_big["armed"] = False  # upstream recovers mid-stream
    # full coverage, in order, no gaps or overlaps
    assert chunks[0][0] == 0 and chunks[-1][1] == 40
    for (s1, e1), (s2, e2) in zip(chunks, chunks[1:]):
        assert e1 == s2
    # it halved 16 -> 4 under failure, then grew back after successes
    sizes = [e - s for s, e in chunks]
    assert min(sizes) <= 4
    assert max(sizes[-2:]) >= 8

    # hard failure (min_batch still failing) eventually raises
    def always_fail(lo, hi):
        raise RuntimeError("down")

    f2 = AdaptiveRangeFetcher(always_fail, max_batch=4, max_retries=2)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        list(f2.run(0, 4))
