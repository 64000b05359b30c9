"""Gap-fill + LOCF and exact time-weighted average — unit semantics
the parity gate can't isolate: empty-gap runs, carry across multiple
gaps, single-observation keys, and equal-timestamp tie ordering."""

from pyspark.sql import functions as F

from blockchain_etl_spark.operators.timeseries import (
    gapfill_locf,
    time_weighted_avg,
)


def test_gapfill_locf_fills_and_flags(spark):
    # key "a": obs at buckets 0 and 30 (step 10) → gaps at 10, 20
    rows = [("a", 5, 7), ("a", 6, 3), ("a", 31, 9), ("b", 12, 4)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = gapfill_locf(df, "k", "t", "v", step=10)
    got = {
        (r["series_key"], r["bucket"]): (r["measure"], r["filled"], r["is_gap"])
        for r in out.collect()
    }
    assert got == {
        ("a", 0): (10, 10, False),   # 7+3 summed into one bucket
        ("a", 10): (None, 10, True),
        ("a", 20): (None, 10, True),
        ("a", 30): (9, 9, False),
        ("b", 10): (4, 4, False),    # single-obs key: one row, no gaps
    }


def test_time_weighted_avg_step_function_and_ties(spark):
    # key "a": v=10 for 4s, v=20 for 6s → TWA = (40+120)/10 = 16
    # key "t": two rows at the SAME ts (tie broken by order col) — the
    # zero-width interval contributes nothing either way
    rows = [
        ("a", 0, 1, 10), ("a", 4, 2, 20), ("a", 10, 3, 99),
        ("t", 0, 1, 5), ("t", 0, 2, 7), ("t", 10, 3, 1),
    ]
    df = spark.createDataFrame(rows, ["k", "t", "o", "v"])
    out = {
        r["series_key"]: (r["twa_num"], r["twa_den"], r["twa"])
        for r in time_weighted_avg(df, "k", "t", "v", "o").collect()
    }
    assert out["a"] == (10 * 4 + 20 * 6, 10, 16)
    assert out["t"] == (5 * 0 + 7 * 10, 10, 7)


def test_time_weighted_avg_single_observation_key_absent(spark):
    # a key with one observation spans no time — no output row (the
    # oracle's lead() is null too)
    df = spark.createDataFrame([("solo", 3, 1, 42)], ["k", "t", "o", "v"])
    assert time_weighted_avg(df, "k", "t", "v", "o").count() == 0


def test_gapfill_plan_has_single_exchange_on_key(spark):
    df = spark.createDataFrame([("a", 1, 1)], ["k", "t", "v"])
    plan = gapfill_locf(df, "k", "t", "v", step=10)._jdf.queryExecution().toString()
    # the grid build, the join, and the LOCF window must share the
    # series-key partitioning — no exchange keyed off anything else
    assert "rangepartitioning" not in plan.lower()


def test_gapfill_interpolate_exact_lerp_and_edges(spark):
    from blockchain_etl_spark.operators.timeseries import gapfill_interpolate

    # key "a": obs at buckets 0 (v=10) and 30 (v=40), step 10 →
    # gaps at 10, 20 lerp to 20, 30; leading/trailing edges need no fill
    rows = [("a", 5, 10), ("a", 31, 40), ("b", 12, 7)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = {
        (r["series_key"], r["bucket"]): (r["measure"], r["filled"], r["is_gap"])
        for r in gapfill_interpolate(df, "k", "t", "v", step=10).collect()
    }
    assert got == {
        ("a", 0): (10, 10, False),
        ("a", 10): (None, 20, True),
        ("a", 20): (None, 30, True),
        ("a", 30): (40, 40, False),
        ("b", 10): (7, 7, False),
    }
    # non-divisible span floors: obs 0 (v=0) and 30 (v=10) → 3, 6
    df2 = spark.createDataFrame([("c", 0, 0), ("c", 30, 10)], ["k", "t", "v"])
    got2 = {
        r["bucket"]: r["filled"]
        for r in gapfill_interpolate(df2, "k", "t", "v", step=10).collect()
    }
    assert got2 == {0: 0, 10: 3, 20: 6, 30: 10}
