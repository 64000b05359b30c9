"""Time-series shaping over sparse event streams: gap-filling with
LOCF (last observation carried forward) and exact time-weighted
averages — the read-side companions of the hypertable rollup cascade
(`streaming/cascade.py`). TimescaleDB's ``time_bucket_gapfill`` /
``locf`` / ``time_weighted`` shapes, re-expressed as Catalyst plans.

≙ the reference's alert/track adapters reading per-block aggregates as
regular series (eth_alert_adapter.py windows over blknum ranges) — a
chain emits blocks on an irregular clock, and every downstream rule
that says "per hour" needs the empty hours materialized.

Scale notes (100 TB):
- the dense grid is built per key with ``sequence() + explode`` — cost
  is O(span/step) rows per key AFTER the aggregate, never a driver
  loop, and it explodes from one row per key (min/max), so the
  pre-explode shuffle is tiny;
- both operators shuffle ONCE on the series key; the LOCF window and
  the lead() pairing run inside that partitioning (no second
  exchange);
- all measures are integers (cents, seconds) — sums are
  order-independent, so results are bit-stable under any parallelism
  and match the single-threaded oracle exactly. Double accumulation
  here would diverge across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    measure_col: str,
    step: int,
) -> DataFrame:
    """Regularize a sparse integer-bucketed series: one row per
    ``step``-wide bucket between each key's first and last observation,
    missing buckets carrying the last observed value forward.

    Input granularity is whatever ``ts_col`` already is (seconds,
    blocks, LSNs); buckets are ``floor(ts/step)*step``. Output columns:
    key, bucket, measure (summed per bucket), filled (LOCF), is_gap.
    """
    k, t, v = F.col(key_col), F.col(ts_col), F.col(measure_col)
    bucket = (F.floor(t / step) * step).cast("long")
    obs = (
        events.select(k.alias("series_key"), bucket.alias("bucket"), v.alias("_v"))
        .groupBy("series_key", "bucket")
        .agg(F.sum("_v").alias("measure"))
    )
    # one row per key carrying its span, exploded to the dense grid
    grid = (
        obs.groupBy("series_key")
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            "series_key",
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(step)).cast("long"))
            ).alias("bucket"),
        )
    )
    j = grid.join(obs, ["series_key", "bucket"], "left")
    w = (
        Window.partitionBy("series_key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "series_key",
        "bucket",
        "measure",
        F.last("measure", ignorenulls=True).over(w).alias("filled"),
        F.col("measure").isNull().alias("is_gap"),
    )


def gapfill_interpolate(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    measure_col: str,
    step: int,
) -> DataFrame:
    """Gap-filling by LINEAR interpolation (TimescaleDB
    ``interpolate``): like :func:`gapfill_locf` but missing buckets take
    the floor'd linear blend of the nearest observations on each side —
    integer arithmetic throughout (``prev + (next-prev)*dist//span``),
    so any partitioning reproduces the oracle bit-for-bit. Buckets
    before the first / after the last observation have no bracketing
    pair and stay null. Same single shuffle on the series key; the two
    bracketing windows share its partitioning."""
    k, t, v = F.col(key_col), F.col(ts_col), F.col(measure_col)
    bucket = (F.floor(t / step) * step).cast("long")
    obs = (
        events.select(k.alias("series_key"), bucket.alias("bucket"), v.alias("_v"))
        .groupBy("series_key", "bucket")
        .agg(F.sum("_v").alias("measure"))
    )
    grid = (
        obs.groupBy("series_key")
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            "series_key",
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(step)).cast("long"))
            ).alias("bucket"),
        )
    )
    j = grid.join(obs, ["series_key", "bucket"], "left")
    back = (
        Window.partitionBy("series_key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("series_key")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pb = F.struct(F.col("bucket"), F.col("measure"))
    prev = F.last(F.when(F.col("measure").isNotNull(), pb), ignorenulls=True).over(back)
    nxt = F.first(F.when(F.col("measure").isNotNull(), pb), ignorenulls=True).over(fwd)
    lerp = prev["measure"] + F.floor(
        (nxt["measure"] - prev["measure"])
        * (F.col("bucket") - prev["bucket"])
        / (nxt["bucket"] - prev["bucket"])
    ).cast("long")
    filled = F.when(F.col("measure").isNotNull(), F.col("measure")).otherwise(
        # needs a bracketing pair; zero-width spans can't occur on a gap
        # row (a gap row is strictly between two observations)
        F.when(prev.isNotNull() & nxt.isNotNull(), lerp)
    )
    return j.select(
        "series_key",
        "bucket",
        "measure",
        filled.alias("filled"),
        F.col("measure").isNull().alias("is_gap"),
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    measure_col: str,
    order_col: str,
) -> DataFrame:
    """Exact time-weighted average per key over a left-closed step
    function: each observation holds its value until the next one, so
    TWA = Σ v_i·(t_{i+1}−t_i) / (t_last−t_first). Emits the exact
    integer numerator/denominator plus the floor'd average — integer
    arithmetic end to end, so any partitioning reproduces the oracle
    bit-for-bit. ``order_col`` breaks equal-timestamp ties into one
    total order (zero-width intervals then contribute nothing,
    regardless of which tied row "wins").
    """
    k, t, v = F.col(key_col), F.col(ts_col), F.col(measure_col)
    o = F.col(order_col)
    w = Window.partitionBy("series_key").orderBy("ts", "ord")
    stepped = events.select(
        k.alias("series_key"), t.alias("ts"), o.alias("ord"), v.alias("val")
    ).withColumn("next_ts", F.lead("ts").over(w))
    return (
        stepped.filter(F.col("next_ts").isNotNull())
        .groupBy("series_key")
        .agg(
            F.sum(F.col("val") * (F.col("next_ts") - F.col("ts"))).alias("twa_num"),
            F.min("ts").alias("_t0"),
            F.max("next_ts").alias("_t1"),
        )
        # a key whose observations all share one instant spans no time —
        # no average exists (same as a single-observation key); without
        # this, the ANSI session kills the WHOLE job with DIVIDE_BY_ZERO
        .filter(F.col("_t1") > F.col("_t0"))
        .select(
            "series_key",
            "twa_num",
            (F.col("_t1") - F.col("_t0")).alias("twa_den"),
            F.floor(F.col("twa_num") / (F.col("_t1") - F.col("_t0"))).alias("twa"),
        )
    )
