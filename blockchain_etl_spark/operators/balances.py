"""Composed balance pipeline: traces ⊕ fees ⊕ block rewards → balances.

≙ ``EthBalanceAdapter._export_balances`` + ``export_balances`` /
``group_balance_by_address`` / ``merge_balance``
(/root/reference/ethereumetl/streaming/eth_balance_adapter.py:339-524)
and the era-based block-reward schedule
(/root/reference/ethereumetl/service/eth_block_reward_service.py:26-80).

The reference composes this in pandas per block batch: sort + two
partition-rank passes + two groupbys (send/recv legs), a fee groupby, a
reward calculation, then a chain of outer merges with zero-fill and a
row-wise net-value apply. Spark-first re-expression:

- Each direction leg is ONE aggregation over the trace scan —
  ``min_by``/``max_by`` on the (blknum, txpos) order struct replaces
  both partition-rank passes and the first/last self-merges (the same
  collapse ``holder_detail_agg`` proves against the oracle), and the
  partial (map-side) aggregation absorbs hot-address skew.
- The send/recv/fee/reward merge is a chain of full-outer hash joins
  on address with ``coalesce`` zero-fill — no pandas, no apply; the
  net-value formula (vin + reward − out − fee) is a column expression.
- The era reward schedule is a literal ``CASE`` over blknum — constant
  folded, never a UDF.

At scale every leg shuffles once on its group key and the merge joins
are co-partitioned on address (same key, AQE coalesces the exchanges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_balance_by_address(traces: DataFrame, is_in: bool) -> DataFrame:
    """One direction leg (≙ group_balance_by_address,
    eth_balance_adapter.py:433-477): per address — value sum, distinct
    tx/block counts, transfer count, and the first/last (blknum, _st)
    by (blknum, txpos) order.

    traces: (txhash, blknum, txpos, from_address, to_address, value,
    _st:timestamp)."""
    d = "vin" if is_in else "out"
    addr = "to_address" if is_in else "from_address"
    order = F.struct(F.col("blknum"), F.col("txpos"))
    pick = F.struct(F.col("blknum"), F.date_format("_st", "yyyy-MM-dd").alias("st"))
    g = traces.groupBy(F.col(addr).alias("address")).agg(
        F.sum("value").alias(f"{d}_value"),
        F.countDistinct("txhash").alias(f"{d}_txs"),
        F.countDistinct("blknum").alias(f"{d}_blocks"),
        F.count(F.lit(1)).alias(f"{d}_xfers"),
        F.min_by(pick, order).alias("_fst"),
        F.max_by(pick, order).alias("_nst"),
    )
    return g.select(
        "address",
        f"{d}_value",
        f"{d}_txs",
        f"{d}_blocks",
        f"{d}_xfers",
        F.col("_fst.blknum").alias(f"{d}_1th_blknum"),
        F.col("_fst.st").alias(f"{d}_1th_st"),
        F.col("_nst.blknum").alias(f"{d}_nth_blknum"),
        F.col("_nst.st").alias(f"{d}_nth_st"),
    )


def era_block_reward(blknum_col, thresholds=(100, 250), rewards=(6400, 3200, 1600)):
    """Static per-block reward by era (≙ the EIP-649/EIP-1234 schedule,
    eth_block_reward_service.py:26-33 — 5/3/2 ×10^18 below/between/above
    the fork heights). Literal CASE: constant-folded, exact integers
    (the synthetic schedule keeps values divisible by 32 and 8 so the
    uncle formulas stay integer-exact cross-engine)."""
    lo, hi = thresholds
    r0, r1, r2 = rewards
    return (
        F.when(blknum_col < lo, F.lit(r0))
        .when(blknum_col < hi, F.lit(r1))
        .otherwise(F.lit(r2))
        .cast("long")
    )


def block_rewards(blocks: DataFrame) -> DataFrame:
    """blocks(blknum, miner, n_uncles, uncle_miner, uncle_delta) →
    per-address (cnb_value, cnb_blocks): the block miner earns the era
    reward + static/32 per included uncle (service :49-51), each uncle
    miner earns (uncle_number + 8 − blknum) × static / 8 (:77)."""
    static = era_block_reward(F.col("blknum"))
    miner_rows = blocks.select(
        F.col("miner").alias("address"),
        "blknum",
        (static + (static / F.lit(32)).cast("long") * F.col("n_uncles")).alias("reward"),
    )
    uncle_rows = blocks.filter(F.col("n_uncles") > 0).select(
        F.col("uncle_miner").alias("address"),
        "blknum",
        (
            ((F.lit(8) - F.col("uncle_delta")) * static / F.lit(8)).cast("long")
        ).alias("reward"),
    )
    return (
        miner_rows.unionByName(uncle_rows)
        .groupBy("address")
        .agg(
            F.sum("reward").alias("cnb_value"),
            F.countDistinct("blknum").alias("cnb_blocks"),
        )
    )


def merge_balance(
    out_df: DataFrame, vin_df: DataFrame, fee_df: DataFrame, cnb_df: DataFrame
) -> DataFrame:
    """Full-outer merge on address with zero-fill of the incremental
    columns and the net value (≙ merge_balance,
    eth_balance_adapter.py:480-524: outer merges + fillna + row-wise
    ``_cal`` — here one join chain and a column expression)."""
    df = (
        out_df.join(vin_df, "address", "full_outer")
        .join(fee_df, "address", "full_outer")
        .join(cnb_df, "address", "full_outer")
    )
    zero_suffixes = ("_value", "_txs", "_blocks", "_xfers")
    cols = []
    for c in df.columns:
        if c != "address" and c.endswith(zero_suffixes):
            cols.append(F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c))
        else:
            cols.append(F.col(c))
    df = df.select(*cols)
    net = (
        F.col("vin_value")
        + F.col("cnb_value")
        - F.col("out_value")
        - F.col("fee_value")
    )
    return df.withColumn("value", net)


def export_balances(
    traces: DataFrame, fees: DataFrame, blocks: DataFrame
) -> DataFrame:
    """The composed pipeline (≙ export_balances,
    eth_balance_adapter.py:515-524): send leg ∪ recv leg ∪ fee agg ∪
    era rewards → one balances row per address."""
    out_df = group_balance_by_address(traces, is_in=False)
    vin_df = group_balance_by_address(traces, is_in=True)
    fee_df = fees.groupBy(F.col("from_address").alias("address")).agg(
        F.sum("fee_value").alias("fee_value")
    )
    cnb_df = block_rewards(blocks)
    return merge_balance(out_df, vin_df, fee_df, cnb_df)


def token_balances(transfers: DataFrame) -> DataFrame:
    """Per-(address, token) transfer stats — the ``token_latest_balances``
    table ProfileService aggregates over
    (/root/reference/blockchainetl/service/profile_service.py:17-30;
    maintained by the token-balance adapter the same way
    ``latest_balances`` is by eth_balance_adapter.py). One aggregation
    per direction leg over the transfer scan, full-outer merged on
    (address, token_address) with zero-fill — both legs shuffle once on
    the same composite key, so the join is co-partitioned.

    transfers: (token_address, from_address, to_address, value, txhash)."""
    keys = ["address", "token_address"]

    def leg(addr: str, d: str) -> DataFrame:
        return transfers.groupBy(
            F.col(addr).alias("address"), "token_address"
        ).agg(
            F.sum("value").alias(f"{d}_value"),
            F.countDistinct("txhash").alias(f"{d}_txs"),
            F.count(F.lit(1)).alias(f"{d}_xfers"),
        )

    df = leg("to_address", "vin").join(
        leg("from_address", "out"), keys, "full_outer"
    )
    return df.select(
        *keys,
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in df.columns
            if c not in keys
        ],
    )


def address_profiles(
    latest_balances: DataFrame, token_latest: DataFrame
) -> DataFrame:
    """≙ ProfileService.get_profile
    (/root/reference/blockchainetl/service/profile_service.py:15-53):
    per address, one ``erc20`` row aggregating its
    token_latest_balances rows and one ``ether`` row aggregating its
    latest_balances rows — count(*) plus vin/out tx, transfer and value
    sums, NULLs coerced to 0 (the service's Decimal/None coercion loop,
    :47-52). The reference resolves this per address on demand with a
    60 s TTL cache; here it is the full profile TABLE (every address),
    computed as two map-side-combinable aggregations and a union — a
    point read is then a key lookup, and the table can be maintained
    incrementally like any other grouped MV (ZsetAggMV over the balance
    tables' change feeds)."""
    cols = ["vin_txs", "out_txs", "vin_xfers", "out_xfers",
            "vin_value", "out_value"]

    def leg(df: DataFrame, typo: str) -> DataFrame:
        return df.groupBy("address").agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(F.coalesce(F.col(c), F.lit(0))).cast("long").alias(c)
                for c in cols
            ],
        ).select(F.lit(typo).alias("typo"), "address", "n_rows", *cols)

    return leg(token_latest, "erc20").unionByName(leg(latest_balances, "ether"))
