"""NFT marketplace-trade extraction (the "nft_orderbook" entity).

≙ ``EthNftOrderbookAdapter``
(/root/reference/ethereumetl/streaming/eth_nft_orderbook_adapter.py:36-200):
the reference extracts per-platform marketplace "order" events from the
log stream (a platform registry of extractors,
``ethereumetl/enumeration/nop_platform.py`` — the ``nop`` package itself
is absent from the checkout), joins them to the token transfers and
transactions of the same tx, then prices the result through a token dim
(decimals, ``eth_token_service.py``) and a price service
(``blockchainetl/service/price_service.py:1-95``) into ``value_usd`` /
``fee_value_usd`` (adapter ``_calculate``, :159-200 — a row-at-a-time
``df.apply`` over pandas).

Spark-first re-expression:

- The platform registry is a DECLARATIVE spec table (event topic +
  word positions per platform) compiled into one codegen'd when-chain
  projection — a single pass over the log scan extracts every
  platform's trades, no per-platform re-scan and no Python.
- The trade ⋈ NFT-leg ⋈ transaction joins are hash joins on the tx
  key — at scale all three sides arrive partitioned by tx hash from
  the same block-range scan, so the joins co-locate.
- The price and decimals dims are BROADCAST joins (they are ≪ the
  trade stream — the reference caches them driver-side with a TTL for
  the same reason), and the USD conversion is a pure column
  expression, not a pandas ``apply``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blockchain_etl_spark.functions.ids import normalized_address
from blockchain_etl_spark.operators.extractors import hex_word_to_long, word_to_addr

# Public marketplace event signatures (chain constants):
# OpenSea Wyvern OrdersMatched(bytes32 buyHash, bytes32 sellHash,
#   address indexed maker, address indexed taker, uint price, bytes32 metadata)
ORDERS_MATCHED_TOPIC = (
    "0xc4109843e0b7d514e4c093114b863f8e7d8d9a458c372cd51bfe526b588006c9"
)
# LooksRare TakerBid(..., address indexed taker, address indexed maker, ...)
TAKER_BID_TOPIC = (
    "0x95fb6205e23ff6bda16a2d1dba56b9ad7c783f67c96fa149785052f47696f2be"
)

# The platform registry (≙ nop_platform.parse_nop_platforms): per
# platform, where in the event the trade fields live. Synthetic/decode
# convention for word positions: words = topics ++ data words, with
# maker/taker as indexed topics and price/currency/fee at fixed data
# word offsets.
PLATFORM_SPECS: dict[str, dict[str, int | str]] = {
    "opensea": {
        "topic": ORDERS_MATCHED_TOPIC,
        "maker_topic": 1,
        "taker_topic": 2,
        "price_word": 2,     # data: [buy_hash, sell_hash, price, currency, fee]
        "currency_word": 3,
        "fee_word": 4,
    },
    "looksrare": {
        "topic": TAKER_BID_TOPIC,
        "maker_topic": 2,    # TakerBid indexes taker FIRST, maker second
        "taker_topic": 1,
        "price_word": 3,     # data: [order_hash, nonce, currency, price, fee]
        "currency_word": 2,
        "fee_word": 4,
    },
}


def _per_platform(col_of_spec) -> Column:
    """when-chain over the platform registry: one codegen'd expression
    selecting the right word per platform, single pass over the scan."""
    t0 = F.get("topics", 0)
    expr = None
    for name, spec in sorted(PLATFORM_SPECS.items()):
        cond = t0 == spec["topic"]
        val = col_of_spec(name, spec)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr


def extract_orderbooks(
    logs: DataFrame, platforms: list[str] | None = None
) -> DataFrame:
    """logs(event_id, address, topics:array<string>, data:string) →
    one trade row per marketplace event (≙ the per-platform
    ``extractor.extract_orderbooks`` loop, adapter :222-241 — but one
    shared scan instead of a scan per platform).

    Returns (event_id, platform, exchange_address, maker, taker,
    value, currency, fee_value)."""
    from blockchain_etl_spark.functions.ids import data_word

    keep = set(platforms or PLATFORM_SPECS)
    topics_wanted = [
        s["topic"] for p, s in PLATFORM_SPECS.items() if p in keep
    ]
    base = logs.filter(F.size("topics") >= 3).filter(
        F.get("topics", 0).isin(topics_wanted)
    )
    # fixed word positions → codegen'd substring access (data_word), no
    # higher-order array materialization on the hot decode path
    return base.select(
        "event_id",
        _per_platform(lambda name, s: F.lit(name)).alias("platform"),
        normalized_address("address").alias("exchange_address"),
        _per_platform(
            lambda _, s: word_to_addr(F.get("topics", s["maker_topic"]))
        ).alias("maker"),
        _per_platform(
            lambda _, s: word_to_addr(F.get("topics", s["taker_topic"]))
        ).alias("taker"),
        _per_platform(
            lambda _, s: hex_word_to_long(data_word("data", s["price_word"]))
        ).alias("value"),
        _per_platform(
            lambda _, s: word_to_addr(data_word("data", s["currency_word"]))
        ).alias("currency"),
        _per_platform(
            lambda _, s: hex_word_to_long(data_word("data", s["fee_word"]))
        ).alias("fee_value"),
    )


def nft_orderbooks(
    orders: DataFrame,
    nft_transfers: DataFrame,
    transactions: DataFrame,
    token_decimals: DataFrame,
    prices: DataFrame,
    tx_key: str = "event_id",
) -> DataFrame:
    """Compose trades with their NFT leg, tx context, and the price /
    decimals dims (≙ adapter ``export_all`` + ``_calculate``,
    :191-200,159-188 — there a pandas concat + row-wise ``apply``; here
    two co-partitioned hash joins plus two broadcast joins and a pure
    column expression for the USD legs).

    - ``nft_transfers``: (tx_key, token_address, from_address,
      to_address, token_id) — the ERC721 leg of the same tx.
    - ``transactions``: (tx_key, blknum, day).
    - ``token_decimals``: (currency, decimals) — broadcast
      (≙ ``_get_token_decimals`` through the TTL'd TokenService).
    - ``prices``: (currency, day, price) — broadcast
      (≙ ``_get_token_price`` through the TTL'd PriceService; day
      granularity is the service's historical-price interval).

    Missing dim rows yield NULL usd values, exactly as the reference
    returns ``None`` when the service misses — never a dropped trade
    (left joins)."""
    j = (
        orders.join(nft_transfers, tx_key)
        .join(transactions, tx_key)
        .join(F.broadcast(token_decimals), "currency", "left")
        .join(F.broadcast(prices), ["currency", "day"], "left")
    )
    scale = F.pow(F.lit(10.0), F.col("decimals").cast("double"))
    usd = lambda c: (F.col(c).cast("double") / scale) * F.col("price")  # noqa: E731
    return j.select(
        tx_key,
        "platform",
        "exchange_address",
        "maker",
        "taker",
        "token_address",
        "token_id",
        "from_address",
        "to_address",
        "currency",
        "value",
        "fee_value",
        "blknum",
        "day",
        usd("value").alias("value_usd"),
        usd("fee_value").alias("fee_value_usd"),
    )
