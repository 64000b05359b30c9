"""ABI-decode extractors: hex logs → typed transfer rows, end to end.

Spark-first re-expression of the reference extraction services:

- ``extract_token_transfers`` ≙ EthTokenTransferExtractor
  (/root/reference/ethereumetl/service/token_transfer_extractor.py:62-109):
  the WETH Deposit/Withdrawal→Transfer topic rewrite, the
  topics+split_to_words(data) concatenation, the ``!= 4 words`` weird-
  event rejection, and word→address / hex→dec decoding — all as pure
  column expressions (one codegen'd projection per log, zero Python).

- ``extract_erc1155_transfers`` ≙ EthErc1155TransferExtractor
  (/root/reference/ethereumetl/service/erc1155_transfer_extractor.py:24-123):
  TransferSingle (6 words exactly) and TransferBatch head-tail dynamic-
  array decode (offset words, id_cnt at word 6, ids, va_cnt, values) with
  the id_cnt != va_cnt rejection; the per-id fan-out is a
  ``posexplode``-style ``explode(sequence(...))`` — row-count ×id_cnt,
  no shuffle.

Scale note: both extractors are narrow maps over the log scan —
predicate pushdown on topic0/address reaches the parquet scan, and the
explode multiplies rows before the first shuffle of whatever runs
downstream. At 10^10 logs there is no state and no join here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from blockchain_etl_spark.functions.ids import normalized_address, split_to_words

TRANSFER_EVENT_TOPIC = (
    "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
)
DEPOSIT_EVENT_TOPIC = (
    "0xe1fffcc4923d04b559f4d29a8bfc6cda04eb5b0d3c460751c2402c5c5cc9109c"
)
WITHDRAWAL_EVENT_TOPIC = (
    "0x7fcf532c15f0a6db0bd6d0e038bea71d30d808c7d98cb3bf7268a95bf5081b65"
)
TRANSFER_SINGLE_TOPIC = (
    "0xc3d58168c5ae7397731d063d5bbf3d657854427343f4c083240f7aacaa2d0f62"
)
TRANSFER_BATCH_TOPIC = (
    "0x4a39dc06d4c0dbc64b70af90fd698a233a518aa5d07e595d983b8c0526c8f7fb"
)
WETH_TOKEN_ADDRESS = "0xc02aaa39b223fe8d0a0e5c4f27ead9083c756cc2"
ZERO_ADDR = "0x0000000000000000000000000000000000000000"


def hex_word_to_long(word: Column) -> Column:
    """hex_to_dec of a 32-byte word whose value fits in int64 (the last
    16 hex chars; ≙ hex_to_dec, /root/reference/blockchainetl/utils.py:45-57
    for the value range an exact cross-engine oracle can carry). Values
    ≥ 2^63 raise under ANSI mode (Spark 4 default) — fail-loud, never a
    silent truncation; use :func:`hex_word_to_decimal` for production
    amounts."""
    return F.conv(F.substring(word, -16, 16), 16, 10).cast("long")


def hex_word_to_decimal(word: Column) -> Column:
    """Exact unsigned decode of a 32-byte word into decimal(38,0) — the
    production-path variant of :func:`hex_word_to_long` (real ERC20/1155
    amounts routinely exceed int64: 2^63 wei ≈ 9.2 tokens at 18
    decimals; ≙ hex_to_dec preserving full precision,
    /root/reference/blockchainetl/utils.py:45-57).

    Spark's conv() is unsigned-64-bit internally, so the low 120 bits
    are decoded as two 15-nibble (60-bit) halves recombined with exact
    decimal arithmetic: hi·2^60 + lo < 2^120 ≈ 1.33e36, inside
    decimal(38,0). Values with any nonzero nibble above bit 120 (≈1.3e18
    whole tokens at 18 decimals — beyond any real supply) decode to
    NULL; callers that must carry full uint256 keep the raw hex word,
    exactly as the reference keeps total_supply as a string."""
    clean = F.lpad(F.lower(F.regexp_replace(word, "^0x", "")), 64, "0")
    fits = F.substring(clean, 1, 34) == F.lit("0" * 34)
    hi = F.conv(F.substring(clean, 35, 15), 16, 10).cast("decimal(19,0)")
    lo = F.conv(F.substring(clean, 50, 15), 16, 10).cast("decimal(19,0)")
    val = (
        hi.cast("decimal(38,0)") * F.lit(2**60).cast("decimal(19,0)")
        + lo.cast("decimal(38,0)")
    ).cast("decimal(38,0)")
    return F.when(fits, val)


def word_to_addr(word: Column) -> Column:
    """word→address: lowercase 0x + last 40 hex chars (≙ word_to_address
    + to_normalized_address, /root/reference/ethereumetl/utils.py:47-68)."""
    return F.lower(F.concat(F.lit("0x"), F.substring(word, -40, 40)))


def extract_token_transfers(
    logs: DataFrame, exact_values: bool = False
) -> DataFrame:
    """logs(event_id, address, topics:array<string>, data:string) →
    token transfers. Anonymous logs (empty topics) are skipped; WETH
    Deposit/Withdrawal logs are rewritten to Transfer shape; logs whose
    topics+data words != 4 are rejected as weird events.

    ``exact_values=True`` decodes ``value`` as decimal(38,0) (production
    path — amounts exceed int64); default int64 keeps the cross-engine
    oracle parity for the synthetic gate queries."""
    from blockchain_etl_spark.functions.ids import data_word, n_data_words

    dec = hex_word_to_decimal if exact_values else hex_word_to_long
    t0 = F.get("topics", 0)
    t1 = F.get("topics", 1)
    addr_norm = normalized_address("address")
    is_weth = addr_norm == WETH_TOKEN_ADDRESS
    topics2 = (
        F.when(
            is_weth & (t0 == DEPOSIT_EVENT_TOPIC),
            F.array(F.lit(TRANSFER_EVENT_TOPIC), F.lit(ZERO_ADDR), t1),
        )
        .when(
            is_weth & (t0 == WITHDRAWAL_EVENT_TOPIC),
            F.array(F.lit(TRANSFER_EVENT_TOPIC), t1, F.lit(ZERO_ADDR)),
        )
        .otherwise(F.col("topics"))
    )
    # combined word index over (rewritten) topics ++ data words as pure
    # substring arithmetic — no higher-order array build on the hottest
    # decode path (see data_word for why: HOFs run interpreted and
    # re-evaluate per reference)
    out = logs.filter(F.size("topics") >= 1).select(
        "event_id",
        addr_norm.alias("token_address"),
        topics2.alias("_t2"),
        "data",
        (F.size(topics2) + n_data_words("data")).alias("_nw"),
    )
    nt = F.size("_t2")

    def word(i: int):
        return F.when(F.lit(i) < nt, F.get("_t2", i)).otherwise(
            data_word("data", F.lit(i) - nt)
        )

    return (
        out.filter((F.get("_t2", 0) == TRANSFER_EVENT_TOPIC) & (F.col("_nw") == 4))
        .select(
            "event_id",
            "token_address",
            word_to_addr(word(1)).alias("from_address"),
            word_to_addr(word(2)).alias("to_address"),
            dec(word(3)).alias("value"),
        )
    )


def extract_erc1155_transfers(
    logs: DataFrame, exact_values: bool = False
) -> DataFrame:
    """logs → ERC1155 transfer rows (one per (log, id_pos)).

    ``exact_values=True`` decodes ``id``/``value`` as decimal(38,0)
    (ids are often hash-derived uint256, amounts exceed int64); the
    int64 default keeps oracle parity on the synthetic gate rows.

    TransferSingle: exactly 6 words (4 topics + id + value).
    TransferBatch head-tail decode (0-based words): [4]=ids offset,
    [5]=values offset, [6]=id_cnt, [7..6+id_cnt]=ids,
    [7+id_cnt]=va_cnt, then values; id_cnt != va_cnt → rejected.
    """
    from blockchain_etl_spark.functions.ids import data_word, n_data_words

    dec = hex_word_to_decimal if exact_values else hex_word_to_long
    # combined word index over topics ++ data words WITHOUT building the
    # array: the old concat+split_to_words form used a higher-order
    # ``transform`` that runs interpreted and re-evaluates the whole
    # word array per reference — at bench scale that was ~10x the wall
    # of this pure-substring form (which stays in whole-stage codegen,
    # including the variable batch positions: the index may be a Column).
    nt = F.size("topics")

    def word(i):
        idx = F.lit(i) if isinstance(i, int) else i
        return F.when(idx < nt, F.get("topics", idx)).otherwise(
            data_word("data", idx - nt)
        )

    base = logs.filter(F.size("topics") >= 1).select(
        "event_id",
        normalized_address("address").alias("token_address"),
        "topics",
        "data",
        (nt + n_data_words("data")).alias("_nw"),
    )
    hdr = [
        word_to_addr(word(1)).alias("operator"),
        word_to_addr(word(2)).alias("from_address"),
        word_to_addr(word(3)).alias("to_address"),
    ]
    single = (
        base.filter((word(0) == TRANSFER_SINGLE_TOPIC) & (F.col("_nw") == 6))
        .select(
            "event_id",
            "token_address",
            *hdr,
            F.lit("TransferSingle").alias("xfer_type"),
            F.lit(0).alias("id_pos"),
            F.lit(1).alias("id_cnt"),
            dec(word(4)).alias("id"),
            dec(word(5)).alias("value"),
        )
    )
    batch = (
        base.filter((word(0) == TRANSFER_BATCH_TOPIC) & (F.col("_nw") >= 8))
        .withColumn("id_cnt", hex_word_to_long(word(6)).cast("int"))
        # id_cnt >= 1 also guards sequence(0, -1); an empty batch emits
        # no rows, same as the reference's range(0, 0) loop
        .filter(
            (F.col("id_cnt") >= 1)
            & (hex_word_to_long(word(F.col("id_cnt") + 7)) == F.col("id_cnt"))
        )
        .select(
            "event_id",
            "token_address",
            *hdr,
            F.lit("TransferBatch").alias("xfer_type"),
            "id_cnt",
            "topics",
            "data",
            F.explode(F.sequence(F.lit(0), F.col("id_cnt") - 1)).alias("id_pos"),
        )
        .select(
            "event_id",
            "token_address",
            "operator",
            "from_address",
            "to_address",
            "xfer_type",
            "id_pos",
            "id_cnt",
            dec(word(F.col("id_pos") + 7)).alias("id"),
            dec(word(F.col("id_pos") + F.col("id_cnt") + 8)).alias("value"),
        )
    )
    cols = [
        "event_id", "token_address", "operator", "from_address", "to_address",
        "xfer_type", "id_pos", "id_cnt", "id", "value",
    ]
    return single.select(*cols).unionByName(batch.select(*cols))


# ----------------------------------------------------------------- erc721
# ≙ EthErc721TransferExtractor
# (/root/reference/ethereumetl/service/erc721_transfer_extractor.py:17-62)
# and EthCryptoPunkTransferExtractor
# (/root/reference/ethereumetl/service/cryptopunk_extractor.py:36-155).

CRYPTOPUNK_TOKEN_ADDRESS = "0xb47e3cd837ddf8e4c57f05d70ab865de6e193bbb"
# PunkTransfer(index from, index to, punkIndex)
PUNK_TRANSFER_EVENT_TOPIC = (
    "0x05af636b70da6819000c49f85b21fa82081c632069bb626f30932034099107d8"
)
# PunkBought(index punkIndex, value, index fromAddress, index toAddress)
PUNK_BOUGHT_EVENT_TOPIC = (
    "0x58e5d5a525e3b40bc15abaa38b5882678db1ee68befd2f60bafe3a7fd06db9e3"
)
# Assign(index to, punkIndex)
ASSIGN_EVENT_TOPIC = (
    "0x8a0e37b73a0d9c82e205d4d1a3ff3d0b57ce5f4d7bccf6bac03336dc101cb7ba"
)


def extract_erc721_transfers(
    logs: DataFrame,
    erc20_tokens: DataFrame | None = None,
    exact_values: bool = False,
) -> DataFrame:
    """Transfer-topic logs that are NOT known ERC20 contracts and NOT the
    CryptoPunk contract are assumed ERC721 (redundant data, no loss —
    the reference's own heuristic, erc721_transfer_extractor.py:27-38);
    the indexed third topic is the token id, not an amount.

    ``erc20_tokens`` (one ``address`` column) is the known-ERC20 set;
    exclusion is a broadcast LEFT ANTI hash join — the dim is ≪ the log
    stream, so the anti join never shuffles the logs.

    ``exact_values=True`` carries ``token_id`` as the raw 64-char
    lowercase hex word (exact for the full uint256 range — real ERC721
    ids are routinely hash-derived ≥ 2^63, and even decimal(38,0) caps
    at 2^120, so the string IS the production representation, exactly as
    the reference keeps uint256 fields as strings). Default int64 keeps
    the cross-engine oracle parity for the synthetic gate queries and
    fails loud under ANSI mode on out-of-range ids rather than
    truncating."""
    from blockchain_etl_spark.functions.ids import data_word, n_data_words

    # word i of topics ++ data_words WITHOUT materializing the array:
    # the array form (concat + split_to_words) uses a higher-order
    # ``transform`` that runs interpreted and re-evaluates per
    # reference — this substring form stays inside whole-stage codegen
    # (measured 3-4x on the extractor at bench scale).
    nt = F.size("topics")
    nw = nt + n_data_words("data")

    def word(i: int):
        return F.when(F.lit(i) < nt, F.get("topics", i)).otherwise(
            data_word("data", F.lit(i) - nt)
        )

    base = logs.filter(F.size("topics") >= 1).select(
        "event_id",
        normalized_address("address").alias("token_address"),
        F.col("topics"),
        F.col("data"),
        nw.alias("_nw"),
    )
    out = base.filter(
        (F.get("topics", 0) == TRANSFER_EVENT_TOPIC)
        & (F.col("_nw") == 4)
        & (F.col("token_address") != CRYPTOPUNK_TOKEN_ADDRESS)
    )
    if erc20_tokens is not None:
        dim = F.broadcast(
            erc20_tokens.select(
                F.lower(F.col("address")).alias("token_address")
            ).distinct()
        )
        out = out.join(dim, "token_address", "left_anti")
    token_id = (
        F.lpad(F.lower(F.regexp_replace(word(3), "^0x", "")), 64, "0")
        if exact_values
        else hex_word_to_long(word(3))
    )
    return out.select(
        "event_id",
        "token_address",
        word_to_addr(word(1)).alias("from_address"),
        word_to_addr(word(2)).alias("to_address"),
        token_id.alias("token_id"),
    )


def decode_cryptopunk_logs(logs: DataFrame) -> DataFrame:
    """Per-topic CryptoPunk decode (cryptopunk_extractor.py:40-84): each
    of the four event shapes has its own word indexes and required
    length — one codegen'd projection, no Python.

    Input logs carry (address, topics, data, block_number,
    transaction_hash, transaction_index, log_index)."""
    from blockchain_etl_spark.functions.ids import data_word, n_data_words

    addr = normalized_address("address")
    t0 = F.get("topics", 0)
    base = (
        logs.filter(F.size("topics") >= 1)
        .filter(addr == CRYPTOPUNK_TOKEN_ADDRESS)
        .select(
            addr.alias("token_address"),
            t0.alias("topics_0"),
            "topics",
            "data",
            (F.size("topics") + n_data_words("data")).alias("_nw"),
            "block_number",
            "transaction_hash",
            "transaction_index",
            "log_index",
        )
    )
    # combined topics++data word as scalar substring arithmetic — the
    # per-topic dynamic indexes stay inside whole-stage codegen (see
    # data_word for why the array form is 3-10x slower)
    nt = F.size("topics")

    def word(idx):
        return F.when(idx < nt, F.get("topics", idx)).otherwise(
            data_word("data", idx - nt)
        )
    req = (
        F.when(F.col("topics_0") == PUNK_TRANSFER_EVENT_TOPIC, 4)
        .when(F.col("topics_0") == PUNK_BOUGHT_EVENT_TOPIC, 5)
        .when(F.col("topics_0") == TRANSFER_EVENT_TOPIC, 4)
        .when(F.col("topics_0") == ASSIGN_EVENT_TOPIC, 3)
    )
    from_idx = (
        F.when(F.col("topics_0") == PUNK_TRANSFER_EVENT_TOPIC, 1)
        .when(F.col("topics_0") == PUNK_BOUGHT_EVENT_TOPIC, 2)
        .when(F.col("topics_0") == TRANSFER_EVENT_TOPIC, 1)
    )
    to_idx = (
        F.when(F.col("topics_0") == PUNK_TRANSFER_EVENT_TOPIC, 2)
        .when(F.col("topics_0") == PUNK_BOUGHT_EVENT_TOPIC, 3)
        .when(F.col("topics_0") == TRANSFER_EVENT_TOPIC, 2)
        .when(F.col("topics_0") == ASSIGN_EVENT_TOPIC, 1)
    )
    id_idx = (
        F.when(F.col("topics_0") == PUNK_TRANSFER_EVENT_TOPIC, 3)
        .when(F.col("topics_0") == PUNK_BOUGHT_EVENT_TOPIC, 1)
        .when(F.col("topics_0") == ASSIGN_EVENT_TOPIC, 2)
    )
    return base.filter(req.isNotNull() & (F.col("_nw") == req)).select(
        "topics_0",
        "token_address",
        F.when(F.col("topics_0") == ASSIGN_EVENT_TOPIC, F.lit(ZERO_ADDR))
        .otherwise(word_to_addr(word(from_idx)))
        .alias("from_address"),
        word_to_addr(word(to_idx)).alias("to_address"),
        hex_word_to_long(word(id_idx)).alias("token_id"),
        "block_number",
        "transaction_hash",
        "transaction_index",
        "log_index",
    )


def extract_cryptopunk_transfers(logs: DataFrame) -> DataFrame:
    """CryptoPunk decode + companion-Transfer merge
    (cryptopunk_extractor.py:86-155): a PunkTransfer pairs with the
    ERC20-style Transfer one log_index earlier, a PunkBought with a
    non-zero buyer pairs at -2 (sale) and ANY PunkBought also pairs at
    -1 (bid accept — buyer lives in the companion Transfer); Assign rows
    pass through. Output to_address/log_index come from the companion
    Transfer, from_address/token_id from the punk event.

    Spark-first, single pass: the reference's pandas merges collapse to
    ONE window shuffle on (block, tx) ordered by log_index. A companion
    at log_index-1 or log_index-2 can only be the lag(1) or lag(2) row
    within the transaction — log indexes are integers, so at most one
    in-set row lies strictly between i-2 and i — which makes the
    lag-check projection exactly equivalent to the former three
    equi-joins while scanning the decoded source once instead of eight
    times (pinned by the merge-path unit test and the gate oracle)."""
    d = decode_cryptopunk_logs(logs)
    keys = ["block_number", "transaction_hash", "transaction_index"]
    w_tx = Window.partitionBy(*keys).orderBy("log_index")
    comp = F.struct("topics_0", "token_address", "to_address", "log_index")
    d = d.withColumn("c1", F.lag(comp, 1).over(w_tx)).withColumn(
        "c2", F.lag(comp, 2).over(w_tx)
    )

    def companion(offset: int) -> Column:
        # The Transfer at exactly log_index-offset, if present in the
        # decoded set, or NULL. Offset 1 can only be lag(1); offset 2
        # may sit at lag(1) (nothing between) or lag(2).
        want = F.col("log_index") - offset

        def ok(c: str) -> Column:
            return (
                (F.col(f"{c}.log_index") == want)
                & (F.col(f"{c}.topics_0") == TRANSFER_EVENT_TOPIC)
                & (F.col(f"{c}.token_address") == F.col("token_address"))
            )

        m = F.when(ok("c1"), F.col("c1"))
        return m.when(ok("c2"), F.col("c2")) if offset > 1 else m

    def hit(cond: Column, m: Column) -> Column:
        return F.when(
            cond & m.isNotNull(),
            F.struct(
                m["to_address"].alias("s_to_address"),
                m["log_index"].alias("s_log_index"),
            ),
        )

    t0 = F.col("topics_0")
    cand = F.array(
        # Assign passes through with its own claimer / log_index.
        F.when(
            t0 == ASSIGN_EVENT_TOPIC,
            F.struct(
                F.col("to_address").alias("s_to_address"),
                F.col("log_index").alias("s_log_index"),
            ),
        ),
        hit(t0 == PUNK_TRANSFER_EVENT_TOPIC, companion(1)),
        hit(
            (t0 == PUNK_BOUGHT_EVENT_TOPIC) & (F.col("to_address") != ZERO_ADDR),
            companion(2),
        ),
        hit(t0 == PUNK_BOUGHT_EVENT_TOPIC, companion(1)),
    )
    return (
        d.select(
            *keys,
            "token_address",
            "from_address",
            "token_id",
            F.explode(cand).alias("m"),
        )
        .filter(F.col("m").isNotNull())
        .select(
            "block_number",
            "transaction_hash",
            "transaction_index",
            "token_address",
            "from_address",
            F.col("m.s_to_address").alias("to_address"),
            "token_id",
            F.col("m.s_log_index").alias("log_index"),
        )
    )
