"""Origin Protocol marketplace extraction — log-triggered IPFS content
fetch → listing / shop-product rows (≙ ExportOriginJob,
/root/reference/ethereumetl/jobs/export_origin_job.py:1-139, and the
IPFS content walk, /root/reference/ethereumetl/ipfs/origin.py:1-167 +
service/origin_extractor.py:44-76).

Spark-first inversion of the reference's per-event fetch loop (one
web3 filter + one IPFS round-trip per log): the log scan is a single
pushed-down filter over the log table, the bytes32→base58 pointer
decode is one Arrow-batched expression over the MATCHED rows only, the
content fetch goes through the token-service template — DISTINCT
pointers → pluggable Arrow-batched fetcher → rows — and the JSON
bodies are parsed JVM-side with ``from_json``. A reorg-style burst of
N logs over K distinct listings costs K fetches, never N.

Fetch failures follow the reference exactly: a listing whose content
fetch fails is logged-and-skipped (``get_origin_marketplace_data`` →
``(None, [])``), never a pipeline error; the fetcher marks them with a
null body.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Chain constants (public, on-chain values — origin_extractor.py:10-16,
# export_origin_job.py:14-19).
LISTING_CREATED_TOPIC = (
    "0xec3d306143145322b45d2788d826e3b7b9ad062f16e1ec59a5eaba214f96ee3c"
)
LISTING_UPDATED_TOPIC = (
    "0x470503ad37642fff73a57bac35e69733b6b38281a893f39b50c285aad1f040e0"
)
PROCESSABLE_TOPICS = [LISTING_CREATED_TOPIC, LISTING_UPDATED_TOPIC]
MARKETPLACE_V0_ADDRESS = "0x819bb9964b6ebf52361f1ae42cf4831b921510f9"
MARKETPLACE_V1_ADDRESS = "0x698ff47b84837d3971118a369c570172ee7e54c2"
MARKETPLACE_V1_EPOCH_BLOCK = 8_582_597

IPFS_GATEWAYS = [
    "https://ipfs-prod.ogn.app/ipfs",
    "https://gateway.ipfs.io/ipfs",
]

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

LISTING_JSON_SCHEMA = T.StructType([
    T.StructField("listingType", T.StringType()),
    T.StructField("category", T.StringType()),
    T.StructField("subCategory", T.StringType()),
    T.StructField("language", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField(
        "price",
        T.StructType([
            T.StructField("amount", T.StringType()),
            T.StructField("currency", T.StringType()),
        ]),
    ),
    T.StructField("shopIpfsHash", T.StringType()),
])

PRODUCT_JSON_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("externalId", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("price", T.StringType()),
    T.StructField("currency", T.StringType()),
    T.StructField("image", T.StringType()),
    T.StructField(
        "variants",
        T.ArrayType(T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("externalId", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("price", T.StringType()),
            T.StructField("option1", T.StringType()),
            T.StructField("option2", T.StringType()),
            T.StructField("option3", T.StringType()),
        ])),
    ),
]))

FETCH_SCHEMA = T.StructType([
    T.StructField("ipfs_hash", T.StringType()),
    T.StructField("body", T.StringType()),  # raw JSON; null = fetch miss
])


def b58encode(raw: bytes) -> str:
    """From-scratch base58 (the public Bitcoin alphabet) — the pointer
    encoding IPFS CIDv0 uses; ≙ origin_extractor.py:27-29 (there via
    the ``base58`` package, not available in this image)."""
    n = int.from_bytes(raw, "big")
    out = []
    while n > 0:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    for b in raw:
        if b != 0:
            break
        out.append(_B58_ALPHABET[0])
    return "".join(reversed(out))


def b58decode(s: str) -> bytes:
    n = 0
    for ch in s:
        n = n * 58 + _B58_ALPHABET.index(ch)
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    pad = 0
    for ch in s:
        if ch != _B58_ALPHABET[0]:
            break
        pad += 1
    return b"\x00" * pad + raw


def hex_to_ipfs_hash(word_hex: str) -> str:
    """bytes32 hex → base58 CIDv0 (prefix 0x1220 = sha2-256/32;
    ≙ origin_extractor.py hex_to_ipfs_hash)."""
    return b58encode(bytes.fromhex("1220" + word_hex.removeprefix("0x")))


def ipfs_hash_to_hex(cid: str) -> str:
    """Inverse decode: base58 CIDv0 → the original bytes32 hex word."""
    raw = b58decode(cid)
    if raw[:2] != b"\x12\x20":
        raise ValueError(f"not a CIDv0 sha2-256 pointer: {cid}")
    return "0x" + raw[2:].hex()


@F.pandas_udf(T.StringType())
def _ipfs_hash_udf(words):  # pragma: no cover - exercised via plans
    return words.map(
        lambda w: hex_to_ipfs_hash(w) if w is not None else None
    )


def extract_origin_listing_events(
    logs: DataFrame, v1_epoch_block: int = MARKETPLACE_V1_EPOCH_BLOCK
) -> DataFrame:
    """logs(event_id, blknum, address, topics, data) → one row per
    ListingCreated/ListingUpdated event with the decoded listing id and
    IPFS pointer. The topic/shape filter is a pushed-down predicate;
    the base58 pointer decode (the one non-SQL step) runs Arrow-batched
    over matched rows only. Contract version derives from the block
    epoch exactly as the reference splits its filter ranges
    (export_origin_job.py:72-113)."""
    from blockchain_etl_spark.functions.ids import hex_to_dec

    base = logs.filter(
        F.get("topics", 0).isin(PROCESSABLE_TOPICS) & (F.size("topics") >= 3)
    )
    version = F.when(
        F.col("blknum") < F.lit(v1_epoch_block), F.lit("000")
    ).otherwise(F.lit("001"))
    return base.select(
        "event_id",
        "blknum",
        F.col("event_id").alias("log_index"),
        version.alias("contract_version"),
        # "1-<version>-<id>" (≙ compose_listing_id, network 1 = mainnet)
        F.concat(
            F.lit("1-"), version, F.lit("-"),
            hex_to_dec(F.get("topics", 2)).cast("string"),
        ).alias("listing_id"),
        _ipfs_hash_udf(F.col("data")).alias("ipfs_hash"),
    )


# --------------------------------------------------------------- fetchers
def http_ipfs_fetcher(
    gateways: list[str] | None = None, timeout: float = 10.0
) -> Callable:
    """Production content fetcher: stdlib-urllib GET against the
    configured IPFS gateways with per-hash failover (≙ IpfsClient over
    IPFS_PRIMARY/SECONDARY_GATEWAY_URL, ipfs/origin.py:10-15). Failures
    on every gateway yield a null body — the skip path, never an
    error. Tested against a local HTTP double (no network in CI)."""
    urls = list(gateways or IPFS_GATEWAYS)

    def _fetch(batches) -> Iterator:
        import urllib.error
        import urllib.request

        import pandas as pd

        def one(h):
            for g in urls:
                try:
                    with urllib.request.urlopen(
                        f"{g}/{h}", timeout=timeout
                    ) as r:
                        return r.read().decode("utf-8", "replace")
                except (urllib.error.URLError, OSError, ValueError):
                    continue
            return None

        for pdf in batches:
            yield pd.DataFrame(
                {"ipfs_hash": pdf["ipfs_hash"], "body": pdf["ipfs_hash"].map(one)}
            )

    return _fetch


def deterministic_fake_ipfs_fetcher(batches) -> Iterator:
    """Test/bench stand-in (no IPFS gateway reachable from this image):
    the listing body is derived from the ORIGINAL bytes32 word the CID
    encodes (decoded back client-side), so oracles that synthesized the
    word can re-derive every field in SQL without base58. Words whose
    last byte ≡ 7 (mod 11) MISS (null body) — the reference's
    logged-and-skipped fetch-failure path."""
    import pandas as pd

    def one(h):
        if h is None:
            return None
        w = ipfs_hash_to_hex(h)[2:]
        if int(w[-2:], 16) % 11 == 7:
            return None  # deterministic fetch miss
        body = {
            "listingType": "unit" if int(w[0], 16) % 2 == 0 else "fractional",
            "category": "cat-" + w[0],
            "subCategory": "sub-" + w[1],
            "language": "en" if int(w[2], 16) % 3 else "zh",
            "title": "Listing " + w[:8],
            "description": w[:16],
            "price": {
                "amount": str(int(w[2:6], 16)),
                "currency": ["ETH", "DAI", "fiat-USD"][int(w[6:8], 16) % 3],
            },
        }
        if int(w[8:10], 16) % 5 == 0:
            body["shopIpfsHash"] = "shop-" + w
        return json.dumps(body)

    for pdf in batches:
        yield pd.DataFrame(
            {"ipfs_hash": pdf["ipfs_hash"], "body": pdf["ipfs_hash"].map(one)}
        )


def deterministic_fake_shop_fetcher(batches) -> Iterator:
    """Shop leg stand-in: one products.json per shop pointer
    (``shop-<word>``), TWO products derived from the word, the second
    carrying ONE variant — covering the product and variant explode
    paths. A production fetcher composes the reference's multi-step
    walk (index.html → data-dir → products.json → per-product
    data.json, ipfs/origin.py:26-122) behind this same one-pointer
    interface."""
    import pandas as pd

    def one(h):
        if h is None or not h.startswith("shop-"):
            return None
        w = h[5:]
        products = [
            {
                "id": "p0",
                "externalId": str(int(w[0:4], 16)),
                "title": "Product p0-" + w[:6],
                "description": "d-" + w[:8],
                "price": str(int(w[4:8], 16)),
                "currency": "fiat-USD",
                "image": None,
                "variants": [],
            },
            {
                "id": "p1",
                "externalId": None,
                "title": "Product p1-" + w[:6],
                "description": "d-" + w[:8],
                "price": str(int(w[8:12], 16)),
                "currency": "fiat-USD",
                "image": None,
                "variants": [
                    {
                        "id": "v1",
                        "externalId": str(int(w[12:16], 16)),
                        "title": "Variant v1-" + w[:6],
                        "price": str(int(w[16:20], 16)),
                        "option1": "o-" + w[20],
                        "option2": None,
                        "option3": None,
                    }
                ],
            },
        ]
        return json.dumps(products)

    for pdf in batches:
        yield pd.DataFrame(
            {"ipfs_hash": pdf["ipfs_hash"], "body": pdf["ipfs_hash"].map(one)}
        )


def _fetch_distinct(
    df: DataFrame, hash_col: str, fetcher: Callable
) -> DataFrame:
    """DISTINCT pointers → Arrow-batched fetch → (ipfs_hash, body).
    The fetch cost is O(distinct pointers), not O(log rows)."""
    return (
        df.select(F.col(hash_col).alias("ipfs_hash"))
        .filter(F.col("ipfs_hash").isNotNull())
        .distinct()
        .mapInPandas(fetcher, FETCH_SCHEMA)
    )


# ----------------------------------------------------------------- outputs
def origin_marketplace_listings(
    events: DataFrame, fetcher: Callable | None = None
) -> DataFrame:
    """Listing events + fetched content → marketplace listing rows
    (≙ OriginMarketplaceListing, ipfs/origin.py:125-151). Fetch misses
    drop the row, as the reference returns ``(None, [])``. Returns the
    listing columns plus ``shop_ipfs_hash`` (null unless the listing is
    a shop) for the product leg to continue from."""
    fetched = _fetch_distinct(
        events, "ipfs_hash", fetcher or deterministic_fake_ipfs_fetcher
    )
    j = events.join(fetched, "ipfs_hash", "left").filter(
        F.col("body").isNotNull()
    )
    body = F.from_json("body", LISTING_JSON_SCHEMA)
    return j.select(
        F.col("blknum").alias("block_number"),
        "log_index",
        "listing_id",
        "ipfs_hash",
        F.coalesce(body["listingType"], F.lit("")).alias("listing_type"),
        F.coalesce(body["category"], F.lit("")).alias("category"),
        F.coalesce(body["subCategory"], F.lit("")).alias("subcategory"),
        F.coalesce(body["language"], F.lit("")).alias("language"),
        F.coalesce(body["title"], F.lit("")).alias("title"),
        F.coalesce(body["description"], F.lit("")).alias("description"),
        F.coalesce(body["price"]["amount"], F.lit("")).alias("price"),
        F.coalesce(body["price"]["currency"], F.lit("")).alias("currency"),
        body["shopIpfsHash"].alias("shop_ipfs_hash"),
    )


def origin_shop_products(
    listings: DataFrame, fetcher: Callable | None = None
) -> DataFrame:
    """Shop listings → product + variant rows (≙ OriginShopProduct,
    ipfs/origin.py:26-122): one fetch per DISTINCT shop pointer, then
    a JVM-side explode of products and their variants — the top
    product row first, its variants (parent_external_id set) after,
    exactly the reference's emit order."""
    shops = listings.filter(F.col("shop_ipfs_hash").isNotNull())
    fetched = _fetch_distinct(
        shops, "shop_ipfs_hash", fetcher or deterministic_fake_shop_fetcher
    )
    j = shops.join(
        fetched,
        shops["shop_ipfs_hash"] == fetched["ipfs_hash"],
        "inner",
    ).filter(F.col("body").isNotNull())
    prod = F.explode(F.from_json("body", PRODUCT_JSON_SCHEMA)).alias("p")
    base = j.select(
        "block_number", "log_index", "listing_id", "shop_ipfs_hash", prod
    ).filter(F.col("p.id").isNotNull())
    top = base.select(
        "block_number", "log_index", "listing_id",
        F.concat("listing_id", F.lit("-"), F.col("p.id")).alias("product_id"),
        F.concat("shop_ipfs_hash", F.lit("/"), F.col("p.id")).alias("ipfs_path"),
        F.col("p.externalId").alias("external_id"),
        F.lit(None).cast("string").alias("parent_external_id"),
        F.col("p.title").alias("title"),
        F.col("p.description").alias("description"),
        F.col("p.price").alias("price"),
        F.coalesce(F.col("p.currency"), F.lit("fiat-USD")).alias("currency"),
        F.lit(None).cast("string").alias("option1"),
        F.lit(None).cast("string").alias("option2"),
        F.lit(None).cast("string").alias("option3"),
    )
    v = base.select(
        "block_number", "log_index", "listing_id", "shop_ipfs_hash",
        F.col("p.id").alias("pid"),
        F.col("p.externalId").alias("p_ext"),
        F.col("p.description").alias("p_desc"),
        F.coalesce(F.col("p.currency"), F.lit("fiat-USD")).alias("currency"),
        F.explode("p.variants").alias("v"),
    )
    variants = v.select(
        "block_number", "log_index", "listing_id",
        F.concat("listing_id", F.lit("-"), F.col("v.id")).alias("product_id"),
        F.concat("shop_ipfs_hash", F.lit("/"), F.col("pid")).alias("ipfs_path"),
        F.col("v.externalId").alias("external_id"),
        F.col("p_ext").alias("parent_external_id"),
        F.col("v.title").alias("title"),
        F.col("p_desc").alias("description"),
        F.col("v.price").alias("price"),
        "currency",
        F.col("v.option1").alias("option1"),
        F.col("v.option2").alias("option2"),
        F.col("v.option3").alias("option3"),
    )
    return top.unionByName(variants)
