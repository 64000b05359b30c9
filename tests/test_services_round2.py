"""Round-2 services: token-metadata dim cache, txpool snapshot source,
bytecode contract classifier."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blockchain_etl_spark.operators import contracts as C
from blockchain_etl_spark.sources.token_service import TokenDimService
from blockchain_etl_spark.sources.txpool_source import fetch_txpool


def test_token_dim_cache_persists_and_fetches_only_misses(spark, tmp_path):
    def fetcher(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "address": pdf["address"],
                    "symbol": pdf["address"].str[-3:].str.upper(),
                    "name": "T " + pdf["address"],
                    "decimals": 18,
                    "total_supply": "1000",
                }
            )

    svc = TokenDimService(spark, str(tmp_path / "cache"), fetcher=fetcher)
    xfers = spark.createDataFrame(
        [("0xAAA", 1), ("0xbbb", 2), ("0xaaa", 3)], "token_address string, n long"
    )
    dim = svc.resolve(xfers)
    got = {r["address"]: r["symbol"] for r in dim.collect()}
    assert got["0xaaa"] == "AAA" and got["0xbbb"] == "BBB"  # lowercased, distinct
    assert dim.count() == 3  # 2 fetched + the ETH pseudo-token seed row

    # cached rows are NOT refetched: plant a sentinel for 0xaaa, then
    # resolve a superset — the sentinel must survive, the new address
    # must appear
    planted = svc.dim().replace("AAA", "SENTINEL", subset=["symbol"])
    svc._commit(planted)
    more = spark.createDataFrame(
        [("0xaaa", 1), ("0xccc", 2)], "token_address string, n long"
    )
    dim2 = svc.resolve(more)
    got2 = {r["address"]: r["symbol"] for r in dim2.collect()}
    assert got2["0xaaa"] == "SENTINEL"  # cache hit, not refetched
    assert got2["0xccc"] == "CCC"  # miss fetched

    # idempotent resolve (no misses) leaves the table version untouched
    before = sorted(os.listdir(svc.cache_path))
    svc.resolve(more)
    assert sorted(os.listdir(svc.cache_path)) == before

    # persistence: a fresh service over the same path sees the cache
    svc2 = TokenDimService(spark, str(tmp_path / "cache"), fetcher=fetcher)
    enriched = svc2.enrich(xfers)
    got3 = {r["token_address"]: r["token_symbol"] for r in enriched.collect()}
    assert got3["0xbbb"] == "BBB"
    assert got3["0xAAA"] == "SENTINEL"


def test_txpool_snapshot(spark):
    df = fetch_txpool(spark, blknum=123, block_timestamp=1_700_000_000, n_shards=4)
    rows = df.collect()
    assert len(rows) == 4 * 50
    assert len({r["tx_hash"] for r in rows}) == len(rows)  # deduped
    assert {r["blknum"] for r in rows} == {123}
    assert {r["pool"] for r in rows} == {"pending", "queued"}
    assert all(r["item_id"] is not None for r in rows)


def test_contract_classifier(spark):
    run = lambda sigs: "".join("63" + C.sighash(s)[2:] for s in sigs)
    erc20 = "0x" + run(C.ERC20_REQUIRED)
    erc721 = "0x" + run(
        ["balanceOf(address)", "ownerOf(uint256)", "approve(address,uint256)",
         "transferFrom(address,address,uint256)"]
    )
    # erc20 selectors PLUS tokenURI → the not-clause kills is_erc20
    uri_poison = erc20 + run(["tokenURI(uint256)"])
    # PUSH2 operand bytes that contain 0x63 must not be misread as PUSH4
    noise = "0x616301" + run(["totalSupply()"])
    df = spark.createDataFrame(
        [(1, erc20), (2, erc721), (3, uri_poison), (4, "0x"), (5, noise)],
        "cid long, bytecode string",
    )
    out = {r["cid"]: r.asDict() for r in C.classify_contracts(df).collect()}
    assert out[1]["is_erc20"] and not out[1]["is_erc721"]
    assert out[2]["is_erc721"] and not out[2]["is_erc20"]
    assert not out[3]["is_erc20"]  # tokenURI poison
    assert out[4]["function_sighashes"] == []
    assert out[5]["function_sighashes"] == [C.sighash("totalSupply()")]


def test_token_dim_commit_is_crash_safe(spark, tmp_path):
    """A crash mid-commit must never wedge the cache: leftover stage dirs
    and pointer tmp files (the only possible crash residue under the
    pointer-file scheme) are recovered/GC'd by the next commit, and the
    cache stays readable at every intermediate state."""
    import os

    cache = str(tmp_path / "cache")
    svc = TokenDimService(spark, cache)
    # simulate crash residue: an orphaned stage dir and a torn pointer tmp
    os.makedirs(os.path.join(cache, "stage-deadbeef"))
    with open(os.path.join(cache, "stage-deadbeef", "junk"), "w") as f:
        f.write("x")
    with open(os.path.join(cache, "CURRENT.tmp-torn"), "w") as f:
        f.write("stage-torn")
    # cache still readable despite the residue
    assert svc.dim().count() >= 1
    # next commit succeeds (old scheme raised ENOTEMPTY here) and GCs
    addrs = spark.createDataFrame([("0xAA",), ("0xBB",)], ["token_address"])
    dim = svc.resolve(addrs)
    assert dim.filter(dim.address == "0xaa").count() == 1
    left = sorted(os.listdir(cache))
    assert not any(d.startswith("CURRENT.tmp-") for d in left)
    assert sum(d.startswith("stage-") for d in left) == 1  # only the live one
    # survives a reopen (pointer is the source of truth)
    svc2 = TokenDimService(spark, cache)
    assert svc2.dim().count() == dim.count()
