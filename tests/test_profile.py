"""Address profile (≙ ProfileService.get_profile,
blockchainetl/service/profile_service.py:15-53): token-balance fold,
the erc20/ether union legs, NULL→0 coercion, and miner-only addresses
appearing with zero transfer legs."""

from pyspark.sql import functions as F

from blockchain_etl_spark.operators import balances as BAL


def _transfers(spark):
    rows = [
        # (token, from, to, value, txhash)
        ("tkA", "alice", "bob", 10, "h1"),
        ("tkA", "alice", "bob", 5, "h1"),   # same tx, 2 transfers
        ("tkA", "bob", "carol", 7, "h2"),
        ("tkB", "alice", "carol", 3, "h3"),
    ]
    return spark.createDataFrame(
        rows, "token_address string, from_address string, "
              "to_address string, value long, txhash string")


def test_token_balances_zero_fill_and_directions(spark):
    tb = {(r["address"], r["token_address"]): r
          for r in BAL.token_balances(_transfers(spark)).collect()}
    a = tb[("alice", "tkA")]
    # alice only SENDS tkA: vin leg zero-filled, not NULL
    assert (a["vin_value"], a["vin_txs"], a["vin_xfers"]) == (0, 0, 0)
    assert (a["out_value"], a["out_txs"], a["out_xfers"]) == (15, 1, 2)
    b = tb[("bob", "tkA")]
    assert (b["vin_value"], b["out_value"]) == (15, 7)
    assert ("carol", "tkB") in tb and ("carol", "tkA") in tb


def test_address_profiles_union_and_n_rows(spark):
    tok = BAL.token_balances(_transfers(spark))
    latest = spark.createDataFrame(
        [("alice", 2, 1, 9, 4, 100, 50),
         # miner-only address: zero legs but PRESENT (reference's
         # latest_balances includes reward-only rows)
         ("miner", 0, 0, 0, 0, 0, 0)],
        "address string, vin_txs long, out_txs long, vin_xfers long, "
        "out_xfers long, vin_value long, out_value long")
    prof = {(r["typo"], r["address"]): r
            for r in BAL.address_profiles(latest, tok).collect()}
    # erc20 n_rows = distinct tokens the address touched
    assert prof[("erc20", "alice")]["n_rows"] == 2
    assert prof[("erc20", "alice")]["out_value"] == 18  # 15 tkA + 3 tkB
    assert prof[("erc20", "carol")]["vin_value"] == 10  # 7 tkA + 3 tkB
    assert prof[("ether", "alice")]["n_rows"] == 1
    assert prof[("ether", "alice")]["vin_value"] == 100
    assert prof[("ether", "miner")]["vin_value"] == 0
    # no cross-leg leakage: ether rows only from latest, erc20 from tok
    assert ("erc20", "miner") not in prof
    assert ("ether", "bob") not in prof


def test_address_profiles_null_coercion(spark):
    # NULL measures in the inputs must read as 0 (the service's
    # Decimal/None loop) — not NULL, not poisoning the sum
    latest = spark.createDataFrame(
        [("alice", None, 1, None, 4, None, 50)],
        "address string, vin_txs long, out_txs long, vin_xfers long, "
        "out_xfers long, vin_value long, out_value long")
    empty_tok = latest.limit(0).select(
        "address", F.lit("t").alias("token_address"), "vin_txs",
        "out_txs", "vin_xfers", "out_xfers", "vin_value", "out_value")
    row = BAL.address_profiles(latest, empty_tok).collect()
    assert len(row) == 1 and row[0]["typo"] == "ether"
    assert row[0]["vin_txs"] == 0 and row[0]["vin_value"] == 0
    assert row[0]["out_value"] == 50
