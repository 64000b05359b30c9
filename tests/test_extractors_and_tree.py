"""Round-2 operators: ABI-decode extractors (token transfer + erc1155),
unbounded-depth call-tree flatten, label_of/tag_value_usd rule UDFs, and
the manifest version→lsn sidecar index."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blockchain_etl_spark.operators import extractors as EXT
from blockchain_etl_spark.operators.tree import flatten_geth_traces

W = lambda h: "0x" + "0" * (64 - len(h)) + h  # left-pad to a 32-byte word
ADDR_A = "a" * 40
ADDR_B = "b" * 40


def _logs(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, address string, topics array<string>, data string"
    )


def test_token_transfer_extract_and_weth_rewrite(spark):
    rows = [
        # plain Transfer: topics [T, from, to] + 1 data word
        (1, "0x" + "c" * 40, [EXT.TRANSFER_EVENT_TOPIC, W(ADDR_A), W(ADDR_B)], W("64")),
        # WETH Deposit → Transfer(zero → dst)
        (2, EXT.WETH_TOKEN_ADDRESS, [EXT.DEPOSIT_EVENT_TOPIC, W(ADDR_A)], W("c8")),
        # WETH Withdrawal → Transfer(src → zero)
        (3, EXT.WETH_TOKEN_ADDRESS, [EXT.WITHDRAWAL_EVENT_TOPIC, W(ADDR_A)], W("2a")),
        # Deposit at a NON-weth address: not rewritten, not a transfer
        (4, "0x" + "d" * 40, [EXT.DEPOSIT_EVENT_TOPIC, W(ADDR_A)], W("01")),
        # weird event: Transfer with 2 data words (5 total) → rejected
        (5, "0x" + "c" * 40, [EXT.TRANSFER_EVENT_TOPIC, W(ADDR_A), W(ADDR_B)],
         W("64")[0:66] + "0" * 63 + "1"),
        # anonymous log → skipped
        (6, "0x" + "c" * 40, [], W("64")),
    ]
    out = {
        r["event_id"]: r.asDict()
        for r in EXT.extract_token_transfers(_logs(spark, rows)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["from_address"] == "0x" + ADDR_A
    assert out[1]["to_address"] == "0x" + ADDR_B
    assert out[1]["value"] == 0x64
    assert out[2]["from_address"] == EXT.ZERO_ADDR
    assert out[2]["to_address"] == "0x" + ADDR_A
    assert out[2]["value"] == 0xC8
    assert out[3]["from_address"] == "0x" + ADDR_A
    assert out[3]["to_address"] == EXT.ZERO_ADDR


def test_erc1155_single_and_batch(spark):
    hdr = [W(ADDR_A), W(ADDR_A), W(ADDR_B)]  # operator, from, to
    batch_words = [
        W("40"), W("a0"),       # offsets
        W("2"), W("b"), W("c"),  # id_cnt=2, ids 11, 12
        W("2"), W("14"), W("1e"),  # va_cnt=2, values 20, 30
    ]
    mismatch = [W("40"), W("a0"), W("2"), W("b"), W("c"), W("3"), W("14"), W("1e")]
    rows = [
        (1, "0x" + "c" * 40, [EXT.TRANSFER_SINGLE_TOPIC, *hdr],
         "0x" + W("7")[2:] + W("5")[2:]),                                   # id 7 val 5
        (2, "0x" + "c" * 40, [EXT.TRANSFER_BATCH_TOPIC, *hdr],
         "0x" + "".join(w[2:] for w in batch_words)),
        (3, "0x" + "c" * 40, [EXT.TRANSFER_BATCH_TOPIC, *hdr],
         "0x" + "".join(w[2:] for w in mismatch)),                           # cnt mismatch
    ]
    out = EXT.extract_erc1155_transfers(_logs(spark, rows)).collect()
    by_key = {(r["event_id"], r["id_pos"]): r.asDict() for r in out}
    assert set(by_key) == {(1, 0), (2, 0), (2, 1)}
    assert by_key[(1, 0)]["xfer_type"] == "TransferSingle"
    assert by_key[(1, 0)]["id"] == 7 and by_key[(1, 0)]["value"] == 5
    assert by_key[(2, 0)]["id"] == 11 and by_key[(2, 0)]["value"] == 20
    assert by_key[(2, 1)]["id"] == 12 and by_key[(2, 1)]["value"] == 30
    assert by_key[(2, 1)]["id_cnt"] == 2


def test_flatten_geth_traces_unbounded_depth(spark):
    # a 70-deep linear chain — beyond any fixed-iteration flatten
    node = {"type": "call", "from": "0xa", "to": "0xb", "value": 1, "calls": []}
    for d in range(69):
        node = {"type": "call", "from": "0xa", "to": "0xb", "value": 1,
                "calls": [node], "error": d == 10}
    df = spark.createDataFrame([(7, json.dumps(node))], "tx_id long, trace_json string")
    rows = flatten_geth_traces(df).collect()
    assert len(rows) == 70
    depths = sorted(r["depth"] for r in rows)
    assert depths == list(range(70))
    paths = {tuple(r["trace_address"]) for r in rows}
    assert tuple([0] * 69) in paths and () in paths
    assert sum(1 for r in rows if r["error"]) == 1


def test_rule_label_of_and_tag_value_usd(spark):
    from blockchain_etl_spark.functions.rules import rule_filter, rule_to_sql
    from blockchain_etl_spark.operators.alerts import with_labels

    df = spark.createDataFrame(
        [(1, "0xaa", 500.0), (2, "0xbb", 250.0), (3, "0xcc", 50.0)],
        "id long, sender string, value double",
    )
    labels = spark.createDataFrame(
        [("0xaa", "exchange"), ("0xbb", "mixer")], "address string, label string"
    )
    tagged = with_labels(df, labels, ["sender"])
    hits = tagged.filter(rule_filter("label_of(sender) == 'mixer'")).collect()
    assert [r["id"] for r in hits] == [2]
    # unlabeled → '' (reference returns '' for unknown addresses)
    empt = tagged.filter(rule_filter("label_of(sender) == ''")).collect()
    assert [r["id"] for r in empt] == [3]
    tags = tagged.select(
        "id", F.expr(rule_to_sql("tag_value_usd(value, 100, 400)")).alias("t")
    ).collect()
    got = {r["id"]: r["t"] for r in tags}
    assert got == {
        1: "Level 1 risk control alert",
        2: "Level 2 risk control alert",
        3: "",
    }


def test_version_index_no_manifest_scans(spark, tmp_path):
    """latest_version_at_or_before must not parse manifests per version —
    the sidecar index answers the lookup."""
    import pyspark.sql.types as T

    from blockchain_etl_spark.tables import snapshot as snapmod
    from blockchain_etl_spark.tables.snapshot import Manifest, SnapshotTable

    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("lsn", T.LongType())]
    )
    t = SnapshotTable.create(spark, str(tmp_path / "t"), schema, key="doc_id", n_buckets=4)
    df = spark.createDataFrame([("d1", 0)], schema)
    for lsn in (5, 10, 15):
        t.append_deltas(df, watermark={"lsn": lsn, "seq": 0, "pos": lsn})

    calls = {"n": 0}
    orig = Manifest.from_json

    def counting(s):
        calls["n"] += 1
        return orig(s)

    snapmod.Manifest.from_json = staticmethod(counting)
    try:
        assert t.latest_version_at_or_before(10) is not None
        assert calls["n"] == 0  # index-only lookup
    finally:
        snapmod.Manifest.from_json = staticmethod(orig)

    # the index answer equals the scan answer for every probe
    def scan(lsn):
        for v in reversed(t.versions()):
            if t.manifest(v).watermark["lsn"] <= lsn:
                return v
        return None

    for probe in (-1, 0, 5, 7, 10, 14, 15, 99):
        assert t.latest_version_at_or_before(probe) == scan(probe)

    # backfill path: a table whose index was never written (pre-index)
    os.remove(t._index_path())
    assert t.latest_version_at_or_before(10) == scan(10)


def test_hex_word_to_decimal_exact_uint_past_int64(spark):
    """ADVICE r2: production amounts exceed int64 — decimal(38,0) decode
    must be exact up to 2^120 and NULL (never truncate) above it."""
    import random

    rng = random.Random(7)
    vals = (
        [0, 1, 2**63 - 1, 2**63, 2**64, 10**18 * 10**9, 2**120 - 1]
        + [rng.getrandbits(100) for _ in range(20)]
        + [2**120, 2**255, int("f" * 64, 16)]  # overflow → NULL
    )
    rows = [(i, f"{v:064x}" if i % 2 else f"0x{v:064x}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i int, w string").select(
        "i", EXT.hex_word_to_decimal(F.col("w")).alias("d")
    )
    assert dict(df.dtypes)["d"] == "decimal(38,0)"
    got = {r["i"]: r["d"] for r in df.collect()}
    for i, v in enumerate(vals):
        if v < 2**120:
            assert got[i] is not None and int(got[i]) == v, (i, v, got[i])
        else:
            assert got[i] is None, (i, v, got[i])


def test_extract_token_transfers_exact_values(spark):
    big = 123456789 * 10**18  # ~1.2e26: fits decimal(38,0), not int64
    rows = [
        (1, "0x" + "c" * 40,
         [EXT.TRANSFER_EVENT_TOPIC, W(ADDR_A), W(ADDR_B)], W(f"{big:x}")),
    ]
    out = EXT.extract_token_transfers(_logs(spark, rows), exact_values=True)
    assert dict(out.dtypes)["value"] == "decimal(38,0)"
    assert int(out.collect()[0]["value"]) == big
    # int64 oracle-parity mode fails LOUDLY on overflow under ANSI (Spark 4
    # default) — never a silent truncation
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|overflow"):
        EXT.extract_token_transfers(_logs(spark, rows)).collect()


def test_erc721_extract_excludes_erc20_set_and_cryptopunk(spark):
    T = EXT.TRANSFER_EVENT_TOPIC
    rows = [
        # plain Transfer at unknown address → erc721 (id from topic 3)
        (1, "0x" + "c" * 40, [T, W(ADDR_A), W(ADDR_B), W("2a")], "0x"),
        # Transfer at a KNOWN erc20 address → excluded
        (2, "0x" + "e" * 40, [T, W(ADDR_A), W(ADDR_B), W("2a")], "0x"),
        # Transfer at the CryptoPunk contract → excluded
        (3, EXT.CRYPTOPUNK_TOKEN_ADDRESS, [T, W(ADDR_A), W(ADDR_B), W("07")], "0x"),
        # weird length (5 words) → rejected
        (4, "0x" + "c" * 40, [T, W(ADDR_A), W(ADDR_B), W("2a")], W("01")),
        # anonymous → skipped
        (5, "0x" + "c" * 40, [], "0x"),
    ]
    erc20 = spark.createDataFrame([("0x" + "E" * 40,)], ["address"])
    out = EXT.extract_erc721_transfers(_logs(spark, rows), erc20).collect()
    assert [r["event_id"] for r in out] == [1]
    assert out[0]["token_id"] == 0x2A
    assert out[0]["from_address"] == "0x" + ADDR_A
    # without the erc20 set, event 2 is assumed erc721 (reference heuristic)
    got = {r["event_id"] for r in EXT.extract_erc721_transfers(_logs(spark, rows)).collect()}
    assert got == {1, 2}


def test_cryptopunk_decode_and_merge(spark):
    """Pins the reference's 4 merge paths (cryptopunk_extractor.py:86-141):
    Assign passthrough, PunkTransfer@+1, PunkBought(sale)@+2,
    PunkBought(bid)@+1 — and the double-match when both companions exist."""
    CP = EXT.CRYPTOPUNK_TOKEN_ADDRESS
    T, PT, PB, AS_ = (
        EXT.TRANSFER_EVENT_TOPIC, EXT.PUNK_TRANSFER_EVENT_TOPIC,
        EXT.PUNK_BOUGHT_EVENT_TOPIC, EXT.ASSIGN_EVENT_TOPIC,
    )
    mk = lambda blk, li, topics, data: (
        CP, topics, data, blk, f"0xtx{blk}", 0, li)
    rows = [
        # blk 1: Assign(to=B, punk 7)
        mk(1, 0, [AS_, W(ADDR_B)], W("07")),
        # blk 2: Transfer(A→B) then PunkTransfer(A→B, punk 9) at +1
        mk(2, 0, [T, W(ADDR_A), W(ADDR_B)], W("64")),
        mk(2, 1, [PT, W(ADDR_A), W(ADDR_B)], W("09")),
        # blk 3: sale — Transfer@0, PunkBought(punk 5, A→B)@2
        mk(3, 0, [T, W(ADDR_A), W(ADDR_B)], W("c8")),
        mk(3, 2, [PB, W("05"), W(ADDR_A), W(ADDR_B)], W("c8")),
        # blk 4: bid accept — Transfer@0, PunkBought(punk 6, A→ZERO)@1
        mk(4, 0, [T, W(ADDR_A), W(ADDR_B)], W("c8")),
        mk(4, 1, [PB, W("06"), W(ADDR_A), W("0" * 40)], W("c8")),
        # blk 5: orphan PunkTransfer (no companion) → dropped
        mk(5, 3, [PT, W(ADDR_A), W(ADDR_B)], W("0b")),
        # blk 6: double match — Transfer@0, Transfer@1, PunkBought(A→B)@2
        mk(6, 0, [T, W(ADDR_A), W(ADDR_B)], W("c8")),
        mk(6, 1, [T, W(ADDR_B), W(ADDR_A)], W("c8")),
        mk(6, 2, [PB, W("08"), W(ADDR_A), W(ADDR_B)], W("c8")),
        # non-punk address → ignored entirely
        (("0x" + "c" * 40), [T, W(ADDR_A), W(ADDR_B)], W("64"), 7, "0xtx7", 0, 0),
    ]
    logs = spark.createDataFrame(
        rows,
        "address string, topics array<string>, data string, block_number long,"
        " transaction_hash string, transaction_index int, log_index long",
    )
    out = sorted(
        (r["block_number"], r["token_id"], r["log_index"], r["to_address"])
        for r in EXT.extract_cryptopunk_transfers(logs).collect()
    )
    B = "0x" + ADDR_B
    A = "0x" + ADDR_A
    assert out == [
        (1, 7, 0, B),           # assign passthrough
        (2, 9, 0, B),           # punk_transfer joined at +1
        (3, 5, 0, B),           # sale joined at +2
        (4, 6, 0, B),           # bid joined at +1
        (6, 8, 0, B),           # double match: sale path (+2)
        (6, 8, 1, A),           # double match: bid path (+1)
    ]


def test_erc721_exact_values_carries_raw_hex_token_id(spark):
    # hash-derived token id ≥ 2^63 (and > decimal(38,0)'s 2^120 ceiling):
    # only the raw hex word carries it exactly
    big_hex = "f" * 40 + "0123456789abcdef012345ef"
    rows = [
        (1, "0x" + "c" * 40,
         [EXT.TRANSFER_EVENT_TOPIC, W(ADDR_A), W(ADDR_B), "0x" + big_hex], "0x"),
    ]
    out = EXT.extract_erc721_transfers(_logs(spark, rows), exact_values=True)
    assert dict(out.dtypes)["token_id"] == "string"
    assert out.collect()[0]["token_id"] == big_hex.rjust(64, "0")
    # default int64 mode fails LOUDLY under ANSI, never silently truncates
    import pytest as _pt
    with _pt.raises(Exception, match="CAST_INVALID_INPUT|overflow"):
        EXT.extract_erc721_transfers(_logs(spark, rows)).collect()
