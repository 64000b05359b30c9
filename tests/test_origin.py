"""Origin Protocol marketplace extract: CIDv0 pointer decode (known
vector from the reference docstring), log filtering, fetch-miss skip
semantics, product/variant explode, and the REAL stdlib-urllib gateway
fetcher against a local HTTP double."""

import json
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.operators import origin as OG

LOG_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("blknum", T.LongType()),
    T.StructField("address", T.StringType()),
    T.StructField("topics", T.ArrayType(T.StringType())),
    T.StructField("data", T.StringType()),
])

# the reference's own example pair (origin_extractor.py:23-26)
VECTOR_HEX = "0x017dfd85d4f6cb4dcd715a88101f7b1f06cd1e009b2327a0809d01eb9c91f231"
VECTOR_CID = "QmNSUYVKDSvPUnRLKmuxk9diJ6yS96r1TrAXzjTiBcCLAL"


def test_hex_to_ipfs_hash_reference_vector():
    assert OG.hex_to_ipfs_hash(VECTOR_HEX) == VECTOR_CID
    assert OG.ipfs_hash_to_hex(VECTOR_CID) == VECTOR_HEX


def test_b58_roundtrip_leading_zeros():
    raw = b"\x00\x00\x01\xff"
    assert OG.b58decode(OG.b58encode(raw)) == raw


def _mk_log(eid, blknum, topic0, lid, word):
    return (
        eid, blknum, OG.MARKETPLACE_V0_ADDRESS,
        [topic0, "0x" + "0" * 64, "0x" + format(lid, "064x")],
        "0x" + word,
    )


def test_extract_filters_and_versions(spark):
    w_ok = "ab" * 32
    rows = [
        _mk_log(1, 100, OG.LISTING_CREATED_TOPIC, 42, w_ok),
        _mk_log(2, 9_000_000, OG.LISTING_UPDATED_TOPIC, 7, w_ok),
        # wrong topic -> skipped
        (3, 100, "0xdead", ["0x" + "9" * 64, "0x" + "0" * 64, "0x" + "0" * 64],
         "0x" + w_ok),
        # too few topics -> skipped (the reference's TOPICS_LEN guard)
        (4, 100, OG.MARKETPLACE_V0_ADDRESS, [OG.LISTING_CREATED_TOPIC],
         "0x" + w_ok),
    ]
    logs = spark.createDataFrame(rows, LOG_SCHEMA)
    got = {
        r["listing_id"]: r
        for r in OG.extract_origin_listing_events(logs).collect()
    }
    assert set(got) == {"1-000-42", "1-001-7"}  # epoch split at 8_582_597
    assert got["1-000-42"]["ipfs_hash"] == OG.hex_to_ipfs_hash("0x" + w_ok)


def test_fetch_miss_drops_listing_and_shop_flow(spark):
    # word ending 0x07: 7 % 11 == 7 -> deterministic fetch miss
    w_miss = "a" * 62 + "07"
    # word with w[8:10] = "00" -> shop listing (0 % 5 == 0); last byte 0
    w_shop = "1234567800" + "c" * 52 + "00"
    w_plain = "2" * 62 + "01"
    logs = spark.createDataFrame(
        [
            _mk_log(1, 100, OG.LISTING_CREATED_TOPIC, 1, w_miss),
            _mk_log(2, 100, OG.LISTING_CREATED_TOPIC, 2, w_shop),
            _mk_log(3, 100, OG.LISTING_CREATED_TOPIC, 3, w_plain),
        ],
        LOG_SCHEMA,
    )
    ev = OG.extract_origin_listing_events(logs)
    lst = OG.origin_marketplace_listings(ev)
    rows = {r["listing_id"]: r for r in lst.collect()}
    assert set(rows) == {"1-000-2", "1-000-3"}  # the miss is skipped
    assert rows["1-000-2"]["shop_ipfs_hash"] == "shop-" + w_shop
    assert rows["1-000-3"]["shop_ipfs_hash"] is None
    assert rows["1-000-3"]["price"] == str(int(w_plain[2:6], 16))

    prods = OG.origin_shop_products(lst).collect()
    by_pid = {r["product_id"]: r for r in prods}
    assert set(by_pid) == {"1-000-2-p0", "1-000-2-p1", "1-000-2-v1"}
    v1 = by_pid["1-000-2-v1"]
    assert v1["parent_external_id"] is None  # p1 has no externalId
    assert v1["ipfs_path"] == "shop-" + w_shop + "/p1"
    assert v1["option1"] == "o-" + w_shop[20]
    assert by_pid["1-000-2-p0"]["external_id"] == str(int(w_shop[0:4], 16))


def test_http_ipfs_fetcher_against_local_double(spark):
    """The production gateway leg is REAL (stdlib urllib): serve two
    pointers from a local HTTP server — one 200, one 404 on the first
    gateway and 200 on the second (failover), one 404 everywhere
    (miss)."""
    import http.server

    body_a = json.dumps({"title": "A"})
    body_b = json.dumps({"title": "B"})

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/g1/QmA":
                payload = body_a.encode()
            elif self.path == "/g2/QmB":
                payload = body_b.encode()
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        fetcher = OG.http_ipfs_fetcher(
            [f"http://127.0.0.1:{port}/g1", f"http://127.0.0.1:{port}/g2"],
            timeout=5.0,
        )
        df = spark.createDataFrame(
            [("QmA",), ("QmB",), ("QmGone",)], ["ipfs_hash"]
        )
        got = {
            r["ipfs_hash"]: r["body"]
            for r in df.mapInPandas(fetcher, OG.FETCH_SCHEMA).collect()
        }
        assert got["QmA"] == body_a
        assert got["QmB"] == body_b  # g1 404 -> failover to g2
        assert got["QmGone"] is None  # all gateways miss -> null body
    finally:
        srv.shutdown()


def test_fetch_cost_is_distinct_pointers(spark, tmp_path):
    """N log rows over K distinct pointers -> K fetched hashes. The
    fetcher runs in worker processes, so calls are counted through a
    shared spool directory (one file per fetched hash)."""
    spool = tmp_path / "calls"
    spool.mkdir()

    def counting(batches):
        import uuid

        import pandas as pd
        for pdf in batches:
            for h in pdf["ipfs_hash"]:
                with open(spool / f"{uuid.uuid4().hex}", "w") as f:
                    f.write(h)
            yield pd.DataFrame(
                {"ipfs_hash": pdf["ipfs_hash"],
                 "body": ['{"title": "x"}'] * len(pdf)}
            )

    w = "3" * 62 + "01"
    logs = spark.createDataFrame(
        [_mk_log(i, 100, OG.LISTING_CREATED_TOPIC, i, w) for i in range(6)],
        LOG_SCHEMA,
    )
    ev = OG.extract_origin_listing_events(logs)
    out = OG.origin_marketplace_listings(ev, fetcher=counting)
    assert out.count() == 6  # every log row keeps its listing
    assert len(list(spool.iterdir())) == 1  # ...fetched exactly once
