"""The three formerly environment-gated transports, driven over REAL
local wires: Kafka Produce v0 against an in-process TCP broker double
that fully parses the frames (header, message sets, per-message CRC),
S3 SigV4 PUT against an HTTP double that re-derives the signature from
the raw request + known secret, and Pub/Sub REST publish against an
HTTP double that checks auth and acks per message."""

import base64
import datetime
import hashlib
import hmac
import http.server
import json
import socket
import struct
import threading

import pytest

from blockchain_etl_spark.operators.wire import (
    kafka_encode_produce_response_v0,
    kafka_parse_produce_request_v0,
    kafka_partition_for,
    murmur2,
)


# --------------------------------------------------------- kafka double

class _BrokerDouble:
    """Single-topic Kafka broker double: accepts connections, parses
    every Produce v0 frame (CRC-checked), appends messages to a log per
    partition, responds with the base offset — or with a forced error
    code."""

    def __init__(self, error_code: int = 0):
        self.error_code = error_code
        self.log: dict[int, list] = {}
        self.requests = []
        self._lock = threading.Lock()
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(16)
        self.addr = f"127.0.0.1:{self.sock.getsockname()[1]}"
        self._stop = False
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn):
        try:
            while True:
                hdr = self._read(conn, 4)
                if hdr is None:
                    return
                size = struct.unpack(">i", hdr)[0]
                frame = self._read(conn, size)
                req = kafka_parse_produce_request_v0(frame)
                results = {}
                with self._lock:
                    self.requests.append(req)
                    for topic, parts in req["topics"].items():
                        for pid, msgs in parts.items():
                            base = len(self.log.get(pid, []))
                            self.log.setdefault(pid, []).extend(msgs)
                            results[pid] = (self.error_code, base)
                        if req["acks"] != 0:
                            conn.sendall(kafka_encode_produce_response_v0(
                                req["correlation_id"], topic, results))
        except (ConnectionError, OSError):
            return
        finally:
            conn.close()

    @staticmethod
    def _read(conn, n):
        out = b""
        while len(out) < n:
            chunk = conn.recv(n - len(out))
            if not chunk:
                return None
            out += chunk
        return out

    def close(self):
        self._stop = True
        self.sock.close()


def test_murmur2_partitioner_properties():
    assert murmur2(b"") == murmur2(b"")
    assert murmur2(b"abc") != murmur2(b"abd")
    assert kafka_partition_for(None, 7) == 0
    for key in (b"a", b"user-42", b"\x00\xff", b"long-key" * 9):
        for n in (1, 3, 16):
            p = kafka_partition_for(key, n)
            assert 0 <= p < n
            assert p == kafka_partition_for(key, n)  # stable


def test_kafka_socket_sink_end_to_end(spark):
    from blockchain_etl_spark.operators.sinks import KafkaSink

    broker = _BrokerDouble()
    try:
        df = spark.createDataFrame(
            [(f"d{i}", i) for i in range(20)], "doc_id string, n int"
        ).repartition(4)
        sink = KafkaSink(broker.addr, topic_prefix="etl_",
                         key_cols=["doc_id"], transport="socket",
                         n_partitions=3)
        sink.write(df, "docs")

        got = {}
        for pid, msgs in broker.log.items():
            for key, value in msgs:
                rec = json.loads(value.decode("utf-8"))
                got[rec["doc_id"]] = (pid, key.decode("utf-8"), rec["n"])
        assert len(got) == 20
        for i in range(20):
            pid, key, n = got[f"d{i}"]
            assert key == f"d{i}" and n == i
            # routed by the murmur2 partitioner, like the Java client
            assert pid == kafka_partition_for(key.encode(), 3)
        assert all(
            t == "etl_docs"
            for r in broker.requests for t in r["topics"]
        )
    finally:
        broker.close()


def test_kafka_socket_sink_raises_on_broker_error(spark):
    from blockchain_etl_spark.operators.sinks import KafkaSink

    broker = _BrokerDouble(error_code=6)  # NOT_LEADER_FOR_PARTITION
    try:
        df = spark.createDataFrame([("a", 1)], "doc_id string, n int")
        sink = KafkaSink(broker.addr, transport="socket")
        with pytest.raises(Exception, match="error 6|produce"):
            sink.write(df.coalesce(1), "docs")
    finally:
        broker.close()


def test_kafka_acks_zero_fire_and_forget(spark):
    from blockchain_etl_spark.operators.sinks import KafkaSink

    broker = _BrokerDouble()
    try:
        df = spark.createDataFrame([("a", 1), ("b", 2)], "doc_id string, n int")
        KafkaSink(broker.addr, transport="socket", acks=0).write(
            df.coalesce(1), "docs")
        # give the double a beat to drain the socket
        import time

        for _ in range(50):
            if sum(len(v) for v in broker.log.values()) == 2:
                break
            time.sleep(0.1)
        assert sum(len(v) for v in broker.log.values()) == 2
    finally:
        broker.close()


# ----------------------------------------------------------- s3 double

ACCESS, SECRET, REGION = "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG", "eu-west-1"


class _S3Double(http.server.BaseHTTPRequestHandler):
    """Verifies SigV4 from the RAW request + known secret — the
    server-side derivation (canonical request rebuilt from what
    actually arrived, not from what the client meant to send)."""

    store: dict[str, bytes] = {}

    def do_PUT(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        auth = self.headers["Authorization"]
        # Authorization: AWS4-HMAC-SHA256 Credential=AK/scope, SignedHeaders=a;b, Signature=hex
        parts = dict(
            p.strip().split("=", 1)
            for p in auth.split(" ", 1)[1].split(",")
        )
        scope = parts["Credential"].split("/", 1)[1]
        datestamp, region, service, _ = scope.split("/")
        signed = parts["SignedHeaders"].split(";")
        canonical = "\n".join([
            "PUT",
            self.path,
            "",
            "".join(f"{h}:{self.headers[h].strip()}\n" for h in signed),
            parts["SignedHeaders"],
            hashlib.sha256(body).hexdigest(),
        ])
        to_sign = "\n".join([
            "AWS4-HMAC-SHA256",
            self.headers["x-amz-date"],
            scope,
            hashlib.sha256(canonical.encode()).hexdigest(),
        ])
        k = hmac.new(("AWS4" + SECRET).encode(), datestamp.encode(),
                     hashlib.sha256).digest()
        for step in (region, service, "aws4_request"):
            k = hmac.new(k, step.encode(), hashlib.sha256).digest()
        want = hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
        if want != parts["Signature"] or hashlib.sha256(
            body
        ).hexdigest() != self.headers["x-amz-content-sha256"]:
            self.send_response(403)
            self.end_headers()
            return
        _S3Double.store[self.path] = body
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


def test_s3_sigv4_put_and_upload_dir(tmp_path):
    from blockchain_etl_spark.operators.sinks import S3ObjectSink

    _S3Double.store = {}
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _S3Double)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        endpoint = f"http://127.0.0.1:{srv.server_port}"
        sink = S3ObjectSink("lake", "dumps/v1", ACCESS, SECRET,
                            region=REGION, endpoint=endpoint)
        assert sink.put_bytes("day=2026-08-18/part-0.csv", b"a,b\n1,2\n") == 200
        assert _S3Double.store["/lake/dumps/v1/day=2026-08-18/part-0.csv"] == (
            b"a,b\n1,2\n"
        )

        d = tmp_path / "out"
        (d / "e1").mkdir(parents=True)
        (d / "e1" / "f.csv").write_bytes(b"x\n")
        (d / "_SUCCESS").write_bytes(b"")  # spark marker stays local
        res = sink.upload_dir(str(d))
        assert res == {"uploaded": 1, "bytes": 2}
        assert _S3Double.store["/lake/dumps/v1/e1/f.csv"] == b"x\n"
    finally:
        srv.shutdown()


def test_s3_bad_secret_is_rejected_by_the_double():
    import urllib.error

    from blockchain_etl_spark.operators.sinks import S3ObjectSink

    _S3Double.store = {}
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _S3Double)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        endpoint = f"http://127.0.0.1:{srv.server_port}"
        sink = S3ObjectSink("lake", "p", ACCESS, "WRONG-SECRET",
                            region=REGION, endpoint=endpoint)
        with pytest.raises(urllib.error.HTTPError):
            sink.put_bytes("k", b"v")
        assert not _S3Double.store
    finally:
        srv.shutdown()


def test_sigv4_is_deterministic_for_fixed_time():
    from blockchain_etl_spark.operators.wire import sigv4_headers

    t = datetime.datetime(2026, 8, 18, 12, 0, 0,
                          tzinfo=datetime.timezone.utc)
    h1 = sigv4_headers("PUT", "s3.local", "/b/k", b"x", ACCESS, SECRET,
                       region=REGION, now=t)
    h2 = sigv4_headers("PUT", "s3.local", "/b/k", b"x", ACCESS, SECRET,
                       region=REGION, now=t)
    assert h1 == h2
    assert h1["x-amz-date"] == "20260818T120000Z"
    assert "Signature=" in h1["Authorization"]


# ------------------------------------------------------- pubsub double

class _PubSubDouble(http.server.BaseHTTPRequestHandler):
    token = "tok-123"
    received: list = []
    calls = 0

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if self.headers["Authorization"] != f"Bearer {self.token}":
            self.send_response(401)
            self.end_headers()
            return
        _PubSubDouble.calls += 1
        ids = []
        for m in body["messages"]:
            _PubSubDouble.received.append(
                (self.path, base64.b64decode(m["data"]),
                 m.get("attributes"))
            )
            ids.append(str(len(_PubSubDouble.received)))
        out = json.dumps({"messageIds": ids}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


def test_pubsub_rest_sink_end_to_end(spark):
    from blockchain_etl_spark.operators.sinks import PubSubSink

    _PubSubDouble.received, _PubSubDouble.calls = [], 0
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _PubSubDouble)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        endpoint = f"http://127.0.0.1:{srv.server_port}"
        df = spark.createDataFrame(
            [(f"d{i}", i) for i in range(5)], "doc_id string, n int"
        ).coalesce(1)
        sink = PubSubSink("proj", topic_prefix="etl_", endpoint=endpoint,
                          token="tok-123", batch_size=2)
        sink.write(df, "docs")
        assert len(_PubSubDouble.received) == 5
        assert _PubSubDouble.calls == 3  # 2 + 2 + 1 under batch_size=2
        paths = {p for p, _, _ in _PubSubDouble.received}
        assert paths == {"/v1/projects/proj/topics/etl_docs:publish"}
        docs = sorted(
            json.loads(data.decode())["doc_id"]
            for _, data, _ in _PubSubDouble.received
        )
        assert docs == [f"d{i}" for i in range(5)]
    finally:
        srv.shutdown()


def test_pubsub_without_token_raises(spark):
    from blockchain_etl_spark.operators.sinks import PubSubSink

    df = spark.createDataFrame([("a", 1)], "doc_id string, n int")
    with pytest.raises(NotImplementedError, match="bearer token"):
        PubSubSink("proj").write(df, "docs")


def test_cdf_debezium_envelopes_over_kafka_wire(spark, tmp_path):
    """Full producer composition: a table's change feed as Debezium
    envelopes (key envelope included), published over the REAL socket
    transport, parsed back off the broker double — key-partitioned by
    murmur2 like a Connect topic."""
    from pyspark.sql import functions as F

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.operators.sinks import _kafka_send_partition
    from blockchain_etl_spark.sources.envelope import cdf_to_debezium
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    flat = [
        e for ep in generate_changelog(seed=29, n_epochs=2, p_reorg_epoch=0.0)
        for e in ep
    ]
    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    CdcEngine(spark, t, collect_metrics=False).apply_epoch(
        events_to_df(spark, flat), epoch_id=1
    )
    env = cdf_to_debezium(t.read_changes(0, t.current_version()), with_key=True)
    n_env = env.count()
    assert n_env > 0

    broker = _BrokerDouble()
    try:
        records = env.select(
            F.lit("etl_cdc").alias("topic"), "key", "value"
        ).repartition(3)
        addr = broker.addr
        records.foreachPartition(
            lambda rows: _kafka_send_partition(rows, addr, 3, 1)
        )
        seen = {}
        for pid, msgs in broker.log.items():
            for key, value in msgs:
                k = json.loads(key.decode())["payload"]["doc_id"]
                v = json.loads(value.decode())["payload"]
                seen[k] = (pid, v["op"])
                assert pid == kafka_partition_for(key, 3)
        assert len(seen) == n_env  # one record per changed key
    finally:
        broker.close()
