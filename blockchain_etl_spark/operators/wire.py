"""Stdlib wire protocols for the bus/object sinks — no client
libraries, so the transports are REAL in this image and testable
against local protocol doubles (the ``SlackWebhookSink`` precedent
applied to the three remaining environment-gated legs).

Implemented from the PUBLIC protocol specifications only:

- Kafka Produce v0 (https://kafka.apache.org/protocol): frame =
  INT32 size + request header (api_key=0, api_version=0,
  correlation_id, client_id) + body (acks, timeout, [topic,
  [partition, message_set]]); MessageSet v0 entries are
  (offset INT64, size INT32, crc32, magic=0, attributes=0, key BYTES,
  value BYTES) with the CRC over magic..value. The default
  partitioner is Kafka's murmur2 (seed 0x9747b28c) mod n, matching
  the Java client so keys land on the same partitions a jar-based
  producer would pick.
- AWS Signature V4 (public AWS docs: canonical request → string to
  sign → HMAC key chain → Authorization header) for S3 object PUTs
  over plain HTTPS.
- Google Pub/Sub REST ``projects.topics.publish`` (public API):
  JSON POST with base64 message data and a Bearer token.

Scale note: these helpers are plain functions over bytes so sinks can
call them EXECUTOR-side (``foreachPartition``) — the wire work
distributes with the data; nothing funnels through the driver except
the final metrics.
"""

from __future__ import annotations

import base64
import binascii
import datetime as _dt
import hashlib
import hmac
import io
import json
import socket
import struct
import urllib.request

# --------------------------------------------------------------- kafka

_KAFKA_SEED = 0x9747B28C
_M = 0x5BD1E995
_MASK32 = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (the Java client's DefaultPartitioner hash) —
    32-bit, seed 0x9747b28c; reproduced so keys route to the SAME
    partition a jar-based producer would choose."""
    length = len(data)
    h = (_KAFKA_SEED ^ length) & _MASK32
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i:i + 4], "little", signed=False)
        k = (k * _M) & _MASK32
        k ^= k >> 24
        k = (k * _M) & _MASK32
        h = (h * _M) & _MASK32
        h ^= k
        i += 4
    rem = length - i
    if rem == 3:
        h ^= (data[i + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[i + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[i] & 0xFF
        h = (h * _M) & _MASK32
    h ^= h >> 13
    h = (h * _M) & _MASK32
    h ^= h >> 15
    return h


def kafka_partition_for(key: bytes | None, n_partitions: int) -> int:
    """DefaultPartitioner routing: murmur2(key) masked to non-negative
    mod n; null keys go to partition 0 (deterministic stand-in for the
    sticky round-robin, so redelivered batches route identically)."""
    if key is None:
        return 0
    return (murmur2(key) & 0x7FFFFFFF) % n_partitions


def _kbytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _kstring(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    raw = s.encode("utf-8")
    return struct.pack(">h", len(raw)) + raw


def kafka_message_v0(key: bytes | None, value: bytes | None) -> bytes:
    """One MessageSet v0 entry: offset(0) + size + message, where
    message = crc32(magic..value) + magic(0) + attributes(0) + key +
    value."""
    body = struct.pack(">bb", 0, 0) + _kbytes(key) + _kbytes(value)
    crc = binascii.crc32(body) & _MASK32
    msg = struct.pack(">I", crc) + body
    return struct.pack(">qi", 0, len(msg)) + msg


def kafka_encode_produce_v0(
    topic: str,
    partition_messages: dict[int, list[tuple[bytes | None, bytes | None]]],
    acks: int = 1,
    timeout_ms: int = 10000,
    correlation_id: int = 1,
    client_id: str = "blockchain-etl-spark",
) -> bytes:
    """Full Produce v0 request frame (size-prefixed), one topic, one
    message set per partition."""
    parts = b""
    for pid in sorted(partition_messages):
        mset = b"".join(
            kafka_message_v0(k, v) for k, v in partition_messages[pid]
        )
        parts += struct.pack(">i", pid) + struct.pack(">i", len(mset)) + mset
    body = (
        struct.pack(">hi", acks, timeout_ms)
        + struct.pack(">i", 1)
        + _kstring(topic)
        + struct.pack(">i", len(partition_messages))
        + parts
    )
    header = (
        struct.pack(">hhi", 0, 0, correlation_id) + _kstring(client_id)
    )
    frame = header + body
    return struct.pack(">i", len(frame)) + frame


def kafka_parse_produce_request_v0(frame: bytes) -> dict:
    """Parse a Produce v0 request (the frame WITHOUT the leading size) —
    used by the broker test double to validate what the sink sent,
    including per-message CRC checks. Returns {correlation_id,
    client_id, acks, timeout_ms, topics: {topic: {partition: [(key,
    value), ...]}}}."""
    buf = io.BytesIO(frame)

    def _i(fmt):
        return struct.unpack(fmt, buf.read(struct.calcsize(fmt)))[0]

    def _str():
        n = _i(">h")
        return None if n < 0 else buf.read(n).decode("utf-8")

    def _bytes():
        n = _i(">i")
        return None if n < 0 else buf.read(n)

    api_key, api_version, corr = _i(">h"), _i(">h"), _i(">i")
    if api_key != 0 or api_version != 0:
        raise ValueError(f"not a Produce v0 request: {api_key}/{api_version}")
    client_id = _str()
    acks, timeout_ms = _i(">h"), _i(">i")
    topics: dict = {}
    for _ in range(_i(">i")):
        topic = _str()
        parts: dict = {}
        for _ in range(_i(">i")):
            pid = _i(">i")
            mset_len = _i(">i")
            end = buf.tell() + mset_len
            msgs = []
            while buf.tell() < end:
                _off = _i(">q")
                _sz = _i(">i")
                crc = _i(">I")
                body_start = buf.tell()
                magic, attrs = _i(">b"), _i(">b")
                if magic != 0 or attrs != 0:
                    raise ValueError(f"unexpected magic/attrs {magic}/{attrs}")
                key, value = _bytes(), _bytes()
                buf.seek(body_start)
                body = buf.read(_sz - 4)
                if (binascii.crc32(body) & _MASK32) != crc:
                    raise ValueError("message crc mismatch")
                msgs.append((key, value))
            parts[pid] = msgs
        topics[topic] = parts
    return {
        "correlation_id": corr,
        "client_id": client_id,
        "acks": acks,
        "timeout_ms": timeout_ms,
        "topics": topics,
    }


def kafka_encode_produce_response_v0(
    correlation_id: int,
    topic: str,
    partition_results: dict[int, tuple[int, int]],
) -> bytes:
    """Produce v0 response frame for the broker double:
    partition_results = {partition: (error_code, base_offset)}."""
    parts = b"".join(
        struct.pack(">ihq", pid, err, off)
        for pid, (err, off) in sorted(partition_results.items())
    )
    body = (
        struct.pack(">i", correlation_id)
        + struct.pack(">i", 1)
        + _kstring(topic)
        + struct.pack(">i", len(partition_results))
        + parts
    )
    return struct.pack(">i", len(body)) + body


def kafka_parse_produce_response_v0(payload: bytes) -> dict:
    """{correlation_id, results: {(topic, partition): (error_code,
    base_offset)}}."""
    buf = io.BytesIO(payload)

    def _i(fmt):
        return struct.unpack(fmt, buf.read(struct.calcsize(fmt)))[0]

    corr = _i(">i")
    results = {}
    for _ in range(_i(">i")):
        n = _i(">h")
        topic = buf.read(n).decode("utf-8")
        for _ in range(_i(">i")):
            pid, err, off = _i(">i"), _i(">h"), _i(">q")
            results[(topic, pid)] = (err, off)
    return {"correlation_id": corr, "results": results}


def _read_exact(sock: socket.socket, n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        if not chunk:
            raise ConnectionError("broker closed the connection")
        out += chunk
    return out


def kafka_produce(
    bootstrap: str,
    topic: str,
    messages: list[tuple[bytes | None, bytes | None]],
    n_partitions: int = 1,
    acks: int = 1,
    timeout_s: float = 10.0,
    max_batch_bytes: int = 1_000_000,
) -> dict[str, int]:
    """Send (key, value) messages to ``topic`` over a raw TCP socket in
    Kafka Produce v0 wire format; partitions chosen by the Java
    client's murmur2 partitioner. Raises on any non-zero partition
    error code when acks != 0. Returns {sent, requests}.

    Routing contract: messages go to the single ``bootstrap``
    host:port — correct for a one-broker cluster or a fronting proxy;
    multi-broker leader routing needs the Metadata API and belongs to
    a full client (use the jar transport on a real cluster). That
    limitation is the documented difference from the jar leg, not a
    stub: the bytes on the wire are real Produce requests."""
    host, _, port = bootstrap.partition(":")
    sent = requests = 0
    corr = 0
    # greedy size-bounded batches, each a single produce request
    batch: dict[int, list[tuple[bytes | None, bytes | None]]] = {}
    batch_bytes = 0

    def _flush(sock):
        nonlocal batch, batch_bytes, sent, requests, corr
        if not batch:
            return
        corr += 1
        frame = kafka_encode_produce_v0(topic, batch, acks=acks,
                                        correlation_id=corr)
        sock.sendall(frame)
        if acks != 0:
            size = struct.unpack(">i", _read_exact(sock, 4))[0]
            resp = kafka_parse_produce_response_v0(_read_exact(sock, size))
            if resp["correlation_id"] != corr:
                raise ValueError("correlation id mismatch")
            for (t, pid), (err, _off) in resp["results"].items():
                if err != 0:
                    raise RuntimeError(
                        f"kafka produce error {err} on {t}[{pid}]"
                    )
        sent += sum(len(v) for v in batch.values())
        requests += 1
        batch, batch_bytes = {}, 0

    with socket.create_connection((host, int(port or 9092)),
                                  timeout=timeout_s) as sock:
        for key, value in messages:
            pid = kafka_partition_for(key, n_partitions)
            batch.setdefault(pid, []).append((key, value))
            batch_bytes += (len(key or b"") + len(value or b"") + 34)
            if batch_bytes >= max_batch_bytes:
                _flush(sock)
        _flush(sock)
    return {"sent": sent, "requests": requests}


# -------------------------------------------------------------- sigv4

def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def sigv4_headers(
    method: str,
    host: str,
    path: str,
    payload: bytes,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
    service: str = "s3",
    now: _dt.datetime | None = None,
    extra_headers: dict[str, str] | None = None,
) -> dict[str, str]:
    """AWS Signature V4 headers for a request with no query string —
    canonical request → string to sign → HMAC chain → Authorization
    (public AWS sigv4 docs; the test double recomputes the signature
    with the known secret and must land on the identical value)."""
    t = now or _dt.datetime.now(_dt.timezone.utc)
    amz_date = t.strftime("%Y%m%dT%H%M%SZ")
    datestamp = t.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(payload).hexdigest()
    headers = {
        "host": host,
        "x-amz-content-sha256": payload_hash,
        "x-amz-date": amz_date,
        **{k.lower(): v for k, v in (extra_headers or {}).items()},
    }
    signed = ";".join(sorted(headers))
    canonical = "\n".join([
        method,
        path,
        "",  # canonical query string (none)
        "".join(f"{k}:{headers[k].strip()}\n" for k in sorted(headers)),
        signed,
        payload_hash,
    ])
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    to_sign = "\n".join([
        "AWS4-HMAC-SHA256",
        amz_date,
        scope,
        hashlib.sha256(canonical.encode("utf-8")).hexdigest(),
    ])
    k = _hmac(("AWS4" + secret_key).encode("utf-8"), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    sig = hmac.new(k, to_sign.encode("utf-8"), hashlib.sha256).hexdigest()
    out = {k_: v for k_, v in headers.items() if k_ != "host"}
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}"
    )
    return out


def s3_put_object(
    endpoint: str,
    bucket: str,
    key: str,
    payload: bytes,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
    timeout_s: float = 30.0,
    now: _dt.datetime | None = None,
) -> int:
    """PUT one object via SigV4-signed HTTP(S) (path-style addressing:
    ``{endpoint}/{bucket}/{key}``). Returns the HTTP status; raises on
    non-2xx (urllib raises HTTPError)."""
    host = endpoint.split("://", 1)[1].split("/", 1)[0]
    path = f"/{bucket}/{key}"
    headers = sigv4_headers("PUT", host, path, payload, access_key,
                            secret_key, region=region, now=now)
    req = urllib.request.Request(
        endpoint.rstrip("/") + path, data=payload, headers=headers,
        method="PUT",
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        resp.read()
        return resp.status


# ------------------------------------------------------------- pubsub

def pubsub_publish(
    endpoint: str,
    project: str,
    topic: str,
    messages: list[tuple[bytes, dict[str, str] | None]],
    token: str,
    timeout_s: float = 30.0,
) -> list[str]:
    """``projects.topics.publish`` REST call (public Pub/Sub API):
    POST {endpoint}/v1/projects/{project}/topics/{topic}:publish with
    base64 message data + attributes and a Bearer token. Returns the
    server-assigned messageIds."""
    body = json.dumps({
        "messages": [
            {"data": base64.b64encode(data).decode("ascii"),
             **({"attributes": attrs} if attrs else {})}
            for data, attrs in messages
        ]
    }).encode("utf-8")
    url = (f"{endpoint.rstrip('/')}/v1/projects/{project}/topics/"
           f"{topic}:publish")
    req = urllib.request.Request(
        url, data=body,
        headers={"Content-Type": "application/json",
                 "Authorization": f"Bearer {token}"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return json.loads(resp.read().decode("utf-8")).get("messageIds", [])
