"""CDC envelope format adapters: Debezium and Maxwell → EVENT_SCHEMA.

Real-world binlog/WAL tails rarely arrive in a bespoke schema — they
arrive as **Debezium** change-event envelopes (the Kafka Connect
ecosystem's lingua franca: ``{"payload": {"before", "after", "source",
"op", "ts_ms"}}``) or **Maxwell** rows (``{"database", "table", "type",
"ts", "xid", "position", "data", "old"}``). These decoders turn either
format into the engine's ``EVENT_SCHEMA`` so the same apply path
(`cdc/apply.py`) ingests a Debezium topic dump byte-for-byte like the
native changelog (≙ the reference's adapter layer,
``blockchainetl/streaming/streamer_adapter_stub.py`` +
``ethereumetl/streaming/eth_streamer_adapter.py:60-118``, which
normalizes RPC shapes into item dicts before export).

Everything is ``from_json`` / ``to_json`` over fixed struct schemas —
JVM-side, whole-stage-codegen, zero Python on the data path. At 100 TB
the decode is a per-row projection that pipelines into the very first
scan stage; no shuffle is introduced.

Mapping notes (public format semantics):

- Debezium ``op``: ``c`` (create) and ``r`` (snapshot read) → ``I``;
  ``u`` → ``U``; ``d`` → ``D``; ``m`` (logical-decoding message,
  Postgres ``pg_logical_emit_message`` surface) carries our
  chain-reorg rollback marker → ``R`` with ``rollback_to_lsn`` in
  ``message.content``. Kafka *tombstone* records (null value, emitted
  after every Debezium delete for log compaction) are dropped.
- Debezium ``source`` is **connector-specific by design** (each
  connector publishes its own source-info struct); ours is the shape a
  chain connector would emit: ``lsn`` (block number), ``pos``
  (intra-block position), ``sequence`` (bus offset as a string, the
  Postgres connector's convention), ``block_hash``, ``ts_ms``,
  ``table``, ``snapshot``.
- Maxwell has no reorg vocabulary (MySQL binlogs don't rewind), so the
  Maxwell leg is defined only for ``I``/``U``/``D`` streams —
  ``encode_maxwell`` refuses ``R`` rows rather than inventing a
  non-public type. ``position`` carries ``binlog.NNNNNN:seq`` (file ≙
  LSN, offset ≙ intra-block position — the binlog coordinates
  convention), ``xid`` carries the bus offset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA

# the DEFAULT row payload inside before/after/data/old — every decoder
# takes ``row_schema`` to follow an upstream schema evolution (added
# payload columns flow through decode into the engine's mergeSchema
# apply; a fixed schema would silently drop them at from_json)
_ROW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _payload_cols(row_schema: T.StructType) -> list[str]:
    return [f.name for f in row_schema.fields]

def debezium_value_schema(row_schema: T.StructType | None = None) -> T.StructType:
    rs = row_schema or _ROW_SCHEMA
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("before", rs, True),
                        T.StructField("after", rs, True),
                        T.StructField("source", _DBZ_SOURCE_SCHEMA, True),
                        T.StructField("op", T.StringType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                        T.StructField(
                            "message",
                            T.StructType(
                                [
                                    T.StructField("prefix", T.StringType(), True),
                                    T.StructField("content", T.StringType(), True),
                                ]
                            ),
                            True,
                        ),
                    ]
                ),
                True,
            )
        ]
    )


def maxwell_value_schema(row_schema: T.StructType | None = None) -> T.StructType:
    rs = row_schema or _ROW_SCHEMA
    return T.StructType(
        [
            T.StructField("database", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("ts", T.LongType(), True),
            T.StructField("xid", T.LongType(), True),
            T.StructField("commit", T.BooleanType(), True),
            T.StructField("position", T.StringType(), True),
            T.StructField("data", rs, True),
            T.StructField("old", rs, True),
        ]
    )


_DBZ_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType(), True),
        T.StructField("connector", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("snapshot", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("pos", T.IntegerType(), True),
        T.StructField("sequence", T.StringType(), True),  # bus offset
        T.StructField("block_hash", T.StringType(), True),
    ]
)

DEBEZIUM_VALUE_SCHEMA = debezium_value_schema()
MAXWELL_VALUE_SCHEMA = maxwell_value_schema()


def _payload_struct(row_schema: T.StructType):
    return F.struct(*[F.col(f.name).alias(f.name) for f in row_schema.fields])


def encode_debezium(events: DataFrame, table: str = "sequences",
                    row_schema: T.StructType | None = None) -> DataFrame:
    """EVENT_SCHEMA rows → one Debezium envelope JSON string per event
    (column ``value``). The inverse of :func:`decode_debezium` — used by
    tests/gates to prove the decoder exact, and as the wire shape for
    the Kafka sink's CDC topics (``to_bus_records`` sibling)."""
    op = F.col("op")
    dbz_op = (
        F.when(op == "I", F.lit("c"))
        .when(op == "U", F.lit("u"))
        .when(op == "D", F.lit("d"))
        .when(op == "R", F.lit("m"))
    )
    rs = row_schema or _ROW_SCHEMA
    after = F.when(op.isin("I", "U"), _payload_struct(rs))
    # deletes carry the full pre-image in `before` (Debezium: after=null
    # on d, before = the old row)
    before = F.when(op == "D", _payload_struct(rs))
    source = F.struct(
        F.lit("2.6").alias("version"),
        F.lit("chain").alias("connector"),
        F.lit("etl").alias("name"),
        (F.col("lsn") * 1000).alias("ts_ms"),
        F.lit("false").alias("snapshot"),
        F.lit("lake").alias("db"),
        F.lit(table).alias("table"),
        F.col("lsn"),
        F.col("seq").alias("pos"),
        F.col("stream_pos").cast("string").alias("sequence"),
        F.col("epoch_hash").alias("block_hash"),
    )
    message = F.when(
        op == "R",
        F.struct(
            F.lit("reorg").alias("prefix"),
            F.col("rollback_to_lsn").cast("string").alias("content"),
        ),
    )
    payload = F.struct(
        before.alias("before"),
        after.alias("after"),
        source.alias("source"),
        dbz_op.alias("op"),
        (F.col("lsn") * 1000 + F.col("seq")).alias("ts_ms"),
        message.alias("message"),
    )
    return events.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value")
    )


def decode_debezium(
    df: DataFrame,
    value_col: str = "value",
    offset_col: str | None = None,
    passthrough_cols: list[str] | None = None,
    row_schema: T.StructType | None = None,
) -> DataFrame:
    """Debezium envelope JSON strings → EVENT_SCHEMA.

    ``offset_col`` names the bus-offset column when reading a Kafka
    batch frame ``(offset, value)``; without it the offset is taken
    from ``payload.source.sequence`` (the envelope's own convention).
    ``passthrough_cols`` ride through unchanged (e.g. a topic-partition
    column when decoding a partitioned topic). Null values (Kafka
    compaction tombstones) and unmapped ops are dropped. Pure
    ``from_json`` + projections — JVM-side."""
    pt = list(passthrough_cols or [])
    rs = row_schema or _ROW_SCHEMA
    parsed = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *pt,
            *( [F.col(offset_col).cast("long").alias("_off")] if offset_col else [] ),
            F.from_json(F.col(value_col), debezium_value_schema(rs)).alias("e"),
        )
        .select(*pt, *( ["_off"] if offset_col else [] ), "e.payload.*")
        .filter(F.col("op").isin("c", "r", "u", "d", "m"))
    )
    stream_pos = (
        F.col("_off") if offset_col else F.col("source.sequence").cast("long")
    )
    eng_op = (
        F.when(F.col("op").isin("c", "r"), F.lit("I"))
        .when(F.col("op") == "u", F.lit("U"))
        .when(F.col("op") == "d", F.lit("D"))
        .otherwise(F.lit("R"))
    )
    payload = [
        F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(c)
        for c in _payload_cols(rs)
    ]
    out = parsed.select(
        stream_pos.alias("stream_pos"),
        F.col("source.lsn").alias("lsn"),
        F.col("source.pos").alias("seq"),
        eng_op.alias("op"),
        *payload,
        F.when(F.col("op") == "m", F.col("message.content").cast("long")).alias(
            "rollback_to_lsn"
        ),
        F.col("source.block_hash").alias("epoch_hash"),
        *pt,
    )
    meta = ["stream_pos", "lsn", "seq", "op"]
    tail = ["rollback_to_lsn", "epoch_hash"]
    return out.select(meta + _payload_cols(rs) + tail + pt)


def encode_maxwell(events: DataFrame, database: str = "lake",
                   table: str = "sequences",
                   row_schema: T.StructType | None = None) -> DataFrame:
    """EVENT_SCHEMA rows → Maxwell JSON (column ``value``). Maxwell has
    no reorg vocabulary, so ``R`` rows are refused at plan level: the
    encode filter drops them and ``decode_maxwell`` can never emit one —
    chains that need rollback markers use the Debezium leg (op=m) or
    the native schema."""
    mx_type = (
        F.when(F.col("op") == "I", F.lit("insert"))
        .when(F.col("op") == "U", F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    # Maxwell's delete `data` is the deleted row's values — the event's
    # own nulls (a delete carries no token payload) pass through as-is
    data = _payload_struct(row_schema or _ROW_SCHEMA)
    return events.filter(F.col("op") != "R").select(
        F.to_json(
            F.struct(
                F.lit(database).alias("database"),
                F.lit(table).alias("table"),
                mx_type.alias("type"),
                F.col("lsn").alias("ts"),
                F.col("stream_pos").alias("xid"),
                F.lit(True).alias("commit"),
                F.format_string("binlog.%06d:%d", F.col("lsn"), F.col("seq")).alias(
                    "position"
                ),
                data.alias("data"),
                F.lit(None).cast(row_schema or _ROW_SCHEMA).alias("old"),
            )
        ).alias("value")
    )


def decode_maxwell(
    df: DataFrame,
    value_col: str = "value",
    offset_col: str | None = None,
    passthrough_cols: list[str] | None = None,
    row_schema: T.StructType | None = None,
) -> DataFrame:
    """Maxwell JSON rows → EVENT_SCHEMA. LSN/seq parse out of the
    binlog ``position`` coordinates; the bus offset comes from
    ``offset_col`` when given, else ``xid``. ``epoch_hash`` is null
    (MySQL binlogs carry no block hash) — it is lineage metadata only,
    never consulted by the apply path."""
    pt = list(passthrough_cols or [])
    rs = row_schema or _ROW_SCHEMA
    parsed = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *pt,
            *( [F.col(offset_col).cast("long").alias("_off")] if offset_col else [] ),
            F.from_json(F.col(value_col), maxwell_value_schema(rs)).alias("e"),
        )
        .select(*pt, *( ["_off"] if offset_col else [] ), "e.*")
        .filter(F.col("type").isin("insert", "bootstrap-insert", "update", "delete"))
    )
    stream_pos = F.col("_off") if offset_col else F.col("xid")
    eng_op = (
        F.when(F.col("type").isin("insert", "bootstrap-insert"), F.lit("I"))
        .when(F.col("type") == "update", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    out = parsed.select(
        stream_pos.alias("stream_pos"),
        F.regexp_extract(F.col("position"), r"binlog\.(\d+):(\d+)", 1)
        .cast("long")
        .alias("lsn"),
        F.regexp_extract(F.col("position"), r"binlog\.(\d+):(\d+)", 2)
        .cast("int")
        .alias("seq"),
        eng_op.alias("op"),
        *[F.col(f"data.{c}").alias(c) for c in _payload_cols(rs)],
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.lit(None).cast("string").alias("epoch_hash"),
        *pt,
    )
    meta = ["stream_pos", "lsn", "seq", "op"]
    tail = ["rollback_to_lsn", "epoch_hash"]
    return out.select(meta + _payload_cols(rs) + tail + pt)


DECODERS = {"debezium": decode_debezium, "maxwell": decode_maxwell}


def decode_audit(
    df: DataFrame, fmt: str, value_col: str = "value"
) -> DataFrame:
    """Accounting for what a decode DROPS — a CDC consumer must never
    lose records silently. One aggregation classifying every bus
    record: ``decoded`` (will produce an event), ``tombstone`` (null
    value — Kafka compaction artifact, dropped by design),
    ``malformed`` (unparseable JSON / wrong envelope shape — candidate
    for the engine's DLQ), ``foreign_op`` (parseable but an op the
    mapping excludes, e.g. Debezium ``t`` truncates). Feed the numbers
    into lineage metrics next to ``n_rejected``."""
    if fmt == "debezium":
        parsed = F.from_json(F.col(value_col), DEBEZIUM_VALUE_SCHEMA)
        op = parsed["payload"]["op"]
        ok_ops = ("c", "r", "u", "d", "m")
    elif fmt == "maxwell":
        parsed = F.from_json(F.col(value_col), MAXWELL_VALUE_SCHEMA)
        op = parsed["type"]
        ok_ops = ("insert", "bootstrap-insert", "update", "delete")
    else:
        raise ValueError(f"unknown envelope format {fmt!r}")
    # a Kafka tombstone is a NULL value; on the file/JSONL bus it can
    # only appear as an EMPTY line — classify both as tombstones, not
    # as parse failures (a dropped-by-design compaction artifact must
    # not masquerade as a DLQ candidate)
    cls = (
        F.when(
            F.col(value_col).isNull()
            | (F.trim(F.col(value_col)) == ""),
            F.lit("tombstone"),
        )
        .when(op.isNull(), F.lit("malformed"))
        .when(op.isin(*ok_ops), F.lit("decoded"))
        .otherwise(F.lit("foreign_op"))
    )
    return (
        df.select(cls.alias("class"))
        .groupBy("class")
        .agg(F.count("*").alias("n"))
    )


def cdf_to_debezium(
    changes: DataFrame,
    key_col: str = "doc_id",
    row_schema: T.StructType | None = None,
    table: str = "sequences",
    with_key: bool = False,
) -> DataFrame:
    """The engine as a **Debezium producer**: turn a table's change feed
    (``SnapshotTable.read_changes`` output — netted per-key changes
    tagged ``_change_type`` with commit-side ``_commit_lsn/_commit_seq``)
    into Debezium envelope JSON, one record per changed key. A
    downstream engine (or any Kafka-Connect consumer) replays them:
    ``decode_debezium`` → apply reproduces the table state exactly —
    lake-to-lake replication with the bus as the only coupling.

    Mapping: insert → ``c`` (after only), update pre+post pair → ``u``
    (before + after), delete → ``d`` (pre-image in before, the
    reference's tombstone semantics). ``lsn/seq`` ride the COMMIT
    watermark (a delete sequenced at its pre-image's lsn would lose to
    its own prior row under the consumer's monotonic guard).
    ``stream_pos`` is minted as ``commit_lsn · 2³² + rank-within-commit``
    — unique, per-key monotone across emissions, computed with a
    per-commit window (bounded, parallel). ``with_key=True`` adds the
    Debezium Kafka KEY envelope (``{"payload": {<key_col>: ...}}``) so
    records key-partition and log-compact the way Connect topics do."""
    from pyspark.sql import Window

    rs = row_schema or _ROW_SCHEMA
    cols = _payload_cols(rs)
    pre = changes.filter(F.col("_change_type") == "update_preimage").select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_pre_{c}") for c in cols if c != key_col],
    )
    post = changes.filter(
        F.col("_change_type").isin("insert", "update_postimage", "delete")
    )
    j = post.join(pre, post[key_col] == pre["_k"], "left").drop("_k")
    op = (
        F.when(F.col("_change_type") == "insert", F.lit("I"))
        .when(F.col("_change_type") == "update_postimage", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    w = Window.partitionBy("_commit_lsn").orderBy(key_col)
    ev = j.select(
        (
            F.col("_commit_lsn") * F.lit(1 << 32)
            + F.row_number().over(w)
        ).cast("long").alias("stream_pos"),
        F.col("_commit_lsn").alias("lsn"),
        F.col("_commit_seq").alias("seq"),
        op.alias("op"),
        *[F.col(c) for c in cols],
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.lit(None).cast("string").alias("epoch_hash"),
        F.col("_change_type").alias("_ct"),
        *[
            F.col(f"_pre_{c}").alias(f"_pre_{c}")
            for c in cols
            if c != key_col
        ],
    )
    # updates need the true before-image (encode_debezium only knows
    # the event row): build the envelope here with both images
    rs_fields = [f.name for f in rs.fields]
    after = F.when(
        F.col("op").isin("I", "U"),
        F.struct(*[F.col(c).alias(c) for c in rs_fields]),
    )
    before = (
        F.when(
            F.col("op") == "U",
            F.struct(
                F.col(key_col).alias(key_col),
                *[
                    F.col(f"_pre_{c}").alias(c)
                    for c in rs_fields
                    if c != key_col
                ],
            ),
        )
        # CDF delete rows carry the pre-image payload in place
        .when(F.col("op") == "D", F.struct(*[F.col(c).alias(c) for c in rs_fields]))
    )
    dbz_op = (
        F.when(F.col("op") == "I", F.lit("c"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    source = F.struct(
        F.lit("2.6").alias("version"),
        F.lit("chain").alias("connector"),
        F.lit("etl").alias("name"),
        (F.col("lsn") * 1000).alias("ts_ms"),
        F.lit("false").alias("snapshot"),
        F.lit("lake").alias("db"),
        F.lit(table).alias("table"),
        F.col("lsn"),
        F.col("seq").alias("pos"),
        F.col("stream_pos").cast("string").alias("sequence"),
        F.col("epoch_hash").alias("block_hash"),
    )
    payload = F.struct(
        before.alias("before"),
        after.alias("after"),
        source.alias("source"),
        dbz_op.alias("op"),
        (F.col("lsn") * 1000 + F.col("seq")).alias("ts_ms"),
        F.lit(None).cast(
            T.StructType(
                [
                    T.StructField("prefix", T.StringType(), True),
                    T.StructField("content", T.StringType(), True),
                ]
            )
        ).alias("message"),
    )
    out_cols = [F.to_json(F.struct(payload.alias("payload"))).alias("value")]
    if with_key:
        out_cols.insert(
            0,
            F.to_json(
                F.struct(F.struct(F.col(key_col).alias(key_col)).alias("payload"))
            ).alias("key"),
        )
    return ev.select(*out_cols)
