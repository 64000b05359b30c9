"""Debezium / Maxwell CDC envelope adapters (sources/envelope.py).

The decode legs are exact inverses of the encode legs over the
generator's full op vocabulary (I/U/D + R-as-logical-message for
Debezium), Kafka compaction tombstones are dropped, and a JSONL
envelope landing tailed with ``bus_format="debezium"`` converges to the
same final state as the native parquet landing (same oracle)."""

import os

import pytest

from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.oracle import oracle_replay
from blockchain_etl_spark.sources.envelope import (
    decode_debezium,
    decode_maxwell,
    encode_debezium,
    encode_maxwell,
)


@pytest.fixture(scope="module")
def flat_events(spark):
    flat = [
        e
        for ep in generate_changelog(seed=41, n_epochs=4, p_reorg_epoch=0.5)
        for e in ep
    ]
    return flat, events_to_df(spark, flat).cache()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_debezium_roundtrip_exact(spark, flat_events):
    _, ev = flat_events
    assert _rows(decode_debezium(encode_debezium(ev))) == _rows(ev)


def test_debezium_reorg_marker_rides_logical_message(spark, flat_events):
    _, ev = flat_events
    r = ev.filter("op = 'R'")
    assert r.count() > 0, "seed must produce a reorg"
    enc = encode_debezium(r)
    # the wire shape is Debezium op=m with the rollback LSN in
    # message.content — assert on the raw JSON, not just the round trip
    val = enc.first()["value"]
    assert '"op":"m"' in val and '"prefix":"reorg"' in val
    dec = decode_debezium(enc)
    assert _rows(dec) == _rows(r)


def test_debezium_offset_column_wins_over_envelope(spark, flat_events):
    _, ev = flat_events
    from pyspark.sql import functions as F

    enc = encode_debezium(ev).withColumn(
        "offset", F.monotonically_increasing_id() + 1_000_000
    )
    dec = decode_debezium(enc, offset_col="offset")
    assert dec.filter("stream_pos < 1000000").count() == 0


def test_debezium_tombstones_and_foreign_ops_dropped(spark, flat_events):
    _, ev = flat_events
    from pyspark.sql import functions as F

    enc = encode_debezium(ev)
    n = ev.count()
    polluted = enc.unionByName(
        spark.createDataFrame(
            [(None,), ('{"payload":{"op":"t","source":{"lsn":9}}}',)],
            "value string",
        )
    )
    assert decode_debezium(polluted).count() == n


def test_maxwell_roundtrip_exact_minus_blockhash(spark, flat_events):
    _, ev = flat_events
    evnr = ev.filter("op <> 'R'")
    dec = decode_maxwell(encode_maxwell(ev))
    # Maxwell has no block-hash slot: epoch_hash (lineage metadata) is
    # null after decode; everything the apply path consults round-trips
    a = [t[:-1] for t in _rows(evnr)]
    b = [t[:-1] for t in _rows(dec)]
    assert a == b
    assert dec.filter("epoch_hash is not null").count() == 0
    assert dec.filter("op = 'R'").count() == 0


def test_jsonl_debezium_landing_matches_native_tail(spark, tmp_path):
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.streaming.tail import ChangeLogTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    eps = list(generate_changelog(seed=53, n_epochs=3, p_reorg_epoch=0.6))
    land_n = tmp_path / "native"
    land_d = tmp_path / "dbz"
    land_n.mkdir(), land_d.mkdir()
    for i, ep in enumerate(eps):
        df = events_to_df(spark, ep)
        df.coalesce(1).write.parquet(str(land_n / f"epoch-{i:08d}.parquet"))
        lines = [r["value"] for r in encode_debezium(df).collect()]
        (land_d / f"epoch-{i:08d}.jsonl").write_text("\n".join(lines) + "\n")

    outs = {}
    for name, land, fmt in [
        ("nat", land_n, "native"),
        ("dbz", land_d, "debezium"),
    ]:
        t = SnapshotTable.create(
            spark, str(tmp_path / f"t_{name}"), TARGET_SCHEMA, n_buckets=4
        )
        eng = CdcEngine(
            spark, t,
            epoch_store=EpochStore(spark, str(tmp_path / f"s_{name}")),
            collect_metrics=False,
        )
        ChangeLogTailer(spark, str(land), eng, bus_format=fmt).run_once()
        outs[name] = sorted(
            map(tuple, t.read().filter("NOT deleted").select("doc_id", "tokens", "n_tok", "source").collect())
        )
    assert outs["nat"] == outs["dbz"]
    flat = [e for ep in eps for e in ep]
    assert len(outs["dbz"]) == len(oracle_replay(flat))


def test_jsonl_with_native_format_fails_loud(spark, tmp_path):
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.tail import ChangeLogTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    land = tmp_path / "land"
    land.mkdir()
    (land / "epoch-00000000.jsonl").write_text("{}\n")
    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    tailer = ChangeLogTailer(spark, str(land), CdcEngine(spark, t))
    with pytest.raises(ValueError, match="bus_format"):
        tailer.run_once()


def test_unknown_bus_format_rejected(spark, tmp_path):
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.tail import ChangeLogTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    with pytest.raises(ValueError, match="bus_format"):
        ChangeLogTailer(
            spark, str(tmp_path), CdcEngine(spark, t), bus_format="protobuf"
        )


def test_decode_audit_classifies_drops(spark, flat_events):
    from blockchain_etl_spark.sources.envelope import decode_audit

    _, ev = flat_events
    enc = encode_debezium(ev)
    n = ev.count()
    polluted = enc.unionByName(
        spark.createDataFrame(
            [
                (None,),                                     # tombstone
                ("{not json",),                              # malformed
                ('{"payload":{"op":"t","source":{"lsn":1}}}',),  # foreign
            ],
            "value string",
        )
    )
    audit = {r["class"]: r["n"] for r in decode_audit(polluted, "debezium").collect()}
    assert audit == {"decoded": n, "tombstone": 1, "malformed": 1, "foreign_op": 1}
    # invariant: decoded count == what decode_debezium emits
    assert decode_debezium(polluted).count() == audit["decoded"]


def test_debezium_schema_evolution_flows_to_target(spark, tmp_path):
    """An upstream column addition (Debezium payload gains `lang`)
    decodes with an evolved row_schema and evolves the engine target
    through the ordinary mergeSchema apply — old rows null-backfilled."""
    from pyspark.sql import types as T

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.sources.envelope import _ROW_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.streaming.tail import ChangeLogTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    evolved = T.StructType(
        list(_ROW_SCHEMA.fields) + [T.StructField("lang", T.StringType(), True)]
    )
    land = tmp_path / "land"
    land.mkdir()

    # epoch 0: original schema
    eps = list(generate_changelog(seed=61, n_epochs=2, p_reorg_epoch=0.0))
    df0 = events_to_df(spark, eps[0])
    lines0 = [r["value"] for r in encode_debezium(df0).collect()]
    (land / "epoch-00000000.jsonl").write_text("\n".join(lines0) + "\n")

    # epoch 1: payload gains `lang` (encode with the evolved schema)
    from pyspark.sql import functions as F

    df1 = events_to_df(spark, eps[1]).withColumn(
        "lang", F.when(F.col("op").isin("I", "U"), F.lit("en"))
    )
    lines1 = [r["value"] for r in encode_debezium(df1, row_schema=evolved).collect()]
    (land / "epoch-00000001.jsonl").write_text("\n".join(lines1) + "\n")

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    eng = CdcEngine(
        spark, t, epoch_store=EpochStore(spark, str(tmp_path / "s")),
        collect_metrics=False,
    )
    ChangeLogTailer(
        spark, str(land), eng, bus_format="debezium", row_schema=evolved
    ).run_once()

    state = t.read().filter("NOT deleted")
    assert "lang" in state.columns
    # rows whose winner came from epoch 1 carry the value; earlier
    # winners are null-backfilled
    assert state.filter("lang = 'en'").count() > 0
    assert state.filter("lang IS NULL").count() > 0


def test_debezium_snapshot_then_stream_handoff(spark, tmp_path):
    """The Debezium bootstrap contract: an initial snapshot (op=r rows
    at their source LSNs) followed by a live stream that OVERLAPS the
    snapshot window must converge to the live truth — the engine's
    (lsn, seq) monotonic guard resolves the overlap, no special
    bootstrap mode needed."""
    from pyspark.sql import functions as F

    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.streaming.tail import ChangeLogTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    eps = list(generate_changelog(seed=73, n_epochs=3, p_reorg_epoch=0.0))
    flat = [e for ep in eps for e in ep]
    mid_lsn = max(e["lsn"] for e in eps[0])

    # "snapshot" = oracle state at the end of epoch 0, emitted as op=r
    snap_rows = oracle_replay([e for e in flat if e["lsn"] <= mid_lsn])
    snap_ev = [
        {
            "stream_pos": i,
            "lsn": r["lsn"],
            "seq": r["seq"],
            "op": "I",  # encoder maps I -> c; rewrite to r below
            "doc_id": d,
            "tokens": r["tokens"],
            "n_tok": r["n_tok"],
            "source": r["source"],
            "rollback_to_lsn": None,
            "epoch_hash": "snap",
        }
        for i, (d, r) in enumerate(sorted(snap_rows.items()))
    ]
    enc = encode_debezium(events_to_df(spark, snap_ev))
    # snapshot reads are op=r in Debezium — patch the op in the JSON
    lines = [
        r["value"].replace('"op":"c"', '"op":"r"') for r in enc.collect()
    ]
    land = tmp_path / "land"
    land.mkdir()
    (land / "epoch-00000000.jsonl").write_text("\n".join(lines) + "\n")
    # live stream: epochs 1-2 PLUS the tail of epoch 0 (overlap with
    # the snapshot window — at-least-once handoff)
    overlap = [e for e in eps[0] if e["lsn"] >= mid_lsn - 2] + eps[1] + eps[2]
    live_lines = [
        r["value"] for r in encode_debezium(events_to_df(spark, overlap)).collect()
    ]
    (land / "epoch-00000001.jsonl").write_text("\n".join(live_lines) + "\n")

    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    eng = CdcEngine(
        spark, t, epoch_store=EpochStore(spark, str(tmp_path / "s")),
        collect_metrics=False,
    )
    ChangeLogTailer(spark, str(land), eng, bus_format="debezium").run_once()

    got = sorted(
        (r["doc_id"], r["n_tok"], r["source"])
        for r in t.read().filter("NOT deleted").collect()
    )
    want = sorted(
        (d, r["n_tok"], r["source"]) for d, r in oracle_replay(flat).items()
    )
    assert got == want


def test_lake_to_lake_replication_via_debezium(spark, tmp_path):
    """The engine as a Debezium PRODUCER: table A's change feed emitted
    as envelopes, decoded, and applied to table B reproduces A's state —
    including updates (true before-image) and deletes — and the
    incremental second emission replicates the delta."""
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.sources.envelope import cdf_to_debezium
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    eps = list(generate_changelog(seed=67, n_epochs=3, p_reorg_epoch=0.0))
    a = SnapshotTable.create(spark, str(tmp_path / "a"), TARGET_SCHEMA, n_buckets=4)
    ea = CdcEngine(spark, a, collect_metrics=False)
    b = SnapshotTable.create(spark, str(tmp_path / "b"), TARGET_SCHEMA, n_buckets=4)
    eb = CdcEngine(
        spark, b, epoch_store=EpochStore(spark, str(tmp_path / "bs")),
        collect_metrics=False,
    )

    def _replicate(v0, v1, epoch_id):
        env = cdf_to_debezium(a.read_changes(v0, v1))
        eb.apply_epoch(decode_debezium(env), epoch_id=epoch_id)

    def _state(t):
        return sorted(
            map(
                tuple,
                t.read()
                .filter("NOT deleted")
                .select("doc_id", "tokens", "n_tok", "source")
                .collect(),
            )
        )

    ea.apply_epoch(events_to_df(spark, eps[0]), epoch_id=1)
    ea.apply_epoch(events_to_df(spark, eps[1]), epoch_id=2)
    v1 = a.current_version()
    _replicate(0, v1, epoch_id=101)
    assert _state(b) == _state(a)

    # incremental: one more epoch on A (updates + deletes), delta only
    ea.apply_epoch(events_to_df(spark, eps[2]), epoch_id=3)
    _replicate(v1, a.current_version(), epoch_id=102)
    assert _state(b) == _state(a)
    assert _state(b)  # non-trivial


def test_tail_rejects_duplicate_epoch_formats(spark, tmp_path):
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.tail import ChangeLogTailer
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    land = tmp_path / "land"
    land.mkdir()
    (land / "epoch-00000003.jsonl").write_text("{}\n")
    (land / "epoch-00000003.parquet").mkdir()
    t = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    tailer = ChangeLogTailer(
        spark, str(land), CdcEngine(spark, t), bus_format="debezium"
    )
    with pytest.raises(ValueError, match="duplicate landing files"):
        tailer.pending_epochs()


def test_decode_audit_empty_line_is_tombstone(spark, flat_events):
    from blockchain_etl_spark.sources.envelope import decode_audit

    _, ev = flat_events
    polluted = encode_debezium(ev).unionByName(
        spark.createDataFrame([("",), ("   ",), (None,)], "value string")
    )
    audit = {r["class"]: r["n"] for r in decode_audit(polluted, "debezium").collect()}
    assert audit.get("tombstone") == 3
    assert "malformed" not in audit
