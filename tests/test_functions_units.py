"""Unit coverage for the scalar function helpers (reference §2.3)."""

from pyspark.sql import functions as F

from blockchain_etl_spark.functions import ids


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_hex_to_dec(spark):
    df = spark.createDataFrame(
        [("0x2a",), ("ff",), ("0x0",), ("0xDeadBeef",)], "h string"
    )
    got = [r["d"] for r in df.select(ids.hex_to_dec("h").alias("d")).collect()]
    assert got == [42, 255, 0, 3735928559]


def test_item_id_matches_reference_shape(spark):
    # md5('block_123') — the reference's concat_md5 form
    import hashlib

    expect = hashlib.md5(b"block_123").hexdigest()
    got = _one(spark, ids.item_id("block", F.lit("123")))
    assert got == expect


def test_word_to_address_and_split_words(spark):
    word = "0x" + "0" * 24 + "a" * 40
    got = _one(spark, ids.word_to_address(F.lit(word)))
    assert got == "0x" + "a" * 40
    data = "0x" + "1" * 64 + "2" * 64
    words = _one(spark, ids.split_to_words(F.lit(data)))
    assert words == ["1" * 64, "2" * 64]
    # non-multiple-of-32-bytes → null (tolerant)
    assert _one(spark, ids.split_to_words(F.lit("0x123"))) is None


def test_timestamp_helpers(spark):
    got = _one(spark, ids.item_timestamp(F.lit(1700000000)))
    assert got == "2023-11-14T22:13:20Z"
    day = _one(spark, ids.append_date(F.lit(1700000000)))
    assert str(day) == "2023-11-14"


def test_wei2eth_exact(spark):
    got = _one(spark, ids.wei2eth(F.lit("1500000000000000000")))
    assert float(got) == 1.5


def test_flatten_topics(spark):
    df = spark.createDataFrame([(["t0", "t1"],)], "topics array<string>")
    row = df.select(*ids.flatten_topics("topics")).first()
    assert row["topic0"] == "t0" and row["topic1"] == "t1"
    assert row["topic2"] is None and row["n_topics"] == 2
    joined = df.select(ids.list_to_string("topics").alias("j")).first()["j"]
    assert joined == "t0,t1"


def test_dlq_persists_rejected(spark, tmp_path):
    from blockchain_etl_spark.cdc.apply import CdcEngine
    from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
    from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
    from blockchain_etl_spark.streaming.epoch_store import EpochStore
    from blockchain_etl_spark.tables.snapshot import SnapshotTable

    epochs = generate_changelog(seed=31, n_epochs=2, invalid_rate=0.5, p_reorg_epoch=0.0)
    table = SnapshotTable.create(spark, str(tmp_path / "t"), TARGET_SCHEMA, n_buckets=4)
    store = EpochStore(spark, str(tmp_path / "s"))
    eng = CdcEngine(spark, table, epoch_store=store, dlq_path=str(tmp_path / "dlq"))
    total_rejected = 0
    for i, ep in enumerate(epochs):
        store.write_epoch(i, events_to_df(spark, ep))
        m = eng.apply_epoch(store.read_epoch(i), i)
        total_rejected += m["n_rejected"]
    assert total_rejected > 0
    dlq = spark.read.parquet(str(tmp_path / "dlq" / "epoch-*"))
    assert dlq.count() == total_rejected
    # every DLQ row genuinely violates the payload contract
    from pyspark.sql import functions as F

    assert dlq.filter(F.col("n_tok") == F.size("tokens")).count() == 0
