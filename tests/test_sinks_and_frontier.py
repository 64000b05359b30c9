import os

from pyspark.sql import functions as F

from blockchain_etl_spark.operators.alerts import track_frontier
from blockchain_etl_spark.operators.sinks import ConsoleSink, FileSink, MultiSink

SF = "/root/testdata/sf0.001"


def test_file_sink_partitioned_csv(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.split("text", " ").alias("words"),  # array column → must flatten
        F.lit("2024-01-01").alias("_st_day"),
    )
    sink = FileSink(str(tmp_path / "out"), delimiter="^")
    out = sink.write(docs, entity="documents")
    # date-partitioned dirs exist, delimiter applied, arrays joined
    parts = [d for d in os.listdir(out) if d.startswith("_st_day=")]
    assert parts == ["_st_day=2024-01-01"]
    back = spark.read.option("delimiter", "^").option("header", True).csv(out)
    assert back.count() == 500
    row = back.filter(F.col("doc_id") == "7").first()
    assert "," in row["words"]  # array flattened to comma-joined string


def test_multi_sink_fans_out(spark, tmp_path):
    df = spark.read.parquet(f"{SF}/nation.parquet").withColumn(
        "_st_day", F.lit("2024-01-01")
    )
    s1 = FileSink(str(tmp_path / "a"))
    s2 = FileSink(str(tmp_path / "b"))
    MultiSink([s1, s2]).write(df, entity="nation")
    assert os.path.exists(str(tmp_path / "a" / "entity=nation"))
    assert os.path.exists(str(tmp_path / "b" / "entity=nation"))
    ConsoleSink().write(df.limit(1), n=1)  # smoke


def test_track_frontier_expands_hops(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    seeds = events.filter(F.col("user_id") == 1).select("user_id").distinct()
    hits = track_frontier(events, seeds, hops=2)
    assert hits.filter("hop = 1").count() == events.filter("user_id = 1").count()
    assert hits.filter("hop = 2").count() > 0
