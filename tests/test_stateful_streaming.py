"""Stateful streaming operator: per-source running stats must converge
to the batch aggregate after the stream drains, and state must persist
across micro-batches (checkpointed)."""

import os

from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.generator import events_to_df, generate_changelog
from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA
from blockchain_etl_spark.streaming.stateful import streaming_source_stats


def test_streaming_stats_converge_to_batch(spark, tmp_path):
    epochs = generate_changelog(seed=19, n_epochs=4, p_reorg_epoch=0.0)
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, ep in enumerate(epochs):
        events_to_df(spark, ep).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(landing, f"epoch-{i:08d}.parquet")
        )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "*"))
    )
    q = (
        streaming_source_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("src_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits one row per group per batch: keep the last
    got = {
        r["source"]: (r["first_lsn"], r["last_lsn"], r["n_events"],
                      r["n_deletes"], r["total_tokens"])
        for r in spark.sql("SELECT * FROM src_stats").collect()
        # later rows overwrite earlier for same source (collect preserves
        # insertion order per batch id)
    }

    flat = events_to_df(spark, [e for ep in epochs for e in ep])
    batch = {
        r["source"]: (r["first_lsn"], r["last_lsn"], r["n_events"],
                      r["n_deletes"], r["total_tokens"])
        for r in flat.filter("source IS NOT NULL")
        .groupBy("source")
        .agg(
            F.min("lsn").alias("first_lsn"),
            F.max("lsn").alias("last_lsn"),
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
            F.sum(F.coalesce("n_tok", F.lit(0))).alias("total_tokens"),
        )
        .collect()
    }
    assert set(got) == set(batch)
    assert got == batch
