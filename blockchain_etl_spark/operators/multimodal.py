"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

The image/audio codecs aren't in this container, so the actual decode is
STUBBED (``decode_image_stub`` raises NotImplementedError; the fake
feature extractor is deterministic) — but the Spark-side plumbing is
real and tested: schema, Arrow batch shape, partitioning, and the UDF
signature are exactly what a real decoder would slot into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def decode_image_stub(payload: bytes) -> "object":
    """Placeholder for a real image decode (PIL/opencv not shipped)."""
    raise NotImplementedError(
        "image decode requires PIL/opencv which are not in this container; "
        "swap this stub for PIL.Image.open(io.BytesIO(payload))"
    )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct — the
    multimodal table shape (payload stands in for an encoded image)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("utf8-text").alias("mime"),
            F.length("text").alias("n_chars"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads — the shape
    a real decode/resize/frame-sample UDF takes. Deterministic fake
    features (byte stats) stand in for pixel features."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                "byte_sum": payloads.map(lambda b: int(sum(b))).astype("int64"),
            }
        )


def binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_binary_payload(docs).mapInPandas(_extract_features, FEATURE_SCHEMA)
