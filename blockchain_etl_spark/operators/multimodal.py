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


# ------------------------------------------------------------ frame sample
# The 1:N UDF shape (one input row → many output rows inside the Arrow
# batch) a video frame-sampler takes. Frames are fixed-size byte chunks
# of the opaque payload — a real decoder would slot in per chunk.

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(df: DataFrame, frame_size: int = 32, every_k: int = 3) -> DataFrame:
    """Chunk each payload into ``frame_size``-byte frames and keep every
    ``every_k``-th one — the frame-sampling stage of a video pipeline,
    with byte chunks standing in for decoded frames. Emits one row per
    SAMPLED frame; the expansion happens inside the Arrow batch, so no
    per-row Python round trips."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, frames, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = (n + frame_size - 1) // frame_size
                for j in range(0, n_frames, every_k):
                    chunk = payload[j * frame_size : (j + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(j)
                    totals.append(n_frames)
                    frames.append(chunk)
                    sums.append(int(sum(chunk)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                    "frame_bytes": pd.Series(frames, dtype="object"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(gen, FRAME_SCHEMA)


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_frames(with_binary_payload(docs)).select(
        "doc_id", "frame_idx", "n_frames", "frame_checksum"
    )


# ----------------------------------------------------------------- resize
# binary→binary 1:1 shape (a pixel resize). Deterministic nearest-index
# byte downsample: output byte i is input byte floor(i*n/t).

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("resized_checksum", T.LongType()),
    ]
)


def resize_payload(df: DataFrame, target_len: int = 16) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes, out_sums = [], []
            for payload in pdf["payload"]:
                n = len(payload)
                if n == 0:
                    out_bytes.append(b"")
                    out_sums.append(0)
                    continue
                resized = bytes(
                    payload[(i * n) // target_len] for i in range(target_len)
                )
                out_bytes.append(resized)
                out_sums.append(int(sum(resized)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "resized": pd.Series(out_bytes, dtype="object"),
                    "resized_checksum": pd.Series(out_sums, dtype="int64"),
                }
            )

    return df.mapInPandas(gen, RESIZE_SCHEMA)


def resize_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return resize_payload(with_binary_payload(docs)).select(
        "doc_id", "n_bytes", "resized_checksum"
    )
