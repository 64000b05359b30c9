"""Token-sequence operators over the input_hint table shape
(doc_id, tokens array<int>, n_tok, source) — the pre-tokenized
training-sequence layout the CDC engine maintains.

Two shapes every LLM-training data pipeline needs downstream of the
lake table:

- ``chunk_tokens``: context-window chunking — split each document's
  token array into fixed-size chunks preserving order. A narrow map
  (slice + posexplode), ZERO shuffle: at 10^10 documents this runs
  embarrassingly parallel at scan parallelism and multiplies rows
  before whatever shuffles downstream.

- ``pack_sequences``: greedy contiguous packing — concatenate documents
  in a deterministic order and cut at a token budget, the standard
  "concat-and-cut" batching used to build fixed-length training
  sequences. Expressed as ONE window cumsum per source partition
  (running token count → pack_id = floor((cum - n_tok)/budget)), so
  the only shuffle is the window's hash partition on ``source``; the
  pack aggregation reuses the same ordering. No per-row Python.

Both are exactly reproducible in ANSI SQL, so they carry full DuckDB
oracle twins in the catalog (``token_chunking`` / ``sequence_packing``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_tokens(df: DataFrame, chunk: int, tokens_col: str = "tokens") -> DataFrame:
    """(doc_id, tokens, ...) → one row per fixed-size chunk.

    Output: (doc_id, chunk_id, chunk_tokens, n_chunk_tok) where
    ``chunk_tokens`` preserves token order and the last chunk of each
    document may be short. Empty documents produce no chunks.
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    n = F.size(tokens_col)
    n_chunks = F.ceil(n / F.lit(chunk)).cast("int")
    slices = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col(tokens_col), i * chunk + 1, chunk),
    )
    return (
        df.filter(n > 0)
        .select("doc_id", F.posexplode(slices).alias("chunk_id", "chunk_tokens"))
        .withColumn("n_chunk_tok", F.size("chunk_tokens"))
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    part_col: str = "source",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Greedy contiguous packing: documents are concatenated in
    ``order_col`` order within each ``part_col`` partition and cut
    every ``budget`` tokens; a document belongs to the pack in which
    its first token lands (documents may straddle the cut — the
    concat-and-cut convention, so no token is dropped or padded).

    Output: one row per (part, pack_id) with document count, token sum,
    and the first/last document of the pack.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    w = Window.partitionBy(part_col).orderBy(order_col)
    cum = F.sum(n_tok_col).over(w)
    pack_id = F.floor((cum - F.col(n_tok_col)) / F.lit(budget))
    return (
        df.select(
            F.col(part_col).alias("part"),
            F.col(order_col).alias("doc_key"),
            F.col(n_tok_col).alias("n_tok"),
            pack_id.alias("pack_id"),
        )
        .groupBy("part", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tok_sum"),
            F.min("doc_key").alias("first_doc"),
            F.max("doc_key").alias("last_doc"),
        )
    )
