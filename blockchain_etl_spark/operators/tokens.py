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
  sequences. The running token count is a TWO-PHASE cumsum (range
  repartition → per-range local window → broadcast prefix offsets), so
  parallelism is the configured partition count, independent of how
  many ``source`` values exist — a plain
  ``Window.partitionBy(source)`` cumsum would push each source's
  ENTIRE corpus through one task (windows with an ORDER BY have no
  partial aggregation), a single-task bottleneck at 10^10 documents
  with a handful of sources. No per-row Python.

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
    n_parts: int | None = None,
) -> DataFrame:
    """Greedy contiguous packing: documents are concatenated in
    ``order_col`` order within each ``part_col`` partition and cut
    every ``budget`` tokens; a document belongs to the pack in which
    its first token lands (documents may straddle the cut — the
    concat-and-cut convention, so no token is dropped or padded).

    Output: one row per (part, pack_id) with document count, token sum,
    and the first/last document of the pack.

    Scale: the running token count is computed as a two-phase cumsum so
    no task ever sees more than ~1/``n_parts`` of the data, regardless
    of ``part_col`` cardinality:

    1. ``repartitionByRange(n_parts, part, order)`` — contiguous
       (part, order) ranges, so per-range local cumsums compose.
    2. Local cumsum via a window keyed on (part, range id): the range
       id rides along as a column, so each window group is one range's
       slice of one part — at most one range of data per task.
    3. Per-(part, range) token totals (a groupBy with map-side partial
       aggregation → one tiny row per range) turn into prefix offsets
       with a window over ROWS ≪ data, then broadcast-join back.

    Two full-data shuffles (range + the local-window hash) versus the
    naive single shuffle into one-task-per-source — the extra exchange
    is the price of unbounded parallelism, exactly the rank/first-last
    trick in :mod:`blockchain_etl_spark.operators.skew`.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_parts is None:
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))

    base = df.select(
        F.col(part_col).alias("part"),
        F.col(order_col).alias("doc_key"),
        F.col(n_tok_col).alias("n_tok"),
    )
    # phase 1: contiguous global order ranges; the range id is captured
    # BEFORE any further exchange so later operators can key on it.
    # The ranged frame feeds two subplans (offsets + the final join);
    # RangePartitioner boundaries come from a sample, so without one
    # frozen materialization a broken exchange-reuse would give the
    # branches DIFFERENT boundaries and corrupt the cumsum (same fix
    # as ordering.global_order_rank).
    ranged = (
        base.repartitionByRange(n_parts, "part", "doc_key")
        .withColumn("_rid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # phase 2: local cumsum — every (part, _rid) group is a bounded slice
    wl = Window.partitionBy("part", "_rid").orderBy("doc_key")
    local = ranged.withColumn("_lcum", F.sum("n_tok").over(wl))
    # phase 3: per-range totals → exclusive prefix offsets (tiny frame:
    # one row per (part, range)), broadcast back onto the data
    wo = (
        Window.partitionBy("part")
        .orderBy("_rid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("part", "_rid")
        .agg(F.sum("n_tok").alias("_rtot"))
        .withColumn("_off", F.coalesce(F.sum("_rtot").over(wo), F.lit(0)))
        .select("part", "_rid", "_off")
    )
    cum = F.col("_lcum") + F.col("_off")
    pack_id = F.floor((cum - F.col("n_tok")) / F.lit(budget))
    return (
        local.join(F.broadcast(offsets), ["part", "_rid"])
        .select("part", "doc_key", "n_tok", pack_id.alias("pack_id"))
        .groupBy("part", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tok_sum"),
            F.min("doc_key").alias("first_doc"),
            F.max("doc_key").alias("last_doc"),
        )
    )
