"""Schemas for the change-log, the target table, and engine metadata.

Shapes follow FIXTURES.md / BASELINE.json ``input_hint``; the columns
mirror the reference's CDC vocabulary:

- ``lsn``  ≙ block number (``blknum``) — the WAL position
  (``blockchainetl/streaming/streamer.py:144-147``).
- ``seq``  ≙ intra-block position (``txpos``/``logpos`` ordering,
  ``ethereumetl/streaming/eth_token_holder_adapter.py:272``).
- ``op``   I/U/D change events ≙ upsert/delete items; ``R`` is the
  chain-reorg rollback marker (block-hash mismatch,
  ``ethereumetl/streaming/eth_reorg_adapter.py:102-114``).
- ``doc_id`` ≙ ``item_id`` (``eth_item_id_calculator.py:28-108``).
- target ``lsn``/``seq`` ≙ ``updated_blknum`` monotonic guard columns
  (``blockchainetl/streaming/postgres_utils.py:80-88``).
"""

from __future__ import annotations

from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        # physical arrival offset in the change-log (Kafka offset / file
        # position analog). Strictly increasing in stream order; the only
        # total order that survives a reorg (re-emitted events REUSE lsns).
        T.StructField("stream_pos", T.LongType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),  # I | U | D | R
        T.StructField("doc_id", T.StringType(), True),  # null for R
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("rollback_to_lsn", T.LongType(), True),  # only for R
        T.StructField("epoch_hash", T.StringType(), True),
    ]
)

# engine-maintained target: payload + (lsn, seq) last-writer watermark +
# commit epoch. `seq` is needed so the monotonic guard is total within an
# LSN (the reference's guard compares blknum only because one block is one
# transaction there; our docs can be touched twice per LSN).
TARGET_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("updated_epoch", T.LongType(), True),
        # tombstone flag: deletes keep a row carrying (lsn, seq) so the
        # monotonic guard also protects deleted keys from stale replays
        # (a hole the reference's plain ON CONFLICT upsert has). Logical
        # reads filter deleted; GC can drop tombstones older than the
        # reorg lag.
        T.StructField("deleted", T.BooleanType(), False),
    ]
)

# per-epoch lineage/metrics row (≙ PERF logs eth_streamer_adapter.py:251-256
# and the done/fail dirs postgres_utils.py:299-306).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("lsn_min", T.LongType(), True),
        T.StructField("lsn_max", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_insert", T.LongType(), True),
        T.StructField("n_update", T.LongType(), True),
        T.StructField("n_delete", T.LongType(), True),
        T.StructField("n_reorg", T.LongType(), True),
        T.StructField("n_rejected", T.LongType(), True),
        T.StructField("n_stale", T.LongType(), True),
        T.StructField("n_buckets_touched", T.LongType(), True),
        T.StructField("merge_ms", T.LongType(), True),
    ]
)
