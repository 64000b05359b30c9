"""Deterministic seeded change-log generators.

Two generators:

- ``generate_changelog`` — pure-Python, driver-side, used by unit /
  property tests and the single-threaded oracle. Covers the FIXTURES.md
  scenarios: inserts-only, mixed I/U/D with key reuse, intra-batch
  multi-event keys, invalid payloads (``n_tok != len(tokens)``), skewed
  keys, and reorg markers followed by re-emission of the diverged LSN
  range.
- ``generate_changelog_spark`` — distributed, column-expression-only
  (no Python RNG, no UDFs): every field is a deterministic function of
  the event index via ``xxhash64``. This is the bench-scale generator —
  it produces N events without materializing anything on the driver,
  so the same code generates 10^5 events in CI and 10^10 on a cluster.
"""

from __future__ import annotations

import random
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.schema import EVENT_SCHEMA


def _payload(rng: random.Random, vocab: int, max_len: int) -> tuple[list[int], int]:
    n = rng.randint(1, max_len)
    toks = [rng.randrange(vocab) for _ in range(n)]
    return toks, n


def generate_changelog(
    seed: int = 42,
    n_epochs: int = 8,
    lsns_per_epoch: int = 10,
    events_per_lsn: int = 6,
    n_docs: int = 120,
    p_update: float = 0.45,
    p_delete: float = 0.08,
    p_reorg_epoch: float = 0.25,
    reorg_max_depth: int = 12,
    invalid_rate: float = 0.03,
    hot_frac: float = 0.02,
    hot_mass: float = 0.3,
    vocab: int = 1000,
    max_len: int = 16,
) -> list[list[dict[str, Any]]]:
    """Return epochs of event dicts (EVENT_SCHEMA fields), stream-ordered.

    Reorg protocol (≙ chain reorg, ``eth_reorg_adapter.py:102-114``):
    an ``R`` marker with ``rollback_to_lsn = L`` invalidates every
    earlier event with ``lsn > L``; the generator then re-emits a
    corrected stream for lsns ``(L, head]`` — lsns REPEAT across the
    marker, which is why ``stream_pos`` is the only total order.
    """
    rng = random.Random(seed)
    hot_docs = [f"doc-{i:06d}" for i in range(max(1, int(n_docs * hot_frac)))]
    all_docs = [f"doc-{i:06d}" for i in range(n_docs)]
    pos = 0
    head = -1  # last fully-emitted lsn
    epochs: list[list[dict[str, Any]]] = []

    def pick_doc() -> str:
        if rng.random() < hot_mass:
            return rng.choice(hot_docs)
        return rng.choice(all_docs)

    def emit_lsn_events(ev: list[dict[str, Any]], lsn: int) -> None:
        nonlocal pos
        ehash = f"h{seed}-{lsn}-{rng.randrange(1 << 30):08x}"
        for seq in range(rng.randint(1, events_per_lsn)):
            r = rng.random()
            if r < p_delete:
                op, toks, n = "D", None, None
            else:
                op = "U" if r < p_delete + p_update else "I"
                toks, n = _payload(rng, vocab, max_len)
                if rng.random() < invalid_rate:
                    n = n + 1  # invalid: engine must reject, not apply
            ev.append(
                {
                    "stream_pos": pos,
                    "lsn": lsn,
                    "seq": seq,
                    "op": op,
                    "doc_id": pick_doc(),
                    "tokens": toks,
                    "n_tok": n,
                    "source": f"src{lsn % 5}",
                    "rollback_to_lsn": None,
                    "epoch_hash": ehash,
                }
            )
            pos += 1

    for ep in range(n_epochs):
        ev: list[dict[str, Any]] = []
        if ep > 0 and rng.random() < p_reorg_epoch and head > 0:
            depth = rng.randint(1, min(reorg_max_depth, head))
            rb = head - depth
            ev.append(
                {
                    "stream_pos": pos,
                    "lsn": head,
                    "seq": 0,
                    "op": "R",
                    "doc_id": None,
                    "tokens": None,
                    "n_tok": None,
                    "source": None,
                    "rollback_to_lsn": rb,
                    "epoch_hash": f"reorg-{ep}",
                }
            )
            pos += 1
            # re-emit corrected events for the diverged range (L, head]
            for lsn in range(rb + 1, head + 1):
                emit_lsn_events(ev, lsn)
        for lsn in range(head + 1, head + 1 + lsns_per_epoch):
            emit_lsn_events(ev, lsn)
        head = head + lsns_per_epoch
        epochs.append(ev)
    return epochs


def events_to_df(spark: SparkSession, events: list[dict[str, Any]]) -> DataFrame:
    rows = [tuple(e[f.name] for f in EVENT_SCHEMA.fields) for e in events]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def generate_changelog_spark(
    spark: SparkSession,
    n_events: int,
    seed: int = 42,
    n_docs: int = 100_000,
    events_per_lsn: int = 64,
    p_update: float = 0.45,
    p_delete: float = 0.08,
    hot_frac: float = 0.001,
    hot_mass: float = 0.3,
    invalid_rate: float = 0.02,
    vocab: int = 32768,
    max_len: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic change-log: every field is a pure column
    expression of the event index. No reorg markers (bench measures the
    steady-state apply path; reorg cost is covered by its own bench).

    Skew scenario (FIXTURES.md #6): ``hot_mass`` of events land on
    ``hot_frac`` of doc_ids — exercised against map-side partial
    aggregation + AQE skew handling.
    """
    rng = F.xxhash64(F.col("id"), F.lit(seed))          # 64-bit mix per event
    rng2 = F.xxhash64(F.col("id"), F.lit(seed + 1))
    u = (F.pmod(rng, F.lit(1_000_000)) / 1_000_000.0)   # uniform [0,1)
    n_hot = max(1, int(n_docs * hot_frac))
    doc_idx = F.when(
        F.pmod(rng2, F.lit(1000)) < int(hot_mass * 1000),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(n_hot)),
    ).otherwise(F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(n_docs)))
    op = (
        F.when(u < p_delete, F.lit("D"))
        .when(u < p_delete + p_update, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    n_tok = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 4)), F.lit(max_len)) + 1).cast("int")
    # tokens[i] = hash(id, i) % vocab — generated JVM-side via transform()
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed + 5)), F.lit(vocab)).cast("int"),
    )
    invalid = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 6)), F.lit(1_000_000)) < int(
        invalid_rate * 1_000_000
    )
    df = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    return df.select(
        F.col("id").alias("stream_pos"),
        (F.col("id") / events_per_lsn).cast("long").alias("lsn"),
        F.pmod(F.col("id"), F.lit(events_per_lsn)).cast("int").alias("seq"),
        op.alias("op"),
        F.format_string("doc-%09d", doc_idx).alias("doc_id"),
        F.when(op != "D", tokens).alias("tokens"),
        F.when(op != "D", F.when(invalid, n_tok + 1).otherwise(n_tok)).alias("n_tok"),
        F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(5))).alias("source"),
        F.lit(None).cast("long").alias("rollback_to_lsn"),
        F.md5(F.concat_ws("-", F.lit(seed), (F.col("id") / events_per_lsn).cast("long"))).alias(
            "epoch_hash"
        ),
    )
