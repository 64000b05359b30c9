"""Custom stateful streaming operator: incrementally-maintained
per-source statistics (≙ the reference's derived aggregate tables —
token_holders / balances — updated per micro-batch, SURVEY §2.6), as an
``applyInPandasWithState`` operator.

State per source: first/last LSN seen, event counts by op, token total.
Each micro-batch updates the state in an Arrow-batched pandas function
(no per-row Python) and emits the current row — the streaming twin of
``incremental_source_stats``. This is the (c)-category operator of the
north star: genuinely stateful, not SQL-expressible as one query over a
batch (its output history depends on batch boundaries), so the driver's
rows-only check applies; tests verify final-state equivalence against
the batch aggregate instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("first_lsn", T.LongType()),
        T.StructField("last_lsn", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_lsn", T.LongType()),
        T.StructField("last_lsn", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    first, last, n, nd, tt = (
        state.get if state.exists else (None, None, 0, 0, 0)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        lsn_min = int(pdf["lsn"].min())
        lsn_max = int(pdf["lsn"].max())
        first = lsn_min if first is None else min(first, lsn_min)
        last = lsn_max if last is None else max(last, lsn_max)
        n += len(pdf)
        nd += int((pdf["op"] == "D").sum())
        tt += int(pdf["n_tok"].fillna(0).sum())
    state.update((first, last, n, nd, tt))
    yield pd.DataFrame(
        [
            {
                "source": key[0],
                "first_lsn": first,
                "last_lsn": last,
                "n_events": n,
                "n_deletes": nd,
                "total_tokens": tt,
            }
        ]
    )


def streaming_source_stats(events: DataFrame) -> DataFrame:
    """events: a STREAMING DataFrame of change events (EVENT_SCHEMA).
    Returns the per-source running stats stream (update mode)."""
    return (
        events.filter("source IS NOT NULL")
        .groupBy("source")
        .applyInPandasWithState(
            _update,
            STATS_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
