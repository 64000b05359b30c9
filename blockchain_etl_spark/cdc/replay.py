"""Declarative full-log replay: final table state as ONE DataFrame plan.

The batch-mode twin of the incremental engine — same semantics contract
(liveness / validity / last-writer-wins, see ``oracle.py``) expressed as
a single Catalyst plan. Used to cross-check the incremental path, to
bootstrap a target from a retained log, and as the SQL-expressible shape
the DuckDB oracle mirrors.

Two liveness implementations:

- ``markers="collect"`` (default, the scale path): collect the R markers
  (reorgs are rare — thousands at most against 10^10 events) and build a
  conjunction of literal predicates. No global ordering, no window, the
  only shuffle in the whole plan is the final per-doc aggregation.
- ``markers="window"``: the textbook suffix-min window over stream
  order. Global (unpartitioned) window = single-task sort, kept only
  because it is the literal SQL the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import _liveness_filter, _valid_expr, dedup_last_writer


def replay_final_state(
    events: DataFrame, markers: str = "collect", markers_df: DataFrame | None = None
) -> DataFrame:
    """events: the full change-log. Returns final rows
    (doc_id, tokens, n_tok, source, lsn, seq).

    ``markers_df``: optional pre-computed R markers (stream_pos, lsn,
    rollback_to_lsn). When the change-log is itself a derived plan (a
    join/transform, not a materialized table), collecting markers from
    ``events`` re-executes the whole derivation — a caller that can
    produce the markers from the cheap base table should pass them."""
    data = events.filter(F.col("op") != "R")
    if markers == "collect":
        src = (
            markers_df
            if markers_df is not None
            else events.filter(F.col("op") == "R").select(
                "stream_pos", "lsn", "rollback_to_lsn"
            )
        )
        mk = [r.asDict() for r in src.collect()]
        live = _liveness_filter(data, mk)
    else:
        w = (
            Window.orderBy(F.desc("stream_pos"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        ev = events.withColumn(
            "_min_rb_after",
            F.min(F.when(F.col("op") == "R", F.col("rollback_to_lsn"))).over(w),
        )
        live = ev.filter(
            (F.col("op") != "R")
            & (F.col("_min_rb_after").isNull() | (F.col("lsn") <= F.col("_min_rb_after")))
        ).drop("_min_rb_after")

    valid = live.filter(_valid_expr())
    last = dedup_last_writer(valid)
    return last.filter(F.col("op") != "D").select(
        "doc_id", "tokens", "n_tok", "source", "lsn", "seq"
    )
