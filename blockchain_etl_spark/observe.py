"""Robust ``Observation`` readback.

``Observation.get`` has a sharp edge in classic PySpark: the JVM
``Observation`` latches the metrics row of the FIRST action executed
on the observed Dataset, but when that action's plan collapses to an
empty relation before execution (Catalyst ``PropagateEmptyRelation``,
or AQE's runtime equivalent), the ``CollectMetrics`` node is optimized
out of the executed plan entirely. The JVM side then latches a
schema-less empty ``GenericRow`` — and ``Observation.get`` dies inside
``PythonSQLUtils.toPyRow`` with an opaque Py4J ``AssertionError``.

For the CDC engine that collapse is reachable from data alone: an
epoch whose rows are ALL rejected by the validity contract (or all
killed by reorg liveness filters) produces an empty upsert set, the
first action on it collapses, and a naive ``obs.get`` would crash the
apply AFTER the table commit succeeded — a poison-epoch crash loop for
any tailer, with the ledger already holding the epoch.

``observed_get`` returns ``None`` in exactly that case so callers can
fall back to recounting (cheap — only degenerate epochs reach it) or
to zeros when the observed input was provably empty.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Observation


def observed_get(obs: Observation) -> dict[str, Any] | None:
    """``obs.get``, or ``None`` when the observed subtree was optimized
    away (empty-relation collapse) and no metrics row exists.

    Must only be called after an action ran on the observed DataFrame —
    like ``Observation.get`` itself, it blocks until the first action's
    listener fires.
    """
    jo = getattr(obs, "_jo", None)
    if jo is not None:
        # classic API: peek at the latched JVM row; an empty,
        # schema-less row is the collapse signature (a real metrics
        # row always carries the observe() aliases in its schema).
        jrow = jo.getRow()
        if jrow.length() == 0:
            return None
        return obs.get
    # non-classic (connect) sessions: no _jo handle; obs.get returns a
    # plain dict and raises no toPyRow assertion — pass through, but
    # translate an empty dict to the same None contract.
    got = obs.get
    return got if got else None
