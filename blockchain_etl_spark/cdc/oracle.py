"""Single-threaded pure-Python oracle replay.

The moral equivalent of the reference's "re-run the range and the upsert
must converge" invariants (autofix checkers,
``ethereumetl/jobs/checkers/block_checker.py:95-156``): fold the whole
change-log in stream order and produce the exact final table state the
engine must match row-for-row (token-array equality included).

Semantics (the contract both this oracle and the engine implement):

1. **Liveness**: event ``e`` is dead iff some later marker ``m``
   (``m.stream_pos > e.stream_pos``) has ``e.lsn > m.rollback_to_lsn``.
2. **Validity**: I/U events with ``tokens is null`` or
   ``n_tok != len(tokens)`` are rejected (do not change state).
3. **Last-writer-wins** per ``doc_id`` over live+valid events, ordered
   by ``stream_pos``; a final ``D`` removes the row; ``U`` on a missing
   key inserts (upsert semantics ≙ ON CONFLICT DO UPDATE); ``D`` on a
   missing key is a no-op.
"""

from __future__ import annotations

from typing import Any


def oracle_replay(events: list[dict[str, Any]]) -> dict[str, dict[str, Any]]:
    """events: flat list in stream order. Returns doc_id -> final row."""
    # pass 1: min rollback_to among markers strictly after each event
    n = len(events)
    min_rb_after = [None] * n
    cur: int | None = None
    for i in range(n - 1, -1, -1):
        min_rb_after[i] = cur
        e = events[i]
        if e["op"] == "R" and e["rollback_to_lsn"] is not None:
            cur = e["rollback_to_lsn"] if cur is None else min(cur, e["rollback_to_lsn"])

    state: dict[str, dict[str, Any]] = {}
    for i, e in enumerate(events):
        if e["op"] == "R":
            continue
        rb = min_rb_after[i]
        if rb is not None and e["lsn"] > rb:
            continue  # rolled back
        if e["op"] in ("I", "U"):
            if e["tokens"] is None or e["n_tok"] != len(e["tokens"]):
                continue  # rejected by validation
            state[e["doc_id"]] = {
                "doc_id": e["doc_id"],
                "tokens": list(e["tokens"]),
                "n_tok": e["n_tok"],
                "source": e["source"],
                "lsn": e["lsn"],
                "seq": e["seq"],
            }
        elif e["op"] == "D":
            state.pop(e["doc_id"], None)
    return state
