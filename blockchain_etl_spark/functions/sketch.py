"""KMV (k-minimum-values) distinct-count sketch — the mergeable
approx-COUNT(DISTINCT) state behind the ``kmv<k>`` column merge policy.

The sketch is the sorted list of the k smallest md5 hex digests of the
values seen; union-then-keep-k-smallest is associative, commutative and
idempotent (a bounded semilattice), so the fold is safe anywhere
``add``/``min``/``max`` are: in-batch pre-aggregation, the MOR
resolver, the COW merge, compaction, and the CDF pandas resolver all
compose to the same sketch regardless of batching or delivery order.
Unlike ``add`` it is also redelivery-proof by construction (set union
is idempotent), and the estimator is deterministic — no RNG, so the
DuckDB oracle twin reproduces it bit-for-bit.

Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
data stream"; the bottom-k form): with the k-th smallest hash mapped to
a fraction U of the hash space, distinct ≈ (k-1)/U. Below k observed
values the sketch IS the value set and the count is exact.

≙ the reference's approx-cardinality needs (token holder / address
uniqueness counters, postgres_hooks.py counter columns) where the exact
``add`` counter over-counts revisits; a kmv column gives distinct-user
counters in the same upsert-hook position.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_KMV_RE = re.compile(r"^kmv([1-9]\d*)$")

# 16^15 = 2^60: md5 prefix of 15 hex chars spans [0, 2^60) and fits a
# long; (k-1)*2^60 is a small-int times a power of two — exact as a
# double, so Spark and DuckDB compute the identical IEEE quotient.
_HASH_SPACE = float(16**15)


def kmv_k(policy: str | None) -> int | None:
    """k of a ``kmv<k>`` policy string, else None (not a kmv policy)."""
    m = _KMV_RE.match(policy or "")
    return int(m.group(1)) if m else None


def kmv_item(col: Column) -> Column:
    """Single-value sketch for an incoming event: ``[md5(value)]``,
    null for null values (a null contributes nothing to the fold)."""
    return F.when(
        col.isNotNull(), F.array(F.md5(col.cast("string")))
    )


def kmv_truncate(col: Column, k: int) -> Column:
    """Normalize an arbitrary hash array to sketch form."""
    return F.slice(F.array_sort(F.array_distinct(col)), 1, k)


def kmv_merge_pair(a: Column, b: Column, k: int) -> Column:
    """Binary fold (the COW merge shape): union of two sketches,
    k smallest kept; null ⊕ x = x (null = "no values seen")."""
    return (
        F.when(a.isNull(), kmv_truncate(b, k))
        .when(b.isNull(), kmv_truncate(a, k))
        .otherwise(kmv_truncate(F.concat(a, b), k))
    )


def kmv_agg(col_name: str, k: int) -> Column:
    """Aggregate fold (the groupBy shape used by the in-batch pre-fold
    and the MOR resolver): union every row's sketch, keep k smallest.
    ``collect_list`` skips null sketches; an all-null group folds to
    null (matching ``sum(min_count=1)`` semantics of ``add``). Group
    cardinality is bounded by rows-per-key in the un-compacted window
    and every element is ≤ k hashes, so the collected list stays small.
    """
    merged = kmv_truncate(F.flatten(F.collect_list(col_name)), k)
    return F.when(F.size(merged) > 0, merged)


def kmv_fold_pandas(values, k: int):
    """Pandas twin of the fold (the CDF executor-side resolver): union
    of an iterable of hash-lists (None/NaN entries skipped), sorted,
    k smallest; None when nothing contributed."""
    acc: set[str] = set()
    for v in values:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        acc.update(v)
    return sorted(acc)[:k] if acc else None


def kmv_estimate(col: Column, k: int) -> Column:
    """Distinct-count estimate as a BIGINT (floor'd so the float math
    never leaks into a hashed gate column): exact size below k, else
    (k-1)/U with U = kth-smallest hash prefix / 16^15."""
    kth = F.try_element_at(col, F.lit(k))  # null when sketch holds < k
    u = F.conv(F.substring(kth, 1, 15), 16, 10).cast("double")
    est = F.floor(F.lit((k - 1) * _HASH_SPACE) / u).cast("long")
    return (
        F.when(col.isNull(), F.lit(None).cast("long"))
        .when(kth.isNull(), F.size(col).cast("long"))
        .otherwise(est)
    )


def kmv_estimate_sql(col: str, k: int) -> str:
    """DuckDB twin of :func:`kmv_estimate` over a LIST(VARCHAR) column
    (1-based list indexing; same exact double constant, one division,
    same floor)."""
    const = repr((k - 1) * _HASH_SPACE)
    return (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN len({col}) < {k} THEN len({col})::BIGINT "
        f"ELSE floor({const} / (('0x' || substr({col}[{k}], 1, 15))::BIGINT)::DOUBLE)::BIGINT END"
    )
