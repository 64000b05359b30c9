"""Fixed-width mergeable histogram — the ``hist<b>`` column merge
policy (approximate quantiles / latency-style distributions as
ingest-time table state).

The sketch is a length-``b`` ``array<bigint>`` of bin counts; merge is
element-wise addition — associative and commutative, so the fold is
safe at every site ``add`` is: the in-batch pre-aggregation, the MOR
resolver, the COW merge, compaction, and the CDF pandas resolver all
compose to the same histogram regardless of batching or delivery
order. Like ``add`` (and unlike ``kmv``) it is NOT idempotent — the
redelivery dedup lives in the delta path (stream_pos dedup +
exactly-once epoch ledger), same contract as the ``add`` counters.
Deterministic (integer adds, no RNG), so the DuckDB oracle twin
reproduces the bins and the derived quantiles bit-for-bit.

Binning is the CALLER's choice (``hist_item`` turns a precomputed bin
index into a one-hot sketch) — the policy only folds; that keeps the
engine value-agnostic the same way ``kmv`` takes pre-hashed items.

≙ the reference's per-key distribution needs (gas-price / tx-value
percentile panels the alert rules threshold against,
``blockchainetl/service/price_service.py`` consumers and the
``tag_value_usd`` rule UDF): the reference recomputes percentiles per
poll from raw history; a ``hist<b>`` column keeps a mergeable
distribution in the same upsert-hook position as its counters.

Estimator: ``hist_quantile_bin`` returns the 0-based index of the
first bin whose cumulative count reaches ``ceil(q * total)`` — the
standard inverted-CDF (type-1) sample quantile at bin granularity.
Integer comparisons only; ``ceil`` of an exact small product is the
single float op and matches DuckDB exactly for the q values in use
(k/100 with total < 2^40).

At scale: a sketch is ``b`` longs per key — constant-size state; every
fold is a per-key array add with no extra shuffle (the folds ride the
same groupBy/merge the last-writer path already does). The zip_with /
aggregate expressions are interpreted (no codegen for array lambdas),
but they touch only the policy column of touched keys — never a wide
scan (the round-5 HOF lesson applies to per-reference re-evaluation,
each fold references its input once).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_HIST_RE = re.compile(r"^hist([1-9]\d*)$")


def hist_bins(policy: str | None) -> int | None:
    """b of a ``hist<b>`` policy string, else None (not a hist policy)."""
    m = _HIST_RE.match(policy or "")
    return int(m.group(1)) if m else None


def hist_item(bin_col: Column, b: int) -> Column:
    """Single-observation sketch for an incoming event: a one-hot
    length-``b`` count array with 1 at ``bin_col`` (clamped to
    [0, b-1]), null for null bins (contributes nothing to the fold)."""
    i = F.least(F.greatest(bin_col.cast("int"), F.lit(0)), F.lit(b - 1))
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(b - 1)),
        lambda j: F.when(j == i, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    return F.when(bin_col.isNotNull(), arr)


def hist_merge_pair(a: Column, b: Column) -> Column:
    """Binary fold (the COW merge shape): element-wise sum;
    null ⊕ x = x (null = "no observations")."""
    return (
        F.when(a.isNull(), b)
        .when(b.isNull(), a)
        .otherwise(F.zip_with(a, b, lambda x, y: x + y))
    )


def hist_agg(col_name: str, b: int) -> Column:
    """Aggregate fold (the groupBy shape used by the in-batch pre-fold
    and the MOR resolver): element-wise sum of every row's sketch.
    ``collect_list`` skips null sketches; an all-null group folds to
    null (matching ``sum(min_count=1)`` semantics of ``add``). Group
    cardinality is bounded by rows-per-key in the un-compacted window
    and every element is exactly ``b`` longs, so the collected list
    stays small."""
    zero = F.array_repeat(F.lit(0).cast("long"), b)
    merged = F.aggregate(
        F.collect_list(col_name), zero,
        lambda acc, x: F.zip_with(acc, x, lambda p, q: p + q),
    )
    return F.when(F.count(col_name) > 0, merged)


def hist_fold_pandas(values):
    """Pandas twin of the fold (the CDF executor-side resolver):
    element-wise sum of an iterable of count-lists (None/NaN entries
    skipped), None when nothing contributed."""
    acc = None
    for v in values:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if acc is None:
            acc = [int(x) for x in v]
        else:
            acc = [a + int(x) for a, x in zip(acc, v)]
    return acc


def hist_total(col: Column) -> Column:
    """Total observation count of a sketch (BIGINT, null-safe)."""
    return F.when(
        col.isNotNull(),
        F.aggregate(col, F.lit(0).cast("long"), lambda a, x: a + x),
    )


def hist_quantile_bin(col: Column, q: float) -> Column:
    """0-based index of the first bin whose cumulative count reaches
    ``ceil(q * total)`` (inverted-CDF quantile at bin granularity) —
    BIGINT, null for null/empty sketches. One pass over the ``b``-long
    array via an (cum, idx, ans) struct accumulator; integer math."""
    total = hist_total(col)
    target = F.ceil(total.cast("double") * F.lit(q)).cast("long")
    zero = F.named_struct(
        F.lit("cum"), F.lit(0).cast("long"),
        F.lit("i"), F.lit(0).cast("long"),
        F.lit("ans"), F.lit(-1).cast("long"),
    )
    scan = F.aggregate(
        col,
        zero,
        lambda acc, x: F.named_struct(
            F.lit("cum"), acc["cum"] + x,
            F.lit("i"), acc["i"] + 1,
            F.lit("ans"),
            F.when(acc["ans"] >= 0, acc["ans"])
            .when(acc["cum"] + x >= target, acc["i"])
            .otherwise(F.lit(-1).cast("long")),
        ),
    )
    ans = scan["ans"]
    return (
        F.when(col.isNull() | (total <= 0), F.lit(None).cast("long"))
        .otherwise(ans)
    )


def hist_quantile_bin_sql(col: str, q: float) -> str:
    """DuckDB twin of :func:`hist_quantile_bin` over a LIST(BIGINT)
    column: unnest-free — a correlated list scan via list_reduce is
    awkward in SQL, so the twin uses the closed form: the first index
    (0-based) where the running sum reaches ceil(q * total). Written
    with list_transform + list_position over the cumulative list so it
    stays a scalar expression usable in any SELECT."""
    # cumulative list: cum[i] = sum of first i+1 bins
    cum = (
        f"list_transform(generate_series(1, len({col})), "
        f"i -> list_sum({col}[1:i]))"
    )
    total = f"list_sum({col})"
    target = f"ceil(({total})::DOUBLE * {q!r})::BIGINT"
    first_ge = (
        f"list_position(list_transform({cum}, c -> c >= {target}), true)"
    )
    return (
        f"CASE WHEN {col} IS NULL OR coalesce({total}, 0) <= 0 THEN NULL "
        f"ELSE ({first_ge} - 1)::BIGINT END"
    )
