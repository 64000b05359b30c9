"""Deterministic sampling for training-data pipelines.

Corpus assembly weights sources differently (up-sample curated text,
down-sample crawl); at 10^10 documents the sample must be reproducible
(re-runs and backfills pick the SAME rows — no ``rand()``), cheap (no
shuffle), and exact per stratum. Hash-threshold Bernoulli sampling
gives all three: keep a row iff ``h(key) mod M < rate·M`` where ``h``
is the engine's md5-based hash convention (DuckDB-reproducible, unlike
Spark's murmur ``hash()``).

Scale shape: a pure projection + filter — whole-stage codegen'd, zero
shuffle, embarrassingly parallel at scan width; the rates dict compiles
to a literal CASE expression, never a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = 10_000  # rate resolution 0.01%


def sample_hash(key: Column | str, salt: str = "samp") -> Column:
    """md5-threshold hash in [0, 10000) — stable across engines and
    re-runs. DuckDB twin:
    ``('0x' || substr(md5('samp' || key), 1, 8))::BIGINT % 10000``."""
    key = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % _MOD
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "doc_id",
    strata_col: str = "source",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep rate in [0, 1]; unlisted strata
    use ``default_rate``. Each stratum's realized fraction converges to
    its rate (the hash is uniform), and membership is a pure function of
    the key — adding a stratum later never reshuffles previous picks
    (the property that makes incremental corpus rebuilds stable)."""
    for r in list(rates.values()) + [default_rate]:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate {r} outside [0, 1]")
    thresh = F.lit(int(default_rate * _MOD))
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        t = F.lit(int(rate * _MOD))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = expr.otherwise(thresh) if expr is not None else thresh
    return df.filter(sample_hash(key_col) < thresh)


def assign_splits(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: consecutive hash ranges
    of ``sample_hash(key)`` map to the named splits in sorted-name
    order; leftover range (rounding) goes to the LAST split. Pure
    projection — a row's split is a function of its key alone, so
    re-runs, backfills, and late-arriving shards agree without any
    coordination, and no document ever migrates between splits when
    other data changes (the leakage-safety property).

    Returns the frame with a ``split`` column appended."""
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    names = sorted(fractions)
    h = sample_hash(key_col, salt=salt)
    expr = None
    lo = 0
    for name in names[:-1]:
        hi = lo + int(fractions[name] * _MOD)
        cond = h < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def mixture_rates(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, float]:
    """Per-source keep rates realizing a target mixture at the LARGEST
    achievable sample size (the standard corpus-mixing problem: hit
    domain shares w_s without up-sampling): the binding source is the
    one with the least data relative to its weight — N = min_s(n_s/w_s)
    — and every source keeps rate_s = w_s·N / n_s ≤ 1."""
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {s}")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {s: w / total_w for s, w in weights.items()}
    n_max = min(
        counts[s] / w for s, w in norm.items() if w > 0 and s in counts
    )
    return {
        s: min(1.0, (w * n_max) / counts[s])
        for s, w in norm.items()
        if s in counts and w > 0
    }


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic domain-mixture sampling: keep each source at the
    rate that realizes the target shares (``mixture_rates``) with the
    same hash-threshold Bernoulli as :func:`stratified_sample` — rerun-
    stable, zero-shuffle on the data path. The per-source counts are
    ONE aggregation collecting #sources rows (a bounded dim, never the
    data); the rates compile to a literal CASE."""
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[source_col] in weights
    }
    rates = mixture_rates(counts, weights)
    expr = None
    for s, rate in sorted(rates.items()):
        t = F.lit(int(rate * _MOD))
        cond = F.col(source_col) == s
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    return df.filter(sample_hash(key_col, salt=salt) < thresh)
