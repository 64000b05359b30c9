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
