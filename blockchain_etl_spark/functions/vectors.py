"""Vector math over array<float|double> columns — JVM-side expressions.

``F.aggregate`` / ``F.zip_with`` keep the arithmetic inside whole-stage
codegen; no UDF, no Arrow transfer. Inputs are cast to double before
accumulation so results match a float64 oracle bit-for-bit (float32
accumulation order would otherwise make cross-engine comparison flaky).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def int_embedding(a: Column | str, scale: int = 1_000_000) -> Column:
    """Fixed-point quantization: floor(x · scale) as array<long>. floor is
    bit-identical across engines (unlike half-up vs half-even rounding),
    so integer similarity math built on this matches any float64 oracle
    exactly."""
    return F.transform(_d(a), lambda x: F.floor(x * scale).cast("long"))


def idot(a: Column | str, b: Column | str) -> Column:
    """Exact integer dot product over array<long> columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def random_hyperplane_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """Sign bits of <a, p> for a fixed list of hyperplanes — the SRP-LSH
    bucket key for cosine ANN. Planes are literals (broadcast into the
    plan), so this stays a pure column expression."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    _d(a),
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in planes
    ]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out
