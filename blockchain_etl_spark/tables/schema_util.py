"""Schema evolution rules: added columns null-backfill, numeric types
widen (int→long, float→double) — the mergeSchema contract of the north
star, applied consistently at the table layer, the epoch store, and the
engine."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WIDEN_ORDER = {
    T.ByteType(): 0,
    T.ShortType(): 1,
    T.IntegerType(): 2,
    T.LongType(): 3,
}
_FLOAT_ORDER = {T.FloatType(): 0, T.DoubleType(): 1}


def widen_type(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    if a in _WIDEN_ORDER and b in _WIDEN_ORDER:
        return a if _WIDEN_ORDER[a] >= _WIDEN_ORDER[b] else b
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(widen_type(a.elementType, b.elementType), True)
    raise TypeError(f"incompatible schema evolution: {a} vs {b}")


def merge_schemas(base: T.StructType, incoming: T.StructType) -> tuple[T.StructType, bool]:
    """base ∪ incoming with widening; returns (merged, changed)."""
    fields: list[T.StructField] = []
    changed = False
    in_by_name = {f.name: f for f in incoming.fields}
    for f in base.fields:
        if f.name in in_by_name:
            w = widen_type(f.dataType, in_by_name[f.name].dataType)
            if w != f.dataType:
                changed = True
            fields.append(T.StructField(f.name, w, True))
        else:
            fields.append(f)
    base_names = set(base.fieldNames())
    for f in incoming.fields:
        if f.name not in base_names:
            fields.append(T.StructField(f.name, f.dataType, True))
            changed = True
    return T.StructType(fields), changed


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project df to `schema`: cast present columns, null-backfill
    missing ones."""
    have = set(df.columns)
    return df.select(
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in have
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in schema.fields
        ]
    )
