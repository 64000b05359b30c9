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
    applied iteratively for fixed depth. For unbounded depth use
    ``flatten_geth_traces`` below. Each child gets trace_address =
    parent path + [position]."""
    children = df.select(
        "*", F.posexplode_outer(F.col(calls_col)).alias("_pos", "_child")
    )
    return children


def flatten_geth_traces(
    df: DataFrame, json_col: str = "trace_json", id_cols: tuple[str, ...] = ("tx_id",)
) -> DataFrame:
    """Unbounded-depth geth call-tree flatten (≙ the recursive
    ``_iterate_geth_trace``, trace_mapper.py:149-290): one row per call
    with ``trace_address`` = the child-position path from the root.

    Spark structs cannot be recursive, so arbitrarily nested traces
    arrive as JSON strings; the decode is an explicit-stack DFS inside an
    Arrow-batched ``mapInPandas`` — per-transaction O(tree) work, no
    shuffle, embarrassingly parallel across 10^10 tx. (This is the one
    place built-in operators genuinely can't express the semantics:
    Catalyst has no recursive type and ``get_json_object`` paths are
    compile-time literals.)"""
    import pyspark.sql.types as T

    id_fields = [f for f in df.schema.fields if f.name in id_cols]
    out_schema = T.StructType(
        [
            *id_fields,
            T.StructField("trace_address", T.ArrayType(T.IntegerType())),
            T.StructField("call_type", T.StringType()),
            T.StructField("from_address", T.StringType()),
            T.StructField("to_address", T.StringType()),
            T.StructField("value", T.LongType()),
            T.StructField("error", T.BooleanType()),
            T.StructField("n_children", T.IntegerType()),
            T.StructField("depth", T.IntegerType()),
        ]
    )
    ids = [f.name for f in id_fields]

    def gen(batches):
        import json as _json

        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for row in pdf.itertuples(index=False):
                idv = {c: getattr(row, c) for c in ids}
                stack = [((), _json.loads(getattr(row, json_col)))]
                while stack:
                    path, node = stack.pop()
                    calls = node.get("calls") or []
                    for c in ids:
                        out[c].append(idv[c])
                    out["trace_address"].append(list(path))
                    out["call_type"].append(node.get("type"))
                    out["from_address"].append(node.get("from"))
                    out["to_address"].append(node.get("to"))
                    v = node.get("value")
                    out["value"].append(None if v is None else int(v))
                    out["error"].append(bool(node.get("error")))
                    out["n_children"].append(len(calls))
                    out["depth"].append(len(path))
                    for i, ch in enumerate(calls):
                        stack.append(((*path, i), ch))
            yield pd.DataFrame(out)

    return df.select(*ids, json_col).mapInPandas(gen, schema=out_schema)
