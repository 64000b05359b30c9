"""Physical-plan inspection helpers — the ".explain and iterate" loop as
assertable code. Used by tests to pin down that filters reach the
parquet scan, small dims broadcast, and the hot path stays inside
whole-stage codegen."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from the scan nodes."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df, "simple")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count WholeStageCodegen subtrees in the EXECUTED plan (AQE only
    finalizes codegen wrapping at runtime, so this triggers the query)."""
    df.collect()  # executes THIS dataset's queryExecution (count() would build a new plan)
    executed = df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]
    # codegen stages print as "*(N) Operator" in the final plan
    return len(set(re.findall(r"\*\((\d+)\)", executed)))
