"""Physical-plan hygiene audit over every catalog query.

For each query, prints one line of plan facts Catalyst's output proves:

- exchanges: shuffle Exchange count (BroadcastExchange counted apart)
- bcast:     broadcast joins used
- smj:       sort-merge joins
- codegen:   WholeStageCodegen span count (JVM-side execution)
- pushed:    parquet PushedFilters present (predicate pushdown reached
             the scan)
- pyudf:     ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
             operators (the declared Arrow-batched slow-path islands)

Usage: python tools/plan_audit.py [sf_dir] [query ...]   → stdout table
       python tools/plan_audit.py --markdown …           → PLANS.md rows
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_etl_spark import catalog
from blockchain_etl_spark.session import get_spark


def audit_one(df) -> dict:
    df.collect()  # execute THIS plan: AQE materializes the final plan
    # (and its codegen *(N) stage markers) only after the query runs —
    # and count() would execute a different (aggregated) plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Final Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    lines = plan.splitlines()
    return {
        "exchanges": sum(
            1 for ln in lines if "Exchange" in ln and "BroadcastExchange" not in ln
        ),
        "bcast": sum(1 for ln in lines if "BroadcastHashJoin" in ln),
        "smj": sum(1 for ln in lines if "SortMergeJoin" in ln),
        # codegen'd operators carry a `*(N)` stage prefix in the plan tree
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed": "PushedFilters: [" in plan
        and not re.search(r"PushedFilters: \[\s*\]", plan),
        "pyudf": sum(
            1
            for ln in lines
            if any(t in ln for t in ("ArrowEvalPython", "MapInPandas", "PythonMapInArrow", "FlatMapGroupsInPandas"))
        ),
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--markdown"]
    md = "--markdown" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    rows = []
    for name, fn in catalog.QUERIES.items():
        if only and name not in only:
            continue
        try:
            a = audit_one(fn(spark, sf_dir))
            rows.append((name, a, None))
        except Exception as e:  # noqa: BLE001 — report, don't abort the audit
            rows.append((name, None, str(e).splitlines()[0][:80]))

    if md:
        print("| query | shuffles | bcast joins | SMJ | codegen spans | pushdown | py islands |")
        print("|---|---|---|---|---|---|---|")
    for name, a, err in rows:
        if a is None:
            print(f"AUDIT-ERR {name}: {err}")
            continue
        if md:
            print(
                f"| {name} | {a['exchanges']} | {a['bcast']} | {a['smj']} "
                f"| {a['codegen']} | {'✓' if a['pushed'] else '—'} | {a['pyudf']} |"
            )
        else:
            print(
                f"{name:28s} shuffles={a['exchanges']:<2d} bcast={a['bcast']:<2d} "
                f"smj={a['smj']:<2d} codegen={a['codegen']:<2d} "
                f"pushed={'Y' if a['pushed'] else '-'} pyudf={a['pyudf']}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
