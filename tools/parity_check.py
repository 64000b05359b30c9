"""Local replica of the driver's correctness gate: run each catalog query
in Spark AND its DuckDB oracle on the same parquet tables, compare row
counts + sorted values.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from blockchain_etl_spark import catalog
from blockchain_etl_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # dtype-strict: the driver's canonicalizer hashes `55.0` != `55`, so a
        # DuckDB sum() that lands as float64 must NOT compare equal to Spark's
        # int64. Tag floats so int-vs-float parity failures surface locally.
        return ("f", round(v, 6))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    return v


def _normalize(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        rows.append(tuple(_norm_cell(v) for v in t))
    return cols, sorted(rows, key=lambda r: str(r))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("parity", master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "16g"})
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = catalog.oracle_sqls()
    failures = []
    for name, fn in catalog.QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(sdf)} rows)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        scols, srows = _normalize(sdf)
        ocols, orows = _normalize(odf)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {len(bad)}/{len(srows)} row mismatches; first: ")
            print("  spark :", bad[0][0])
            print("  oracle:", bad[0][1])
            continue
        print(f"OK   {name}: {len(srows)} rows")

    print(f"\n{len(failures)} failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
