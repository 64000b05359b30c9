"""Pytest version of the driver's correctness gate: every catalog query
vs its DuckDB oracle at sf0.001 (the driver runs sf0.01)."""

import math
import os

import duckdb
import pandas as pd
import pytest

from blockchain_etl_spark import catalog

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _normalize(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in t) for t in df[cols].itertuples(index=False)]
    return cols, sorted(rows, key=str)


@pytest.mark.parametrize("name", sorted(catalog.QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = catalog.QUERIES[name](spark, SF_DIR).toPandas()
    odf = ddb.sql(catalog.oracle_sqls()[name]).df()
    scols, srows = _normalize(sdf)
    ocols, orows = _normalize(odf)
    assert scols == ocols
    assert len(srows) == len(orows)
    mismatches = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mismatches, f"{len(mismatches)} mismatching rows; first: {mismatches[0]}"
