"""The flagship end-to-end: the incremental engine's final state over the
derived change-log must equal the one-shot declarative replay (which the
catalog parity test separately proves equals the DuckDB oracle)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from blockchain_etl_spark.catalog import cdc_replay_final_state


def _d(df):
    return {
        r["doc_id"]: (r["tokens_csv"], r["n_tok"], r["source"], r["lsn"], r["seq"])
        for r in df.collect()
    }


def test_entry_engine_equals_declarative_replay(spark):
    got = _d(entrymod.entry(spark))
    want = _d(cdc_replay_final_state(spark, "/root/testdata/sf0.001"))
    assert len(got) > 0
    assert got == want


def test_queries_and_oracles_aligned():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) == set(q)
    assert len(q) >= 30
