"""Seeded random-walk equivalence stress for the outer/temporal join
MVs: a deterministic pseudo-random interleaving of fact churn (insert /
update / re-point / delete, null values included) and dim/history churn
(insert / reweight / delete / rebirth), asserting after EVERY hop that
the incrementally-maintained state equals a from-scratch recompute of
the join over current states. This is the adversarial sweep for the
cross-term algebra — same-hop changes on both inputs in combinations
the hand-written tests don't enumerate."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from blockchain_etl_spark.cdc.apply import CdcEngine, read_state
from blockchain_etl_spark.cdc.generator import events_to_df
from blockchain_etl_spark.cdc.schema import TARGET_SCHEMA
from blockchain_etl_spark.streaming.join_mv import FullOuterJoinMV
from blockchain_etl_spark.tables.snapshot import SnapshotTable

from tests.test_join_mv import DIM_EV, DIM_SCHEMA, _frow

KEYS = [f"d{i}" for i in range(12)]
VALS = [f"s{i}" for i in range(5)] + [None]


def _step(rng, lsn, live_facts, live_dims):
    """One hop's worth of fact + dim events, mutating the mirrors."""
    fact_rows, dim_rows = [], []
    for seq in range(rng.randint(1, 4)):
        k = rng.choice(KEYS)
        if k in live_facts and rng.random() < 0.35:
            fact_rows.append((lsn, seq, "D", k, None, None))
            del live_facts[k]
        else:
            v = rng.choice(VALS)
            toks = list(range(rng.randint(1, 4)))
            op = "U" if k in live_facts else "I"
            fact_rows.append((lsn, seq, op, k, toks, v))
            live_facts[k] = (len(toks), v)
    for seq in range(rng.randint(0, 3)):
        s = rng.choice([v for v in VALS if v is not None])
        if s in live_dims and rng.random() < 0.4:
            dim_rows.append((lsn, seq, "D", s, None))
            del live_dims[s]
        else:
            w = rng.randint(1, 99)
            op = "U" if s in live_dims else "I"
            dim_rows.append((lsn, seq, op, s, w))
            live_dims[s] = w
    return fact_rows, dim_rows


def test_full_outer_random_walk(spark, tmp_path):
    rng = random.Random(20260818)
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), TARGET_SCHEMA, key="doc_id", n_buckets=4
    )
    dim = SnapshotTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key="doc_id", n_buckets=2
    )
    feng = CdcEngine(spark, fact, collect_metrics=False)
    deng = CdcEngine(spark, dim, collect_metrics=False)
    jm = FullOuterJoinMV(
        spark, fact, dim, str(tmp_path / "fjm"), join_col="source",
        fact_cols=["n_tok"], dim_cols=["weight"], n_buckets=2,
    )
    live_facts, live_dims = {}, {}
    for hop in range(10):
        lsn = hop + 1
        fact_rows, dim_rows = _step(rng, lsn, live_facts, live_dims)
        if dim_rows:
            deng.apply_epoch(spark.createDataFrame(
                [(l, l, seq, op, None, s, w)
                 for (l, seq, op, s, w) in dim_rows], DIM_EV), epoch_id=hop)
        if fact_rows:
            feng.apply_epoch(events_to_df(spark, [
                _frow(hop * 10 + i, l, seq, op, k, toks, v)
                for i, (l, seq, op, k, toks, v) in enumerate(fact_rows)
            ]), epoch_id=hop)
        jm.run_once()
        got = {
            (r["fact_id"], r["dim_id"]): (r["source"], r["n_tok"], r["weight"])
            for r in jm.state().collect()
        }
        ref = {
            (r["fid"], r["did"]): (r["source"], r["n_tok"], r["weight"])
            for r in read_state(fact).alias("f").join(
                read_state(dim).alias("d"),
                F.col("f.source") == F.col("d.doc_id"), "full_outer")
            .select(F.col("f.doc_id").alias("fid"),
                    F.col("d.doc_id").alias("did"),
                    "f.source", "f.n_tok", "d.weight").collect()
        }
        assert got == ref, (
            f"divergence at hop {hop}:"
            f"\nonly-mv={set(got) - set(ref)}\nonly-ref={set(ref) - set(got)}"
        )
        # the mirrors sanity-check the generator itself
        assert len([1 for (f, d) in got if f is not None]) == len(live_facts)


def test_asof_random_walk(spark, tmp_path):
    """As-of MV vs windowed recompute under random interleaving: fact
    churn (inserts / ts moves / deletes), history appends at RANDOM
    valid-froms (backfills land between existing breakpoints), and
    occasional history retractions — the non-bilinear re-resolve leg
    under adversarial schedules."""
    from tests.test_asof_join_mv import (
        FACT_EV, FACT_SCHEMA, HIST_EV, HIST_SCHEMA, _recompute, _got,
    )
    from blockchain_etl_spark.streaming.join_mv import AsofJoinMV

    rng = random.Random(77)
    fact = SnapshotTable.create(
        spark, str(tmp_path / "fact"), FACT_SCHEMA, key="doc_id", n_buckets=4
    )
    hist = SnapshotTable.create(
        spark, str(tmp_path / "hist"), HIST_SCHEMA, key="doc_id",
        n_buckets=2, bucket_key="hk",
    )
    feng = CdcEngine(spark, fact, collect_metrics=False)
    heng = CdcEngine(spark, hist, collect_metrics=False)
    jm = AsofJoinMV(
        spark, fact, hist, str(tmp_path / "asof"), join_col="k",
        ts_col="ets", hist_key_col="hk", hist_ts_col="vf",
        fact_cols=["val"], dim_cols=["weight"], n_buckets=2,
    )
    ks = ["k1", "k2", "k3"]
    live_facts: dict[str, tuple] = {}
    live_hist: set[tuple] = set()
    for hop in range(8):
        lsn = hop + 1
        frows = []
        for seq in range(rng.randint(1, 3)):
            d = f"f{rng.randint(0, 9)}"
            if d in live_facts and rng.random() < 0.3:
                frows.append((lsn, lsn, seq, "D", None, d, None, None, None))
                del live_facts[d]
            else:
                k = rng.choice(ks + [None])
                t = rng.choice([None, rng.randint(0, 40)])
                op = "U" if d in live_facts else "I"
                frows.append((lsn, lsn, seq, op, None, d, k, t, rng.randint(1, 9)))
                live_facts[d] = (k, t)
        hrows = []
        for seq in range(rng.randint(0, 2)):
            k = rng.choice(ks)
            if live_hist and rng.random() < 0.25:
                kk, vf = rng.choice(sorted(live_hist))
                hrows.append((lsn, lsn, seq, "D", None, f"{kk}@{vf}", kk, vf, None))
                live_hist.discard((kk, vf))
            else:
                vf = rng.randint(0, 40)  # backfills welcome
                if (k, vf) in live_hist:
                    continue
                hrows.append((lsn, lsn, seq, "I", None, f"{k}@{vf}", k, vf,
                              vf * 100 + len(k)))
                live_hist.add((k, vf))
        if frows:
            feng.apply_epoch(spark.createDataFrame(frows, FACT_EV), epoch_id=hop)
        if hrows:
            heng.apply_epoch(spark.createDataFrame(hrows, HIST_EV), epoch_id=hop)
        jm.run_once()
        got, ref = _got(jm), _recompute(fact, hist)
        assert got == ref, (
            f"divergence at hop {hop}:"
            f"\nonly-mv={set(got.items()) - set(ref.items())}"
            f"\nonly-ref={set(ref.items()) - set(got.items())}"
        )
