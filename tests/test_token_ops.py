"""Token-sequence ops: context-window chunking, concat-and-cut packing,
eval-set decontamination, repetition stats."""

import pytest
from pyspark.sql import functions as F

from blockchain_etl_spark.functions import text as X
from blockchain_etl_spark.operators import dedup
from blockchain_etl_spark.operators import tokens as TOK


def test_chunk_tokens_order_and_tail(spark):
    df = spark.createDataFrame(
        [("a", list(range(10))), ("b", [7]), ("c", [])],
        "doc_id string, tokens array<int>",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_tokens"], r["n_chunk_tok"])
        for r in TOK.chunk_tokens(df, chunk=4).collect()
    }
    # 10 tokens at chunk=4 -> [0..3], [4..7], [8,9]; order preserved
    assert out[("a", 0)] == ([0, 1, 2, 3], 4)
    assert out[("a", 1)] == ([4, 5, 6, 7], 4)
    assert out[("a", 2)] == ([8, 9], 2)
    # single short doc -> one short chunk
    assert out[("b", 0)] == ([7], 1)
    # empty doc produces no chunks
    assert not any(k[0] == "c" for k in out)
    assert len(out) == 4


def test_chunk_tokens_rejects_bad_width(spark):
    df = spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>")
    with pytest.raises(ValueError):
        TOK.chunk_tokens(df, chunk=0)


def test_pack_sequences_concat_and_cut(spark):
    # source s: docs 1..4 with 60+50+10+100 tokens, budget 100.
    # cum-start offsets: 0, 60, 110, 120 -> packs 0, 0, 1, 1
    df = spark.createDataFrame(
        [(1, "s", 60), (2, "s", 50), (3, "s", 10), (4, "s", 100), (9, "t", 5)],
        "doc_id long, source string, n_tok int",
    )
    rows = {
        (r["part"], r["pack_id"]): (
            r["n_docs"], r["n_tok_sum"], r["first_doc"], r["last_doc"]
        )
        for r in TOK.pack_sequences(df, budget=100).collect()
    }
    assert rows[("s", 0)] == (2, 110, 1, 2)  # doc 2 straddles the cut, no drop
    assert rows[("s", 1)] == (2, 110, 3, 4)
    assert rows[("t", 0)] == (1, 5, 9, 9)
    assert len(rows) == 3


def test_decontaminate_threshold_and_eval_exclusion(spark):
    # eval doc 0 carries the grams; doc 3 shares 2 distinct grams (>= 2),
    # doc 6 shares 1 (< min_hits), doc 9 shares none.
    df = spark.createDataFrame(
        [
            (0, "aa bb cc dd ee"),            # eval
            (3, "aa bb cc dd zz"),            # grams "aa bb cc", "bb cc dd"
            (6, "xx aa bb cc yy"),            # gram  "aa bb cc" only
            (9, "pp qq rr ss tt"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_contaminated"]
        for r in dedup.decontaminate(
            df, eval_pred=F.col("doc_id") == 0, k=3, min_hits=2
        ).collect()
    }
    assert out == {3: 2}


def test_repetition_stats_duplicated_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "w x y z")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["n_distinct"])
        for r in df.select("doc_id", *X.repetition_stats("text", k=2)).collect()
    }
    # "a b a b a" bigrams: "a b","b a","a b","b a" -> 4 total, 2 distinct
    assert out[1] == (4, 2)
    assert out[2] == (3, 3)


def test_pack_sequences_parallelism_independent_of_sources(spark):
    """The two-phase cumsum must (a) match the naive single-window
    formulation exactly and (b) run at the requested range parallelism
    even with ONE source — the scale property: a window partitioned by
    source alone would push the whole corpus through one task."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = [(i, "s0" if i % 3 else "s1", rng.randint(1, 400)) for i in range(1, 801)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")

    got = TOK.pack_sequences(df, budget=512, n_parts=8)
    # naive single-window reference (the oracle-shaped formulation)
    w = Window.partitionBy("source").orderBy("doc_id")
    pack = F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(512))
    want = (
        df.select(
            F.col("source").alias("part"), F.col("doc_id").alias("doc_key"),
            "n_tok", pack.alias("pack_id"),
        )
        .groupBy("part", "pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tok_sum"),
             F.min("doc_key").alias("first_doc"), F.max("doc_key").alias("last_doc"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    # the range exchange runs INSIDE the eager localCheckpoint (one
    # frozen materialization — the round-6 determinism fix), so the
    # downstream plan reads the checkpointed RDD rather than showing
    # RangePartitioning; the cumsum window still keys on
    # (part, range id), never on part alone
    assert "_rid" in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_stratified_sample_deterministic_and_rate_accurate(spark):
    import pytest

    from blockchain_etl_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(4000)],
        "doc_id long, source string",
    )
    rates = {"a": 0.5, "b": 0.1}
    s1 = stratified_sample(df, rates, default_rate=0.0)
    got = {r["source"]: r["n"] for r in
           s1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # hash-threshold sampling: realized fraction within a few % of rate
    assert abs(got["a"] / 2000 - 0.5) < 0.05
    assert abs(got["b"] / 2000 - 0.1) < 0.05
    # exactly reproducible (no rand): a second run picks the SAME rows
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in stratified_sample(df, rates).collect()
    )
    # unlisted stratum honors default_rate
    df2 = spark.createDataFrame([(i, "zz") for i in range(100)],
                                "doc_id long, source string")
    assert stratified_sample(df2, rates, default_rate=1.0).count() == 100
    assert stratified_sample(df2, rates, default_rate=0.0).count() == 0
    with pytest.raises(ValueError, match="outside"):
        stratified_sample(df, {"a": 1.5})


def test_connected_components_chain_and_singleton(spark):
    from blockchain_etl_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3 → multiple propagation rounds), pair 7-8,
    # singleton 9 via explicit node set
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (7, 8)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 7, 8, 9]],
                                  "node long")
    got = {r["node"]: r["label"]
           for r in connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7, 9: 9}


def test_connected_components_bridges_nodes_outside_node_set(spark):
    """Edge endpoints absent from `nodes` still conduct labels: a-b-c
    with only {a, c} declared must merge a and c through b — and the
    convergence probe must not early-exit while b's label is still
    propagating (regression: a node-keyed inner-join probe ignored
    message-introduced nodes)."""
    from blockchain_etl_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(1,), (3,)], "node long")
    got = {r["node"]: r["label"]
           for r in connected_components(edges, nodes=nodes).collect()}
    assert got[1] == 1 and got[3] == 1  # bridged through 2

    # non-convergence inside the budget raises instead of silently
    # returning partial labels
    import pytest as _pt

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long"
    )
    with _pt.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=2)


def test_assign_splits_is_stable_and_exhaustive(spark):
    import pytest as _pt

    from blockchain_etl_spark.operators.sampling import assign_splits

    df = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    out = assign_splits(df, fr)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(fr)  # exhaustive, no null split
    assert abs(counts["train"] / 3000 - 0.9) < 0.03
    # a doc's split never depends on what else is in the frame
    sub = assign_splits(df.filter("doc_id < 100"), fr)
    full_first = {r["doc_id"]: r["split"]
                  for r in out.filter("doc_id < 100").collect()}
    assert {r["doc_id"]: r["split"] for r in sub.collect()} == full_first
    with _pt.raises(ValueError, match="sum to 1"):
        assign_splits(df, {"a": 0.5, "b": 0.4})
