"""Property-based checks for the iterative / multi-phase operators:
random inputs, python-oracle equivalence.

- connected components vs a union-find oracle over random edge sets
  (label propagation must hit the same unique min-label fixpoint).
- two-phase pack_sequences vs a sequential python fold over random
  (source, n_tok) streams at random range parallelism (the parallel
  prefix-sum decomposition must be invisible in the result).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from blockchain_etl_spark.operators.dedup import connected_components
from blockchain_etl_spark.operators.tokens import pack_sequences

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def edge_sets(draw):
    n = draw(st.integers(min_value=2, max_value=24))
    n_edges = draw(st.integers(min_value=0, max_value=30))
    edges = [
        (draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)))
        for _ in range(n_edges)
    ]
    return n, [(a, b) for a, b in edges if a != b]


def _uf_components(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    label = {}
    for v in range(n):
        r = find(v)
        label.setdefault(r, min(u for u in range(n) if find(u) == r))
    return {v: label[find(v)] for v in range(n)}


@settings(**_SETTINGS)
@given(edge_sets())
def test_connected_components_matches_union_find(spark, case):
    n, edges = case
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    if edges:
        e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    else:
        e = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r["node"]: r["label"]
           for r in connected_components(e, nodes=nodes).collect()}
    assert got == _uf_components(n, edges)


@st.composite
def doc_streams(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    n_sources = draw(st.integers(min_value=1, max_value=3))
    rows = [
        (i, f"s{draw(st.integers(0, n_sources - 1))}",
         draw(st.integers(1, 300)))
        for i in range(1, n + 1)
    ]
    budget = draw(st.sampled_from([64, 128, 512]))
    n_parts = draw(st.sampled_from([1, 3, 8]))
    return rows, budget, n_parts


def _pack_oracle(rows, budget):
    out = {}
    by_src = {}
    for doc_id, src, n_tok in sorted(rows):
        by_src.setdefault(src, []).append((doc_id, n_tok))
    for src, docs in by_src.items():
        cum = 0
        for doc_id, n_tok in docs:
            pack = cum // budget
            cum += n_tok
            k = (src, pack)
            n_docs, tok_sum, first, last = out.get(k, (0, 0, doc_id, doc_id))
            out[k] = (n_docs + 1, tok_sum + n_tok, min(first, doc_id),
                      max(last, doc_id))
    return out


@settings(**_SETTINGS)
@given(doc_streams())
def test_pack_sequences_matches_sequential_fold(spark, case):
    rows, budget, n_parts = case
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")
    got = {
        (r["part"], r["pack_id"]): (r["n_docs"], r["n_tok_sum"],
                                    r["first_doc"], r["last_doc"])
        for r in pack_sequences(df, budget=budget, n_parts=n_parts).collect()
    }
    assert got == _pack_oracle(rows, budget)


def test_mixture_rates_properties():
    """mixture_rates: realized shares match target weights at the max
    achievable N; binding source keeps rate 1.0; rates never exceed 1."""
    from blockchain_etl_spark.operators.sampling import mixture_rates

    counts = {"a": 1000, "b": 400, "c": 50}
    w = {"a": 0.5, "b": 0.25, "c": 0.25}
    rates = mixture_rates(counts, w)
    assert rates["c"] == 1.0  # binding: least data per unit weight
    # expected sample sizes proportional to weights: N = 50/0.25 = 200
    exp = {"a": 100, "b": 50, "c": 50}
    got = {s: rates[s] * counts[s] for s in rates}
    for s in exp:
        assert abs(got[s] - exp[s]) < 1e-6
    assert all(0 < r <= 1.0 for r in rates.values())
    import pytest

    with pytest.raises(ValueError):
        mixture_rates(counts, {"a": -1})
    with pytest.raises(ValueError):
        mixture_rates(counts, {"a": 0.0})


@st.composite
def rank_cases(draw):
    n = draw(st.integers(min_value=0, max_value=120))
    # coarse keys force duplicate-key ordering through the tiebreak
    keys = [draw(st.integers(0, 5)) for _ in range(n)]
    n_parts = draw(st.integers(min_value=1, max_value=9))
    return keys, n_parts


@given(case=rank_cases())
@settings(**_SETTINGS)
def test_global_order_rank_matches_sequential_sort(spark, case):
    """The two-phase global rank equals a plain python sort at any range
    parallelism, including duplicate keys, empty input, and n_parts
    larger than the row count."""
    from blockchain_etl_spark.operators.ordering import global_order_rank

    keys, n_parts = case
    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id long, k long") if rows else (
        spark.range(0).selectExpr("id", "id AS k")
    )
    got = {
        r["id"]: r["pos"]
        for r in global_order_rank(df, ["k", "id"], n_parts=n_parts).collect()
    }
    want = {i: p for p, (k, i) in enumerate(sorted((k, i) for i, k in rows))}
    assert got == want
