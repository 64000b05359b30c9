"""BPE tokenizer: trainer + greedy encoder (functions/bpe.py).

The encoder's cross-engine exactness is proven by the `bpe_encode`
parity gate (DuckDB recursive-CTE twin); these are the exact unit twins
for the trainer and the greedy semantics."""

from blockchain_etl_spark.functions import bpe as B


def test_encode_word_greedy_semantics():
    # multi-level merges resolve in rank order, leftmost-lowest-rank
    assert B.encode_word("scan") == ["scan"]
    assert B.encode_word("the") == ["the"]
    assert B.encode_word("customer") == ["cust", "o", "mer"]
    assert B.encode_word("vector") == ["v", "e", "c", "t", "or"]
    assert B.encode_word("agg") == ["a", "g", "g"]  # no ranked pair at all
    # 'p|ar' (rank 55) fires before 's|p' (rank 69), so 'spark' settles
    # as a 3-token segmentation — a real greedy-BPE artifact
    assert B.encode_word("spark") == ["s", "par", "k"]
    assert B.encode_word("window") == ["window"]
    # overlapping occurrences merge left-to-right, non-overlapping
    ranks = B.merge_ranks([("a", "a")])
    assert B.encode_word("aaa", ranks) == ["aa", "a"]


def test_sym_ids_unique_and_stable():
    ids = [B.sym_id(ch) for ch in "abcdefghijklmnopqrstuvwxyz"]
    assert ids == list(range(26))
    merged_ids = [B.sym_id(a + b) for a, b in B.MERGES]
    assert merged_ids == list(range(26, 26 + len(B.MERGES)))
    assert len(set(ids + merged_ids)) == 26 + len(B.MERGES)


def test_learn_bpe_hand_computed():
    # histogram {ab:5, abc:3}: pair (a,b) count 8 beats (b,c) count 3;
    # after merging, (ab,c) count 3 is the only pair left
    merges = B.learn_bpe([("ab", 5), ("abc", 3)], num_merges=4)
    assert merges == [("a", "b"), ("ab", "c")]


def test_learn_bpe_deterministic_tie_break():
    # equal counts: lexicographically smallest pair wins
    merges = B.learn_bpe([("cd", 2), ("ab", 2)], num_merges=1)
    assert merges == [("a", "b")]


def test_learn_bpe_spark_matches_pure_python(spark):
    rows = [("a", "the fast the slow the fast",), ("b", "fast slow fast",)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = B.learn_bpe_spark(df, num_merges=3)
    # same histogram, same trainer
    hist = {}
    for _, t in rows:
        for w in t.split():
            hist[w] = hist.get(w, 0) + 1
    exp = B.learn_bpe(
        sorted(hist.items(), key=lambda kv: (-kv[1], kv[0])), num_merges=3
    )
    assert got == exp
    # learned merges actually compress: encode with them shortens 'fast'
    ranks = {p: i for i, p in enumerate(got)}
    assert len(B.encode_word("fast", ranks)) < 4


def test_encode_docs_matches_per_word_python(spark):
    df = spark.createDataFrame(
        [(1, "s1", "the fast customer"), (2, "s2", "agg spark")],
        ["doc_id", "source", "text"],
    )
    out = {
        r["doc_id"]: (r["n_tok"], r["tokens"])
        for r in B.bpe_encode_docs(df, carry=["source"]).collect()
    }
    exp1 = B.encode_word_ids("the") + B.encode_word_ids("fast") + B.encode_word_ids(
        "customer"
    )
    exp2 = B.encode_word_ids("agg") + B.encode_word_ids("spark")
    assert out[1] == (len(exp1), exp1)
    assert out[2] == (len(exp2), exp2)


def test_cte_twin_unbounded_word_length():
    """The DuckDB recursive-CTE twin must match the Python encoder for
    words LONGER than any fixed iteration budget (the cap is now
    length(word), which bounds merges at len-1)."""
    import duckdb

    from blockchain_etl_spark.catalog import _bpe_sql

    word = "scan" * 15  # 60 chars, 45 merge steps to full fold
    sql = _bpe_sql()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT 1 AS doc_id, '{word}' AS text, "
        f"'s' AS source"
    )
    got = con.sql(sql).fetchall()
    exp_ids = B.encode_word_ids(word)
    assert got[0][1] == ",".join(str(i) for i in exp_ids)
    assert got[0][2] == len(exp_ids)
