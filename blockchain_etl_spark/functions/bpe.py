"""Byte-pair-encoding tokenizer, from scratch (trainer + encoder).

Replaces the hash-token stand-in (``text.tokenize``) with a REAL
subword tokenizer: a merge-rank table (either learned from the corpus
or a fixed public table) drives a greedy encoder. No tokenizer library
is involved — the algorithm is the classic public BPE (Sennrich et al.
2016 / the GPT-2 encoder shape):

- **Training** operates on the word-FREQUENCY table, not the corpus
  (exactly how public BPE trainers work): Spark computes word counts
  with one ``groupBy`` (map-side combined), the driver runs the
  pair-count/merge loop over that bounded histogram. Corpus-side cost
  is one aggregation regardless of corpus size; driver cost is
  O(vocab × merges), independent of corpus size.
- **Encoding** is vocabulary-sized, not corpus-sized: distinct words
  are encoded once through an Arrow-batched pandas UDF, then joined
  back to the word stream (the dim is tiny → AQE broadcasts it). The
  per-word encode is the deterministic greedy loop: repeatedly merge
  the LEFTMOST occurrence of the LOWEST-RANK adjacent pair until no
  ranked pair remains. One-pair-per-step with that tie order produces
  the same fixed point as the usual all-occurrences-per-rank pass, and
  is exactly reproducible as a DuckDB recursive CTE (the gate twin).

Token ids: 'a'..'z' → 0..25, merge with rank r (1-based) → 25 + r.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Fixed public merge table (rank = list position, 1-based). A merge is
# (left symbol, right symbol) → concatenated symbol. Multi-level chains
# (t+h → th, th+e → the) exercise real subword structure over the
# synthetic corpus vocabulary; results are unique by construction.
# ---------------------------------------------------------------------------
MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"), ("o", "r"),
    ("s", "t"), ("a", "r"), ("o", "w"), ("r", "o"), ("a", "t"), ("e", "y"),
    ("o", "u"), ("s", "c"), ("sc", "an"), ("j", "o"), ("jo", "in"),
    ("m", "er"), ("mer", "g"), ("merg", "e"), ("s", "m"), ("sm", "a"),
    ("sma", "l"), ("smal", "l"), ("w", "in"), ("win", "d"), ("wind", "ow"),
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"), ("d", "at"),
    ("dat", "a"), ("g", "ro"), ("gro", "u"), ("grou", "p"), ("f", "a"),
    ("fa", "st"), ("k", "ey"), ("h", "a"), ("ha", "s"), ("has", "h"),
    ("q", "u"), ("qu", "er"), ("quer", "y"), ("b", "at"), ("bat", "c"),
    ("batc", "h"), ("r", "ow"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("s", "or"), ("sor", "t"), ("p", "ar"), ("par", "t"), ("l", "in"),
    ("lin", "e"), ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("s", "l"), ("sl", "ow"), ("c", "u"), ("cu", "st"), ("o", "m"),
    ("o", "l"), ("c", "ol"), ("s", "p"), ("sp", "ar"), ("spar", "k"),
]

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def merge_ranks(merges: list[tuple[str, str]] | None = None) -> dict[tuple[str, str], int]:
    """(a, b) → 0-based rank (lower = higher priority)."""
    return {pair: i for i, pair in enumerate(merges or MERGES)}


def sym_id(sym: str, merges: list[tuple[str, str]] | None = None) -> int:
    """Token id: base chars 0..25, merge of 1-based rank r → 25 + r."""
    m = merges or MERGES
    if len(sym) == 1 and sym in _ALPHABET:
        return _ALPHABET.index(sym)
    return 25 + 1 + [a + b for a, b in m].index(sym)


def encode_word(word: str, ranks: dict[tuple[str, str], int] | None = None) -> list[str]:
    """Greedy BPE encode of one word: merge the leftmost occurrence of
    the lowest-rank adjacent pair, one pair per step, until no ranked
    pair remains. Pure Python — the exact twin of the gate's DuckDB
    recursive CTE, and the inner loop of the Arrow-batched UDF."""
    if ranks is None:
        ranks = merge_ranks()
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pos = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pos = r, i
        if best_pos is None:
            break
        syms[best_pos : best_pos + 2] = [syms[best_pos] + syms[best_pos + 1]]
    return syms


def encode_word_ids(
    word: str, merges: list[tuple[str, str]] | None = None
) -> list[int]:
    m = merges or MERGES
    ranks = merge_ranks(m)
    return [sym_id(s, m) for s in encode_word(word, ranks)]


# ------------------------------------------------------------------ trainer
def learn_bpe(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a word-frequency histogram: repeatedly
    merge the most frequent adjacent symbol pair (ties broken by the
    lexicographically smallest pair — deterministic across runs). The
    histogram is the full training input; corpus size only affects the
    counts, never this loop's cost."""
    seqs: list[tuple[list[str], int]] = [(list(w), c) for w, c in word_freqs]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in seqs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        # deterministic tie-break: highest count, then lexicographically
        # smallest (a, b)
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        a, b = best
        for syms, _ in seqs:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
    return merges


def learn_bpe_spark(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 64,
    max_vocab_words: int = 65536,
) -> list[tuple[str, str]]:
    """Corpus-scale trainer: ONE word-count aggregation (map-side
    combined, one shuffle) bounds the histogram to the top
    ``max_vocab_words`` words by frequency; the merge loop runs
    driver-side on that bounded table. This is the scale contract of
    every public BPE trainer — the corpus is only ever touched by the
    counting pass."""
    wc = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(max_vocab_words)
        .collect()
    )
    return learn_bpe([(r["word"], r["n"]) for r in wc], num_merges)


# ----------------------------------------------------------- Spark encoding
def encode_words_udf(merges: list[tuple[str, str]] | None = None):
    """Arrow-batched pandas UDF: word → array<int> of BPE token ids.
    Applied to DISTINCT words only (vocabulary-sized Python work); the
    merge table rides the closure (broadcast with the task)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m = list(merges or MERGES)

    def _enc(words):
        ranks = merge_ranks(m)
        res = {a + b: 25 + 1 + i for i, (a, b) in enumerate(m)}
        base = {ch: i for i, ch in enumerate(_ALPHABET)}

        def one(w):
            return [
                base[s] if len(s) == 1 and s in base else res[s]
                for s in encode_word(w, ranks)
            ]

        # memoize within the batch — word streams repeat heavily
        cache: dict[str, list[int]] = {}
        out = []
        for w in words:
            if w not in cache:
                cache[w] = one(w)
            out.append(cache[w])
        return pd.Series(out)

    # `from __future__ import annotations` stringifies inline hints,
    # which pandas_udf's signature inspection rejects — set real ones.
    _enc.__annotations__ = {"words": pd.Series, "return": pd.Series}
    return pandas_udf(_enc, "array<int>")


def bpe_encode_docs(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    carry: list[str] | None = None,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Encode a document corpus: explode words with position, encode the
    DISTINCT words once (Arrow UDF), join back (small side → AQE
    broadcast), and reassemble each doc's token sequence in word order.
    Output: (doc_id, *carry, n_tok, tokens) — the input_hint shape with
    real subword ids instead of hash ids."""
    carry = carry or []
    words = docs.select(
        doc_id_col,
        *carry,
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit("[a-z]+"), 0)
        ).alias("pos", "word"),
    )
    vocab = words.select("word").distinct().withColumn(
        "ids", encode_words_udf(merges)(F.col("word"))
    )
    joined = words.join(vocab, "word")
    arr = F.array_sort(F.collect_list(F.struct("pos", "ids")))
    toks = F.flatten(F.transform(arr, lambda x: x["ids"]))
    return (
        joined.groupBy(doc_id_col, *carry)
        .agg(toks.alias("tokens"))
        .select(
            doc_id_col,
            *carry,
            F.size("tokens").cast("int").alias("n_tok"),
            F.col("tokens"),
        )
    )
