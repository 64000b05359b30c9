"""Text-analysis column helpers for training-data pipelines.

Everything here is a pure JVM column expression (codegen'd, no Python in
the hot path): tokenization, shingling, minhash/simhash signatures,
language-ID and quality heuristics, rolling-hash fingerprints.

Determinism contract: hash primitives are built on ``md5`` (not Spark's
murmur ``hash()``), so the DuckDB oracle can reproduce every value
bit-for-bit — that is what makes the dedup/similarity operators
checkable by the driver's side-by-side gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --------------------------------------------------------------- tokenizing
def words(text: Column | str) -> Column:
    """Whitespace tokenization (non-empty words)."""
    return F.filter(F.split(_c(text), r"\s+"), lambda w: w != "")


def hash_token_id(word: Column, vocab: int = 32768) -> Column:
    """word → stable token id in [0, vocab): first 6 md5 hex digits mod vocab.

    md5-based so DuckDB can reproduce it; the BPE-ish regex tokenizer in
    ``token_count_bpeish`` covers the counting use-case.
    """
    return (F.conv(F.substring(F.md5(word), 1, 6), 16, 10).cast("long") % vocab).cast("int")


def tokenize(text: Column | str, vocab: int = 32768) -> Column:
    """text → array<int> of deterministic hash token ids."""
    return F.transform(words(text), lambda w: hash_token_id(w, vocab))


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpeish(text: Column | str) -> Column:
    """BPE-ish token estimate: split on word/non-word boundaries
    (letters+digits runs, punctuation singles), the usual ~GPT-ish
    pre-tokenizer shape without a merges table."""
    t = _c(text)
    runs = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z0-9]+"), 0))
    punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), 0))
    return runs + punct


# ----------------------------------------------------------------- shingles
def shingles(text: Column | str, k: int = 3) -> Column:
    """Word k-shingles (k consecutive words joined by a space)."""
    w = words(text)
    n = F.size(w)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", w)))


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-grams of the lowercased text."""
    t = F.lower(_c(text))
    ln = F.length(t)
    return F.when(
        ln >= n,
        F.transform(F.sequence(F.lit(1), ln - n + 1), lambda i: F.substring(t, i, n)),
    ).otherwise(F.array(t))


# ------------------------------------------------------------ minhash / lsh
_MH_MOD = 1 << 31


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) universal-hash coefficients, derivable by any
    engine (md5-seeded, embedded as literals in plans AND oracle SQL)."""
    import hashlib as _hl

    out = []
    for s in range(num_hashes):
        h = _hl.md5(f"mh{s}".encode()).hexdigest()
        out.append(((int(h[:8], 16) | 1) % _MH_MOD, int(h[8:16], 16) % _MH_MOD))
    return out


def shingle_hash31(shingle: Column) -> Column:
    """ONE md5 per shingle → 31-bit base hash; per-seed minhash values are
    integer mixes (a·h+b mod 2^31) of this base — the textbook minhash
    optimization (k seeds of integer math instead of k cryptographic
    hashes per shingle). All values < 2^62, exact in any int64 engine."""
    return F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long") % _MH_MOD


def minhash_signature(shingle_arr: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: for seed s, min over shingles of
    ``md5(s || '|' || shingle)`` (hex strings compare lexicographically —
    uniform enough, and exactly reproducible in DuckDB SQL).

    Returns array<string> of length ``num_hashes``.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(shingle_arr, lambda sh: F.md5(F.concat_ws("|", s, sh)))
        ),
    )


def minhash_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Group a signature into LSH bands; each band value is the md5 of its
    rows — two docs sharing any band value are near-dup candidates."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(F.concat_ws("|", F.slice(signature, b * rows_per_band + 1, rows_per_band))).alias(
                "bucket"
            ),
        ),
    )


def simhash64(feature_arr: Column) -> Column:
    """64-bit SimHash over string features, as a bigint.

    Bit j of the hash is the sign of sum(+1/-1 over features), where a
    feature votes +1 on bit j iff bit j of md5(feature) is 1. Computed
    bit-serially from md5 hex nibbles — pure column expressions.
    """
    def bit_of(ft, j):
        nibble = F.conv(F.md5(ft).substr((j / 4).cast("int") + 1, F.lit(1)), 16, 10).cast("int")
        k = (3 - F.pmod(j, F.lit(4))).cast("int")
        return (nibble / F.pow(F.lit(2.0), k)).cast("int") % 2

    # fold sign bits into a long: bit 0 is the sign bit (-(2^63)); powers
    # of two are exact in double up to 2^62 so pow+cast is lossless.
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(63)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            F.aggregate(
                feature_arr,
                F.lit(0),
                lambda a, ft: a + F.when(bit_of(ft, j) == 1, 1).otherwise(-1),
            )
            > 0,
            F.when(j == 0, F.lit(-(2**63)).cast("long")).otherwise(
                F.pow(F.lit(2.0), (63 - j).cast("int")).cast("long")
            ),
        ).otherwise(F.lit(0).cast("long")),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


# ----------------------------------------------------- language / quality
# tiny stopword lists per language — n-gram-free heuristic language ID:
# score = fraction of words in each language's stopword set.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "du", "une", "que"],
}


def lang_scores(text: Column | str) -> Column:
    """map<lang, double>: stopword-hit fraction per candidate language."""
    w = F.transform(words(text), lambda x: F.lower(x))
    n = F.greatest(F.size(w), F.lit(1))
    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            (
                F.size(F.array_intersect(w, F.array(*[F.lit(m) for m in marks])))
                .cast("double")
                / n
            ).alias("score"),
        )
        for lang, marks in _LANG_MARKERS.items()
    ]
    return F.map_from_entries(F.array(*entries))


def lang_id(text: Column | str) -> Column:
    """argmax language (or 'und' when nothing matches)."""
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        F.transform(words(text), lambda x: F.lower(x)),
                        F.array(*[F.lit(m) for m in marks]),
                    )
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, marks in _LANG_MARKERS.items()
        ]
    )
    best = F.array_max(scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(text: Column | str) -> list[Column]:
    """Length / punctuation / stopword / repetition features, aliased.

    The classic C4/Gopher-style cheap quality signals.
    """
    t = _c(text)
    w = words(t)
    n_words = F.size(w)
    n_chars = F.length(t)
    stop = F.array(*[F.lit(m) for m in _LANG_MARKERS["en"]])
    return [
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_chars / F.greatest(n_words, F.lit(1))).alias("mean_word_len"),
        (
            F.length(F.regexp_replace(t, r"[^.!?,;:]", "")) / F.greatest(n_chars, F.lit(1))
        ).alias("punct_ratio"),
        (
            F.size(F.array_intersect(F.transform(w, lambda x: F.lower(x)), stop))
            .cast("double")
            / F.greatest(n_words, F.lit(1))
        ).alias("stopword_ratio"),
        (
            F.size(F.array_distinct(w)).cast("double") / F.greatest(n_words, F.lit(1))
        ).alias("distinct_word_ratio"),
    ]


def quality_score(text: Column | str) -> Column:
    """Scalar quality score in [0,1]: product of clamped feature gates."""
    t = _c(text)
    feats = dict(zip(
        ["n_chars", "n_words", "mean_word_len", "punct_ratio", "stopword_ratio",
         "distinct_word_ratio"],
        quality_features(t),
    ))
    gate_len = F.least(feats["n_words"] / F.lit(20.0), F.lit(1.0))
    gate_wordlen = F.when(
        (feats["mean_word_len"] >= 2) & (feats["mean_word_len"] <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    gate_distinct = feats["distinct_word_ratio"]
    return F.round(gate_len * gate_wordlen * gate_distinct, 6)


# ------------------------------------------------------------- fingerprints
def doc_fingerprint(text: Column | str, window: int = 4) -> Column:
    """Winnowing-style fingerprint: min md5 over each sliding window of
    word shingles — a compact rolling-hash document signature."""
    sh = shingles(text, k=window)
    return F.array_min(F.transform(sh, lambda s: F.md5(s)))


def repetition_stats(text: Column | str, k: int = 2) -> list[Column]:
    """Intra-document repetition: total vs distinct word k-grams.

    The duplicated-k-gram fraction is the usual boilerplate/spam signal
    (MassiveText-style repetition filters); pure array expressions, so
    it runs inside whole-stage codegen with zero shuffles.
    Returns [n_grams, n_distinct] columns.
    """
    g = shingles(text, k=k)
    return [
        F.size(g).alias("n_grams"),
        F.size(F.array_distinct(g)).alias("n_distinct"),
    ]


# ---------------------------------------------------------------- PII scrub
# Patterns restricted to syntax Java regex and RE2 (DuckDB) parse
# identically, so the redaction is oracle-reproducible.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"


def redact_pii(text: Column | str) -> dict[str, Column]:
    """Training-corpus PII scrub: replace email addresses and phone-like
    digit groups with typed placeholders, and count what was removed
    (the per-doc counts are the audit signal corpus reports aggregate).

    Pure regexp column expressions — codegen'd, zero shuffle, linear in
    text bytes; exactly the shape a 100 TB scrub pass needs (the regex
    set extends per policy; each added pattern is one more
    ``regexp_replace`` in the same projection)."""
    t = F.col(text) if isinstance(text, str) else text
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    return {
        "n_emails": F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)),
        # counted on the email-redacted INTERMEDIATE, so a phone-shaped
        # substring inside an email address (already removed as part of
        # <EMAIL>) is not reported as a <PHONE> replacement — the counts
        # are exact replacement counts, not raw-text match counts.
        "n_phones": F.size(F.regexp_extract_all(no_email, F.lit(PHONE_RE), 0)),
        "redacted": red,
    }
