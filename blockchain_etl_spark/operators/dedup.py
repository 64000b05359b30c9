"""Deduplication family over the ``documents`` table — the operations a
large-scale training-data pipeline runs before anything else.

All hash primitives are md5-based (see functions/text.py) so every
operator here has an exact DuckDB oracle twin. Scale notes per operator:

- exact: one shuffle on content hash; map-side combine absorbs dup skew.
- minhash LSH: shingle/signature/banding are per-row (no shuffle);
  the only shuffle is the band-bucket self-join — the standard
  shingle→minhash→band→bucket-join plan, where bucket is the join key
  and AQE splits hot buckets.
- simhash: per-row signature; exact-bucket grouping is one shuffle.
- n-gram jaccard: blocked (source, lang) + deterministic subsample —
  the block key bounds the pair blow-up; at scale the block would be
  an LSH bucket instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_etl_spark.functions import text as X


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keep min doc_id per md5(text); report
    groups with duplicates (≙ the dedup checker GROUP BY ... HAVING
    count>1, /root/reference/ethereumetl/jobs/checkers/block_checker.py:61-92)."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 8,
    bands: int = 4,
    sample_mod: int = 5,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → signature → band →
    bucket self-join. Output: candidate pairs (a < b) with the number of
    shared band buckets. ``sample_mod`` deterministically subsamples doc
    ids to bound the oracle's pair count at test scale."""
    rows = num_hashes // bands
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % sample_mod == 0)
    # k=1 shingles (word sets): the synthetic corpus shares a small
    # vocabulary, so word-level jaccard is the signal; k is a dial (3-5
    # word shingles for web-scale text).
    sig = d.select(
        "doc_id",
        X.minhash_signature(X.shingles("text", k=1), num_hashes=num_hashes).alias("sig"),
    )
    banded = sig.select(
        "doc_id", F.explode(X.minhash_bands(F.col("sig"), bands, rows)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document + exact-signature dup grouping.
    (32-bit so the bit-fold stays in exact integer range for the SQL
    oracle; hamming-radius pairing is in ``simhash_near_pairs``.)"""
    d = _docs(spark, sf_dir)
    sh = d.select("doc_id", simhash32(X.words("text")).alias("simhash"))
    return sh.groupBy("simhash").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id")
    )


def simhash32(feature_arr) -> F.Column:
    """32-bit SimHash over string features: bit j = sign of the vote sum,
    votes from bit j of md5(feature). Pure column expressions."""
    def bit_of(ft, j):
        # bit (3 - j%4) of hex nibble j/4 of md5(ft); shiftleft/right only
        # take literal shift amounts, so use exact 2^k arithmetic instead
        nibble = F.conv(F.md5(ft).substr((j / 4).cast("int") + 1, F.lit(1)), 16, 10).cast("int")
        k = (3 - F.pmod(j, F.lit(4))).cast("int")
        return (nibble / F.pow(F.lit(2.0), k)).cast("int") % 2

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            F.aggregate(
                feature_arr,
                F.lit(0),
                lambda a, ft: a + F.when(bit_of(ft, j) == 1, 1).otherwise(-1),
            )
            > 0,
            F.pow(F.lit(2.0), (31 - j).cast("int")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def ngram_jaccard_blocks(
    spark: SparkSession, sf_dir: str, sample_mod: int = 10, threshold: float = 0.5
) -> DataFrame:
    """Blocked n-gram Jaccard near-dup: within (source, lang) blocks,
    word-set jaccard over deterministically-subsampled docs; compact
    per-block aggregate output (pair count + mean jaccard)."""
    d = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % sample_mod == 0)
        .select(
            "doc_id",
            "source",
            "lang",
            F.array_distinct(X.words("text")).alias("wset"),
        )
    )
    a = d.alias("a")
    b = d.alias("b")
    jac = F.size(F.array_intersect(F.col("a.wset"), F.col("b.wset"))).cast("double") / F.size(
        F.array_union(F.col("a.wset"), F.col("b.wset"))
    )
    pairs = (
        a.join(b, ["source", "lang"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("source", "lang", jac.alias("jaccard"))
    )
    return pairs.groupBy("source", "lang").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(F.col("jaccard") >= threshold, 1).otherwise(0)).alias("n_near_dups"),
        F.round(F.avg("jaccard"), 6).alias("mean_jaccard"),
    )
