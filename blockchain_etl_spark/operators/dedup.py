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
- n-gram jaccard: blocked on MinHash LSH band buckets (bounded block
  cardinality), exact integer jaccard on the deduped candidate pairs.
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
    count>1, /root/reference/ethereumetl/jobs/checkers/block_checker.py:61-92).

    The sf0.01 documents table has NO exact-duplicate texts (verified),
    which made this gate row trivially empty — so duplicates are PLANTED
    deterministically: every doc_id % 7 == 0 document is re-sampled with
    a shifted id, exactly mirrored in the DuckDB twin."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    planted = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    u = d.unionByName(planted)
    return (
        u.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def minhash_banded(
    docs: DataFrame, num_hashes: int, bands: int, shingle_col: str = "shingles"
) -> DataFrame:
    """(doc_id, shingles) → (doc_id, band, bucket) LSH band keys.

    Plan: explode shingles → ONE md5 per shingle in a codegen'd
    projection → per-seed minhash as integer mixes aggregated with
    map-side-combined min() (one small shuffle of num_hashes longs per
    doc) → band bucket = md5 of the row-group. The per-seed md5s of the
    classic formulation cost num_hashes cryptographic hashes per shingle
    inside HOF lambdas (no CSE there); this is the standard
    single-base-hash minhash."""
    rows = num_hashes // bands
    coeffs = X.minhash_coeffs(num_hashes)
    w = docs.select("doc_id", F.explode(shingle_col).alias("sh")).select(
        "doc_id", X.shingle_hash31(F.col("sh")).alias("h")
    )
    sig = w.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % X._MH_MOD).alias(f"m{s}")
            for s, (a, b) in enumerate(coeffs)
        ]
    )
    bandcols = []
    for bnd in range(bands):
        cols = [F.col(f"m{bnd * rows + r}") for r in range(rows)]
        bandcols.append(
            F.struct(
                F.lit(bnd).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    return sig.select("doc_id", F.explode(F.array(*bandcols)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
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
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % sample_mod == 0)
    # k=1 shingles (word sets): the synthetic corpus shares a small
    # vocabulary, so word-level jaccard is the signal; k is a dial (3-5
    # word shingles for web-scale text).
    banded = minhash_banded(
        d.select("doc_id", X.shingles("text", k=1).alias("shingles")),
        num_hashes,
        bands,
    )
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


def lsh_index_probe(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 8,
    bands: int = 4,
    sample_mod: int = 3,
    batch_mod: int = 10,
) -> DataFrame:
    """Ingest-time near-dup check: an incoming micro-batch probed
    against the EXISTING corpus's LSH band index — the asymmetric
    shape a CDC pipeline runs per epoch (new docs vs everything already
    ingested), as opposed to :func:`minhash_lsh_pairs`' batch
    self-join. Output: (new_doc, dup_doc, n_shared_bands) candidates.

    Scale story: the index side is a persisted (band, bucket, doc_id)
    table maintained incrementally by the entity pipeline (the
    ``band_index`` derivation in streaming/pipeline.py — same band
    function, parent-scoped reconciliation on doc updates), bucketed on
    (band, bucket); the probe side is one micro-batch, so it is
    BROADCAST — the corpus-side table is scanned without a shuffle and
    never all-pairs-joined. Here both sides derive from the documents
    table with a deterministic hash split (batch ≈ 1/batch_mod of the
    sampled corpus) so the DuckDB twin can replay it exactly."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % sample_mod == 0)
    banded = minhash_banded(
        d.select("doc_id", X.shingles("text", k=1).alias("shingles")),
        num_hashes,
        bands,
    )
    # batch = every batch_mod'th sampled doc (doc_id % sample_mod == 0
    # already holds, so this is exactly 1/batch_mod of the sample)
    is_batch = F.col("doc_id") % (sample_mod * batch_mod) == 0
    index = banded.filter(~is_batch).select(
        F.col("doc_id").alias("dup_doc"), "band", "bucket"
    )
    probe = banded.filter(is_batch).select(
        F.col("doc_id").alias("new_doc"), "band", "bucket"
    )
    return (
        index.join(F.broadcast(probe), ["band", "bucket"])
        .groupBy("new_doc", "dup_doc")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def simhash32_df(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) → (doc_id, simhash:long) 32-bit SimHash.

    Plan shape: explode words → ONE md5 per word in a plain codegen'd
    projection (a HOF-lambda formulation recomputes each word's md5 32×
    — no CSE inside lambdas) → 32 literal-shift bit votes summed per doc
    (hash agg with map-side partial combine) → sign-fold. One shuffle on
    doc_id carrying 32 small ints per word."""
    # explode_outer keeps zero-word docs (they get a null hash row → all
    # vote sums null → simhash 0, same as the oracle's empty-fold)
    w = docs.select("doc_id", F.explode_outer(X.words("text")).alias("w")).select(
        "doc_id",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    votes = w.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), 31 - j).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"v{j}")
            for j in range(32)
        ]
    )
    simhash = None
    for j in range(32):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << (31 - j)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = bit if simhash is None else simhash + bit
    return votes.select("doc_id", simhash.alias("simhash"))


def simhash64_df(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) → (doc_id, simhash:long) 64-bit SimHash.

    Same codegen-friendly plan as :func:`simhash32_df` — ONE md5 per word
    in a plain projection (never inside a HOF lambda: no CSE there), then
    64 literal-shift bit votes summed per doc and a sign-fold. The word
    hash is split into two 32-bit halves (hex chars 1-8 / 9-16 of the
    md5) so every intermediate stays in exact int64 range; bit 0 of the
    signature is the long sign bit (weight -(2^63))."""
    w = docs.select("doc_id", F.explode_outer(X.words("text")).alias("w")).select(
        "doc_id",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(F.md5("w"), 9, 8), 16, 10).cast("long").alias("lo"),
    )
    votes = w.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("hi" if j < 32 else "lo"), (31 - j) % 32)
                .bitwiseAND(F.lit(1))
                * 2
                - 1
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    simhash = None
    for j in range(64):
        weight = F.lit(-(2**63)).cast("long") if j == 0 else F.lit(
            1 << (63 - j)
        ).cast("long")
        bit = F.when(F.col(f"v{j}") > 0, weight).otherwise(F.lit(0).cast("long"))
        simhash = bit if simhash is None else simhash + bit
    return votes.select("doc_id", simhash.alias("simhash"))


def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document + exact-signature dup grouping.
    (32-bit so the bit-fold stays in exact integer range for the SQL
    oracle; hamming-radius pairing is ``simhash_near_pairs``.)"""
    sh = simhash32_df(_docs(spark, sf_dir))
    return sh.groupBy("simhash").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id")
    )


def simhash_near_pairs(
    spark: SparkSession,
    sf_dir: str,
    radius: int = 3,
    sample_mod: int = 2,
) -> DataFrame:
    """Hamming-radius SimHash near-dup pairs, pigeonhole-blocked.

    With the 64-bit signature split into 4 disjoint 16-bit blocks, two
    signatures within hamming distance r ≤ 3 must agree EXACTLY on at
    least one block (pigeonhole) — so candidates come from a
    (block, value) bucket join, never all-pairs; the exact popcount
    check then keeps true neighbors. The standard multi-index Hamming
    search layout.

    Scale: each block index has 65,536 possible values and real simhash
    bits are near-uniform, so expected bucket size is ≈ n/65,536 per
    block — bucket cardinality GROWS with the corpus (unlike a fixed
    block count over a fixed-width value space, buckets shrink relative
    to n as more blocks' values spread), and AQE skew-join splits any
    residual hot bucket. At 10^10 docs a bucket holds ~150k docs →
    ~10^10 candidate pairs total across all buckets, linear-ish in n,
    vs the quadratic blow-up an 8-bit block scheme (256 values) hits.
    The 4-block pigeonhole is only complete for radius ≤ 3 — asserted.
    """
    if radius > 3:
        raise ValueError(
            f"radius={radius} > 3: the 4-block pigeonhole guarantee needs "
            "blocks > radius; use radius+1 blocks for larger radii"
        )
    sh = simhash64_df(
        _docs(spark, sf_dir).filter(F.col("doc_id") % sample_mod == 0)
    )
    blocked = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright("simhash", 16 * b)
                        .bitwiseAND(F.lit(65535))
                        .alias("val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", "simhash", F.col("bb.blk").alias("blk"), F.col("bb.val").alias("val")
    )
    a = blocked.select(
        "blk", "val", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa")
    )
    b = blocked.select(
        "blk", "val", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb")
    )
    pairs = (
        a.join(b, ["blk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return pairs.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= radius)


def ngram_jaccard_blocks(
    spark: SparkSession,
    sf_dir: str,
    sample_mod: int = 10,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """n-gram Jaccard near-dup over MinHash-LSH candidate blocks.

    Blocking is the LSH band bucket (shingle → minhash signature → band
    → bucket self-join), NOT a coarse (source, lang) block: bucket
    cardinality is bounded (≈ n / 16^32 per band at hash width, AQE
    splits residual hot buckets), so the pair join never goes quadratic
    in a data-defined block size. Candidates sharing ≥1 band are deduped
    to one pair, then exact word-set jaccard is evaluated on the pair.

    All aggregates are INTEGER-exact: the jaccard ≥ 0.5 test is the
    integer predicate 2·|A∩B| ≥ |A∪B| and the output carries the exact
    intersect/union size sums — no float summation anywhere, so the
    DuckDB oracle matches bit-for-bit.
    """
    d = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % sample_mod == 0)
        .select(
            "doc_id",
            "source",
            "lang",
            F.array_distinct(X.words("text")).alias("wset"),
            X.shingles("text", k=1).alias("shingles"),
        )
    )
    banded = minhash_banded(d, num_hashes, bands)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    da = d.select(
        F.col("doc_id").alias("doc_a"), "source", "lang", F.col("wset").alias("wa")
    )
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("wset").alias("wb"))
    p = (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "source",
            "lang",
            F.size(F.array_intersect("wa", "wb")).alias("inter"),
            F.size(F.array_union("wa", "wb")).alias("uni"),
        )
    )
    return p.groupBy("source", "lang").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(2 * F.col("inter") >= F.col("uni"), 1).otherwise(0)).alias(
            "n_near_dups"
        ),
        F.sum("inter").alias("sum_intersect"),
        F.sum("uni").alias("sum_union"),
    )


def decontaminate(
    docs: DataFrame,
    eval_pred: Column,
    k: int = 3,
    min_hits: int = 2,
    text_col: str = "text",
    grams: Column | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share at
    least ``min_hits`` distinct word ``k``-grams with a held-out eval
    set (the standard n-gram-overlap leakage check run before training).

    ``eval_pred`` selects the eval rows out of ``docs``; everything else
    is corpus. Plan: ONE distinct-shingle explode feeds both sides, the
    (small) eval n-gram set is collapsed with ``distinct`` and hash-
    joined back — at 10^10 corpus docs the eval side is fixed-size (an
    eval suite, not a corpus), so the join broadcasts and the only
    shuffle of corpus data is the per-doc hit count aggregation, which
    map-side combines.

    Output: (doc_id, n_contaminated) for flagged corpus docs only.

    ``grams`` overrides the default word-shingle expression with a
    caller-built array column (e.g. token k-grams over an already-
    tokenized corpus); the caller then owns short-document handling.
    """
    from blockchain_etl_spark.functions import text as X

    shingle_expr = grams if grams is not None else X.shingles(text_col, k=k)
    exploded = docs.select(
        "doc_id",
        eval_pred.alias("is_eval"),
        F.explode(F.array_distinct(shingle_expr)).alias("g"),
    )
    eval_grams = exploded.filter("is_eval").select("g").distinct()
    return (
        exploded.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
        .filter(F.col("n_contaminated") >= min_hits)
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components by hash-min label propagation — the cluster
    step of near-duplicate dedup (candidate pairs → duplicate CLUSTERS →
    keep one canonical doc per cluster; the canonical id IS the
    component label, the min doc id reachable).

    Each iteration: every node takes the min of its own label and its
    neighbors' — one hash join + one map-side-combined min aggregation —
    and converges in O(component diameter) rounds (near-dup components
    are shallow: dozens of docs sharing content, not long chains; the
    large-star/small-star transform halves rounds if diameter ever
    matters). Per-round lineage is truncated with localCheckpoint so the
    plan stays O(1) deep regardless of rounds; the convergence probe is
    a limit(1) count — bounded driver work, not a data collect.

    Deterministic: the min-label fixpoint is unique, independent of
    execution order."""
    e = edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
    e = e.unionByName(
        e.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).distinct()
    if nodes is None:
        nodes = e.select(F.col("x").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    e = e.localCheckpoint(eager=True)  # reused every round — read once
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iters):
        msgs = e.withColumnRenamed("y", "node").join(
            labels.withColumnRenamed("node", "x").withColumnRenamed("label", "nlabel"),
            "x",
        ).select("node", F.col("nlabel").alias("label"))
        new = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # convergence = NO (node, label) pair differs from the previous
        # round. The anti join on BOTH columns also catches nodes first
        # introduced by messages (edge endpoints outside `nodes`), which
        # a node-keyed inner-join comparison would silently ignore —
        # early-exiting before their labels propagate.
        changed = (
            new.join(labels, ["node", "label"], "left_anti").limit(1).count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_iters} rounds "
        f"— a component's diameter exceeds the iteration budget; raise "
        f"max_iters (or pre-contract with large-star/small-star)"
    )
