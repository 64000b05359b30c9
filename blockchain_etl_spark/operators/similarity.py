"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

- ``brute_topk`` — exact cosine top-k: broadcast the (small) query set
  against the full corpus; one narrow shuffle for the per-query rank.
  The scale path keeps queries broadcast and corpus partitioned — the
  corpus is never shuffled, ranking is a per-query top-k (a heap-sized
  window, not a global sort).
- ``srp_bucket_histogram`` / ``ann_lsh_topk`` — signed-random-projection
  LSH: deterministic hyperplanes (seeded numpy, embedded as plan
  literals), bucket = sign-bit key. ANN search only scores candidates
  in the query's bucket — the 10^10-row variant prunes >99% of the
  corpus before any distance math.

All arithmetic is cast to double before accumulation so the DuckDB
oracle (float64) matches bit-for-bit at 6-decimal rounding.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blockchain_etl_spark.functions import vectors as V

PLANES_SEED = 1234
N_PLANES = 8
DIM = 64


def srp_planes(n_planes: int = N_PLANES, dim: int = DIM, seed: int = PLANES_SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    # round to 6 dp so the literals in the Spark plan and the oracle SQL
    # are the exact same decimal numbers
    return [[round(float(x), 6) for x in rng.standard_normal(dim)] for _ in range(n_planes)]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def brute_topk(
    spark: SparkSession, sf_dir: str, k: int = 10, n_queries: int = 5
) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    sim = F.round(V.cosine("qv", "cv"), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


def srp_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket sizes — the data layout a bucketed ANN index would
    partition by."""
    e = _emb(spark, sf_dir)
    b = V.random_hyperplane_bits("embedding", srp_planes())
    return e.groupBy(b.alias("bucket")).agg(
        F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec_id")
    )


def ann_lsh_topk(
    spark: SparkSession, sf_dir: str, k: int = 10, n_queries: int = 5
) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's SRP
    bucket (plus exact tie-broken ranking inside the bucket)."""
    e = _emb(spark, sf_dir).withColumn(
        "bucket", V.random_hyperplane_bits("embedding", srp_planes())
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "bucket")
    sim = F.round(V.cosine("qv", "cv"), 6)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


N_BANDS = 2
TARGET_BUCKET_SIZE = 1024


def derived_planes_per_band(n: int, target: int = TARGET_BUCKET_SIZE) -> int:
    """Scale-aware SRP width: enough planes that the expected bucket size
    n / 2^planes stays ≈ ``target`` — ceil(log2(n / target)), floored at
    N_PLANES. 10^10 vectors → 24 planes → 16.7M buckets/band (~600
    vecs/bucket); a FIXED 8-plane band would put ~4·10^7 vecs in each of
    its 256 buckets and go quadratic."""
    import math

    if n <= target:
        return N_PLANES
    return max(N_PLANES, math.ceil(math.log2(n / target)))


def embedding_near_dup(
    spark: SparkSession,
    sf_dir: str,
    n_bands: int = N_BANDS,
    planes_per_band: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate candidates within BANDED SRP
    buckets (the embedding leg of the dedup family).

    Scale shape: each of ``n_bands`` independent ``planes_per_band``-plane
    SRP bands maps a vector to one of 2^planes buckets and recall comes
    from the OR across bands — the standard banded-LSH layout. The
    default width is CORPUS-DERIVED (``derived_planes_per_band``): the
    expected bucket size n/2^planes is held near TARGET_BUCKET_SIZE, so
    the bucket self-join stays ~linear in n at any scale (at the gate
    scales ≤ 2^18 vectors this resolves to the oracle-pinned 8 planes);
    AQE splits residual hot buckets.

    All similarity math is INTEGER-exact: embeddings are fixed-point
    quantized (floor(x·10^6) as long), the cosine ≥ 0.9 test is the
    exact integer predicate dot > 0 ∧ 100·dot² ≥ 81·‖a‖²·‖b‖² evaluated
    in decimal(38,0) — no float accumulation, so the DuckDB (HUGEINT)
    oracle matches bit-for-bit.
    """
    e0 = _emb(spark, sf_dir)
    if planes_per_band is None:
        # parquet-footer count: cheap, no full scan
        planes_per_band = derived_planes_per_band(e0.count())
    planes = srp_planes(planes_per_band * n_bands)
    e = e0.select(
        "vec_id",
        V.int_embedding("embedding").alias("iv"),
        *[
            V.random_hyperplane_bits(
                "embedding", planes[b * planes_per_band : (b + 1) * planes_per_band]
            ).alias(f"_bkt{b}")
            for b in range(n_bands)
        ],
    )
    e = e.withColumn("nrm", V.idot("iv", "iv"))
    banded = e.select(
        "vec_id",
        "iv",
        "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"_bkt{b}").alias("bucket")
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "iv", "nrm", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(
        "band",
        "bucket",
        F.col("vec_id").alias("ia"),
        F.col("iv").alias("va"),
        F.col("nrm").alias("na"),
    )
    b_ = banded.select(
        "band",
        "bucket",
        F.col("vec_id").alias("ib"),
        F.col("iv").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b_, ["band", "bucket"])
        .filter(F.col("ia") < F.col("ib"))
        .select("band", "bucket", V.idot("va", "vb").alias("dot"), "na", "nb")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    near = (F.col("dot") > 0) & (
        dec("dot") * F.col("dot") * 100 >= dec("na") * F.col("nb") * 81
    )
    return pairs.groupBy("band", "bucket").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(near, 1).otherwise(0)).alias("n_near_dups"),
        F.max("dot").alias("max_dot"),
    )


IVF_N_CENTROIDS = 16
IVF_CENTROID_BASE = 200  # corpus rows used as coarse-quantizer seeds
IVF_NPROBE = 4


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    n_centroids: int = IVF_N_CENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the third ANN scale path
    next to brute force and SRP-LSH.

    Index build: a coarse quantizer of ``n_centroids`` data-sampled
    seeds (corpus rows vec_id ∈ [IVF_CENTROID_BASE, +n) — deterministic,
    derivable by the SQL oracle from the same table). Every vector joins
    its argmax-dot centroid's inverted list; queries probe the ``nprobe``
    nearest lists and score ONLY those candidates.

    Cross-engine exactness: assignment dots are fixed-point INTEGER
    (floor(x·10^6)), so list membership is bit-identical in DuckDB; only
    the final candidate cosine is float, rounded to 6 dp like brute_topk.
    Assignment ties break on centroid id via an explicit rank window.

    Scale shape: assignment is a broadcast(n_centroids)×corpus narrow
    map + ONE ``max_by`` aggregation — partial (map-side) combine
    reduces the n×n_centroids scored rows to n BEFORE any shuffle, and
    the tie order (max cdot, then min cid) lives in the max_by ordering
    struct, so it stays exact without a row_number window (which would
    shuffle all n×n_centroids rows). The probe side keeps its window:
    n_queries×n_centroids rows is metadata-sized. The probe join touches
    nprobe/n_centroids of the corpus — with 4096 lists and nprobe 64,
    >98% of the corpus is never scored."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select(
        "vec_id", "embedding", V.int_embedding("embedding").alias("iv")
    )
    cents = F.broadcast(
        e.filter(
            (F.col("vec_id") >= IVF_CENTROID_BASE)
            & (F.col("vec_id") < IVF_CENTROID_BASE + n_centroids)
        ).select(
            (F.col("vec_id") - IVF_CENTROID_BASE).alias("cid"),
            F.col("iv").alias("civ"),
        )
    )
    scored_assign = e.crossJoin(cents).select(
        "vec_id", "embedding", "cid", V.idot("iv", "civ").alias("cdot")
    )
    assign = (
        scored_assign.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("embedding", "cid"),
                F.struct(F.col("cdot"), (-F.col("cid")).alias("nc")),
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.embedding").alias("embedding"),
            F.col("best.cid").alias("cid"),
        )
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("cdot"), F.asc("cid"))
    probes = (
        scored_assign.filter(F.col("vec_id") < n_queries)
        .withColumn("crk", F.row_number().over(wa))
        .filter(F.col("crk") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "cid")
    )
    cand = assign.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"), "cid"
    )
    sim = F.round(V.cosine("qv", "cv"), 6)
    scored = (
        cand.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))  # a candidate may share >1 probed list
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )


KM_K = 8
KM_SEED_BASE = 100  # corpus rows used as deterministic initial centroids


def kmeans_refine(
    spark: SparkSession,
    sf_dir: str,
    k: int = KM_K,
) -> DataFrame:
    """One full Lloyd refinement round of k-means over the embedding
    corpus — the clustering primitive under corpus bucketing / topic
    balancing in training-data pipelines (and the iterative half of the
    IVF index build: assignment + centroid recompute).

    Determinism contract (what makes an iterative float algorithm
    oracle-checkable): vectors are fixed-point quantized (floor(x·10^6)
    as int64), so (1) round-1 assignment dots are EXACT integers,
    (2) centroid accumulation is an INTEGER element-wise sum — immune to
    float summation order across partitions, (3) round-2 scores divide
    that exact integer dot by the exact member count as one IEEE double
    op, identical in any engine. Ties break on centroid id.

    Scale shape: round-1 assignment is broadcast(seeds)×corpus with a
    map-side-combined ``max_by`` (the IVF assignment path); centroid
    recompute is posexplode → (cid, dim) partial-agg sum — 64·n rows
    into k·64, no collect; round 2 re-broadcasts k centroids. Per Lloyd
    iteration: two shuffles, both map-side combined. More rounds loop
    the same two stages."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select(
        "vec_id", V.int_embedding("embedding").alias("iv")
    )
    seeds = F.broadcast(
        e.filter(
            (F.col("vec_id") >= KM_SEED_BASE) & (F.col("vec_id") < KM_SEED_BASE + k)
        ).select((F.col("vec_id") - KM_SEED_BASE).alias("cid"), F.col("iv").alias("siv"))
    )
    # round 1: exact-integer argmax assignment, map-side combined
    a1 = (
        e.crossJoin(seeds)
        .select("vec_id", "iv", "cid", V.idot("iv", "siv").alias("d"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("iv", "cid"), F.struct(F.col("d"), (-F.col("cid")).alias("nc"))
            ).alias("b")
        )
        .select("vec_id", F.col("b.iv").alias("iv"), F.col("b.cid").alias("cid1"))
    )
    # centroid recompute: exact integer element-wise sums + member counts
    sums = (
        a1.select("cid1", F.posexplode("iv").alias("pos", "v"))
        .groupBy("cid1", "pos")
        .agg(F.sum("v").alias("s"))
        .groupBy("cid1")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda x: x["s"]
            ).alias("csum"),
        )
    )
    counts = a1.groupBy("cid1").agg(F.count("*").alias("n"))
    cent = F.broadcast(
        sums.join(counts, "cid1").select(
            F.col("cid1").alias("cid"), "csum", "n"
        )
    )
    # round 2: exact int dot / exact count — one IEEE double division
    d2 = V.idot("iv", "csum").cast("double") / F.col("n")
    w = Window.partitionBy("vec_id").orderBy(F.desc("d2"), F.asc("cid"))
    return (
        a1.crossJoin(cent)
        .select("vec_id", "cid1", "cid", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid1", F.col("cid").alias("cid2"))
    )
