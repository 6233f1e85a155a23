"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a random-
hyperplane LSH-bucketed variant as the scale path. Dot products are
computed over *quantized* integer vectors (round(x*1000)) so results
are bit-identical across engines (integer sums in double are exact
below 2^53) — this makes even the similarity queries oracle-checkable
against DuckDB.

Scale notes: brute force is one broadcast of the (small) query set
against a full scan — embarrassingly parallel, no shuffle except the
final per-query top-k (TakeOrdered-style window). The LSH variant
buckets candidates by hyperplane sign pattern so each query probes
only its bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textops import portable_hash64

QUANT = 1000


def quantized(col: Column) -> Column:
    """array<float> → array<bigint> via round(x*QUANT)."""
    return F.transform(col, lambda x: F.round(x * QUANT).cast("bigint"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors (double; deterministic given
    identical integer dot/norms on both engines)."""
    return F.round(
        dot_q(a, b) / F.sqrt(norm_sq_q(a).cast("double") * norm_sq_q(b).cast("double")),
        4,
    )


def brute_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries: (qid, qvec). Broadcast the query side; rank per query by
    (cosine desc, id asc) — fully deterministic.
    """
    e = embeddings.select(
        F.col(id_col), quantized(F.col(vec_col)).alias("vq")
    )
    q = queries.select(F.col("qid"), quantized(F.col("qvec")).alias("qq"))
    scored = e.join(F.broadcast(q), F.col(id_col) != F.col("qid")).withColumn(
        "cosine", cosine_q(F.col("vq"), F.col("qq"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", F.col(id_col).alias("neighbor_id"), "cosine", "rk")
    )


def hyperplane_signs(vec_q: Column, n_planes: int, dim: int) -> Column:
    """LSH bucket id: sign pattern of n_planes deterministic pseudo-
    random hyperplanes. Plane p component j = portable_hash64(p:j)
    mapped to ±1 — reproducible anywhere, no RNG state."""
    def plane_dot(p):
        # ±1 components via hash parity
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.when(
                portable_hash64(F.concat_ws(":", F.lit(p).cast("string"), j.cast("string")))
                % 2
                == 0,
                F.lit(1).cast("bigint"),
            ).otherwise(F.lit(-1).cast("bigint")),
        )
        return F.aggregate(
            F.zip_with(vec_q, comps, lambda x, c: x * c),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )

    bucket = None
    for p in range(n_planes):
        bit = F.when(plane_dot(p) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        term = bit * F.lit(1 << p).cast("bigint")
        bucket = term if bucket is None else bucket + term
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's
    hyperplane-sign bucket, then exact cosine rank within it.

    ``n_probes`` > 1 enables MULTI-PROBE LSH: each query additionally
    probes the buckets at Hamming distance 1 from its own (one sign
    bit flipped), in fixed plane order 0..n_planes-1 — deterministic,
    so the widened search stays oracle-checkable. Single-probe recall
    at small bucket counts is low by construction (a 4-plane index has
    16 buckets; the top-k rarely all share one); n_probes=p scans
    ~p/2^n_planes of the corpus per query and recall rises
    accordingly — the standard recall/cost dial (Lv et al., VLDB'07).

    ``dim`` must be passed explicitly: inferring it would require a
    driver-side action during operator *construction* (a hidden job
    and a scheduling barrier inside plan building)."""
    if dim is None:
        raise ValueError("lsh_topk requires an explicit embedding dim")
    if not 1 <= n_probes <= n_planes + 1:
        raise ValueError("n_probes must be in [1, n_planes+1]")
    e = embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("vq"))
    e = e.withColumn("bucket", hyperplane_signs(F.col("vq"), n_planes, dim))
    q = queries.select("qid", quantized(F.col("qvec")).alias("qq"))
    q = q.withColumn("bucket", hyperplane_signs(F.col("qq"), n_planes, dim))
    if n_probes > 1:
        probe_list = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("bigint"))
                for p in range(n_planes)
            ],
        )
        q = q.select(
            "qid",
            "qq",
            F.explode(F.slice(probe_list, 1, n_probes)).alias("bucket"),
        )
    scored = e.join(F.broadcast(q), "bucket").filter(
        F.col(id_col) != F.col("qid")
    ).withColumn("cosine", cosine_q(F.col("vq"), F.col("qq")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", F.col(id_col).alias("neighbor_id"), "cosine", "rk")
    )


def lsh_probe_stats(
    embeddings: DataFrame,
    queries: DataFrame,
    n_planes: int,
    dim: int,
    probe_counts: tuple[int, ...] = (1, 3, 5),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe-COST accounting for the multi-probe dial: per
    (n_probes, qid), how many candidate vectors the widened search
    actually scans (the occupancy of the probed buckets, self
    excluded). Read next to recall@k this is the full recall/cost
    trade: n_probes=p scans ~p/2^n_planes of the corpus. Queries whose
    probed buckets are empty produce no row (both engines agree)."""
    e = embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("vq"))
    e = e.withColumn("bucket", hyperplane_signs(F.col("vq"), n_planes, dim))
    q0 = queries.select("qid", quantized(F.col("qvec")).alias("qq"))
    q0 = q0.withColumn("bucket", hyperplane_signs(F.col("qq"), n_planes, dim))
    probe_list = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("bigint"))
            for p in range(n_planes)
        ],
    )
    probes = None
    for np_ in probe_counts:
        if not 1 <= np_ <= n_planes + 1:
            raise ValueError("probe counts must be in [1, n_planes+1]")
        pq = q0.select(
            F.lit(np_).alias("n_probes"),
            "qid",
            F.explode(F.slice(probe_list, 1, np_)).alias("bucket"),
        )
        probes = pq if probes is None else probes.unionByName(pq)
    return (
        e.join(F.broadcast(probes), "bucket")
        .filter(F.col(id_col) != F.col("qid"))
        .groupBy("n_probes", "qid")
        .agg(F.count(F.lit(1)).alias("candidates"))
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over quantized vectors → (cid, cv) centroids —
    with EXACT integer arithmetic end-to-end, so even the TRAINING is
    DuckDB-oracle-checkable (no float-summation-order divergence):

    the centroid is kept as the UNNORMALIZED element-wise member SUM
    (a rational centroid — cosine is scale-invariant, so ranking
    against sum(members) equals ranking against mean(members), and
    every dot/norm stays an exact bigint sum). Init = the k lowest-id
    vectors (deterministic, no RNG); assignment ties break to the
    lowest cid; a cluster that loses all members keeps its previous
    centroid. Returns cv as array<bigint> usable directly by
    ivf_topk(cents=...).

    Scale notes: assignment is a broadcast join (k rows) over the full
    scan — the same shape as ivf_topk's assignment; the update is a
    posexplode + two-level groupBy (dim × N rows through one shuffle).
    At 10^9 vectors swap the update for an applyInPandas partial-sum
    (numpy column sums per partition, then a k×dim reduce) and the
    init for k-means|| oversampling — the shapes downstream are
    unchanged. Lazy (no driver actions in construction); n_iter is
    small and the plan grows linearly (each iteration references the
    previous centroids once)."""
    e = embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("vq"))
    cents = e.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("bigint").alias("cid"), F.col("vq").alias("cv")
    )
    for _ in range(n_iter):
        w = Window.partitionBy(id_col).orderBy(F.desc("c_cos"), F.asc("cid"))
        assigned = (
            e.join(F.broadcast(cents))
            .withColumn("c_cos", cosine_q(F.col("vq"), F.col("cv")))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("cid", "vq")
        )
        sums = (
            assigned.select("cid", F.posexplode("vq").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda x: x["s"],
                ).alias("new_cv")
            )
        )
        cents = cents.join(sums, "cid", "left").select(
            "cid", F.coalesce(F.col("new_cv"), F.col("cv")).alias("cv")
        )
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: coarse-quantize every vector to its
    nearest centroid (the inverted-file bucket), then each query
    probes only its ``nprobe`` nearest centroid buckets and ranks by
    exact quantized cosine within them.

    "Training" is deterministic: the centroids are the vectors of the
    ``n_centroids`` lowest-id rows — no RNG, no k-means iterations, so
    the whole operator (index build + search) is bit-reproducible and
    DuckDB-oracle-checkable. Production swaps the pivot rule for
    k-means|| centroids; every downstream shape (assignment join on a
    broadcast centroid table, bucket-restricted probe, per-query
    top-k) is unchanged.

    Scale shape: assignment is one broadcast join (C rows) over the
    full scan; the probe joins the (small) query×nprobe list against
    the index on centroid_id — bucket-partitioned, no all-pairs.

    ``cents`` overrides the pivot centroids with a trained table
    (cid, cv) — e.g. ``kmeans_centroids`` (exact-integer Lloyd
    iterations, still oracle-checkable)."""
    e = embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("vq"))
    if cents is None:
        cents = e.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).cast("bigint").alias("cid"), F.col("vq").alias("cv")
        )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.desc("c_cos"), F.asc("cid")
    )
    index = (
        e.join(F.broadcast(cents))
        .withColumn("c_cos", cosine_q(F.col("vq"), F.col("cv")))
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select(id_col, "vq", "cid")
    )
    q = queries.select("qid", quantized(F.col("qvec")).alias("qq"))
    w_probe = Window.partitionBy("qid").orderBy(F.desc("c_cos"), F.asc("cid"))
    probes = (
        q.join(F.broadcast(cents))
        .withColumn("c_cos", cosine_q(F.col("qq"), F.col("cv")))
        .withColumn("rk", F.row_number().over(w_probe))
        .filter(F.col("rk") <= nprobe)
        .select("qid", "qq", "cid")
    )
    scored = index.join(F.broadcast(probes), "cid").filter(
        F.col(id_col) != F.col("qid")
    ).withColumn("cosine", cosine_q(F.col("vq"), F.col("qq")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", F.col(id_col).alias("neighbor_id"), "cosine", "rk")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, LSH-bucketed
    (pairs in different buckets are missed — documented approximation;
    raise n_planes for precision, lower for recall). ``dim`` must be
    passed explicitly (no driver action in operator construction)."""
    if dim is None:
        raise ValueError("embedding_neardup_pairs requires an explicit dim")
    e = embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("vq"))
    e = e.withColumn("bucket", hyperplane_signs(F.col("vq"), n_planes, dim))
    a = e.select(F.col(id_col).alias("id_a"), F.col("vq").alias("va"), "bucket")
    b = e.select(F.col(id_col).alias("id_b"), F.col("vq").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_q(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup_flags(
    embeddings: DataFrame,
    k_clusters: int = 8,
    threshold: float = 0.97,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    block_target: int = 8192,
) -> DataFrame:
    """Semantic deduplication (Abbas et al. 2023, "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication"):
    cluster the embedding space with k-means, then within each cluster
    flag every document whose cosine similarity to an EARLIER cluster
    member reaches ``threshold`` — the lowest-id member of each
    semantic group survives as canonical. Catches paraphrases and
    template re-writes that exact/MinHash/SimHash dedup (string-space)
    cannot see.

    Returns (id, cluster_id, max_cos, is_dup, dup_of): ``max_cos`` is
    the similarity to the closest earlier member (NULL for the
    cluster's first/loner rows), ``dup_of`` the smallest earlier id
    over the threshold.

    Determinism / oracle: centroids default to ``kmeans_centroids``
    (exact-integer Lloyd — rational sum-vector centroids), assignment
    ties break to the lowest cid, and cosines are the quantized
    4-decimal form — the whole pass (training included) re-derives
    bit-identically in DuckDB.

    Scale shape: assignment is one broadcast join (k rows) over the
    full scan; the pairwise stage self-joins ON cluster_id — hash-
    partitioned by cluster, never a global crossJoin — at the paper's
    operating point (k scaled so clusters average ~1k members, e.g.
    k=100k for 10^8 docs) Σ|c|² stays ~1k× corpus size. A runaway
    cluster (embedding-space hub) is bounded by EXACT block-pair
    decomposition (r6): members of a cluster larger than
    ``block_target`` are split into B = ⌈|c|/block_target⌉
    deterministic hash blocks; the comparison side is replicated to
    every block, so the join key (cid, block) fans the hot cluster
    over B reducers while producing exactly the same (i, j) pairs —
    each pair materializes once, in row i's block (same construction
    as the two-phase stratified_cap / salted joins, guide §2.5; result
    equality pinned by tests/test_similarity.py)."""
    if cents is None:
        cents = kmeans_centroids(
            embeddings, k=k_clusters, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
    e = embeddings.select(F.col(id_col), quantized(F.col(vec_col)).alias("vq"))
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("c_cos"), F.asc("cid"))
    assigned = (
        e.join(F.broadcast(cents))
        .withColumn("c_cos", cosine_q(F.col("vq"), F.col("cv")))
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select(F.col(id_col), "vq", "cid")
    )
    sizes = assigned.groupBy("cid").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(block_target)).cast("int").alias("_nb")
    )
    sized = assigned.join(F.broadcast(sizes), "cid")
    left = sized.select(
        "cid",
        F.col(id_col).alias("_i"),
        F.col("vq").alias("_vi"),
        F.pmod(F.xxhash64(F.col(id_col)), F.col("_nb")).cast("int").alias("_blk"),
    )
    right = sized.select(
        "cid",
        F.col(id_col).alias("_j"),
        F.col("vq").alias("_vj"),
        F.explode(F.sequence(F.lit(0), F.col("_nb") - 1)).alias("_blk"),
    )
    agg = (
        left.join(right, ["cid", "_blk"])
        .filter(F.col("_j") < F.col("_i"))
        .withColumn("_cos", cosine_q(F.col("_vi"), F.col("_vj")))
        .groupBy("cid", "_i")
        .agg(
            F.max("_cos").alias("max_cos"),
            F.min(
                F.when(F.col("_cos") >= F.lit(threshold), F.col("_j"))
            ).alias("dup_of"),
        )
        .withColumnRenamed("_i", id_col)
    )
    return (
        assigned.drop("vq")
        .join(agg, ["cid", id_col], "left")
        .select(
            F.col(id_col),
            F.col("cid").cast("bigint").alias("cluster_id"),
            F.col("max_cos"),
            F.when(F.col("dup_of").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_dup"),
            F.col("dup_of"),
        )
    )
