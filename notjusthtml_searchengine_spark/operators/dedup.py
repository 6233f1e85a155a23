"""Deduplication operators for web-scale corpora.

Exact (hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup — each as composable DataFrame transforms.
Exact/Jaccard/MinHash use the portable md5-derived hash so their
results are DuckDB-oracle-checkable; SimHash uses the same hash with
bit arithmetic in built-ins.

Scale notes: shingle explosion is the dominant cost — it is a
map-side explode (no shuffle) feeding one groupBy; LSH banding turns
the O(n²) pair space into per-bucket self-joins whose size AQE can
handle (skewed buckets split by adaptive skew-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import portable_hash48, portable_hash64, tokens

MERSENNE_P = (1 << 61) - 1


def normalized(col):
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One representative (min id) per distinct normalized text."""
    return (
        df.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (map-side explode)."""
    toks = tokens(F.lower(F.col(text_col)))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    grams = F.when(F.size(toks) >= n, grams).otherwise(F.array())
    return (
        df.select(F.col(id_col), F.explode(grams).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    shingles_a: DataFrame,
    id_col: str,
    max_id_gap: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Pairwise Jaccard over shared shingles.

    Joins docs on shared shingles (only pairs with ≥1 common shingle
    materialize), counts the intersection, and derives the union from
    per-doc shingle counts: |A∪B| = |A|+|B|-|A∩B|.

    ``max_df`` (document-frequency cutoff) is the corpus-scale guard:
    a single stop-phrase shingle shared by 10⁶ docs would generate
    10¹² join rows; dropping shingles that appear in more than
    ``max_df`` documents bounds per-shingle join fan-out at max_df²
    while near-duplicate pairs keep plenty of rare shingles. Jaccard
    is then computed consistently over the *filtered* shingle space
    (both intersections and per-doc counts).
    """
    if max_df is not None:
        dfreq = shingles_a.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        shingles_a = (
            shingles_a.join(dfreq.filter(F.col("_df") <= max_df), "shingle")
            .drop("_df")
        )
    counts = shingles_a.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles_a.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingles_a.select(F.col(id_col).alias("id_b"), "shingle")
    cond = F.col("id_a") < F.col("id_b")
    if max_id_gap is not None:
        cond = cond & (F.col("id_b") - F.col("id_a") <= max_id_gap)
    inter = (
        a.join(b, "shingle")
        .filter(cond)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(counts.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(counts.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 16, n: int = 3
) -> DataFrame:
    """k-permutation MinHash signatures over word n-gram shingles.

    h_i(s) = (a_i * H(s) + b_i) mod (2^61-1) with deterministic odd
    a_i / b_i and the portable 48-bit md5-based H (so a_i * H stays
    within int64 under ANSI arithmetic) — reproducible anywhere.
    Output: (id, sig: array<bigint>[k]).
    """
    sh = word_shingles(df, id_col, text_col, n).withColumn(
        "h", portable_hash48(F.col("shingle"))
    )
    aggs = [
        F.min(
            (F.lit(2 * i + 1) * F.col("h") + F.lit(i * i + 1)) % F.lit(MERSENNE_P)
        ).alias(f"mh{i}")
        for i in range(k)
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(
        F.col(id_col), F.array(*[F.col(f"mh{i}") for i in range(k)]).alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str, bands: int = 4) -> DataFrame:
    """Band the signatures and self-join per (band, band-hash) bucket.

    rows_per_band = k/bands; docs sharing any band land in the same
    bucket → candidate pair. Returns distinct (id_a < id_b) pairs.
    """
    k = bands  # bands count; rows derived from sig length at runtime
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ",",
                        F.slice(
                            F.col("sig"),
                            b * (F.size("sig") / bands).cast("int") + 1,
                            (F.size("sig") / bands).cast("int"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens using the portable hash.

    Classic Charikar scheme: per token take 60 hash bits, sum ±1 per
    bit position weighted by term frequency, sign → fingerprint bit.
    Pure built-ins: explode → groupBy(token) → per-bit aggregate.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    hashed = toks.withColumn("h", portable_hash64(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(60)
    ]
    agg = hashed.groupBy(id_col).agg(*bit_sums)
    fp = None
    for i in range(60):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = bit * F.lit(1 << i).cast("bigint")
        fp = term if fp is None else fp + term
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    sim: DataFrame, id_col: str, max_hamming: int = 8, bits: int = 60
) -> DataFrame:
    """Near-dup pairs by Hamming distance on SimHash fingerprints.

    Pigeonhole banding (the Manku/Jain/Sarma WWW'07 construction): the
    ``bits``-bit fingerprint is split into ``max_hamming + 1``
    contiguous chunks; a pair within Hamming distance ``max_hamming``
    differs in at most that many bit positions, so at least one chunk
    matches EXACTLY. Candidates come from an equi-join on
    (chunk_idx, chunk_value) — no crossJoin — and are verified with an
    exact ``bit_count(xor)``. Tighter thresholds give wider chunks →
    exponentially smaller buckets; use small ``max_hamming`` at corpus
    scale (the classic setting is 3-4 over 64 bits).
    """
    n_chunks = max_hamming + 1
    base, rem = divmod(bits, n_chunks)
    widths = [base + (1 if i < rem else 0) for i in range(n_chunks)]
    starts = [sum(widths[:i]) for i in range(n_chunks)]
    chunks = F.array(
        *[
            (
                F.shiftright(F.col("simhash"), s).bitwiseAND(F.lit((1 << w) - 1))
            ).cast("bigint")
            for s, w in zip(starts, widths)
        ]
    )
    banded = sim.select(
        F.col(id_col), F.col("simhash"), F.posexplode(chunks).alias("chunk", "cval")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "cval"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "cval"
    )
    return (
        a.join(b, ["chunk", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    n_iter: int = 8,
) -> DataFrame:
    """Corpus-level near-duplicate CLUSTERING — the standard training-
    data dedup pass (the Dolma / FineWeb / RefinedWeb shape), composed
    from this module's primitives plus graph.connected_components:

      MinHash-LSH candidate pairs  (banded self-join — never all-pairs)
        → exact Jaccard verify     (per-doc shingle sets joined onto
                                    the candidate pairs only; two
                                    id-keyed joins, the shingle-level
                                    join fan-out of jaccard_pairs is
                                    avoided entirely)
        → connected components     (min-label k-hop; the O(log n)
                                    small/large-star form is noted in
                                    graph.py for extreme diameters)
        → every doc labeled (cluster_id = component min id);
          is_canonical marks the one doc per cluster a dedup pass
          KEEPS (deterministic: the smallest id).

    Docs with no verified near-dup are their own singleton cluster.
    Output: (id, cluster_id, is_canonical), one row per input doc.
    """
    sigs = minhash_signatures(docs, id_col, text_col, k=k, n=n)
    cand = lsh_candidate_pairs(sigs, id_col, bands=bands)
    sets_ = word_shingles(docs, id_col, text_col, n).groupBy(id_col).agg(
        F.sort_array(F.collect_set("shingle")).alias("_sh")
    )
    verified = (
        cand.join(
            sets_.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sa")),
            "id_a",
        )
        .join(
            sets_.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sb")),
            "id_b",
        )
        .withColumn(
            "_j",
            F.size(F.array_intersect("_sa", "_sb")).cast("double")
            / F.greatest(F.size(F.array_union("_sa", "_sb")), F.lit(1)).cast(
                "double"
            ),
        )
        .filter(F.col("_j") >= threshold)
    )
    from .graph import connected_components

    edges = verified.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comp = connected_components(edges, n_iter=n_iter)
    out = docs.select(id_col).join(
        comp.withColumnRenamed("vertex", id_col), id_col, "left"
    )
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
    ).withColumn("is_canonical", F.col("cluster_id") == F.col(id_col))


def substring_dup_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact-substring duplicate flagging (the document-granularity
    form of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better": a k-token span that already appears in an
    earlier document marks the later one as a duplicate carrier).

    Each k-token shingle is owned by the smallest doc id containing
    it; a doc is ``is_dup`` when any of its shingles is owned by an
    earlier doc, and ``dup_of`` names the smallest such owner (the
    deterministic canonical source). Unlike the Jaccard/MinHash ops
    this catches verbatim COPIED SPANS between otherwise-different
    documents — the boilerplate/quotation failure mode n-gram overlap
    scores dilute away.

    Shape at scale: one map-side shingle explode, one groupBy on the
    shingle (owner = min id, df = count), one co-partitioned re-join
    of the same shingle rows onto the owners (both sides hash-
    partitioned by shingle from the groupBy), one groupBy doc. No
    pairwise join anywhere — cost is O(total tokens), not O(docs²).
    ``max_df`` drops shingles present in more than that many docs
    (site chrome / boilerplate that would otherwise chain unrelated
    docs; same guard as jaccard_pairs).
    """
    sh = word_shingles(docs, id_col, text_col, n=k)
    owners = sh.groupBy("shingle").agg(
        F.min(id_col).alias("_owner"), F.count(F.lit(1)).alias("_df")
    )
    if max_df is not None:
        owners = owners.filter(F.col("_df") <= max_df)
    joined = sh.join(owners, "shingle")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("_owner") < F.col(id_col)).cast("bigint")).alias(
                "n_shared"
            ),
            F.min(
                F.when(F.col("_owner") < F.col(id_col), F.col("_owner"))
            ).alias("dup_of"),
        )
        .withColumn("is_dup", (F.col("n_shared") > 0).cast("int"))
    )
