"""Dedup operator family: exact, Jaccard, MinHash+LSH, SimHash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash64,
    simhash_near_pairs,
    word_shingles,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (3, "completely different words entirely here now ok"),
    (4, "spark engines shuffle partitions across the cluster"),
    (5, "spark engines shuffle partitions across a cluster"),  # near-dup of 4
    (6, "one more unrelated document with its own tokens"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, "doc_id", "text").collect()
    by_hash = {r["content_hash"]: r for r in out}
    assert len(out) == 6  # 7 docs, one exact dup
    dup = [r for r in out if r["n_dups"] == 2]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0


def test_exact_dedup_normalizes_whitespace_case(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "other")],
        "doc_id bigint, text string",
    )
    out = exact_dedup(df, "doc_id", "text").collect()
    assert len(out) == 2


def test_jaccard_pairs(spark, docs):
    sh = word_shingles(docs, "doc_id", "text", n=2)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(sh, "doc_id").collect()}
    assert pairs[(0, 2)] == 1.0  # exact dup
    assert pairs[(0, 1)] > 0.6  # near dup
    assert (0, 3) not in pairs  # no shared bigrams


def test_minhash_estimates_jaccard(spark, docs):
    """MinHash signature agreement approximates true Jaccard."""
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, "doc_id", "text", k=16, n=2).collect()}
    agree_01 = sum(a == b for a, b in zip(sigs[0], sigs[1])) / 16
    agree_03 = sum(a == b for a, b in zip(sigs[0], sigs[3])) / 16
    assert sigs[0] == sigs[2]  # identical docs → identical signatures
    assert agree_01 > agree_03  # near-dup agrees more than unrelated


def test_lsh_candidates_cover_high_jaccard_pairs(spark, docs):
    sigs = minhash_signatures(docs, "doc_id", "text", k=16, n=2)
    cands = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, "doc_id", bands=8).collect()}
    # pairs with very high true jaccard must be candidates
    assert (0, 2) in cands
    assert (0, 1) in cands


def test_jaccard_max_df_drops_hot_shingles(spark):
    """Adversarial corpus: one stop-phrase shingle in EVERY doc. The
    max_df cutoff must keep the self-join off the hot shingle (pair
    fan-out stays bounded) while true near-dups still pair up."""
    n = 300
    rows = [(i, f"common phrase everywhere unique{i} token{i} extra{i}") for i in range(n)]
    rows.append((n, "common phrase everywhere unique0 token0 extra0"))  # dup of 0
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = word_shingles(df, "doc_id", "text", n=2)
    pairs = jaccard_pairs(sh, "doc_id", max_df=10)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    # the hot shingles ('common phrase', 'phrase everywhere') are in
    # all 301 docs -> dropped; only the planted dup shares rare ones
    assert (0, n) in got and got[(0, n)] == 1.0
    assert len(got) == 1  # no all-pairs explosion through hot shingles


def test_jaccard_max_df_filters_consistently(spark, docs):
    """With a cutoff below every DF, output is empty; with a cutoff
    above every DF, output equals the uncut operator."""
    sh = word_shingles(docs, "doc_id", "text", n=2)
    uncut = {(r["id_a"], r["id_b"], r["jaccard"]) for r in jaccard_pairs(sh, "doc_id").collect()}
    loose = {(r["id_a"], r["id_b"], r["jaccard"]) for r in jaccard_pairs(sh, "doc_id", max_df=1000).collect()}
    assert loose == uncut


def test_simhash_banding_equivalent_to_brute(spark):
    """The pigeonhole-banded near-pair join must return EXACTLY the
    brute-force pair set (banding is candidate generation only; the
    exact Hamming verify keeps semantics identical)."""
    import random

    rng = random.Random(3)
    words = [f"w{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choices(words, k=12)))
        for i in range(60)
    ]
    # planted near-dups
    rows.append((100, rows[0][1] + " tail"))
    rows.append((101, rows[0][1]))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sim = simhash64(df, "doc_id", "text")
    fps = {r["doc_id"]: r["simhash"] for r in sim.collect()}

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    for d in (4, 10):
        brute = {
            (a, b, ham(fps[a], fps[b]))
            for a in fps
            for b in fps
            if a < b and ham(fps[a], fps[b]) <= d
        }
        banded = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_near_pairs(sim, "doc_id", max_hamming=d).collect()
        }
        assert banded == brute


def test_simhash_near_pairs_plan_has_no_cross_join(spark, docs):
    sim = simhash64(docs, "doc_id", "text")
    plan = simhash_near_pairs(sim, "doc_id", max_hamming=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_hamming_ordering(spark, docs):
    sim = simhash64(docs, "doc_id", "text")
    rows = {r["doc_id"]: r["simhash"] for r in sim.collect()}

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert ham(rows[0], rows[2]) == 0  # identical docs
    assert ham(rows[0], rows[1]) < ham(rows[0], rows[3])  # near < far
    near = simhash_near_pairs(sim, "doc_id", max_hamming=10).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in near}
    assert (0, 2) in pairs


def test_dedup_clusters_groups_and_canonicals(spark, docs):
    from notjusthtml_searchengine_spark.operators.dedup import dedup_clusters

    out = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters(
            docs, "doc_id", "text", threshold=0.5, n=2
        ).collect()
    }
    assert len(out) == 7  # one row per input doc, always
    # 0/1/2 cluster together (exact dup + near-dup), canonical = 0
    assert out[0] == (0, True)
    assert out[1] == (0, False)
    assert out[2] == (0, False)
    # 4/5 cluster, canonical = 4
    assert out[4] == (4, True)
    assert out[5] == (4, False)
    # singletons are their own canonical cluster
    assert out[3] == (3, True)
    assert out[6] == (6, True)


def test_dedup_clusters_threshold_1_keeps_only_exact(spark, docs):
    from notjusthtml_searchengine_spark.operators.dedup import dedup_clusters

    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(
            docs, "doc_id", "text", threshold=1.0, n=2
        ).collect()
    }
    assert out[2] == 0 and out[0] == 0  # exact dup still clusters
    assert out[1] == 1 and out[5] == 5  # near-dups split out


def test_substring_dup_flags_known_structure(spark):
    from notjusthtml_searchengine_spark.operators.dedup import (
        substring_dup_flags,
    )

    span = "alpha beta gamma delta epsilon"  # 5 tokens, k=4 below
    rows = [
        (1, "one two three " + span),            # owner of the span
        (2, span + " four five six"),            # copies the span -> dup of 1
        (3, "totally different words entirely here now"),  # clean
        (4, "prefix " + span + " suffix"),       # also dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r
        for r in substring_dup_flags(df, k=4).collect()
    }
    assert got[1]["is_dup"] == 0 and got[1]["dup_of"] is None
    assert got[2]["is_dup"] == 1 and got[2]["dup_of"] == 1
    assert got[4]["is_dup"] == 1 and got[4]["dup_of"] == 1
    assert got[3]["is_dup"] == 0
    # doc 2 shares exactly the two 4-token shingles inside the span
    assert got[2]["n_shared"] == 2


def test_substring_dup_flags_max_df_drops_boilerplate(spark):
    from notjusthtml_searchengine_spark.operators.dedup import (
        substring_dup_flags,
    )

    boiler = "nav menu footer copyright"
    rows = [(i, f"doc {i} body words here " + boiler) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # the boilerplate shingle appears in all 5 docs; max_df=3 drops it,
    # so nothing is flagged
    got = substring_dup_flags(df, k=4, max_df=3).collect()
    assert all(r["is_dup"] == 0 for r in got)
    flagged = substring_dup_flags(df, k=4).filter(F.col("is_dup") == 1)
    assert flagged.count() == 4  # without the guard, docs 2..5 chain to 1
