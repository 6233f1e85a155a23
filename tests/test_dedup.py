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
