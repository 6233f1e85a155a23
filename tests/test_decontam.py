"""Benchmark decontamination (n-gram overlap vs an eval set): flag
semantics, the max_df hot-shingle cutoff, and the broadcast plan
shape. No reference-engine analogue (the reference crawls, it does
not train); part of the LLM-pipeline operator set the survey scopes
in alongside dedup/quality scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.decontam import contamination_flags


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # verbatim leak of bench doc 0 (many shared 3-grams)
        (0, "the quick brown fox jumps over the lazy dog"),
        # exactly ONE shared 3-gram with bench doc 0
        (1, "quick brown fox goes somewhere else entirely today"),
        # clean
        (2, "completely unrelated text about spark query planning"),
        # empty
        (3, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "an unrelated benchmark question about chemistry"),
        ],
        "doc_id long, text string",
    )


def test_flags_and_counts(spark, corpus, bench):
    out = {
        r["doc_id"]: r
        for r in contamination_flags(
            corpus, bench, n=3, min_matches=2
        ).collect()
    }
    assert len(out) == 4  # total labeling: every corpus doc has a row
    # doc 0: all 7 distinct 3-grams of bench doc 100 shared
    assert out[0]["n_matched_grams"] == 7
    assert out[0]["n_bench_docs"] == 1
    assert out[0]["contaminated"]
    # doc 1: only "quick brown fox" shared -> below min_matches=2
    assert out[1]["n_matched_grams"] == 1
    assert not out[1]["contaminated"]
    # clean + empty docs: zeros, not contaminated
    assert out[2]["n_matched_grams"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_matched_grams"] == 0 and not out[3]["contaminated"]


def test_min_matches_one_flags_single_gram(spark, corpus, bench):
    out = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_flags(
            corpus, bench, n=3, min_matches=1
        ).collect()
    }
    assert out[0] and out[1] and not out[2]


def test_max_df_drops_boilerplate_grams(spark):
    """A gram occurring in more than max_df bench docs is
    non-discriminative boilerplate and must not count."""
    bench = [(i, "all rights reserved worldwide") for i in range(100, 105)]
    bench += [(105, "a unique evaluation answer string here")]
    corpus = [
        (0, "footer says all rights reserved worldwide ok"),
        (1, "contains a unique evaluation answer string here verbatim"),
    ]
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in contamination_flags(
            cdf, bdf, n=4, min_matches=1, max_df=3
        ).collect()
    }
    # "all rights reserved worldwide" occurs in 5 bench docs > max_df=3
    assert out[0]["n_matched_grams"] == 0 and not out[0]["contaminated"]
    # the unique gram survives the cutoff
    assert out[1]["n_matched_grams"] >= 1 and out[1]["contaminated"]


def test_bench_side_broadcasts(spark, corpus, bench):
    """Scale shape: the eval-set side is tiny vs the corpus — the
    overlap join must be a broadcast hash join (corpus text never
    shuffles), not a sort-merge exchange of the exploded corpus."""
    plan = contamination_flags(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
