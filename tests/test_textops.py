"""Text-analysis operators beyond the oracle queries: BM25 ranking
against the hand-computed reference formula."""

from __future__ import annotations

import math

import pytest


def test_bm25_scores_reference_formula(spark):
    """Hand-checked BM25 (Lucene idf) on a 3-doc corpus, plus the
    ranking property: more occurrences of a rarer term score higher."""
    from notjusthtml_searchengine_spark.operators.textops import bm25_scores

    docs = spark.createDataFrame(
        [
            (0, "spark spark fast"),
            (1, "spark slow slow slow"),
            (2, "other words entirely here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_scores(docs, ["spark", "fast"]).collect()}
    assert set(out) == {0, 1}  # doc 2 matches nothing
    n, avgdl = 3, (3 + 4 + 4) / 3
    k1, b = 1.2, 0.75

    def score(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    want0 = round(score(2, 2, 3) + score(1, 1, 3), 4)
    want1 = round(score(1, 2, 4), 4)
    assert out[0]["score"] == pytest.approx(want0, abs=1e-4)
    assert out[1]["score"] == pytest.approx(want1, abs=1e-4)
    assert out[0]["n_terms"] == 2 and out[1]["n_terms"] == 1
    assert out[0]["score"] > out[1]["score"]


def test_bm25_case_insensitive_and_empty(spark):
    from notjusthtml_searchengine_spark.operators.textops import bm25_scores

    docs = spark.createDataFrame(
        [(0, "SPARK Spark"), (1, "")], "doc_id long, text string"
    )
    out = bm25_scores(docs, ["spark"]).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 0
