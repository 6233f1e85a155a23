"""Composite corpus quality filter (FineWeb-style keep/drop pass):
each gate actually gates, the labeling is total, and the verdict
agrees with independently recomputing the four signals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.filters import corpus_filter

GOOD = (
    "the cat sat on a warm mat and then that old dog walked over the "
    "hill because it was such a good day for being outside in the sun"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, GOOD),  # passes everything
        (1, GOOD.replace("cat", "chat le")),  # still mostly english stopwords
        (2, "le la les et le la les et le la les et " * 3),  # french-ish + repetitive
        (3, "x " * 2),  # too short -> low quality score
        (4, ("the same line\n" * 20)),  # dup-line repetition fail
        (5, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_total_labeling_and_gates(spark, docs):
    out = {r["doc_id"]: r for r in corpus_filter(docs).collect()}
    assert len(out) == 6
    assert out[0]["keep"] == 1
    assert out[0]["lang_pred"] == "en" and out[0]["repetition_ok"] == 1
    # repetitive non-english doc fails at least lang + repetition
    assert out[2]["keep"] == 0
    # too-short doc: quality gate
    assert out[3]["q"] < 0.5 and out[3]["keep"] == 0
    # dup-line doc: repetition gate
    assert out[4]["repetition_ok"] == 0 and out[4]["keep"] == 0
    # empty doc: no lang vote -> NULL lang_pred -> dropped, not crashed
    assert out[5]["lang_pred"] is None and out[5]["keep"] == 0


def test_ppl_gate(spark, docs):
    """A tight max_ppl drops the highest-perplexity docs that pass
    every other gate."""
    loose = {r["doc_id"]: r for r in corpus_filter(docs, max_ppl=1e9).collect()}
    kept_loose = {i for i, r in loose.items() if r["keep"] == 1}
    # doc 0's ppl, minus epsilon, as the cutoff: doc 0 must drop when
    # the bar is below its own score
    cut = loose[0]["ppl"] - 0.01
    tight = {r["doc_id"]: r for r in corpus_filter(docs, max_ppl=cut).collect()}
    assert tight[0]["keep"] == 0
    assert {i for i, r in tight.items() if r["keep"] == 1} <= kept_loose


def test_verdict_consistency(spark, docs):
    """keep == AND of the reported per-signal columns (the verdict
    never disagrees with its own evidence)."""
    for r in corpus_filter(docs, max_ppl=500.0).collect():
        expect = int(
            r["lang_pred"] == "en"
            and r["q"] is not None
            and r["q"] >= 0.5
            and r["repetition_ok"] == 1
            and r["ppl"] is not None
            and r["ppl"] <= 500.0
        )
        assert r["keep"] == expect, r
