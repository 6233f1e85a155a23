"""Bigram-LM perplexity (CCNet-style corpus-trained quality signal):
values match an independent pure-Python bigram model, OOV tokens fold
to '<unk>', empty docs score ppl=1, and the whole train+score path is
one lazy plan (no driver-side model collect)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.lm import BOS, UNK, perplexity


def py_perplexity(texts, min_count, alpha):
    """Independent reference implementation (plain dicts, no Spark)."""
    toks = {i: t.lower().split() for i, t in texts.items()}
    freq: dict[str, int] = {}
    for ws in toks.values():
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
    vocab = {w for w, c in freq.items() if c >= min_count}
    V = len(vocab) + 2
    mapped = {
        i: [BOS] + [w if (w in vocab or w == BOS) else UNK for w in ws]
        for i, ws in toks.items()
    }
    bgs = {i: list(zip(ws, ws[1:])) for i, ws in mapped.items()}
    c12: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    for pairs in bgs.values():
        for a, b in pairs:
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    out = {}
    for i, pairs in bgs.items():
        if not pairs:
            out[i] = (0, 0.0, 1.0)
            continue
        nll = -sum(
            math.log((c12[p] + alpha) / (c1[p[0]] + alpha * V)) for p in pairs
        ) / len(pairs)
        out[i] = (len(pairs), round(nll, 4), round(math.exp(nll), 2))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the hat"),
        (2, "the dog sat on the mat"),
        (3, "zzz qqq vvv"),  # all-rare -> all '<unk>'
        (4, ""),  # empty
        (5, "the cat sat on the mat"),  # duplicate of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_reference_model(spark, docs):
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = py_perplexity(texts, min_count=2, alpha=0.1)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"], r["ppl"])
        for r in perplexity(docs, min_count=2, alpha=0.1).collect()
    }
    assert got == want


def test_empty_doc_scores_neutral(spark, docs):
    row = [r for r in perplexity(docs).collect() if r["doc_id"] == 4][0]
    assert row["n_bigrams"] == 0 and row["nll"] == 0.0 and row["ppl"] == 1.0


def test_oov_folds_to_unk(spark):
    """Two docs differing only in WHICH rare token they use must score
    identically: both token sequences map to the same '<unk>' form."""
    docs = spark.createDataFrame(
        [
            (0, "common common word aardvark common"),
            (1, "common common word zyzzyva common"),
            (2, "common word common word"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["nll"], r["ppl"]) for r in perplexity(docs, min_count=2).collect()}
    assert out[0] == out[1]


def test_predictable_text_scores_lower(spark):
    """A doc made of the corpus's dominant pattern must have lower
    perplexity than a doc of shuffled rare transitions."""
    rows = [(i, "alpha beta gamma delta") for i in range(10)]
    rows.append((100, "alpha beta gamma delta"))
    rows.append((101, "delta alpha gamma beta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["ppl"] for r in perplexity(docs, min_count=2).collect()}
    assert out[100] < out[101]


def test_single_lazy_plan_no_collect(spark, docs):
    """The train+score pipeline must build without triggering any
    Spark job (the model is never collected to the driver)."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = perplexity(docs)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before)
    assert df.columns == ["doc_id", "n_bigrams", "nll", "ppl"]
