"""C4 line-level cleaning: each rule gates, cleaned text is the
surviving lines re-joined, and the page-level verdict composes."""

from __future__ import annotations

import pytest

from notjusthtml_searchengine_spark.operators.cleaning import c4_clean


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "This is a good sentence.\nAnother full sentence here!\n"
            "And a third one follows?"),
        (1, "no terminal punctuation on this line\nShort one.\n"
            "This line is long enough and ends properly."),
        (2, "Enable javascript to view this page.\nReal content is here.\n"
            "More real content is also here.\nAnd a third real line too."),
        (3, "Lorem ipsum dolor sit amet, consectetur adipiscing elit.\n"
            "A fine sentence follows here.\nAnd another one right after.\n"
            "Plus a third proper sentence."),
        (4, "function f() { return 1; }\nA fine sentence follows here.\n"
            "And another one right after.\nPlus a third proper sentence."),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_rules(spark, docs):
    out = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    # doc 0: all three lines survive
    assert out[0]["n_lines_kept"] == 3 and out[0]["doc_ok"] == 1
    assert out[0]["clean_text"].count("\n") == 2
    # doc 1: line 1 lacks terminal punct, line 2 has < 3 words
    assert out[1]["n_lines_kept"] == 1
    assert out[1]["clean_text"] == "This line is long enough and ends properly."
    # doc 2: the javascript line is dropped, the rest survive
    assert out[2]["n_lines_kept"] == 3 and out[2]["doc_ok"] == 1
    assert "javascript" not in out[2]["clean_text"].lower()
    # empty doc: total labeling, zeroes
    assert out[5]["n_lines_kept"] == 0 and out[5]["doc_ok"] == 0


def test_page_rules(spark, docs):
    out = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    # lorem ipsum and curly-brace pages are dropped wholesale even
    # though enough lines individually survive
    assert out[3]["n_lines_kept"] >= 3 and out[3]["doc_ok"] == 0
    assert out[4]["n_lines_kept"] >= 3 and out[4]["doc_ok"] == 0


def test_min_lines_threshold(spark, docs):
    out = {r["doc_id"]: r["doc_ok"] for r in c4_clean(docs, min_lines=2).collect()}
    assert out[1] == 0  # only one surviving line
    out1 = {r["doc_id"]: r["doc_ok"] for r in c4_clean(docs, min_lines=1).collect()}
    assert out1[1] == 1


def test_no_shuffle_plan(spark, docs):
    """The whole pass must be a pure projection — no Exchange."""
    plan = c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
