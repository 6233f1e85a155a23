"""Gopher repetition quality signals (textops.repetition_signals):
duplicate-line fractions and top n-gram character coverage with the
published Rae et al. 2021 A1.1 thresholds. The corpus documents are
single-line, so the multi-line/duplicate-line semantics are pinned
here on constructed docs; the n-gram side is also oracle-checked
end-to-end (q:repetition_signals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.textops import (
    GOPHER_THRESHOLDS,
    repetition_signals,
)


def _sig(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return repetition_signals(df).collect()[0]


def test_clean_prose_passes(spark):
    r = _sig(spark, "the quick brown fox jumps over the lazy dog tonight")
    assert r["n_lines"] == 1
    assert r["dup_line_frac"] == 0.0
    assert r["dup_line_char_frac"] == 0.0
    assert r["repetition_ok"]


def test_duplicate_lines_counted_with_all_occurrences(spark):
    # 4 lines, 'spam spam' appears 3x -> dup_line_frac = 1 - 2/4 = 0.5;
    # dup chars = 3*9 over total 3*9+10
    text = "spam spam\nreal prose\nspam spam\nspam spam"
    r = _sig(spark, text)
    assert r["n_lines"] == 4
    assert r["dup_line_frac"] == 0.5
    assert r["dup_line_char_frac"] == round(27 / 37, 6)
    assert not r["repetition_ok"]  # 0.5 > 0.30 line threshold


def test_blank_and_whitespace_lines_ignored(spark):
    r = _sig(spark, "a b c\n\n   \na b c")
    assert r["n_lines"] == 2
    assert r["dup_line_frac"] == 0.5


def test_top_ngram_char_fraction(spark):
    # 'ab ab ab ab' -> top 2-gram 'ab ab' occurs 3x (sliding), len 5,
    # text_len 11 -> 15/11 capped? NOT capped: Gopher counts overlap
    # coverage approximately; we pin the exact formula cnt*len/text_len.
    # The 4-gram occurs once -> NOT repetition -> 0.0 (singleton gate).
    r = _sig(spark, "ab ab ab ab")
    assert r["top_2gram_char_frac"] == round(3 * 5 / 11, 6)
    assert r["top_3gram_char_frac"] == round(2 * 8 / 11, 6)
    assert r["top_4gram_char_frac"] == 0.0
    assert not r["repetition_ok"]


def test_tie_breaks_to_lexicographically_smallest_gram(spark):
    # 'b a b a' -> 2-grams: 'b a' x2? tokens b,a,b,a: grams 'b a','a b','b a'
    # -> max cnt 2 ('b a'); 'z y z y x w x w' -> 'z y' and 'x w' both 2,
    # tie -> 'x w'
    df = spark.createDataFrame(
        [(1, "z y z y x w x w")], "doc_id bigint, text string"
    )
    # reach into the helper to observe the chosen gram via the fraction:
    # both tied grams have len 3 so the fraction is identical; assert
    # determinism by running twice
    a = repetition_signals(df).collect()[0]["top_2gram_char_frac"]
    b = repetition_signals(df).collect()[0]["top_2gram_char_frac"]
    assert a == b == round(2 * 3 / 15, 6)


def test_short_docs_and_empty(spark):
    r = _sig(spark, "word")
    assert r["top_2gram_char_frac"] == 0.0
    assert r["repetition_ok"]
    r = _sig(spark, "")
    assert r["n_lines"] == 0
    assert r["repetition_ok"]


def test_thresholds_table_matches_published(spark):
    assert GOPHER_THRESHOLDS == {
        "dup_line_frac": 0.30,
        "dup_line_char_frac": 0.20,
        "top_2gram_char_frac": 0.20,
        "top_3gram_char_frac": 0.18,
        "top_4gram_char_frac": 0.16,
    }


def test_no_window_over_unbounded_strata(spark):
    """Plan shape: the per-doc argmax is groupBy/agg (partial
    aggregation), not a row_number window over an exploded gram
    stream — a hot doc must not serialize through one task."""
    df = spark.createDataFrame(
        [(i, "a b c a b c") for i in range(8)], "doc_id bigint, text string"
    )
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
