"""Composite corpus quality filter: the FineWeb/Gopher/CCNet-style
keep/drop pass over a training corpus, composed from this package's
individually-oracle-checked signals:

  * language ID (stopword majority vote, textops.lang_votes)
  * heuristic quality score (length/punct/stopword bands,
    textops.quality_score)
  * Gopher repetition gates (textops.repetition_signals)
  * bigram-LM perplexity trained on the corpus itself (lm.perplexity)

A document is kept when it is in the target language, scores at least
``min_quality``, passes every repetition gate, and its perplexity is
at most ``max_ppl`` (the CCNet low-perplexity tail; boilerplate and
gibberish both land in the high-ppl head).

Scale shape: each signal is ONE corpus pass built from exchanges on
the doc id (explode → partial-agg groupBy → join back); the composite
is four such passes joined on the id. At 100 TB you run the signal
passes once into a signals sink and join there — the composition here
keeps each signal's plan untouched so their individual oracle checks
carry over verbatim. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import perplexity
from .textops import lang_votes, quality_score, repetition_signals


def corpus_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str | None = "en",
    min_quality: float = 0.5,
    max_ppl: float = 2000.0,
    min_count: int = 2,
    alpha: float = 0.1,
) -> DataFrame:
    """One row per input doc: (id, lang_pred, q, repetition_ok, ppl,
    keep). ``lang_pred`` is NULL when no stopword voted (treated as
    not-in-language → dropped); ``lang=None`` disables the language
    gate (multilingual corpora). The output is a total labeling so it
    joins directly as a corpus filter."""
    lid = lang_votes(docs, id_col, text_col).select(id_col, "lang_pred")
    q = docs.select(
        F.col(id_col), quality_score(F.col(text_col)).alias("q")
    )
    rep = repetition_signals(docs, id_col, text_col).select(
        id_col, "repetition_ok"
    )
    ppl = perplexity(
        docs, id_col, text_col, min_count=min_count, alpha=alpha
    ).select(id_col, "ppl")
    keep = (
        (F.lit(True) if lang is None else (F.col("lang_pred") == lang))
        & (F.col("q") >= min_quality)
        & F.col("repetition_ok")
        & (F.col("ppl") <= max_ppl)
    )
    return (
        docs.select(id_col)
        .join(lid, id_col, "left")
        .join(q, id_col, "left")
        .join(rep, id_col, "left")
        .join(ppl, id_col, "left")
        .select(
            F.col(id_col),
            "lang_pred",
            "q",
            F.col("repetition_ok").cast("int").alias("repetition_ok"),
            "ppl",
            F.coalesce(keep, F.lit(False)).cast("int").alias("keep"),
        )
    )
