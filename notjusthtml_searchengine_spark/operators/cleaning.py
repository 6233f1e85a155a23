"""C4-style line-level corpus cleaning (Raffel et al. 2020 §2.2's
"Colossal Clean Crawled Corpus" rules, the standard web-text cleanup
pass that precedes every other filter):

  line kept iff   it ends in a terminal punctuation mark,
                  has at least ``min_words`` whitespace words,
                  and does not mention "javascript" (case-insensitive);
  doc kept iff    at least ``min_lines`` lines survived,
                  and the raw text contains neither "lorem ipsum"
                  (case-insensitive) nor a curly brace (code).

Everything is built-in array/string expressions (one projection, no
explode, no Python, no shuffle at all — a pure map over the corpus
scan), so the pass costs one codegen stage at any scale and is
re-derivable exactly in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: terminal punctuation in C4: . ! ? and closing double-quote
_TERMINAL_RE = '[.!?"]$'


def _kept_lines(text: Column, min_words: int) -> Column:
    lines = F.transform(F.split(text, "\n"), lambda l: F.trim(l))
    return F.filter(
        lines,
        lambda l: l.rlike(_TERMINAL_RE)
        & (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != "")) >= min_words)
        & ~F.contains(F.lower(l), F.lit("javascript")),
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 3,
) -> DataFrame:
    """One row per input doc: (id, clean_text, n_lines_kept,
    n_lines_total, doc_ok). ``clean_text`` is the surviving lines
    re-joined with newlines (empty string when none survive);
    ``doc_ok`` is the page-level verdict."""
    kept = _kept_lines(F.col(text_col), min_words)
    total = F.size(
        F.filter(
            F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        )
    )
    low = F.lower(F.col(text_col))
    doc_ok = (
        (F.size(kept) >= min_lines)
        & ~F.contains(low, F.lit("lorem ipsum"))
        & ~F.contains(low, F.lit("{"))
    )
    return docs.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).cast("bigint").alias("n_lines_kept"),
        total.cast("bigint").alias("n_lines_total"),
        doc_ok.cast("int").alias("doc_ok"),
    )
