"""Benchmark decontamination: flag training documents that overlap an
evaluation set by shared word n-grams.

The standard pre-training hygiene pass (GPT-3 appendix C, The Pile,
FineWeb): a training document is CONTAMINATED when it shares at least
``min_matches`` distinct word n-grams (n=13 in most published setups;
configurable — the tiny test corpora use smaller n) with any benchmark
document. Emits one row per training doc with the match evidence so
the caller can either drop the doc or route it to an audit sink.

Scale shape (100 TB corpus, ~10^4-10^6 benchmark docs):
  * the benchmark side is shingled and DISTINCT-ed first — eval sets
    are tiny relative to the corpus, so its shingle table broadcasts
    (explicit ``broadcast()`` below; Spark would pick SMJ from the
    post-explode size estimate otherwise);
  * the corpus side is a map-side shingle explode feeding ONE
    broadcast-hash semi-join + one groupBy(doc) — no shuffle of raw
    text, no self-joins;
  * hot shingles (boilerplate that appears in both sides) fan out the
    join — ``max_df`` drops benchmark shingles that occur in more
    than ``max_df`` benchmark docs, mirroring the hot-shingle cutoff
    in dedup.jaccard_pairs (published pipelines exclude such grams as
    non-discriminative).

No reference-engine analogue (the reference crawls, it does not train);
this is part of the LLM-pipeline operator set the survey scopes in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    n: int = 13,
    min_matches: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """One row per corpus doc: (id, n_matched_grams, n_bench_docs,
    contaminated). Docs with zero overlap are kept (zeros, False) so
    the output is a total labeling, directly joinable as a filter.

    ``n_matched_grams`` counts DISTINCT shared (gram, bench_doc) pairs
    collapsed to distinct grams; ``n_bench_docs`` counts distinct
    benchmark docs hit — both useful audit signals (one shared gram
    with 50 eval docs is boilerplate; 50 grams with one eval doc is a
    verbatim leak).
    """
    bench_id = bench_id_col or id_col
    bsh = word_shingles(benchmark, bench_id, text_col, n).withColumnRenamed(
        bench_id, "_bench_id"
    )
    if max_df is not None:
        hot = (
            bsh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("shingle")
        )
        bsh = bsh.join(F.broadcast(hot), "shingle", "left_anti")
    csh = word_shingles(corpus, id_col, text_col, n)
    hits = (
        csh.join(F.broadcast(bsh), "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_matched_grams"),
            F.countDistinct("_bench_id").alias("n_bench_docs"),
        )
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_matched_grams", F.lit(0)).alias("n_matched_grams"),
            F.coalesce("n_bench_docs", F.lit(0)).alias("n_bench_docs"),
            (F.coalesce("n_matched_grams", F.lit(0)) >= min_matches).alias(
                "contaminated"
            ),
        )
    )
