"""Crawl → training-set pipeline: turn a crawl state directory into a
packed LM training corpus, closing the loop between the engine's two
halves — the crawler that produces the corpus and the training-data
operators that consume one.

    contents + content_blobs      (the crawl's own sinks)
      → visible text              (kernel U2 — the byte-identical
                                   extraction the reference's parser
                                   produces; extract/udfs.py)
      → C4 line cleaning          (operators/cleaning.c4_clean, opt.)
      → exact text dedup          (md5 fingerprint of the normalized
                                   cleaned text; byte-identical HTML is
                                   already deduped by the blob sink's
                                   sha1 — this catches same-text-
                                   different-markup)
      → quality filter            (operators/filters.corpus_filter:
                                   lang / quality / repetition /
                                   corpus-trained LM perplexity)
      → sequence packing          (operators/packing.pack_sequences —
                                   deterministic token-stream layout)

Outputs under ``out_dir``: ``documents.parquet`` (doc_id = canonical
url, the final text, every per-doc signal) and ``packing.parquet``
(the sequence manifest a loader consumes), plus a returned stats dict
(one row per funnel stage — the numbers a pipeline operator monitors).

Scale shape: one blob-side pass through the visible-text kernel (the
only Python stage), every later stage is the respective operator's
documented plan; the funnel counts come from ONE aggregate over the
final labeled frame, not per-stage actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..extract.udfs import visible_text_udf
from ..operators.cleaning import c4_clean
from ..operators.filters import corpus_filter
from ..operators.packing import pack_sequences
from ..operators.textops import fingerprint
from .state import CrawlState


def corpus_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """(doc_id, text): one document per distinct page body in the
    crawl state. doc_id is the lexicographically-first url that
    carried the body (deterministic canonical choice); text is the
    U2 visible-text extraction of the stored blob."""
    state = CrawlState(state_dir)
    contents = spark.read.schema(schemas.CONTENTS).parquet(
        state.sink_glob("contents")
    )
    blobs = spark.read.schema(schemas.CONTENT_BLOBS).parquet(
        state.sink_glob("content_blobs")
    )
    canon = contents.groupBy("sha1").agg(F.min("url").alias("doc_id"))
    return canon.join(blobs, "sha1").select(
        "doc_id", visible_text_udf(F.col("content")).alias("text")
    )


def build_training_set(
    spark: SparkSession,
    state_dir: str,
    out_dir: str,
    seq_len: int = 1024,
    clean: bool = True,
    text_dedup: bool = True,
    near_dedup: bool = False,
    near_threshold: float = 0.8,
    lang: str | None = "en",
    min_quality: float = 0.5,
    max_ppl: float = 2000.0,
) -> dict:
    """Run the full funnel and write the training set. Returns the
    stage-by-stage stats dict. ``near_dedup`` adds the MinHash-LSH →
    Jaccard-verified → connected-components clustering pass
    (operators/dedup.dedup_clusters) after exact dedup, keeping one
    canonical doc per near-dup cluster."""
    docs = corpus_from_state(spark, state_dir)

    if clean:
        cleaned = c4_clean(docs)
        docs = (
            cleaned.filter(F.col("doc_ok") == 1)
            .select("doc_id", F.col("clean_text").alias("text"))
        )

    if text_dedup:
        # one winner per normalized-text fingerprint, deterministic
        docs = (
            docs.withColumn("_fp", fingerprint(F.col("text")))
            .groupBy("_fp")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min_by("text", "doc_id").alias("text"),
            )
            .drop("_fp")
        )

    if near_dedup:
        from ..operators.dedup import dedup_clusters

        clusters = dedup_clusters(
            docs, threshold=near_threshold
        ).filter(F.col("is_canonical"))
        docs = docs.join(clusters.select("doc_id"), "doc_id")

    labeled = docs.join(
        corpus_filter(
            docs, lang=lang, min_quality=min_quality, max_ppl=max_ppl
        ),
        "doc_id",
    )
    kept = labeled.filter(F.col("keep") == 1).select("doc_id", "text")
    manifest = pack_sequences(kept, seq_len=seq_len)

    final = labeled.join(manifest.drop("n_tokens"), "doc_id", "left")
    final.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    manifest.write.mode("overwrite").parquet(f"{out_dir}/packing.parquet")

    out_docs = spark.read.parquet(f"{out_dir}/documents.parquet")
    out_manifest = spark.read.parquet(f"{out_dir}/packing.parquet")
    agg = out_docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_kept"),
    ).collect()[0]
    magg = out_manifest.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.max("last_seq") + 1, F.lit(0)).alias("n_sequences"),
    ).collect()[0]
    return {
        "docs_after_clean_dedup": int(agg["n_docs"]),
        "docs_kept": int(agg["n_kept"] or 0),
        "total_tokens": int(magg["n_tokens"]),
        "n_sequences": int(magg["n_sequences"]),
        "seq_len": seq_len,
        "out_dir": out_dir,
    }
