"""Structured Streaming ingestion of a live page feed (SURVEY.md §2.9).

The crawl loop itself is batch rounds (a frontier is its own feedback
loop — a stream cannot consume its own output), but the *ingestion*
side of a production deployment is naturally streaming: WARC/page
files land continuously, and extraction + sinks should keep up
incrementally with exactly-once file tracking.

This module provides that path with the same kernels the batch
engine uses (mapInPandas works identically on streaming DataFrames):

  pages file-stream → gates → extraction (U1 flat) → link sink
                    → watermarked tumbling-window page stats

Checkpointed (`checkpointLocation`) so a killed stream resumes
without reprocessing — the streaming counterpart of the round
driver's snapshot/resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..extract.udfs import extract_links_flat
from ..session import MAX_FILESIZE


def read_page_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream over the pages schema (parquet drops)."""
    return (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_links(pages: DataFrame) -> DataFrame:
    """Gates (P3/P4/P5) + flat link extraction over a page stream.

    The P5 html-sniff gate runs INSIDE the extraction kernel
    (``sniff_gate=True``) — chaining a separate pandas-UDF sniff
    filter in front of mapInPandas doubles the JVM↔Python Arrow
    hops over the fat html column (measured ~7× slower on the batch
    path, BENCH/BASELINE.md); the stream keeps the same single
    Python stage. The suffix skip is a JVM filter and case-sensitive
    (html.go:169 parity, same as the batch round)."""
    ok = pages.filter(
        F.col("html").isNotNull()
        & (F.length("html") > 0)
        & (F.length("html") < F.lit(MAX_FILESIZE))
        & ~F.col("url").rlike(r"\.(jpeg|png|jpg)$")
    )
    src = ok.select(
        F.col("url").alias("origin_url"), F.col("warc_ts"), F.col("html")
    )
    flat = extract_links_flat(src, url_col="origin_url", sniff_gate=True)
    return flat.filter(F.col("kw_idx").isNull() | (F.col("kw_idx") == 0)).select(
        "origin_url",
        "dest_url",
        "pos",
        F.xxhash64("origin_url", "dest_url", "pos").alias("link_id"),
        F.unix_micros("warc_ts").alias("time_found"),
    )


def windowed_page_stats(pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window ingest stats (late data beyond the
    watermark is dropped — the engine's late-page policy)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("html").cast("bigint")).alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "lang",
            "n_pages",
            "bytes",
        )
    )


def run_link_ingest(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the link-extraction
    stream; returns the StreamingQuery."""
    links = stream_links(read_page_stream(spark, input_dir))
    writer = (
        links.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
