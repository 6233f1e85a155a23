"""Structured Streaming ingestion path: file-stream → extraction →
parquet sink with checkpoint; watermarked window stats; resume
without reprocessing."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark import schemas
from notjusthtml_searchengine_spark.streaming.ingest import (
    read_page_stream,
    run_link_ingest,
    stream_links,
    windowed_page_stats,
)


@pytest.fixture(scope="module")
def stream_dirs(corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir = base / "in"
    in_dir.mkdir()
    html_pages = [
        p for p in corpus.pages if p["html"][:14].lower().startswith(b"<!doctype html")
    ]
    # two file drops
    half = len(html_pages) // 2
    for i, chunk in enumerate((html_pages[:half], html_pages[half:])):
        tbl = pa.table(
            {
                "url": [p["url"] for p in chunk],
                "warc_ts": pa.array(
                    [p["warc_ts"] for p in chunk], pa.timestamp("us", tz="UTC")
                ),
                "html": pa.array([p["html"] for p in chunk], pa.binary()),
                "text": [p["text"] for p in chunk],
                "lang": [p["lang"] for p in chunk],
            }
        )
        pq.write_table(tbl, str(in_dir / f"drop{i}.parquet"))
    return {"in": str(in_dir), "out": str(base / "out"), "ckpt": str(base / "ckpt"), "n_html": len(html_pages)}


def test_stream_links_drain_and_resume(spark, stream_dirs, corpus):
    q = run_link_ingest(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    q.awaitTermination(120)
    out = spark.read.parquet(stream_dirs["out"])
    n1 = out.count()
    golden_links = sum(
        len(g["links"])
        for g, p in zip(corpus.golden, corpus.pages)
        if p["html"][:14].lower().startswith(b"<!doctype html")
    )
    assert n1 == golden_links

    # restart with no new files: checkpoint prevents reprocessing
    q2 = run_link_ingest(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    q2.awaitTermination(60)
    assert spark.read.parquet(stream_dirs["out"]).count() == n1


def test_stream_links_single_python_stage(spark, stream_dirs):
    """Plan audit: the streaming ingest DAG must contain exactly ONE
    Python/Arrow node (the fused extraction kernel) — a chained sniff
    UDF stage would double the Arrow hops over the fat html column.
    The logical transformation is identical for batch and streaming
    (same function over an unbounded table), so audit it on the batch
    plan where the executed plan is materializable."""
    pages = spark.read.schema(schemas.PAGES).parquet(stream_dirs["in"])
    links = stream_links(pages)
    p = links._jdf.queryExecution().executedPlan().toString()
    assert p.count("MapInPandas") + p.count("PythonMapInArrow") == 1
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_windowed_stats_batch_equivalence(spark, stream_dirs):
    """Window aggregation logic validated on the same data in batch
    mode (streaming window semantics == batch date_trunc grouping)."""
    pages = spark.read.schema(schemas.PAGES).parquet(stream_dirs["in"])
    stats = windowed_page_stats(pages.withColumn("warc_ts", F.col("warc_ts")))
    rows = stats.collect()
    assert sum(r["n_pages"] for r in rows) == pages.count()
    assert all(r["bytes"] > 0 for r in rows)
