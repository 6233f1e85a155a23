"""applyInPandasWithState: streaming first-seen URL dedup holds state
across micro-batches (the streaming counterpart of J2)."""

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark import schemas
from notjusthtml_searchengine_spark.streaming.stateful import stream_first_seen

TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _drop(path, urls):
    tbl = pa.table(
        {
            "url": urls,
            "warc_ts": pa.array([TS] * len(urls), pa.timestamp("us", tz="UTC")),
            "html": pa.array([b"<html></html>"] * len(urls), pa.binary()),
            "text": [""] * len(urls),
            "lang": ["en"] * len(urls),
        }
    )
    pq.write_table(tbl, str(path))


def test_first_seen_dedup_across_microbatches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # drop 0: a,b on h1; c on h2. drop 1: b,c repeated + d new.
    _drop(in_dir / "d0.parquet", ["http://h1.ex/a", "http://h1.ex/b", "http://h2.ex/c"])
    _drop(in_dir / "d1.parquet", ["http://h1.ex/b", "http://h2.ex/c", "http://h2.ex/d"])

    pages = (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", 1)  # force 2 micro-batches
        .parquet(str(in_dir))
        .withColumn("host", F.expr("parse_url(url, 'HOST')"))
    )
    firsts = stream_first_seen(pages)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        firsts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    got = {r["url"] for r in rows}
    assert got == {
        "http://h1.ex/a",
        "http://h1.ex/b",
        "http://h2.ex/c",
        "http://h2.ex/d",
    }
    assert len(rows) == 4  # repeats suppressed ACROSS micro-batches

    # restart with a new drop repeating old urls: state survives
    _drop(in_dir / "d2.parquet", ["http://h1.ex/a", "http://h1.ex/e"])
    q2 = (
        stream_first_seen(pages)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows2 = spark.read.parquet(out_dir).collect()
    assert {r["url"] for r in rows2} == got | {"http://h1.ex/e"}
    assert len(rows2) == 5


def test_state_cap_bounds_memory_without_data_loss(spark, tmp_path):
    """Past max_state_per_host, new urls are still EMITTED (no silent
    data loss); only the memory of them is bounded, so repeats of
    overflow urls in LATER micro-batches re-emit (batch J2 dedups)."""
    in_dir = tmp_path / "in2"
    in_dir.mkdir()
    # batch 0 exactly fills the cap (state = a,b,c). batch 1: a
    # suppressed (in state); d,e overflow → EMITTED; in-batch repeat
    # of d suppressed locally. batch 2: b suppressed; d (overflow,
    # never remembered) re-emitted.
    a, b, c, d, e = (f"http://h1.ex/{x}" for x in "abcde")
    _drop(in_dir / "d0.parquet", [a, b, c])
    _drop(in_dir / "d1.parquet", [a, d, e, d])
    _drop(in_dir / "d2.parquet", [b, d])
    # micro-batch order follows file mtime; same-millisecond writes
    # can reorder — pin it
    import os as _os

    for i, name in enumerate(("d0.parquet", "d1.parquet", "d2.parquet")):
        t = 1700000000 + i * 60
        _os.utime(in_dir / name, (t, t))
    pages = (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
        .withColumn("host", F.expr("parse_url(url, 'HOST')"))
    )
    firsts = stream_first_seen(pages, max_state_per_host=3)
    q = (
        firsts.writeStream.format("memory")
        .queryName("capped_firsts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT url FROM capped_firsts").collect()
    urls = [r["url"] for r in rows]
    # every distinct url surfaced at least once — nothing lost
    assert set(urls) == {a, b, c, d, e}
    assert len(urls) == 6  # 3 + 2 + 1
    assert urls.count(d) == 2  # overflow url re-emitted across batches
    assert urls.count(a) == 1 and urls.count(b) == 1  # in-state suppressed
