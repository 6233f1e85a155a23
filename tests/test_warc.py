"""WARC source connector: parse → pages schema → extraction kernel."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.extract.udfs import extract_links_flat
from notjusthtml_searchengine_spark.sources.warc import (
    iter_warc_records,
    pages_from_warc_bytes,
    read_warc,
    write_warc,
)

TS = datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
PAGES = [
    {
        "url": "http://a.example/1",
        "warc_ts": TS,
        "html": b"<html><body><a href='http://a.example/2'>two</a></body></html>",
    },
    {"url": "http://a.example/2", "warc_ts": TS, "html": b"<html><body>leaf</body></html>"},
]


def test_roundtrip_parse():
    data = write_warc(PAGES)
    rows = pages_from_warc_bytes(data)
    assert [r["url"] for r in rows] == [p["url"] for p in PAGES]
    assert rows[0]["html"] == PAGES[0]["html"]  # HTTP envelope stripped
    assert rows[0]["warc_ts"] == TS


def test_non_response_records_skipped():
    data = write_warc(PAGES)
    # prepend a warcinfo record (plain)
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    rows = pages_from_warc_bytes(info + gunzip_all(data))
    assert len(rows) == 2


def gunzip_all(data: bytes) -> bytes:
    import gzip
    import io

    with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
        return gz.read()


def test_read_warc_into_engine(spark, tmp_path):
    p = tmp_path / "crawl-00000.warc.gz"
    p.write_bytes(write_warc(PAGES))
    pages = read_warc(spark, str(p))
    got = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    assert got == {p_["url"]: p_["html"] for p_ in PAGES}
    # straight into the extraction kernel (the engine's input contract)
    flat = extract_links_flat(
        pages.select(F.col("url").alias("origin_url"), "html"),
        url_col="origin_url",
        sniff_gate=True,
    )
    links = {r["dest_url"] for r in flat.collect()}
    assert links == {"http://a.example/2"}


def test_malformed_archive_skipped(spark, tmp_path):
    (tmp_path / "bad.warc.gz").write_bytes(b"not a warc at all")
    (tmp_path / "good.warc.gz").write_bytes(write_warc(PAGES))
    pages = read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert pages.count() == 2
