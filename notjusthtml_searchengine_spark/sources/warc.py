"""WARC source → pages table (Common-Crawl-style ingestion).

The engine's input (BASELINE.json input_hint) is a table of
(url, warc_ts, html, …); in production that table is materialized
from WARC archives. This module is the connector: a from-scratch
WARC/1.0-1.1 parser (ISO 28500) handling both plain and the
Common-Crawl convention of per-record gzip members, run as an
Arrow-batched mapInPandas over ``binaryFile`` rows.

Only ``response`` records become pages; the HTTP response envelope is
stripped so ``html`` is the raw payload body. Malformed records are
skipped (a count-preserving source would route them to an error sink;
the crawl only needs the pages).

Scale note: ``binaryFile`` yields one row per WARC file, so
parallelism = number of archives (Common Crawl ships ~64k × ~1 GB
per snapshot — far more files than executors). Single giant archives
should be split upstream; gzip members are not byte-range splittable.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pandas as pd

from .. import schemas


def _iter_plain_records(buf: bytes):
    """Yield (headers: dict, block: bytes) from an UNCOMPRESSED WARC."""
    pos = 0
    n = len(buf)
    while pos < n:
        # skip record separators
        while pos < n and buf[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n:
            return
        head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = buf[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return
        block_start = head_end + 4
        block = buf[block_start : block_start + length]
        yield headers, block
        pos = block_start + length


def iter_warc_records(data: bytes):
    """Yield (headers, block) from a WARC file, gzipped (multi-member,
    the Common-Crawl layout) or plain."""
    if data[:2] == b"\x1f\x8b":
        # concatenated gzip members: GzipFile reads them all
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
            data = gz.read()
    yield from _iter_plain_records(data)


def _strip_http(block: bytes) -> bytes:
    """HTTP response envelope → body (WARC response blocks carry the
    full HTTP message)."""
    if block[:5] in (b"HTTP/",):
        sep = block.find(b"\r\n\r\n")
        if sep >= 0:
            return block[sep + 4 :]
    return block


def _parse_ts(v: str | None):
    if not v:
        return None
    try:
        return datetime.strptime(v, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return None


def pages_from_warc_bytes(data: bytes) -> list[dict]:
    """One WARC file → pages rows (url, warc_ts, html, text, lang)."""
    out = []
    for headers, block in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        out.append(
            {
                "url": url,
                "warc_ts": _parse_ts(headers.get("warc-date")),
                "html": _strip_http(block),
                "text": None,
                "lang": None,
            }
        )
    return out


def read_warc(spark, path_glob: str):
    """WARC archives (glob) → DataFrame in the pages schema."""
    files = spark.read.format("binaryFile").load(path_glob)

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for content in pdf["content"]:
                try:
                    rows.extend(pages_from_warc_bytes(bytes(content)))
                except Exception:
                    continue  # malformed archive: skip (see module doc)
            yield pd.DataFrame(rows, columns=schemas.PAGES.names)

    return files.select("content").mapInPandas(gen, schemas.PAGES)


def write_warc(pages: list[dict]) -> bytes:
    """Tiny WARC writer (tests + fixtures): one gzip member per record,
    the Common-Crawl layout."""
    out = io.BytesIO()
    for p in pages:
        body = p["html"]
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        ts = p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {p['url']}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        rec = head + b"\r\n" + http + b"\r\n\r\n"
        out.write(gzip.compress(rec))
    return out.getvalue()
