"""Differential pin for the take-based (vectorized-carry) emission in
extract_links_flat / extract_with_meta (r6).

The r6 rewrite builds the carried input columns with one numpy
fancy-index per column instead of per-output-row list appends; row
ORDER within a batch is allowed to change (meta block then link
block — downstream consumers filter on ``kind``), but the row SET
must be exactly the old row-at-a-time emission's. The reference here
re-derives that old semantics independently, row by row, from the
same kernels.
"""

import hashlib

import pytest

from notjusthtml_searchengine_spark.extract.kernels import extract_links
from notjusthtml_searchengine_spark.extract.udfs import (
    extract_links_flat,
    extract_with_meta,
)
from notjusthtml_searchengine_spark.functions.sniff import detect_content_type


def _input_rows(corpus):
    rows = []
    for i, p in enumerate(corpus.pages):
        gate = "ok" if i % 5 else "size"  # some rows fail the gate
        rows.append((p["url"], i, gate, p["html"]))
    # adversarial rows: null html, null url, binary body, image suffix
    rows.append(("http://x.example/null", 900, "ok", None))
    rows.append((None, 901, "ok", b"<html><body><a href='/y'>t</a></body></html>"))
    rows.append(("http://x.example/gif", 902, "ok", b"GIF89a\x01\x00"))
    rows.append((
        "http://x.example/pic.jpg", 903, "ok",
        b"<html><body><a href='/z'>kw</a></body></html>",
    ))
    return rows


def _norm(row):
    return tuple(
        bytes(v) if isinstance(v, (bytearray, memoryview)) else v for v in row
    )


def _key(row):
    return tuple((v is None, 0 if v is None else v) for v in row)


def _link_rows(u, h):
    out = []
    for pos, lnk in enumerate(extract_links(u, h)):
        kws = lnk["keywords"] or [None]
        for ki, kw in enumerate(kws):
            if kw is None:
                out.append((pos, lnk["dest_url"], None, None, None))
            else:
                out.append((pos, lnk["dest_url"], ki, kw["visibility"], kw["text"]))
    return out


@pytest.fixture(scope="module")
def in_df(spark, corpus):
    return spark.createDataFrame(
        _input_rows(corpus), "url_norm string, tag int, gate string, html binary"
    )


def test_extract_links_flat_matches_rowwise_reference(spark, in_df):
    got = sorted(
        (_norm(r) for r in extract_links_flat(
            in_df, url_col="url_norm", sniff_gate=True
        ).collect()),
        key=_key,
    )
    want = []
    for u, tag, gate, h in _input_rows_cached(in_df):
        if h is None or u is None:
            continue
        if not detect_content_type(h).startswith("text/html"):
            continue
        for pos, dest, ki, vis, text in _link_rows(u, h):
            want.append((u, tag, gate, pos, dest, ki, vis, text))
    assert got == sorted(want, key=_key)


def test_extract_with_meta_matches_rowwise_reference(spark, in_df):
    got = sorted(
        (_norm(r) for r in extract_with_meta(in_df, url_col="url_norm").collect()),
        key=_key,
    )
    want = []
    for u, tag, gate, h in _input_rows_cached(in_df):
        if h is None or u is None:
            continue
        ct = detect_content_type(h)
        want.append((
            u, tag, gate, 0, ct, hashlib.sha1(h).digest(),
            hashlib.sha512(h).digest(), len(h), None, None, None, None, None,
        ))
        if (
            gate != "ok"
            or u.endswith((".jpeg", ".png", ".jpg"))
            or not ct.startswith("text/html")
        ):
            continue
        for pos, dest, ki, vis, text in _link_rows(u, h):
            want.append((
                u, tag, gate, 1, None, None, None, None, pos, dest, ki, vis, text,
            ))
    assert got == sorted(want, key=_key)


def _input_rows_cached(in_df):
    return [
        (r["url_norm"], r["tag"], r["gate"], bytes(r["html"]) if r["html"] is not None else None)
        for r in in_df.select("url_norm", "tag", "gate", "html").collect()
    ]


def test_empty_batch_yields_schema_stable_frame(spark):
    empty = spark.createDataFrame(
        [], "url_norm string, tag int, gate string, html binary"
    )
    assert extract_with_meta(empty, url_col="url_norm").count() == 0
    assert extract_links_flat(empty, url_col="url_norm").count() == 0
