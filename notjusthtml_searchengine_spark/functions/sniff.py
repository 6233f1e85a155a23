"""Content-type sniffing (kernel U4, SURVEY.md §2.10).

Reimplements the WHATWG MIME-sniffing subset that Go's
``http.DetectContentType`` applies (/root/reference/html.go:96):
first 512 bytes, signature table in spec order, masked
case-insensitive HTML tag matches with a tag-terminating byte,
text/plain vs application/octet-stream fallback on "binary" bytes.

Table-driven port of the published WHATWG algorithm
(https://mimesniff.spec.whatwg.org/) — no Go code copied.
"""

from __future__ import annotations

import pandas as pd

_SNIFF_LEN = 512
_WS = b"\t\n\x0c\r "

# (pattern, mime) exact-prefix signatures, spec order.
_EXACT = [
    (b"%PDF-", "application/pdf"),
    (b"%!PS-Adobe-", "application/postscript"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"BM", "image/bmp"),
    (b"\x00\x00\x01\x00", "image/x-icon"),
    (b"\x00\x00\x02\x00", "image/x-icon"),
    (b"OggS\x00", "application/ogg"),
    (b"ID3", "audio/mpeg"),
    (b"\x1f\x8b\x08", "application/x-gzip"),
    (b"PK\x03\x04", "application/zip"),
    (b"Rar!\x1a\x07\x00", "application/x-rar-compressed"),
    (b"wOFF", "font/woff"),
    (b"wOF2", "font/woff2"),
    (b"\x00\x01\x00\x00", "font/ttf"),
    (b"OTTO", "font/otf"),
]

# UTF BOM signatures are MASKED (Go sniff.go masks FF FF 00 00 /
# FF FF FF 00): only the BOM bytes are compared, but the masked
# window is 4 bytes, so inputs shorter than 4 bytes never match.
_MASKED_BOMS = [
    (b"\xfe\xff", "text/plain; charset=utf-16be"),
    (b"\xff\xfe", "text/plain; charset=utf-16le"),
    (b"\xef\xbb\xbf", "text/plain; charset=utf-8"),
]
_BOM_WINDOW = 4

# HTML tag sniffers: case-insensitive prefix + tag-terminating byte
# (space or '>') required right after — per spec and Go's htmlSig,
# which applies the terminator rule to every tag INCLUDING '<!--'.
_HTML_TAGS = [
    b"<!DOCTYPE HTML",
    b"<HTML",
    b"<HEAD",
    b"<SCRIPT",
    b"<IFRAME",
    b"<H1",
    b"<DIV",
    b"<FONT",
    b"<TABLE",
    b"<A",
    b"<STYLE",
    b"<TITLE",
    b"<B",
    b"<BODY",
    b"<BR",
    b"<P",
    b"<!--",
]

# Bytes whose presence marks data as binary (WHATWG "binary data byte").
_BINARY_BYTES = frozenset(
    list(range(0x00, 0x09)) + [0x0B] + list(range(0x0E, 0x1B)) + list(range(0x1C, 0x20))
)


def _masked_riff(data: bytes) -> str | None:
    if data[:4] == b"RIFF":
        if data[8:14] == b"WEBPVP":
            return "image/webp"
        if data[8:12] == b"WAVE":
            return "audio/wave"
        if data[8:12] == b"AVI ":
            return "video/avi"
    return None


def detect_content_type(body: bytes | None) -> str:
    """Sniff one body. Mirrors Go http.DetectContentType output."""
    if body is None:
        body = b""
    data = bytes(body[:_SNIFF_LEN])

    # HTML / XML sniffers skip leading whitespace.
    trimmed = data.lstrip(_WS)
    upper = trimmed.upper()
    for tag in _HTML_TAGS:
        if upper.startswith(tag):
            rest = trimmed[len(tag) :]
            if rest[:1] in (b" ", b">"):
                return "text/html; charset=utf-8"
    if trimmed.startswith(b"<?xml"):
        return "text/xml; charset=utf-8"

    for bom, mime in _MASKED_BOMS:
        if len(data) >= _BOM_WINDOW and data.startswith(bom):
            return mime
    for sig, mime in _EXACT:
        if data.startswith(sig):
            return mime
    riff = _masked_riff(data)
    if riff:
        return riff
    # mp4: ftyp box at offset 4.
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "video/mp4"

    if not any(b in _BINARY_BYTES for b in data):
        return "text/plain; charset=utf-8"
    return "application/octet-stream"


def detect_series(bodies: pd.Series) -> pd.Series:
    """Vectorized form for use inside Arrow pandas UDFs."""
    return bodies.map(detect_content_type)


def sniff_col(html_col: str = "html"):
    """JVM Column-expression version of the sniffer (whole-stage
    codegen; no Python stage over the fat html column).

    Bit-equivalent to detect_content_type for every branch (parity-
    tested in tests/test_sniff.py::test_jvm_column_sniff_parity);
    exact-prefix signatures compare raw binary, the HTML/text branches
    work on a UTF-8 cast of the first 512 bytes (lossy replacement of
    invalid sequences never affects the ASCII prefixes being tested).
    """
    from pyspark.sql import functions as F

    head = F.expr(f"substring({html_col}, 1, 512)")  # binary
    s = head.cast("string")
    trimmed = F.regexp_replace(s, "^[\\t\\n\\x0c\\r ]+", "")
    up = F.upper(trimmed)

    def tag_match(t: str):
        return up.startswith(t + " ") | up.startswith(t + ">")

    html_hit = None
    for t in _HTML_TAGS:
        m = tag_match(t.decode())
        html_hit = m if html_hit is None else (html_hit | m)

    def bin_prefix(sig: bytes):
        return F.expr(f"substring({html_col}, 1, {len(sig)})") == F.lit(sig)

    expr = F.when(html_hit, "text/html; charset=utf-8").when(
        trimmed.startswith("<?xml"), "text/xml; charset=utf-8"
    )
    for bom, mime in _MASKED_BOMS:
        expr = expr.when((F.length(html_col) >= 4) & bin_prefix(bom), mime)
    for sig, mime in _EXACT:
        expr = expr.when(bin_prefix(sig), mime)
    expr = (
        expr.when(
            bin_prefix(b"RIFF") & (F.expr(f"substring({html_col}, 9, 6)") == F.lit(b"WEBPVP")),
            "image/webp",
        )
        .when(
            bin_prefix(b"RIFF") & (F.expr(f"substring({html_col}, 9, 4)") == F.lit(b"WAVE")),
            "audio/wave",
        )
        .when(
            bin_prefix(b"RIFF") & (F.expr(f"substring({html_col}, 9, 4)") == F.lit(b"AVI ")),
            "video/avi",
        )
        .when(
            (F.length(html_col) >= 12)
            & (F.expr(f"substring({html_col}, 5, 4)") == F.lit(b"ftyp")),
            "video/mp4",
        )
        .when(
            ~s.rlike("[\\x00-\\x08\\x0b\\x0e-\\x1a\\x1c-\\x1f]"),
            "text/plain; charset=utf-8",
        )
        .otherwise("application/octet-stream")
    )
    return expr
