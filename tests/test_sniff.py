"""Kernel U4: WHATWG sniffing table (reference html.go:96 paths)."""

from notjusthtml_searchengine_spark.functions.sniff import detect_content_type


def test_html_variants():
    assert detect_content_type(b"<!DOCTYPE html><html></html>") == "text/html; charset=utf-8"
    assert detect_content_type(b"  \n\t<html><body></body></html>") == "text/html; charset=utf-8"
    assert detect_content_type(b"<HTML>") == "text/html; charset=utf-8"
    assert detect_content_type(b"<!-- c -->") == "text/html; charset=utf-8"
    # tag-terminator required: "<htmlx" is NOT html
    assert detect_content_type(b"<htmlx>hi") == "text/plain; charset=utf-8"
    # '<!--' needs the terminator too (Go htmlSig applies it uniformly)
    assert detect_content_type(b"<!--x") == "text/plain; charset=utf-8"
    assert detect_content_type(b"<!-->") == "text/html; charset=utf-8"


def test_utf_boms_masked():
    """Go's BOM signatures are masked: trailing bytes are ignored, but
    the 4-byte masked window means inputs shorter than 4 never match."""
    assert detect_content_type(b"\xfe\xff\x00A") == "text/plain; charset=utf-16be"
    assert detect_content_type(b"\xfe\xffAB") == "text/plain; charset=utf-16be"
    assert detect_content_type(b"\xff\xfeXY") == "text/plain; charset=utf-16le"
    assert detect_content_type(b"\xef\xbb\xbfhi") == "text/plain; charset=utf-8"
    # <4 bytes: no BOM match; not binary bytes -> plain text fallback
    assert detect_content_type(b"\xfe\xff") == "text/plain; charset=utf-8"


def test_images():
    assert detect_content_type(b"\x89PNG\r\n\x1a\nrest") == "image/png"
    assert detect_content_type(b"\xff\xd8\xff\xe0junk") == "image/jpeg"
    assert detect_content_type(b"GIF89a....") == "image/gif"


def test_text_vs_binary():
    assert detect_content_type("plain text — üñï".encode()) == "text/plain; charset=utf-8"
    assert detect_content_type(bytes(range(32))) == "application/octet-stream"
    assert detect_content_type(b"") == "text/plain; charset=utf-8"


def test_pdf_xml():
    assert detect_content_type(b"%PDF-1.7 ...") == "application/pdf"
    assert detect_content_type(b"  <?xml version='1.0'?>") == "text/xml; charset=utf-8"


def test_jvm_column_sniff_parity(spark, corpus):
    """sniff_col (JVM expression) must agree with detect_content_type
    (python kernel) on every corpus body plus adversarial fixtures."""
    from notjusthtml_searchengine_spark.functions.sniff import sniff_col

    bodies = [p["html"] for p in corpus.pages if len(p["html"]) < 1_000_000]
    bodies += [
        b"",
        b"<htmlx>nope",
        b"  \t\r\n<HTML><body>x",
        b"<!-- comment page -->",
        b"<?xml version='1.0'?><r/>",
        b"%PDF-1.4",
        b"\x89PNG\r\n\x1a\nrest",
        b"\xff\xd8\xff\xdbjunk",
        b"GIF89aXYZ",
        b"RIFF1234WEBPVP8 ",
        b"RIFF1234WAVEfmt ",
        b"\x00\x00\x00\x18ftypmp42",
        b"plain ascii text only",
        "unicode téxt ütf-8".encode(),
        bytes(range(256)),
        b"PK\x03\x04zipfile",
        b"\x1f\x8b\x08gz",
        b"\xfe\xff\x00A",  # utf-16be BOM (masked match)
        b"\xff\xfeXY",  # utf-16le BOM
        b"\xef\xbb\xbfhi",  # utf-8 BOM
        b"\xfe\xff",  # too short for the 4-byte BOM window
        b"<!--x",  # '<!--' without terminator is not html
        b"<!-->",
    ]
    df = spark.createDataFrame([(bytearray(b),) for b in bodies], "html binary")
    got = [r[0] for r in df.select(sniff_col("html")).collect()]
    want = [detect_content_type(b) for b in bodies]
    for g, w, b in zip(got, want, bodies):
        assert g == w, (b[:40], g, w)
