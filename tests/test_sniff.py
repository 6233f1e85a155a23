"""Kernel U4: WHATWG sniffing table (reference html.go:96 paths)."""

from notjusthtml_searchengine_spark.functions.sniff import detect_content_type


def test_html_variants():
    assert detect_content_type(b"<!DOCTYPE html><html></html>") == "text/html; charset=utf-8"
    assert detect_content_type(b"  \n\t<html><body></body></html>") == "text/html; charset=utf-8"
    assert detect_content_type(b"<HTML>") == "text/html; charset=utf-8"
    assert detect_content_type(b"<!-- c -->") == "text/html; charset=utf-8"
    # tag-terminator required: "<htmlx" is NOT html
    assert detect_content_type(b"<htmlx>hi") == "text/plain; charset=utf-8"


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
