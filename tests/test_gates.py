"""Gate-semantics pins (P5/P6): the image-suffix extraction skip is
case-SENSITIVE (html.go:169 strings.HasSuffix on the raw URL) while
the priority rule lowercases first (crawling.go:20) — a '.PNG' html
page IS link-extracted but does NOT get image priority."""

from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.crawl_ops import (
    html_gate,
    with_link_priority,
)


def test_html_gate_suffix_case_sensitive(spark):
    rows = [
        ("http://a.example/p.png", "text/html; charset=utf-8"),
        ("http://a.example/p.PNG", "text/html; charset=utf-8"),
        ("http://a.example/p.JpEg", "text/html; charset=utf-8"),
        ("http://a.example/p.html", "text/html; charset=utf-8"),
        ("http://a.example/p.html", "image/png"),
    ]
    df = spark.createDataFrame(rows, "url_norm string, content_type string")
    kept = {r[0] for r in html_gate(df).select("url_norm").collect()}
    # lowercase .png skipped; .PNG/.JpEg extracted (Go-faithful)
    assert kept == {
        "http://a.example/p.PNG",
        "http://a.example/p.JpEg",
        "http://a.example/p.html",
    }


def test_priority_rule_lowercases(spark):
    df = spark.createDataFrame(
        [("http://a.example/p.PNG", 0.0), ("http://a.example/p.html", 0.0)],
        "dest_url string, rating double",
    )
    got = {
        r["dest_url"]: r["priority"]
        for r in with_link_priority(df).collect()
    }
    assert got["http://a.example/p.PNG"] == 90  # priority DOES lowercase
    assert got["http://a.example/p.html"] == 0
