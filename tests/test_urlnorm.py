"""Kernel U3: canonicalization round-trip + resolution (Go url.Parse
semantics), with hypothesis idempotence (SURVEY.md §5.2.5)."""

from hypothesis import given
from hypothesis import strategies as st

from notjusthtml_searchengine_spark.functions.urlnorm import (
    canonicalize,
    host_of,
    resolve,
)


def test_absolute_roundtrip_identity():
    for u in [
        "http://host1.example/p/1",
        "https://a.example/x?q=1#frag",
        "http://a.example",  # empty path stays empty (Go behavior)
        "http://a.example/",
    ]:
        assert canonicalize(u) == u


def test_scheme_lowercased():
    assert canonicalize("HTTP://a.example/x") == "http://a.example/x"


def test_relative_resolution():
    base = "http://host0.example/p/5"
    assert resolve(base, "/p/7") == "http://host0.example/p/7"
    assert resolve(base, "p/7") == "http://host0.example/p/p/7"
    assert resolve(base, "../img/1.png") == "http://host0.example/img/1.png"
    assert resolve(base, "http://other.example/z") == "http://other.example/z"
    assert resolve(base, "?q=2") == "http://host0.example/p/5?q=2"
    assert resolve(base, "#f") == "http://host0.example/p/5#f"


def test_host_of():
    assert host_of("http://host1.example/p/1") == "host1.example"
    assert host_of("http://host1.example:8080/p/1") == "host1.example"
    assert host_of("not a url") == ""


def test_host_of_preserves_case_like_go_and_jvm():
    """Go url.Hostname() preserves host case; so does Spark's
    parse_url(url,'HOST') — the Python helper must agree so
    politeness/robots keys are consistent across both paths."""
    assert host_of("http://ExAmple.COM/p") == "ExAmple.COM"
    assert host_of("http://ExAmple.COM:8080/p") == "ExAmple.COM"
    assert host_of("http://user:pw@MiXed.Host/p") == "MiXed.Host"
    assert host_of("http://[2001:DB8::1]:443/p") == "2001:DB8::1"


def test_host_parity_python_vs_jvm(spark):
    from pyspark.sql import functions as F

    urls = [
        "http://ExAmple.COM/p",
        "http://ExAmple.COM:8080/p",
        "http://host1.example/p/1",
        "https://UPPER.example/x?q=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    jvm_hosts = [r[0] for r in df.select(F.expr("parse_url(url, 'HOST')")).collect()]
    assert jvm_hosts == [host_of(u) for u in urls]


@given(
    st.builds(
        lambda h, p, q: f"http://{h}.example/{p}" + (f"?{q}" if q else ""),
        st.from_regex(r"[a-z][a-z0-9-]{0,10}", fullmatch=True),
        st.from_regex(r"[a-zA-Z0-9/._~%-]{0,20}", fullmatch=True),
        st.from_regex(r"[a-z0-9=&]{0,10}", fullmatch=True),
    )
)
def test_canonicalize_idempotent(url):
    c1 = canonicalize(url)
    assert c1 is not None
    assert canonicalize(c1) == c1
