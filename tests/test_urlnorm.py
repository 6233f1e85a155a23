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
    """The engine's JVM host expression (host_expr — regexp, never
    throws) must agree with the Python host_of on every URL the crawl
    can see, INCLUDING invalid ones: Spark's parse_url raises
    [INVALID_URL] on a literal space (one bad href would abort a whole
    round), which is why the engine uses host_expr instead."""
    from pyspark.sql import functions as F

    from notjusthtml_searchengine_spark.functions.urlnorm import host_expr

    urls = [
        "http://ExAmple.COM/p",
        "http://ExAmple.COM:8080/p",
        "http://host1.example/p/1",
        "https://UPPER.example/x?q=1",
        "http://user:pw@MiXed.Host/p",
        "http://[2001:DB8::1]:443/p",
        # java.net.URI-invalid forms parse_url would throw on:
        "http://a.example/spark engine page",
        "http://a.example/x?q=a b|c",
        "http://a.example/x^y",
        "not a url",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    jvm_hosts = [r[0] for r in df.select(host_expr("url")).collect()]
    assert jvm_hosts == [host_of(u) for u in urls]


def test_path_protocol_exprs(spark):
    from notjusthtml_searchengine_spark.functions.urlnorm import (
        path_expr,
        protocol_expr,
    )

    rows = [
        ("http://a.example/robots.txt", "/robots.txt", "http"),
        ("https://a.example/a b/c?q=1#f", "/a b/c", "https"),
        ("http://a.example", "", "http"),
        ("http://a.example/?q=1", "/", "http"),
        ("garbage", "garbage", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], "url string")
    got = df.select(path_expr("url"), protocol_expr("url")).collect()
    for (u, p, s), r in zip(rows, got):
        assert r[0] == p, (u, r[0])
        assert r[1] == s, (u, r[1])


def test_canonicalize_escapes_like_go():
    """Go url.String() re-serializes the PATH through EscapedPath():
    a raw space percent-encodes, an already-encoded path is kept
    byte-identical, an invalid %-escape is a parse error (None — the
    reference drops the link). Query is emitted verbatim."""
    assert (
        canonicalize("http://a.example/spark engine page")
        == "http://a.example/spark%20engine%20page"
    )
    assert canonicalize("http://a.example/a%20b") == "http://a.example/a%20b"
    assert canonicalize("http://a.example/%zz") is None
    assert canonicalize("http://a.example/x%2") is None
    # query kept verbatim (Go RawQuery round-trip), fragment escaped
    assert canonicalize("http://a.example/x?q=a b") == "http://a.example/x?q=a b"
    assert canonicalize("http://a.example/x#a b") == "http://a.example/x#a%20b"
    # Go keeps these path bytes raw (validEncoded set)
    assert (
        canonicalize("http://a.example/a!$&'()*+,;=:@[]b")
        == "http://a.example/a!$&'()*+,;=:@[]b"
    )
    # space in the HOST is a Go parse error
    assert canonicalize("http://a b.example/x") is None
    # resolution of a spacey href escapes too
    assert (
        resolve("http://a.example/", "/spark engine page")
        == "http://a.example/spark%20engine%20page"
    )


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
    if c1 is None:
        # only a Go-faithful parse error may return None: an invalid
        # %-escape in the generated path
        from notjusthtml_searchengine_spark.functions.urlnorm import (
            _valid_escapes,
        )

        assert not _valid_escapes(url)
        return
    assert canonicalize(c1) == c1


def test_resolve_fast_path_matches_slow_path():
    """r6: resolve() short-circuits already-canonical absolute URLs
    (one regex match) — brute-differential against the full
    urljoin+canonicalize round trip over an adversarial generator
    biased toward the fast-path boundary: dot segments ('.', '..',
    '...', '.x'), ';' (urljoin params quirk), '%', '?', '#', ports,
    empty paths, uppercase schemes/hosts."""
    import random
    from urllib.parse import urljoin as _uj

    from notjusthtml_searchengine_spark.functions.urlnorm import (
        canonicalize,
        resolve,
    )

    def slow(base, ref):
        try:
            return canonicalize(_uj(base, ref))
        except ValueError:
            return None

    rng = random.Random(99)
    alpha = "abcXYZ019._~!$&'()*+,=-"
    seg_pool = [".", "..", "...", ".x", "x.", ";", "a;b", "a%20b", "p"]
    bases = [
        "http://basehost.example/p/1",
        "https://B.example/a/b?q=1#f",
        "http://h",
    ]
    for i in range(20000):
        host = "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 10)))
        port = f":{rng.randrange(1, 65535)}" if rng.random() < 0.2 else ""
        segs = [
            rng.choice(seg_pool)
            if rng.random() < 0.3
            else "".join(
                rng.choice(alpha + ":@") for _ in range(rng.randrange(0, 7))
            )
            for _ in range(rng.randrange(0, 4))
        ]
        path = "/" + "/".join(segs) if segs else rng.choice(["", "/"])
        scheme = rng.choice(["http", "https", "HTTP", "ftp"])
        tail = rng.choice(["", "", "", "?q=1", "#f", "%7e", "%zz"])
        u = f"{scheme}://{host}{port}{path}{tail}"
        base = rng.choice(bases)
        assert resolve(base, u) == slow(base, u), (base, u)
    # relative refs always take the slow path
    for ref in ["/p/7", "p/7", "../x", "?q", "#f", "//other.example/z"]:
        assert resolve("http://a.example/p/5", ref) == slow(
            "http://a.example/p/5", ref
        )
