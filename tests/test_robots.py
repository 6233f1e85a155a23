"""robots.txt parser (RFC 9309 group selection + engine prefix
reduction) and its Spark operator form feeding the politeness filter."""

from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.functions.robots import (
    parse_robots_txt,
    robots_rules,
)
from notjusthtml_searchengine_spark.operators.crawl_ops import robots_filter

BODY = """
# example robots
User-agent: googlebot
Disallow: /private/
Crawl-delay: 2

User-agent: njh-crawler
User-agent: otherbot
Allow: /public/
Disallow: /
Crawl-delay: 0.5

User-agent: *
Disallow: /blocked/
Disallow:
Allow: /blocked/ok*suffix
"""


def test_group_selection_longest_match():
    g = parse_robots_txt(BODY, user_agent="njh-crawler/1.0")
    assert g["disallow_prefixes"] == ["/"]
    assert g["allow_prefixes"] == ["/public/"]
    assert g["crawl_delay_ms"] == 500

    google = parse_robots_txt(BODY, user_agent="Googlebot-Image")
    assert google["disallow_prefixes"] == ["/private/"]
    assert google["crawl_delay_ms"] == 2000


def test_fallback_star_group_and_wildcard_reduction():
    g = parse_robots_txt(BODY, user_agent="randombot")
    assert g["disallow_prefixes"] == ["/blocked/"]  # empty Disallow dropped
    # single-star Allow is KEPT since r5 — the enforcement side
    # matches it exactly (startswith pre-star + contains post-star)
    assert g["allow_prefixes"] == ["/blocked/ok*suffix"]
    assert g["crawl_delay_ms"] is None


def test_wildcard_allow_policy():
    body = (
        "User-agent: *\nDisallow: /private/\nAllow: /*.css\n"
        "Allow: /page$\nAllow: /*a*b\n"
    )
    g = parse_robots_txt(body, "bot")
    # single-star and '$'-anchored Allows are kept (matched exactly by
    # crawl_ops._rule_match); only the multi-star Allow is dropped —
    # its superset fallback match would WIDEN it
    assert g["allow_prefixes"] == ["/*.css", "/page$"]
    assert g["disallow_prefixes"] == ["/private/"]
    # Disallow patterns are stored VERBATIM
    g2 = parse_robots_txt("User-agent: *\nDisallow: /a*/b\nDisallow: /c$\n", "bot")
    assert g2["disallow_prefixes"] == ["/a*/b", "/c$"]


def test_single_star_disallow_does_not_block_host(spark):
    """ADVICE r4 regression: 'Disallow: /*.gif' used to reduce to the
    prefix '/' with full original-length precedence — blocking the
    ENTIRE host. Exact single-star matching blocks only gif paths."""
    rules = spark.createDataFrame(
        [("h.ex", [], ["/*.gif"], None, 0)],
        "host string, allow_prefixes array<string>, disallow_prefixes array<string>, "
        "crawl_delay_ms int, fetched_round int",
    )
    cands = spark.createDataFrame(
        [
            ("http://h.ex/img/cat.gif", "h.ex"),   # matches → blocked
            ("http://h.ex/page.html", "h.ex"),      # no match → allowed
            ("http://h.ex/", "h.ex"),               # no match → allowed
        ],
        "url_norm string, host string",
    )
    allowed = {r["url_norm"] for r in robots_filter(cands, rules).collect()}
    assert allowed == {"http://h.ex/page.html", "http://h.ex/"}


def test_single_star_allow_matched_exactly(spark):
    """'Allow: /*.css' + 'Disallow: /' — css paths (and only css
    paths) survive, exactly as a real RFC 9309 parser decides."""
    rules = spark.createDataFrame(
        [("h.ex", ["/*.css"], ["/"], None, 0)],
        "host string, allow_prefixes array<string>, disallow_prefixes array<string>, "
        "crawl_delay_ms int, fetched_round int",
    )
    cands = spark.createDataFrame(
        [
            ("http://h.ex/styles/site.css", "h.ex"),  # allow 7 > dis 1
            ("http://h.ex/page.html", "h.ex"),        # dis only → blocked
        ],
        "url_norm string, host string",
    )
    allowed = {r["url_norm"] for r in robots_filter(cands, rules).collect()}
    assert allowed == {"http://h.ex/styles/site.css"}


def test_anchored_and_middle_star_shapes(spark):
    """'$'-anchored literal = exact path equality; '/a/*/b$' single
    star anchored = startswith + endswith with no overlap."""
    rules = spark.createDataFrame(
        [("h.ex", [], ["/exact$", "/a/*/b$"], None, 0)],
        "host string, allow_prefixes array<string>, disallow_prefixes array<string>, "
        "crawl_delay_ms int, fetched_round int",
    )
    cands = spark.createDataFrame(
        [
            ("http://h.ex/exact", "h.ex"),        # == → blocked
            ("http://h.ex/exactly", "h.ex"),      # prefix only → allowed
            ("http://h.ex/a/x/b", "h.ex"),        # star match → blocked
            ("http://h.ex/a/x/b/c", "h.ex"),      # not anchored-end → allowed
        ],
        "url_norm string, host string",
    )
    allowed = {r["url_norm"] for r in robots_filter(cands, rules).collect()}
    assert allowed == {"http://h.ex/exactly", "http://h.ex/a/x/b/c"}


def test_multi_star_ranks_by_reduced_prefix(spark):
    """Multi-star patterns still superset-match (over-block only) but
    rank by the REDUCED prefix so they cannot dominate the host: the
    collapsed '/*a*b' (prefix '/', rank 1) ties with 'Allow: /'
    (rank 1) and allow wins the tie."""
    rules = spark.createDataFrame(
        [("h.ex", ["/"], ["/*a*b"], None, 0)],
        "host string, allow_prefixes array<string>, disallow_prefixes array<string>, "
        "crawl_delay_ms int, fetched_round int",
    )
    cands = spark.createDataFrame(
        [("http://h.ex/anything", "h.ex")], "url_norm string, host string"
    )
    assert robots_filter(cands, rules).count() == 1


def test_truncated_wildcard_disallow_keeps_original_precedence(spark):
    """ADVICE r3: 'Allow: /foo' + 'Disallow: /foo*' on /foobar — a
    real longest-match parser blocks (pattern length 5 > 4). Storing
    the truncated prefix '/foo' (4) let the Allow win the tie =
    under-block. Verbatim storage + original-length ranking blocks."""
    rules = spark.createDataFrame(
        [("h.ex", ["/foo"], ["/foo*"], None, 0)],
        "host string, allow_prefixes array<string>, disallow_prefixes array<string>, "
        "crawl_delay_ms int, fetched_round int",
    )
    cands = spark.createDataFrame(
        [
            ("http://h.ex/foobar", "h.ex"),  # dis 5 > allow 4 → blocked
            ("http://h.ex/other", "h.ex"),   # no match → allowed
        ],
        "url_norm string, host string",
    )
    allowed = {r["url_norm"] for r in robots_filter(cands, rules).collect()}
    assert allowed == {"http://h.ex/other"}


def test_dollar_anchor_disallow_keeps_original_precedence(spark):
    """Same under-block class with the '$' anchor: 'Disallow: /foo$'
    (length 5) must beat 'Allow: /foo' (4) on the exact path /foo."""
    rules = spark.createDataFrame(
        [("h.ex", ["/foo"], ["/foo$"], None, 0)],
        "host string, allow_prefixes array<string>, disallow_prefixes array<string>, "
        "crawl_delay_ms int, fetched_round int",
    )
    cands = spark.createDataFrame(
        [("http://h.ex/foo", "h.ex")], "url_norm string, host string"
    )
    assert robots_filter(cands, rules).count() == 0


def test_longest_match_precedence(spark):
    rules = spark.createDataFrame(
        [("h.ex", ["/private/pub"], ["/private/", "/p"], None, 0)],
        "host string, allow_prefixes array<string>, disallow_prefixes array<string>, "
        "crawl_delay_ms int, fetched_round int",
    )
    cands = spark.createDataFrame(
        [
            ("http://h.ex/private/pub/x", "h.ex"),   # allow 12 > dis 9 → allowed
            ("http://h.ex/private/secret", "h.ex"),  # dis 9 > allow -1 → blocked
            ("http://h.ex/public", "h.ex"),          # dis 2 (/p) > allow -1 → blocked
            ("http://h.ex/other", "h.ex"),           # no match → allowed
        ],
        "url_norm string, host string",
    )
    allowed = {r["url_norm"] for r in robots_filter(cands, rules).collect()}
    assert allowed == {"http://h.ex/private/pub/x", "http://h.ex/other"}


def test_empty_and_garbage_bodies():
    assert parse_robots_txt("", "x") == {
        "allow_prefixes": [],
        "disallow_prefixes": [],
        "crawl_delay_ms": None,
    }
    g = parse_robots_txt("Disallow: /early\nUser-agent: *\nDisallow: /x", "a")
    assert g["disallow_prefixes"] == ["/x"]  # rules before any UA ignored


def test_robots_rules_operator_feeds_filter(spark):
    bodies = spark.createDataFrame(
        [
            ("h1.example", BODY.encode()),
            ("h2.example", b"User-agent: *\nDisallow: /priv\n"),
            ("h3.example", bytes([0xFF, 0xFE]) + b"garbage\x00"),
        ],
        "host string, body binary",
    )
    rules = robots_rules(bodies, user_agent="njh-crawler")
    got = {r["host"]: r.asDict() for r in rules.collect()}
    assert got["h1.example"]["disallow_prefixes"] == ["/"]
    assert got["h2.example"]["disallow_prefixes"] == ["/priv"]
    assert got["h3.example"]["disallow_prefixes"] == []  # permissive on garbage

    cands = spark.createDataFrame(
        [
            ("http://h1.example/public/x", "h1.example"),
            ("http://h1.example/other", "h1.example"),
            ("http://h2.example/priv/1", "h2.example"),
            ("http://h2.example/ok", "h2.example"),
            ("http://h3.example/anything", "h3.example"),
        ],
        "url_norm string, host string",
    )
    allowed = {r["url_norm"] for r in robots_filter(cands, rules).collect()}
    assert allowed == {
        "http://h1.example/public/x",  # Allow overrides Disallow /
        "http://h2.example/ok",
        "http://h3.example/anything",
    }
