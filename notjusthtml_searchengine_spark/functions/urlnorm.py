"""URL canonicalization (kernel U3, SURVEY.md §2.10).

The reference keys its Bloom seen-filter on the *resolved,
re-serialized* URL string: Go ``url.Parse`` → ``ResolveReference`` →
``String()`` (/root/reference/crawling.go:85, html.go:41,
linkNodeParsing.go:18-28). We reproduce that round-trip with
``urllib.parse`` and pin the corner cases with property tests
(canon(canon(u)) == canon(u) — SURVEY.md §5.2.5).

Semantics reproduced from Go's net/url serializer:
  - scheme is lowercased on parse; host case is preserved;
  - an empty path stays empty ("http://a.example" has no trailing /);
  - the fragment is preserved (Go's String() keeps it; the bloom key
    therefore includes fragments — faithful, if surprising);
  - relative references resolve per RFC 3986 (urljoin == Go
    ResolveReference for the cases a crawler sees; divergences are
    pinned in tests/test_urlnorm.py).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd


def canonicalize(raw: str) -> str | None:
    """Parse + re-serialize one URL; None on unparseable input."""
    try:
        parts = urlsplit(raw)
    except ValueError:
        return None
    # Go lowercases the scheme during parse; everything else is kept.
    return urlunsplit(
        (parts.scheme.lower(), parts.netloc, parts.path, parts.query, parts.fragment)
    )


def resolve(base: str, ref: str) -> str | None:
    """Go ``base.ResolveReference(ref)`` → serialized string."""
    try:
        return canonicalize(urljoin(base, ref))
    except ValueError:
        return None


def host_of(raw: str) -> str:
    """Go ``url.Hostname()``: host without port, brackets stripped.

    Case is PRESERVED (Go does not lowercase the host on parse, and
    the engine's JVM path ``parse_url(url, 'HOST')`` preserves case
    too — both paths must produce identical politeness/robots keys).
    ``urlsplit().hostname`` lowercases, so the netloc is taken apart
    manually.
    """
    try:
        netloc = urlsplit(raw).netloc
    except ValueError:
        return ""
    if "@" in netloc:  # strip userinfo
        netloc = netloc.rsplit("@", 1)[1]
    if netloc.startswith("["):  # bracketed IPv6 literal
        end = netloc.find("]")
        return netloc[1:end] if end > 0 else netloc[1:]
    return netloc.split(":", 1)[0]


# ---- vectorized (pandas Series) forms used inside Arrow UDFs ----------


def canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize(u) if isinstance(u, str) else None)


def host_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: host_of(u) if isinstance(u, str) else "")
