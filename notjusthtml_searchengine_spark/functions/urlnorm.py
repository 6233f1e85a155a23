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

import string
from urllib.parse import (
    quote_from_bytes,
    unquote_to_bytes,
    urljoin,
    urlsplit,
    urlunsplit,
)

import pandas as pd

# Go net/url escaping tables (url.go shouldEscape/validEncoded).
# Raw-keep set: characters validEncoded allows verbatim in an already-
# encoded component; anything outside forces a re-escape of the DECODED
# component with the mode's escape-safe set (so Go's String() turns
# "/a b" into "/a%20b" but keeps "/a%20b" byte-identical).
_UNRESERVED = set(string.ascii_letters + string.digits + "-_.~")
_PATH_RAW = _UNRESERVED | set("!$&'()*+,;=:@[]%/")
_FRAG_RAW = _PATH_RAW | set("?")
_PATH_SAFE = "$&+,/:;=@"  # encodePath: '?' escapes, these stay
_FRAG_SAFE = "$&+,/:;=?@!()*"  # encodeFragment
_HEX = set("0123456789abcdefABCDEF")
# Go parseHost rejects these outright (url.Parse returns an error, the
# reference drops the link): C0 controls, space, and the RFC 3986
# non-host delimiters it checks for.
_BAD_HOST = set(' <>"{}|\\^`') | {chr(c) for c in range(0x21)}


def _valid_escapes(s: str) -> bool:
    """False iff a '%' is not followed by two hex digits (Go unescape
    error => url.Parse error)."""
    i = s.find("%")
    while i != -1:
        if len(s) < i + 3 or s[i + 1] not in _HEX or s[i + 2] not in _HEX:
            return False
        i = s.find("%", i + 1)
    return True


def _go_component(raw: str, raw_set: set, safe: str) -> str | None:
    """Go's parse+EscapedPath() round-trip for one component: error on
    invalid %-escapes; keep a validly-encoded component verbatim; else
    percent-encode the decoded form with the mode's safe set."""
    if not _valid_escapes(raw):
        return None
    if all(c in raw_set for c in raw):
        return raw
    # bytes round-trip (Go operates on bytes): %FF stays %FF rather
    # than becoming a UTF-8 replacement character
    return quote_from_bytes(unquote_to_bytes(raw), safe=safe)


def canonicalize(raw: str) -> str | None:
    """Parse + re-serialize one URL; None on unparseable input.

    Faithful to Go's url.Parse→String() round-trip: the scheme is
    lowercased; the path and fragment are re-serialized through Go's
    EscapedPath()/EscapedFragment() rules (a raw space becomes %20, an
    already-encoded component is kept byte-identical); the query is
    written verbatim (Go String() emits RawQuery untouched); invalid
    %-escapes in path/fragment and invalid host characters are parse
    ERRORS in Go — the link is dropped (None)."""
    try:
        parts = urlsplit(raw)
    except ValueError:
        return None
    if any(c in _BAD_HOST for c in parts.netloc):
        return None
    # Go's parseHost also unescapes the host (encodeHost mode): an
    # invalid %-escape in the netloc is a url.Parse ERROR — the
    # reference drops the link, so must we.
    if not _valid_escapes(parts.netloc):
        return None
    path = _go_component(parts.path, _PATH_RAW, _PATH_SAFE)
    frag = _go_component(parts.fragment, _FRAG_RAW, _FRAG_SAFE)
    if path is None or frag is None:
        return None
    return urlunsplit(
        (parts.scheme.lower(), parts.netloc, path, parts.query, frag)
    )


# Fast-path shape for resolve(): an ABSOLUTE http(s) URL whose every
# character passes the whole parse→resolve→re-serialize round trip
# unchanged. The alphabet is the intersection of Go's raw-keep sets
# and Python's urljoin-neutral characters: no '%' (escape handling),
# no '?'/'#' (query/fragment split), no ';' (urljoin's urlparse
# round-trip drops an empty params segment: 'p;' → 'p'), and no
# exact '.'/'..' path segments (RFC 3986 dot-segment removal). For a
# match, resolve(base, ref) == ref for every base — brute-verified
# against the slow path in tests/test_urlnorm.py. At crawl scale the
# overwhelming majority of extracted hrefs take this path (~20x
# cheaper than the urljoin+canonicalize round trip, measured r6 —
# U1's per-link cost was 39% URL resolution).
import re as _re

_CANONICAL_ABS = _re.compile(
    r"^https?://[A-Za-z0-9._~!$&'()*+,=\-]+(?::\d+)?"
    r"(?:/[A-Za-z0-9._~!$&'()*+,=:@\-]*)*$"
)


def resolve(base: str, ref: str) -> str | None:
    """Go ``base.ResolveReference(ref)`` → serialized string."""
    if _CANONICAL_ABS.match(ref) and "/./" not in ref and "/../" not in ref \
            and not ref.endswith("/.") and not ref.endswith("/.."):
        return ref
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


# ---- JVM-side (codegen) URL component expressions ---------------------
# Spark's parse_url THROWS [INVALID_URL] on java.net.URI-invalid input
# (a literal space anywhere kills the whole stage — one bad href on one
# page aborts a 10^7-page round). These regexp forms never throw, stay
# inside whole-stage codegen, and agree with the Python helpers above
# (host_expr == host_of for every URL, including invalid ones) so
# politeness/robots keys are identical across both paths.


def host_expr(col):
    """Go url.Hostname() as a codegen expression: netloc after
    userinfo, port stripped, IPv6 brackets stripped; '' when absent."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    # scheme is OPTIONAL: a scheme-relative reference ('//host/path')
    # has a netloc too (urlsplit agrees) — requiring 'scheme://' gave
    # such URLs an empty politeness/robots key (ADVICE r4)
    netloc = F.regexp_extract(c, r"^(?:[^:/?#]+:)?//([^/?#]*)", 1)
    nouser = F.regexp_replace(netloc, r"^[^/?#]*@", "")
    return F.when(
        nouser.startswith("["), F.regexp_extract(nouser, r"^\[([^\]]*)", 1)
    ).otherwise(F.regexp_extract(nouser, r"^([^:]*)", 1))


def path_expr(col):
    """URL path component ('' when absent), never throws."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^(?:(?:[^:/?#]+:)?//[^/?#]*)?([^?#]*)", 1)


def protocol_expr(col):
    """URL scheme ('' when absent), never throws."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^([^:/?#]+)://", 1)


# ---- vectorized (pandas Series) forms used inside Arrow UDFs ----------


def canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize(u) if isinstance(u, str) else None)


def host_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: host_of(u) if isinstance(u, str) else "")
