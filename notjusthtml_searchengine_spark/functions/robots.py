"""robots.txt parsing (politeness layer input, north_rule).

The reference has no robots handling (its crawler fetches anything);
the north_rule adds "per-host politeness buckets and robots.txt
caching". The engine's enforcement side (operators/crawl_ops.py
robots_filter + crawl_delay_caps) consumes pre-parsed rule rows
(schemas.ROBOTS); this module produces those rows from raw robots.txt
bodies fetched during the crawl.

Parser follows RFC 9309 (Robots Exclusion Protocol):
  * groups of User-agent lines followed by Allow/Disallow rules;
  * group selection by LONGEST matching user-agent token, '*' as
    fallback; multiple user-agent lines share one group;
  * Crawl-delay (non-RFC but ubiquitous) is captured per group in
    milliseconds;
  * comments (#) and blank lines per spec; unknown directives ignored.

Patterns are stored VERBATIM; the enforcement side
(crawl_ops._rule_match) applies EXACT RFC 9309 matching for the
common shapes — plain prefixes, '$'-anchored literals, and
single-'*' patterns like '/*.php' or '/a/*/b$' (pre-star fragment by
startswith, post-star fragment by contains/endswith) — with
longest-match precedence on the original pattern length (allow wins
ties). Only multi-'*' patterns (vanishingly rare on the real web)
degrade to a conservative superset prefix match, and those rank by
their REDUCED prefix length so a collapsed pattern cannot out-rank
every real rule and block the whole host. Consequently an Allow is
dropped only when it has ≥2 '*'s (a superset match would WIDEN an
allow and defeat Disallows); single-star and anchored Allows are
kept and matched exactly. Empty Disallow ("allow all") produces no
rule, per spec.

Vectorized form (`robots_rules`) runs as one mapInPandas over
(host, body) rows → ROBOTS-schema rows, partitioned like any other
kernel — robots bodies are just more fetched pages.
"""

from __future__ import annotations

import pandas as pd

from .. import schemas


def _clean_pattern(p: str, allow: bool = False) -> str | None:
    """RFC pattern → stored engine pattern. None = no usable rule.

    Patterns are kept VERBATIM: the enforcement side
    (crawl_ops._rule_match) matches plain/anchored/single-'*' shapes
    exactly and ranks by the ORIGINAL pattern length — truncating here
    would shorten the stored length and let an equally-long Allow win
    a tie the real pattern would have beaten (under-block = impolite
    fetch). Only a multi-'*' Allow is dropped: its superset fallback
    match would WIDEN the allow (e.g. '/*a*' → '/' would override
    every Disallow under longest-match); single-star and '$'-anchored
    Allows are matched exactly, so they are safe to keep."""
    p = p.strip()
    if not p:
        return None
    if allow and p.count("*") >= 2:
        return None
    return p


def parse_robots_txt(text: str, user_agent: str = "*") -> dict:
    """One robots.txt body → {allow_prefixes, disallow_prefixes,
    crawl_delay_ms} for the given user agent (RFC 9309 group pick)."""
    groups: list[dict] = []  # each: {agents, allow, disallow, delay}
    cur: dict | None = None
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur is None or not last_was_agent:
                cur = {"agents": [], "allow": [], "disallow": [], "delay": None}
                groups.append(cur)
            cur["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # rules before any user-agent line are ignored
        if field == "allow":
            p = _clean_pattern(value, allow=True)
            if p is not None:
                cur["allow"].append(p)
        elif field == "disallow":
            p = _clean_pattern(value)
            if p is not None:
                cur["disallow"].append(p)
        elif field == "crawl-delay":
            try:
                cur["delay"] = int(float(value) * 1000)
            except ValueError:
                pass

    ua = user_agent.lower()
    best = None
    best_len = -1
    for g in groups:
        for agent in g["agents"]:
            if agent == "*":
                if best_len < 0:
                    best, best_len = g, 0
            elif agent and agent in ua and len(agent) > best_len:
                best, best_len = g, len(agent)
    if best is None:
        return {"allow_prefixes": [], "disallow_prefixes": [], "crawl_delay_ms": None}
    return {
        "allow_prefixes": list(best["allow"]),
        "disallow_prefixes": list(best["disallow"]),
        "crawl_delay_ms": best["delay"],
    }


def robots_rules(df, host_col: str = "host", body_col: str = "body",
                 user_agent: str = "*", round_col: int = 0):
    """(host, body) rows → schemas.ROBOTS rows (one per host).

    One Arrow-batched Python stage; undecodable bodies yield
    empty-rule rows (permissive, like a fetch failure would be)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                try:
                    text = (
                        bytes(body).decode("utf-8", "replace")
                        if not isinstance(body, str)
                        else body
                    )
                    rules = parse_robots_txt(text, user_agent)
                except Exception:
                    rules = {
                        "allow_prefixes": [],
                        "disallow_prefixes": [],
                        "crawl_delay_ms": None,
                    }
                rows.append(
                    {
                        "host": host,
                        "allow_prefixes": rules["allow_prefixes"],
                        "disallow_prefixes": rules["disallow_prefixes"],
                        "crawl_delay_ms": rules["crawl_delay_ms"],
                        "fetched_round": round_col,
                    }
                )
            yield pd.DataFrame(rows, columns=schemas.ROBOTS.names)

    return df.select(host_col, body_col).mapInPandas(gen, schemas.ROBOTS)
