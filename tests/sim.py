"""Pure-Python reference simulator (SURVEY.md §5.2.3).

A ~150-LoC faithful model of the reference's crawl semantics
(crawling.go + html.go gates + the deterministic linearizations the
engine documents), driven by the corpus *goldens* (spec-derived links
and content types), NOT by the engine's kernels — so the end-to-end
test compares two independent implementations of the same semantics.

Replicated reference quirks:
  * TestOrAdd happens before the priority-0 drop (crawling.go:85-91):
    dropped candidates still enter the seen set;
  * seeds never enter the seen set (crawling.go:153-175): a
    rediscovered seed is re-enqueued and re-fetched once;
  * per-url max-priority collapse is the engine's deterministic
    linearization of the reference's first-TestOrAdd-wins race.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit

from notjusthtml_searchengine_spark.functions.xxh64 import xxhash64_str
from notjusthtml_searchengine_spark.sources.corpus import Corpus

MAX_FILESIZE = 20_000_000
FLAG_WEIGHT = 2


def link_rating(keywords: list[dict], flagged: list[tuple[str, int]]) -> float:
    rating = 0.0
    for kw in keywords:
        for word, prio in flagged:
            if word in kw["text"]:
                rating += float(kw["visibility"]) * float(FLAG_WEIGHT * prio)
    return rating


def link_priority(dest_url: str, rating: float) -> int:
    u = dest_url.lower()
    p = 90 if u.endswith((".png", ".jpg", ".jpeg")) else 0
    if rating > 20 and p < 90:
        p = 80
    return p


@dataclass
class SimResult:
    fetched_per_round: list[set[str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    contents: set[tuple[str, int]] = field(default_factory=set)
    link_rels: set[tuple[str, str, float]] = field(default_factory=set)
    errors: set[tuple[str, str]] = field(default_factory=set)  # (url, kind)


class Simulator:
    def __init__(
        self,
        corpus: Corpus,
        per_host_budget: int | None = None,
        round_budget: int | None = None,
        use_robots: bool = True,
    ):
        self.pages = {p["url"]: p for p in corpus.pages}
        self.golden = {g["url"]: g for g in corpus.golden}
        self.flagged = corpus.flagged
        self.robots = corpus.robots if use_robots else []
        self.per_host_budget = per_host_budget
        self.round_budget = round_budget
        self.seeds = list(corpus.seeds)

    @staticmethod
    def _host(url: str) -> str:
        return urlsplit(url).hostname or ""

    def _robots_blocked(self, url: str) -> bool:
        host, path = self._host(url), urlsplit(url).path
        for rule in self.robots:
            if rule["host"] == host:
                dis = any(path.startswith(p) for p in rule["disallow_prefixes"])
                allow = any(path.startswith(p) for p in rule["allow_prefixes"])
                return dis and not allow
        return False

    def _drain(self, frontier: dict[str, tuple[int, int]]) -> list[str]:
        items = sorted(
            frontier.items(), key=lambda kv: (-kv[1][0], xxhash64_str(kv[0]))
        )
        if self.per_host_budget is not None:
            by_host: dict[str, int] = {}
            capped = []
            for url, (prio, depth) in items:
                h = self._host(url)
                if by_host.get(h, 0) < self.per_host_budget:
                    by_host[h] = by_host.get(h, 0) + 1
                    capped.append((url, (prio, depth)))
            items = capped
        if self.round_budget is not None:
            items = items[: self.round_budget]
        return [u for u, _ in items]

    def run(self, max_rounds: int = 100) -> SimResult:
        res = SimResult()
        # frontier: url -> (priority, depth)
        frontier: dict[str, tuple[int, int]] = {u: (90, 0) for u in self.seeds}
        for r in range(1, max_rounds + 1):
            drained = self._drain(frontier)
            if not drained:
                break
            res.fetched_per_round.append(set(drained))
            candidates: dict[str, tuple[int, int]] = {}
            for url in drained:
                depth = frontier[url][1]
                del frontier[url]
                page = self.pages.get(url)
                if page is None:
                    res.errors.add((url, "miss"))
                    continue
                body = page["html"]
                if len(body) >= MAX_FILESIZE:
                    res.errors.add((url, "too_big"))
                    continue
                if len(body) == 0:
                    res.errors.add((url, "empty"))
                    continue
                res.contents.add((url, r))
                g = self.golden[url]
                ct = g["content_type"]
                if not ct.startswith("text/html") or url.endswith(
                    (".jpeg", ".png", ".jpg")
                ):
                    continue
                for lnk in g["links"]:
                    rating = link_rating(lnk["keywords"], self.flagged)
                    prio = link_priority(lnk["dest_url"], rating)
                    res.link_rels.add((url, lnk["dest_url"], rating))
                    d = lnk["dest_url"]
                    old = candidates.get(d)
                    if old is None or prio > old[0]:
                        candidates[d] = (prio, depth + 1)
            # robots → seen (TestOrAdd incl. priority-0) → enqueue
            for d, (prio, depth) in sorted(candidates.items()):
                if self._robots_blocked(d):
                    continue
                if d in res.seen:
                    continue
                res.seen.add(d)
                if prio > 0:
                    old = frontier.get(d)
                    if old is None or prio > old[0]:
                        frontier[d] = (prio, depth)
        return res
