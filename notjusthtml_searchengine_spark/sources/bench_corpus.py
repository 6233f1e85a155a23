"""Streaming, multiprocess generator for the benchmark corpus.

Same deterministic page machinery as sources/corpus.py but sized for
throughput benchmarking: realistic-weight pages (tens of KB, dozens
of links — Common-Crawl-like extraction cost), no golden sidecars,
page rendering fanned out over a process pool, chunked parquet
row-group writes. Fully deterministic: page i is rendered from
Random(seed * 1_000_003 + i) regardless of worker scheduling.

The corpus is cached on disk keyed by its parameters; bench.py reuses
it across parallelism levels so both runs see identical input.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from .corpus import FLAGGED_WORDS, El, golden_text, render

_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_FILLER = [
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua ",
    "web scale crawling requires careful frontier management and polite "
    "per host scheduling with robots compliance at all times ",
    "the quick brown fox jumps over the lazy dog again and again while "
    "the indexer keeps extracting keywords from heading nodes ",
]

# worker globals (set once per process via initializer)
_G: dict = {}


def _init_worker(params: dict, urls: list[str]) -> None:
    _G["params"] = params
    _G["urls"] = urls


def _render_page(i: int) -> tuple[str, bytes, str]:
    p = _G["params"]
    urls = _G["urls"]
    rng = random.Random(p["seed"] * 1_000_003 + i)
    n_pages = p["n_pages"]
    flagged_cycle = [w for w, _ in FLAGGED_WORDS[:2]]  # spark / crawl → promote
    children: list = [El("h1", children=[f"Bench page {i}"])]
    for j in range(p["links_per_page"]):
        t = rng.randrange(n_pages)
        if j % 3 != 2:  # 2/3 of links promote (rating > 20)
            word = flagged_cycle[(i + j) % 2]
            anchor = [El("h2", children=[f"hot {word} item {t} from page {i}"])]
        else:
            anchor = [f"cold data note {t}"]
        children.append(El("a", [("href", urls[t])], anchor))
        if j < p["filler_blocks"]:
            children.append(
                El("p", children=[_FILLER[(i + j) % len(_FILLER)] * p["filler_repeat"]])
            )
    root = El("html", children=[El("body", children=children)])
    return urls[i], render(root).encode(), golden_text(root)


def generate_bench_corpus(
    out_dir: str,
    n_pages: int = 20000,
    seed: int = 42,
    links_per_page: int = 30,
    filler_blocks: int = 30,
    filler_repeat: int = 16,
    n_seeds: int = 4096,
    chunk: int = 2000,
    workers: int | None = None,
) -> dict:
    """Generate (or reuse cached) corpus; returns manifest dict."""
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "bench_manifest.json")
    params = {
        "n_pages": n_pages,
        "seed": seed,
        "links_per_page": links_per_page,
        "filler_blocks": filler_blocks,
        "filler_repeat": filler_repeat,
        "n_seeds": n_seeds,
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f)
        if old.get("params") == params:
            return old

    n_hosts = max(8, n_pages // 200)
    hosts = [f"host{h}.example" for h in range(n_hosts)]
    weights = [1.0 / (k + 1) for k in range(n_hosts)]
    base_ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    rng2 = random.Random(seed + 1)
    urls = [
        f"http://{rng2.choices(hosts, weights=weights, k=1)[0]}/p/{i}"
        for i in range(n_pages)
    ]

    # one file per chunk (directory-style table): many small files →
    # the scan parallelizes across all cores without byte-range
    # splitting contention on a single fat file
    pages_dir = os.path.join(out_dir, "pages.parquet")
    os.makedirs(pages_dir, exist_ok=True)
    for old in os.listdir(pages_dir):
        os.unlink(os.path.join(pages_dir, old))
    workers = workers or min(16, os.cpu_count() or 4)
    part = 0
    with mp.Pool(workers, initializer=_init_worker, initargs=(params, urls)) as pool:
        buf: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}

        def flush():
            nonlocal part, buf
            if buf["url"]:
                pq.write_table(
                    pa.table(buf, schema=_SCHEMA),
                    os.path.join(pages_dir, f"part-{part:05d}.parquet"),
                    row_group_size=1000,
                )
                part += 1
                buf = {k: [] for k in buf}

        for i, (url, html, text) in enumerate(
            pool.imap(_render_page, range(n_pages), chunksize=200)
        ):
            buf["url"].append(url)
            buf["warc_ts"].append(base_ts + timedelta(seconds=i))
            buf["html"].append(html)
            buf["text"].append(text)
            buf["lang"].append("en")
            if len(buf["url"]) >= chunk:
                flush()
        flush()

    with open(os.path.join(out_dir, "seeds.txt"), "w") as f:
        f.write("\n".join(urls[:n_seeds]) + "\n")
    with open(os.path.join(out_dir, "flaggedWords.csv"), "w") as f:
        for w, p in FLAGGED_WORDS:
            f.write(f"{w},{p}\n")
    robots = pa.table(
        {
            "host": [hosts[0]],
            "allow_prefixes": pa.array([[]], pa.list_(pa.string())),
            "disallow_prefixes": pa.array([["/blocked"]], pa.list_(pa.string())),
            "crawl_delay_ms": pa.array([0], pa.int32()),
            "fetched_round": pa.array([0], pa.int32()),
        }
    )
    pq.write_table(robots, os.path.join(out_dir, "robots.parquet"))

    manifest = {"params": params, "n_hosts": n_hosts, "dir": out_dir}
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    return manifest
