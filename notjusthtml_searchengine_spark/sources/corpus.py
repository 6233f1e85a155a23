"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates the engine's input table ``pages(url, warc_ts, html, text,
lang)`` with a *known* link graph, plus golden sidecars, a seed list,
flagged words, and robots rules — all seeded, no external data.

The golden ``text``/``links`` columns are computed from the
structural page spec (the element tree the generator composed), NOT
by running the extraction kernels on the rendered HTML — so kernel
tests assert the parser+kernel path against an independent oracle.

Graph design (exercises every reference path):
  * hosts are Zipf-distributed → hot-domain skew for W2/salting;
  * anchor links with flagged-word keywords under h1..h3 produce
    rating > 20 → priority 80 (crawling.go:51-53) — the only way
    HTML pages propagate the crawl;
  * <img src> links to .png/.jpg → priority 90 (crawling.go:18-27);
  * plain anchors rate ≤ 20 → priority 0 → dropped but still
    entered into the seen set (crawling.go:85-91 order quirk);
  * one node carries both href and src (two links emitted);
  * relative hrefs resolved against the page URL;
  * special bodies: ≥20MB (size gate), zero-length, text/plain,
    binary, robots-blocked targets, dangling (missing) targets.
"""

from __future__ import annotations

import hashlib
import random
import struct
import zlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.textclean import go_clean
from ..functions.urlnorm import resolve

_HEADING_MULT = {"h1": 10, "h2": 9, "h3": 8, "h4": 7, "h5": 6, "h6": 5, "h7": 4}

MESSY_TEXTS = [
    "  plain\ttext with\nnewlines  ",
    "unicode éü中文 ok",
    "zero​width and nbsp here",
    "control\x01chars\x7fdropped",
    "tabs\t\tand   spaces",
    "ümlaut Ärger größe",
]

LANGS = ["en", "de", "fr", "es", "ja"]


@dataclass
class El:
    tag: str
    attrs: list[tuple[str, str]] = field(default_factory=list)
    children: list = field(default_factory=list)  # El | str


def _escape(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render(node) -> str:
    if isinstance(node, str):
        return _escape(node)
    attrs = "".join(f' {k}="{_escape(v)}"' for k, v in node.attrs)
    inner = "".join(render(c) for c in node.children)
    if node.tag in ("img", "br", "meta", "link"):
        return f"<{node.tag}{attrs}/>"
    return f"<{node.tag}{attrs}>{inner}</{node.tag}>"


def _spec_keywords(node, multiplier: int = 1) -> list[tuple[int, str]]:
    """extractKeywords semantics over the spec tree (golden oracle)."""
    if isinstance(node, str):
        # spec text == one text node; raw-nonempty check, cleaned text
        return [(multiplier, go_clean(node))] if node != "" else []
    multiplier = _HEADING_MULT.get(node.tag, multiplier)
    out: list[tuple[int, str]] = []
    for c in node.children:
        out.extend(_spec_keywords(c, multiplier))
    return out


def _spec_text_nodes(node) -> list[str]:
    if isinstance(node, str):
        return [node] if node != "" else []
    out = []
    for c in node.children:
        out.extend(_spec_text_nodes(c))
    return out


def _spec_links(page_url: str, node) -> list[dict]:
    """getAllLinks semantics over the spec tree (golden oracle)."""
    out: list[dict] = []
    if isinstance(node, El):
        kws = None
        for k, v in node.attrs:
            if k in ("href", "src"):
                dest = resolve(page_url, v)
                if dest is None:
                    break
                if kws is None:
                    kws = [
                        {"visibility": vis, "text": txt}
                        for vis, txt in _spec_keywords(node, 1)
                    ]
                out.append({"dest_url": dest, "keywords": kws})
        for c in node.children:
            out.extend(_spec_links(page_url, c))
    return out


def golden_text(root: El) -> str:
    parts = []
    for raw in _spec_text_nodes(root):
        cleaned = go_clean(raw)
        if cleaned:
            parts.append(cleaned)
    return " ".join(parts)


# ---------------------------------------------------------------------------
# Minimal real PNG encoder (pure stdlib) so perceptual-hash kernels run on
# genuine PNG bytes. 8-bit RGB, no interlace, filter 0.
# ---------------------------------------------------------------------------
def encode_png(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    h = len(pixels)
    w = len(pixels[0])

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + b"".join(bytes(px) for px in row) for row in pixels
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# Real baseline JPEG: SOI + APP1(EXIF TIFF) + encoded 48x32 image
# (sources/jpegenc.py — from-scratch T.81 encoder). Carries real EXIF
# metadata for kernel U6, sniffs as image/jpeg (\xff\xd8\xff), and
# DECODES for kernel U5 (media/jpeg.py), like the reference's JPEGs do
# through Go image.Decode (perceptualHashing.go:33-49).
# corrupt=True emits the old junk-scan container instead — the
# decode-failure path (ErrorPerceptualHash) stays exercised.
def encode_jpeg_with_exif(
    camera: str | None,
    dt: str | None,
    lat: float | None,
    lon: float | None,
    seed: int = 0,
    corrupt: bool = False,
) -> bytes:
    entries = []

    def rational(v: float, den: int = 10000) -> bytes:
        return struct.pack(">II", int(round(v * den)), den)

    tiff_body = b""
    next_off = [0]

    def add_entry(tag: int, typ: int, count: int, value: bytes):
        entries.append((tag, typ, count, value))

    # Build a single IFD0 with Model(0x0110), DateTime(0x0132) and inline
    # GPS tags in a GPS sub-IFD (0x8825).
    extra = b""
    base = 8  # after TIFF header

    def build_ifd(ents: list[tuple[int, int, int, bytes]], ifd_off: int):
        nonlocal extra
        out = struct.pack(">H", len(ents))
        data_off = ifd_off + 2 + 12 * len(ents) + 4
        blob = b""
        for tag, typ, count, value in ents:
            if len(value) <= 4:
                val_field = value + b"\x00" * (4 - len(value))
            else:
                val_field = struct.pack(">I", data_off + len(blob))
                blob += value
            out += struct.pack(">HHI", tag, typ, count) + val_field
        out += struct.pack(">I", 0)  # next IFD
        return out + blob

    ifd0_entries = []
    if camera is not None:
        cam = camera.encode() + b"\x00"
        ifd0_entries.append((0x0110, 2, len(cam), cam))
    if dt is not None:
        dts = dt.encode() + b"\x00"
        ifd0_entries.append((0x0132, 2, len(dts), dts))

    gps_blob = b""
    if lat is not None and lon is not None:
        # GPS IFD placed after IFD0; compute IFD0 size first (with the
        # GPSInfo pointer entry included).
        ifd0_count = len(ifd0_entries) + 1
        # rough layout: IFD0 at 8; GPS IFD after IFD0 block
        def ifd_size(ents):
            return 2 + 12 * len(ents) + 4 + sum(
                len(v) for _, _, _, v in ents if len(v) > 4
            )

        gps_entries = [
            (0x0001, 2, 2, (b"N" if lat >= 0 else b"S") + b"\x00"),
            (
                0x0002,
                5,
                3,
                rational(abs(lat)) + rational(0, 1) + rational(0, 1),
            ),
            (0x0003, 2, 2, (b"E" if lon >= 0 else b"W") + b"\x00"),
            (
                0x0004,
                5,
                3,
                rational(abs(lon)) + rational(0, 1) + rational(0, 1),
            ),
        ]
        gps_off = 8 + ifd_size(ifd0_entries) + 12  # + GPSInfo entry
        ifd0_entries.append((0x8825, 4, 1, struct.pack(">I", gps_off)))
        ifd0 = build_ifd(ifd0_entries, 8)
        gps_ifd = build_ifd(gps_entries, gps_off)
        tiff = b"MM\x00\x2a" + struct.pack(">I", 8) + ifd0 + gps_ifd
    else:
        ifd0 = build_ifd(ifd0_entries, 8)
        tiff = b"MM\x00\x2a" + struct.pack(">I", 8) + ifd0

    exif_payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(exif_payload) + 2) + exif_payload
    if corrupt:
        return (
            b"\xff\xd8" + app1 + b"\xff\xdb" + b"\x00\x04\x00\x00"
            + b"junkscan" * 8 + b"\xff\xd9"
        )
    import numpy as np

    from .jpegenc import encode_baseline_jpeg

    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.dstack(
        [
            (xx * (3 + seed % 5) + yy * 2 + seed * 17) % 256,
            (yy * (2 + seed % 3) + seed * 29) % 256,
            ((xx + yy) * (1 + seed % 7) + seed * 41) % 256,
        ]
    ).astype(np.uint8)
    return encode_baseline_jpeg(img, quality=88, app1=app1)


# ---------------------------------------------------------------------------
# Corpus builder
# ---------------------------------------------------------------------------
FLAGGED_WORDS = [
    ("spark", 3),
    ("crawl", 2),
    ("index", 2),
    ("data", 1),
]


@dataclass
class Corpus:
    pages: list[dict]  # rows of the pages table
    golden: list[dict]  # rows of pages_golden
    seeds: list[str]
    flagged: list[tuple[str, int]]
    robots: list[dict]


def _page_url(host: str, i: int) -> str:
    return f"http://{host}/p/{i}"


def build_corpus(
    n_pages: int = 60,
    seed: int = 42,
    n_hosts: int | None = None,
    special_pages: bool = True,
) -> Corpus:
    """special_pages=False skips images/big/empty/binary bodies — a
    lean HTML-only corpus for extraction-kernel demo queries."""
    rng = random.Random(seed)
    n_hosts = n_hosts or max(4, n_pages // 25)
    hosts = [f"host{h}.example" for h in range(n_hosts)]
    # Zipf-ish host weights → hot-domain skew
    weights = [1.0 / (k + 1) for k in range(n_hosts)]

    def pick_host() -> str:
        return rng.choices(hosts, weights=weights, k=1)[0]

    page_host = {i: pick_host() for i in range(n_pages)}
    n_images = max(4, n_pages // 3)
    image_urls = []
    for j in range(n_images):
        host = rng.choice(hosts)
        ext = ".png" if j % 3 != 2 else ".jpg"
        image_urls.append(f"http://{host}/img/{j}{ext}")

    blocked_url = f"http://{hosts[0]}/blocked/secret"
    missing_url = f"http://{hosts[-1]}/missing/404"
    big_url = f"http://{hosts[0]}/big.html"
    empty_url = f"http://{hosts[0]}/empty.html"
    plain_url = f"http://{hosts[0]}/plain.txt"
    bin_url = f"http://{hosts[0]}/data.bin"

    base_ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    pages: list[dict] = []
    golden: list[dict] = []

    def flagged_anchor_children(i: int) -> list:
        """Anchor content whose rating exceeds 20 (promotes the link)."""
        word, prio = FLAGGED_WORDS[i % 2]  # spark(3) or crawl(2)
        lvl = ["h1", "h2", "h3"][i % 3]
        # rating = vis * 2 * prio; h1..h3 → vis 10..8; min 8*2*2=32 > 20
        return [El(lvl, children=[f"big {word} news {i}"])]

    def plain_anchor_children(i: int) -> list:
        # 'data' has priority 1; vis 1 → rating = 1*2*1 = 2 ≤ 20 → dropped
        return [f"minor data note {rng.randrange(1000)}"]

    for i in range(n_pages):
        url = _page_url(page_host[i], i)
        body_children: list = [
            El("h1", children=[f"Page {i} about {rng.choice(['spark', 'ducks', 'maps'])}"]),
            MESSY_TEXTS[i % len(MESSY_TEXTS)],
        ]
        # promoted links (crawl expansion)
        for _ in range(2):
            j = rng.randrange(n_pages)
            body_children.append(
                El("a", [("href", _page_url(page_host[j], j))], flagged_anchor_children(i))
            )
        # plain (dropped) links
        for _ in range(rng.randrange(1, 3)):
            j = rng.randrange(n_pages)
            body_children.append(
                El("a", [("href", _page_url(page_host[j], j))], plain_anchor_children(i))
            )
        # relative link (resolved against page url), promoted half the time
        rel_target = f"/p/{rng.randrange(n_pages)}"
        body_children.append(
            El(
                "a",
                [("href", rel_target[1:] if i % 2 else rel_target)],
                flagged_anchor_children(i + 1) if i % 2 else plain_anchor_children(i),
            )
        )
        # image links → priority 90
        for _ in range(1 + i % 2):
            body_children.append(El("img", [("src", rng.choice(image_urls))]))
        # quirks and special targets, sprinkled deterministically
        if i % 10 == 0:
            body_children.append(
                El("a", [("href", rng.choice(image_urls)), ("src", plain_url)], ["dual attr"])
            )
        if i % 7 == 0:
            body_children.append(El("a", [("href", blocked_url)], flagged_anchor_children(i)))
        if i % 11 == 0:
            body_children.append(El("a", [("href", missing_url)], flagged_anchor_children(i)))
        if i == 0:
            body_children.append(El("a", [("href", big_url)], flagged_anchor_children(0)))
            body_children.append(El("a", [("href", empty_url)], flagged_anchor_children(1)))
            body_children.append(El("a", [("href", bin_url)], flagged_anchor_children(2)))
            body_children.append(El("script", [("src", f"http://{hosts[0]}/app.js")]))
        root = El(
            "html",
            children=[
                El("head", children=[El("title", children=[f"t{i}"])]),
                El("body", children=body_children),
            ],
        )
        html_bytes = ("<!DOCTYPE html>" + render(root)).encode("utf-8")
        text = golden_text(root)
        links = _spec_links(url, root)
        pages.append(
            {
                "url": url,
                "warc_ts": base_ts + timedelta(seconds=i),
                "html": html_bytes,
                "text": text,
                "lang": LANGS[hosts.index(page_host[i]) % len(LANGS)],
            }
        )
        golden.append(
            {
                "url": url,
                "links": links,
                "content_type": "text/html; charset=utf-8",
                "sha1": hashlib.sha1(html_bytes).digest(),
                "sha512": hashlib.sha512(html_bytes).digest(),
            }
        )

    # ---- non-HTML bodies -------------------------------------------------
    def add_page(url: str, body: bytes, text: str = "", lang: str = "en", ct: str | None = None):
        pages.append(
            {
                "url": url,
                "warc_ts": base_ts + timedelta(days=1, seconds=len(pages)),
                "html": body,
                "text": text,
                "lang": lang,
            }
        )
        golden.append(
            {
                "url": url,
                "links": [],
                "content_type": ct or "application/octet-stream",
                "sha1": hashlib.sha1(body).digest(),
                "sha512": hashlib.sha512(body).digest(),
            }
        )

    if not special_pages:
        seeds = [_page_url(page_host[0], 0), _page_url(page_host[min(1, n_pages - 1)], min(1, n_pages - 1))]
        return Corpus(
            pages=pages, golden=golden, seeds=seeds, flagged=list(FLAGGED_WORDS), robots=[]
        )

    for j, iurl in enumerate(image_urls):
        if iurl.endswith(".png"):
            px = [
                [((x * 37 + y * 11 + j * 7) % 256, (x * 5 + j) % 256, (y * 3) % 256)
                 for x in range(16)]
                for y in range(16)
            ]
            add_page(iurl, encode_png(px), ct="image/png")
        else:
            body = encode_jpeg_with_exif(
                camera=f"Cam-{j}" if j % 2 else None,
                dt="2024:06:01 12:00:00" if j % 2 else None,
                lat=48.1 + j if j % 4 == 1 else None,
                lon=11.5 + j if j % 4 == 1 else None,
                seed=j,
                # keep a few undecodable JPEGs in every corpus so the
                # ErrorPerceptualHash path stays exercised end-to-end
                # (jpegs are the j % 3 == 2 urls; j=2,14,26,… corrupt)
                corrupt=(j % 12 == 2),
            )
            add_page(iurl, body, ct="image/jpeg")

    add_page(big_url, b"<html><body>" + b"x" * 20_000_001, ct="text/html; charset=utf-8")
    add_page(empty_url, b"", ct="text/plain; charset=utf-8")
    add_page(plain_url, "just plain text, no tags — spark data".encode(), ct="text/plain; charset=utf-8")
    add_page(bin_url, bytes(range(32)) * 8, ct="application/octet-stream")
    blocked_root = El(
        "html", children=[El("body", children=[El("h1", children=["robots should have blocked this"])])]
    )
    add_page(
        blocked_url,
        render(blocked_root).encode(),
        text=golden_text(blocked_root),
        ct="text/html; charset=utf-8",
    )
    # NOTE: missing_url gets NO page row → fetch-miss error path.

    seeds = [_page_url(page_host[0], 0), _page_url(page_host[min(1, n_pages - 1)], min(1, n_pages - 1))]
    robots = [
        {
            "host": hosts[0],
            "allow_prefixes": [],
            "disallow_prefixes": ["/blocked"],
            "crawl_delay_ms": 0,
            "fetched_round": 0,
        }
    ]
    return Corpus(pages=pages, golden=golden, seeds=seeds, flagged=list(FLAGGED_WORDS), robots=robots)


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------
def write_corpus(corpus: Corpus, out_dir: str) -> dict[str, str]:
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    pages_tbl = pa.table(
        {
            "url": [p["url"] for p in corpus.pages],
            "warc_ts": pa.array([p["warc_ts"] for p in corpus.pages], pa.timestamp("us", tz="UTC")),
            "html": pa.array([p["html"] for p in corpus.pages], pa.binary()),
            "text": [p["text"] for p in corpus.pages],
            "lang": [p["lang"] for p in corpus.pages],
        }
    )
    paths["pages"] = os.path.join(out_dir, "pages.parquet")
    pq.write_table(pages_tbl, paths["pages"])

    kw_t = pa.struct([("visibility", pa.int32()), ("text", pa.string())])
    link_t = pa.struct([("dest_url", pa.string()), ("keywords", pa.list_(kw_t))])
    golden_tbl = pa.table(
        {
            "url": [g["url"] for g in corpus.golden],
            "links": pa.array([g["links"] for g in corpus.golden], pa.list_(link_t)),
            "content_type": [g["content_type"] for g in corpus.golden],
            "sha1": pa.array([g["sha1"] for g in corpus.golden], pa.binary()),
            "sha512": pa.array([g["sha512"] for g in corpus.golden], pa.binary()),
        }
    )
    paths["pages_golden"] = os.path.join(out_dir, "pages_golden.parquet")
    pq.write_table(golden_tbl, paths["pages_golden"])

    paths["seeds"] = os.path.join(out_dir, "seeds.txt")
    with open(paths["seeds"], "w") as f:
        f.write("\n".join(corpus.seeds) + "\n")

    paths["flagged_words"] = os.path.join(out_dir, "flaggedWords.csv")
    with open(paths["flagged_words"], "w") as f:
        for w, p in corpus.flagged:
            f.write(f"{w},{p}\n")

    robots_tbl = pa.table(
        {
            "host": [r["host"] for r in corpus.robots],
            "allow_prefixes": pa.array([r["allow_prefixes"] for r in corpus.robots], pa.list_(pa.string())),
            "disallow_prefixes": pa.array([r["disallow_prefixes"] for r in corpus.robots], pa.list_(pa.string())),
            "crawl_delay_ms": pa.array([r["crawl_delay_ms"] for r in corpus.robots], pa.int32()),
            "fetched_round": pa.array([r["fetched_round"] for r in corpus.robots], pa.int32()),
        }
    )
    paths["robots"] = os.path.join(out_dir, "robots.parquet")
    pq.write_table(robots_tbl, paths["robots"])
    return paths
