"""Arrow-vectorized Spark UDF wrappers for the extraction kernels.

All kernels run as pandas UDFs (Arrow batch transfer — the
input_hint mandates no per-row Python UDFs). The fat ``html`` column
is selected as late as possible by callers and batch sizes are kept
small (session.py) so batches of near-20MB pages fit in memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import schemas
from ..functions.sniff import detect_content_type, detect_series
from ..functions.urlnorm import canonicalize_series, host_series
from .kernels import extract_links, visible_text


@pandas_udf(T.ArrayType(schemas.EXTRACTED_LINK))
def extract_links_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    """Kernel U1: page → array<struct<dest_url, keywords>> (nested form).

    NOTE: Arrow conversion of nested list<struct<..list<struct>>>
    results is ~7x slower than the kernel itself; the round driver
    uses extract_links_flat below (all-scalar columns) instead. This
    nested form is kept for ad-hoc/API use."""
    return pd.Series(
        [
            extract_links(u, h) if (h is not None and u is not None) else []
            for u, h in zip(url, html)
        ]
    )


def extract_links_flat(
    df, url_col: str = "url_norm", html_col: str = "html", sniff_gate: bool = False
):
    """Kernel U1, flat form: one output row per (link, keyword).

    Emits all-scalar columns so Arrow transfer is fully vectorized
    (no python-loop struct building). Links with zero keywords emit
    one row with null kw_idx/visibility/text. All non-html input
    columns are carried through unchanged.

    Downstream (shuffle-free) projections:
      links    = flat.filter(kw_idx.isNull() | (kw_idx == 0))
      keywords = flat.filter(kw_idx.isNotNull())

    sniff_gate=True applies the html-only gate (P5: sniffed
    text/html*, html.go:162-167) INSIDE this kernel. Chaining a
    separate pandas-UDF sniff filter in front of mapInPandas forces a
    second JVM↔Python Arrow hop over the fat html column — measured
    ~7x slower than gating in-kernel.
    """
    carry = [f for f in df.schema.fields if f.name not in (html_col,)]
    out_schema = T.StructType(
        list(carry)
        + [
            T.StructField("pos", T.IntegerType(), False),
            T.StructField("dest_url", T.StringType(), False),
            T.StructField("kw_idx", T.IntegerType(), True),
            T.StructField("visibility", T.IntegerType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    carry_names = [f.name for f in carry]
    out_names = [f.name for f in out_schema.fields]

    # Emission is take-based (r6): the per-output-row python work is
    # ONE index append plus the five link fields; the carried input
    # columns are attached afterwards with one vectorized numpy
    # fancy-index per column instead of len(carry) list appends per
    # output row (~30x fan-out per page makes those appends a
    # measurable slice of the kernel wall).
    def gen(batches):
        for pdf in batches:
            urls = pdf[url_col].tolist()
            htmls = pdf[html_col].tolist()
            idx: list[int] = []
            poss: list[int] = []
            dests: list[str] = []
            kwis: list[int | None] = []
            viss: list[int | None] = []
            texts: list[str | None] = []
            for i, (u, h) in enumerate(zip(urls, htmls)):
                if h is None or u is None:
                    continue
                if sniff_gate and not detect_content_type(h).startswith("text/html"):
                    continue
                for pos, lnk in enumerate(extract_links(u, h)):
                    dest = lnk["dest_url"]
                    kws = lnk["keywords"] or [None]
                    for ki, kw in enumerate(kws):
                        idx.append(i)
                        poss.append(pos)
                        dests.append(dest)
                        if kw is None:
                            kwis.append(None)
                            viss.append(None)
                            texts.append(None)
                        else:
                            kwis.append(ki)
                            viss.append(kw["visibility"])
                            texts.append(kw["text"])
            take = np.asarray(idx, dtype=np.intp)
            cols = {n: pdf[n].to_numpy()[take] for n in carry_names}
            cols.update(
                pos=poss, dest_url=dests, kw_idx=kwis,
                visibility=viss, text=texts,
            )
            yield pd.DataFrame(cols, columns=out_names)

    return df.mapInPandas(gen, out_schema)


def extract_with_meta(df, url_col: str = "url_norm", html_col: str = "html",
                      gate_col: str = "gate"):
    """U1 + the per-page meta columns (U4 sniff, F8/F9 digests, P3
    size) in ONE pass over the fat rows (r6).

    The round driver previously paid two full corpus scans per round
    for these: one JVM scan computing sniff/sha1/sha512/size (the
    ``meta`` frame) and one Python scan running link extraction —
    ~13-19s of decode CPU per scan at bench scale. This kernel emits
    BOTH from a single scan: for every input row one ``kind=0`` meta
    row (content_type, sha1, sha512, size — hashlib digests and the
    Python sniff are byte-identical to the JVM ``unhex(sha1(html))``
    / ``unhex(sha2(html,512))`` / ``sniff_col`` expressions, parity
    pinned by tests), and for rows passing the html gate (P5 sniff —
    computed once and reused — plus P6's case-sensitive suffix skip)
    the U1 flat link/keyword rows (``kind=1``) with the exact
    extract_links_flat semantics. All non-html input columns are
    carried through on every output row.
    """
    import hashlib

    carry = [f for f in df.schema.fields if f.name not in (html_col,)]
    out_schema = T.StructType(
        list(carry)
        + [
            T.StructField("kind", T.IntegerType(), False),
            T.StructField("content_type", T.StringType(), True),
            T.StructField("sha1", T.BinaryType(), True),
            T.StructField("sha512", T.BinaryType(), True),
            T.StructField("size", T.IntegerType(), True),
            T.StructField("pos", T.IntegerType(), True),
            T.StructField("dest_url", T.StringType(), True),
            T.StructField("kw_idx", T.IntegerType(), True),
            T.StructField("visibility", T.IntegerType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    carry_names = [f.name for f in carry]
    out_names = [f.name for f in out_schema.fields]
    meta_cols = ("content_type", "sha1", "sha512", "size")
    link_cols = ("pos", "dest_url", "kw_idx", "visibility", "text")

    # Take-based emission (r6, same construction as extract_links_flat
    # above): the kind=0 meta rows and kind=1 link rows are built as
    # two separate column blocks — per output row only the block's own
    # fields are appended in python, the carried input columns are
    # attached with one vectorized numpy fancy-index per column, and
    # the opposite block's fields are nulled wholesale. Downstream
    # consumers filter on ``kind``, so block order (all meta rows of a
    # batch, then its link rows) is irrelevant.
    def gen(batches):
        for pdf in batches:
            urls = pdf[url_col].tolist()
            htmls = pdf[html_col].tolist()
            gates = pdf[gate_col].tolist() if gate_col in pdf else ["ok"] * len(urls)

            m_idx: list[int] = []
            m_ct: list[str] = []
            m_sha1: list[bytes] = []
            m_sha512: list[bytes] = []
            m_size: list[int] = []
            l_idx: list[int] = []
            l_pos: list[int] = []
            l_dest: list[str] = []
            l_kwi: list[int | None] = []
            l_vis: list[int | None] = []
            l_text: list[str | None] = []

            for i, (u, h) in enumerate(zip(urls, htmls)):
                if h is None or u is None:
                    continue
                ct = detect_content_type(h)
                m_idx.append(i)
                m_ct.append(ct)
                m_sha1.append(hashlib.sha1(h).digest())
                m_sha512.append(hashlib.sha512(h).digest())
                m_size.append(len(h))
                if (
                    gates[i] != "ok"
                    or u.endswith((".jpeg", ".png", ".jpg"))
                    or not ct.startswith("text/html")
                ):
                    continue
                for pos, lnk in enumerate(extract_links(u, h)):
                    dest = lnk["dest_url"]
                    kws = lnk["keywords"] or [None]
                    for ki, kw in enumerate(kws):
                        l_idx.append(i)
                        l_pos.append(pos)
                        l_dest.append(dest)
                        if kw is None:
                            l_kwi.append(None)
                            l_vis.append(None)
                            l_text.append(None)
                        else:
                            l_kwi.append(ki)
                            l_vis.append(kw["visibility"])
                            l_text.append(kw["text"])

            carry_np = {n: pdf[n].to_numpy() for n in carry_names}
            if m_idx:
                take = np.asarray(m_idx, dtype=np.intp)
                cols = {n: carry_np[n][take] for n in carry_names}
                cols.update(
                    kind=0, content_type=m_ct, sha1=m_sha1,
                    sha512=m_sha512, size=m_size,
                )
                cols.update({n: None for n in link_cols})
                yield pd.DataFrame(cols, columns=out_names)
            if l_idx:
                take = np.asarray(l_idx, dtype=np.intp)
                cols = {n: carry_np[n][take] for n in carry_names}
                cols["kind"] = 1
                cols.update({n: None for n in meta_cols})
                cols.update(
                    pos=l_pos, dest_url=l_dest, kw_idx=l_kwi,
                    visibility=l_vis, text=l_text,
                )
                yield pd.DataFrame(cols, columns=out_names)

    return df.mapInPandas(gen, out_schema)


@pandas_udf(T.StringType())
def visible_text_udf(html: pd.Series) -> pd.Series:
    """Kernel U2: page html → byte-identical visible text."""
    return pd.Series([visible_text(h) if h is not None else "" for h in html])


@pandas_udf(T.StringType())
def sniff_udf(html: pd.Series) -> pd.Series:
    """Kernel U4: WHATWG content-type sniff of the first 512 bytes."""
    return detect_series(html)


@pandas_udf(T.StringType())
def canonicalize_udf(url: pd.Series) -> pd.Series:
    """Kernel U3: Go url.Parse→String round-trip canonical form."""
    return canonicalize_series(url)


@pandas_udf(T.StringType())
def host_udf(url: pd.Series) -> pd.Series:
    """Go url.Hostname() (port stripped)."""
    return host_series(url)


def with_url_identity(df, url_col: str = "url_norm"):
    """Standard derived columns: url_hash (engine-wide surrogate id)."""
    return df.withColumn("url_hash", F.xxhash64(F.col(url_col)))
