"""Arrow-vectorized Spark UDF wrappers for the extraction kernels.

All kernels run as pandas UDFs (Arrow batch transfer — the
input_hint mandates no per-row Python UDFs). The fat ``html`` column
is selected as late as possible by callers and batch sizes are kept
small (session.py) so batches of near-20MB pages fit in memory.
"""

from __future__ import annotations

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

    def gen(batches):
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in out_names}
            urls = pdf[url_col].tolist()
            htmls = pdf[html_col].tolist()
            carries = {n: pdf[n].tolist() for n in carry_names}
            for i, (u, h) in enumerate(zip(urls, htmls)):
                if h is None or u is None:
                    continue
                if sniff_gate and not detect_content_type(h).startswith("text/html"):
                    continue
                for pos, lnk in enumerate(extract_links(u, h)):
                    kws = lnk["keywords"] or [None]
                    for ki, kw in enumerate(kws):
                        for n in carry_names:
                            cols[n].append(carries[n][i])
                        cols["pos"].append(pos)
                        cols["dest_url"].append(lnk["dest_url"])
                        if kw is None:
                            cols["kw_idx"].append(None)
                            cols["visibility"].append(None)
                            cols["text"].append(None)
                        else:
                            cols["kw_idx"].append(ki)
                            cols["visibility"].append(kw["visibility"])
                            cols["text"].append(kw["text"])
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
    link_nones = {"pos": None, "dest_url": None, "kw_idx": None,
                  "visibility": None, "text": None}

    def gen(batches):
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in out_names}
            urls = pdf[url_col].tolist()
            htmls = pdf[html_col].tolist()
            gates = pdf[gate_col].tolist() if gate_col in pdf else ["ok"] * len(urls)
            carries = {n: pdf[n].tolist() for n in carry_names}

            def put_carry(i):
                for n in carry_names:
                    cols[n].append(carries[n][i])

            for i, (u, h) in enumerate(zip(urls, htmls)):
                if h is None or u is None:
                    continue
                ct = detect_content_type(h)
                put_carry(i)
                cols["kind"].append(0)
                cols["content_type"].append(ct)
                cols["sha1"].append(hashlib.sha1(h).digest())
                cols["sha512"].append(hashlib.sha512(h).digest())
                cols["size"].append(len(h))
                for n, v in link_nones.items():
                    cols[n].append(v)
                if (
                    gates[i] != "ok"
                    or u.endswith((".jpeg", ".png", ".jpg"))
                    or not ct.startswith("text/html")
                ):
                    continue
                for pos, lnk in enumerate(extract_links(u, h)):
                    kws = lnk["keywords"] or [None]
                    for ki, kw in enumerate(kws):
                        put_carry(i)
                        cols["kind"].append(1)
                        cols["content_type"].append(None)
                        cols["sha1"].append(None)
                        cols["sha512"].append(None)
                        cols["size"].append(None)
                        cols["pos"].append(pos)
                        cols["dest_url"].append(lnk["dest_url"])
                        if kw is None:
                            cols["kw_idx"].append(None)
                            cols["visibility"].append(None)
                            cols["text"].append(None)
                        else:
                            cols["kw_idx"].append(ki)
                            cols["visibility"].append(kw["visibility"])
                            cols["text"].append(kw["text"])
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
