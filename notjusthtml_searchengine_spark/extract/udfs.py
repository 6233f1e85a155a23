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
from ..functions.sniff import detect_series
from ..functions.urlnorm import canonicalize_series, host_series
from .kernels import extract_links, visible_text


@pandas_udf(T.ArrayType(schemas.EXTRACTED_LINK))
def extract_links_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    """Kernel U1: page → array<struct<dest_url, keywords>>."""
    return pd.Series(
        [
            extract_links(u, h) if (h is not None and u is not None) else []
            for u, h in zip(url, html)
        ]
    )


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
