"""Custom stateful streaming operator (applyInPandasWithState).

Streaming first-seen URL dedup: on a live page feed, emit each URL
the FIRST time it is seen within its host group and suppress repeats
across micro-batches — the streaming counterpart of the batch
engine's seen anti-join (J2), holding per-host state in the state
store. This is the in-flight dedup layer of a streaming ingest
deployment; the authoritative 10^10-row seen set stays in the
bucketed batch tables (state stores are not built for that scale),
so state is bounded with an optional per-host cap + processing-time
timeout eviction.

State layout: one row per host — an array of xxhash64(url) values
(64-bit identity, same scheme as the batch seen set). Arrow-batched
both ways; no per-row Python UDFs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.xxh64 import xxhash64_str

OUT = T.StructType(
    [
        T.StructField("host", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("first_ts", T.TimestampType(), True),
    ]
)

STATE = T.StructType([T.StructField("hashes", T.ArrayType(T.LongType()), True)])


def stream_first_seen(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    max_state_per_host: int = 1_000_000,
    timeout_ms: int | None = None,
) -> DataFrame:
    """pages stream (with a host column) → first-seen rows only."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen: set[int] = set(state.get[0]) if state.exists else set()
        # Bounded state: past the cap, NEW urls are still EMITTED (never
        # silently dropped — downstream batch J2 dedups any resulting
        # repeats), they just stop being remembered. overflow_local
        # keeps this call's emissions duplicate-free without growing
        # the persisted state.
        overflow_local: set[int] = set()
        host = key[0]
        for pdf in pdfs:
            urls, tss = [], []
            for url, ts in zip(pdf[url_col], pdf[ts_col]):
                h = xxhash64_str(url)
                if h in seen or h in overflow_local:
                    continue
                if len(seen) < max_state_per_host:
                    seen.add(h)
                else:
                    overflow_local.add(h)
                urls.append(url)
                tss.append(ts)
            if urls:
                yield pd.DataFrame({"host": host, "url": urls, "first_ts": tss})
        state.update((list(seen),))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return pages.groupBy(host_col).applyInPandasWithState(
        fn, OUT, STATE, "append", timeout
    )
