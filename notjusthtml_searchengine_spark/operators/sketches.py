"""Mergeable frequency sketches (count-min) as pure Catalyst plans.

At 100 TB "how often does each host/url/token occur" cannot always
afford an exact groupBy over 10^10 distinct keys; a count-min sketch
(Cormode & Muthukrishnan, J.Alg 2005) bounds the state at
depth × width counters with a one-sided error guarantee
(est ≥ true; est ≤ true + εN with prob 1-δ for width=e/ε,
depth=ln(1/δ)).

Spark-first shape: the sketch IS a groupBy — counters are the rows of
``groupBy(row, bucket).count``, so building it is one map-side-
combined shuffle of at most depth×width groups (bounded regardless of
key cardinality), it is mergeable across partitions/streams by
construction (sum counters), and estimation is a broadcast join of
the query keys against the counter table. Hash functions are the
engine's portable md5-based hashes, so the WHOLE sketch — counters
and estimates — is deterministically reproducible in DuckDB and
hash-checked by the oracle, not just property-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import portable_hash64


def _bucket(item: Column, row: int, width: int) -> Column:
    return F.pmod(
        portable_hash64(F.concat(F.lit(f"{row}:"), item.cast("string"))),
        F.lit(width),
    )


def count_min_build(
    items: DataFrame, item_col: str, width: int, depth: int
) -> DataFrame:
    """items → counter table (row, bucket, c). At most depth×width
    groups regardless of key cardinality; one shuffle with map-side
    combine. Merging two sketches = union + re-sum (tested)."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(F.col(item_col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("p")
    return (
        items.select(F.col(item_col))
        .select(pairs)
        .select(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def count_min_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two counter tables built with the same (width, depth)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def count_min_estimate(
    counters: DataFrame, queries: DataFrame, key_col: str, width: int, depth: int
) -> DataFrame:
    """Estimate each query key's frequency: min over rows of its
    bucket counter (missing bucket = 0). Returns (key_col, est)."""
    probes = queries.select(F.col(key_col)).distinct()
    probes = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
