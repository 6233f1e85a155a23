"""Count-min sketch (operators/sketches.py): one-sided error,
exactness without collisions, mergeability, bounded state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.sketches import (
    count_min_build,
    count_min_estimate,
    count_min_merge,
)


@pytest.fixture(scope="module")
def items(spark):
    # key i appears i+1 times, 30 keys, 465 rows
    rows = [(k,) for k in range(30) for _ in range(k + 1)]
    return spark.createDataFrame(rows, "key long")


def _exact(items):
    return {
        r["key"]: r["n"]
        for r in items.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_one_sided_error_and_wide_exactness(spark, items):
    """est >= true always; with width >> distinct keys the estimates
    are exact (no collisions at width 4096 over 30 keys, depth 3,
    for this fixed hash family)."""
    exact = _exact(items)
    counters = count_min_build(items, "key", width=4096, depth=3)
    est = {
        r["key"]: r["est"]
        for r in count_min_estimate(counters, items, "key", 4096, 3).collect()
    }
    assert est == exact  # wide sketch: exact
    # narrow sketch: only the one-sided guarantee holds
    narrow = count_min_build(items, "key", width=8, depth=2)
    est_n = {
        r["key"]: r["est"]
        for r in count_min_estimate(narrow, items, "key", 8, 2).collect()
    }
    assert all(est_n[k] >= exact[k] for k in exact)
    assert sum(est_n.values()) > sum(exact.values())  # collisions happened


def test_bounded_state(spark, items):
    counters = count_min_build(items, "key", width=16, depth=3)
    assert counters.count() <= 16 * 3
    # total mass per row equals the stream length
    per_row = counters.groupBy("row").agg(F.sum("c").alias("m")).collect()
    n = items.count()
    assert all(r["m"] == n for r in per_row)


def test_merge_equals_build_on_union(spark, items):
    a = items.filter(F.col("key") < 15)
    b = items.filter(F.col("key") >= 15)
    merged = count_min_merge(
        count_min_build(a, "key", 64, 3), count_min_build(b, "key", 64, 3)
    )
    direct = count_min_build(items, "key", 64, 3)
    ma = {(r["row"], r["bucket"]): r["c"] for r in merged.collect()}
    mb = {(r["row"], r["bucket"]): r["c"] for r in direct.collect()}
    assert ma == mb


def test_unknown_key_estimates_small(spark, items):
    """A key never inserted estimates 0 (or a small collision count),
    never negative."""
    counters = count_min_build(items, "key", width=4096, depth=3)
    q = spark.createDataFrame([(999999,)], "key long")
    est = count_min_estimate(counters, q, "key", 4096, 3).collect()
    assert len(est) == 1 and 0 <= est[0]["est"] <= 5
