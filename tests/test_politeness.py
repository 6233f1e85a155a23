"""Politeness drain: per-host caps, robots crawl_delay enforcement,
priority-bucket-major order with deterministic tie-break (W1/W2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark import schemas
from notjusthtml_searchengine_spark.functions.xxh64 import xxhash64_str
from notjusthtml_searchengine_spark.operators.crawl_ops import (
    crawl_delay_caps,
    drain_frontier,
)


@pytest.fixture(scope="module")
def frontier(spark):
    rows = []
    for h, host in enumerate(["slow.example", "fast.example", "plain.example"]):
        for i in range(10):
            url = f"http://{host}/p/{i}"
            rows.append((url, host, 90 if i < 5 else 80, 1, 0, xxhash64_str(url)))
    return spark.createDataFrame(rows, schemas.FRONTIER)


def _robots(spark):
    return spark.createDataFrame(
        [
            ("slow.example", [], [], 5000, 0),  # 1 fetch / 5s
            ("fast.example", [], [], 100, 0),  # 10 fetches / s
        ],
        schemas.ROBOTS,
    )


def test_per_host_budget(frontier):
    batch = drain_frontier(frontier, round_budget=None, per_host_budget=4)
    counts = {r["host"]: r["n"] for r in batch.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts == {"slow.example": 4, "fast.example": 4, "plain.example": 4}


def test_crawl_delay_caps_derivation(spark):
    caps = {r["host"]: r["host_cap"] for r in crawl_delay_caps(_robots(spark), round_seconds=10.0).collect()}
    assert caps == {"slow.example": 2, "fast.example": 100}


def test_drain_respects_crawl_delay(spark, frontier):
    caps = crawl_delay_caps(_robots(spark), round_seconds=10.0)
    batch = drain_frontier(frontier, round_budget=None, per_host_budget=6, host_caps=caps)
    counts = {r["host"]: r["n"] for r in batch.groupBy("host").agg(F.count("*").alias("n")).collect()}
    # slow: min(2, 6) = 2; fast: min(100, 6) = 6; plain: default 6
    assert counts == {"slow.example": 2, "fast.example": 6, "plain.example": 6}


def test_drain_priority_bucket_major_with_hash_tiebreak(spark, frontier):
    caps = crawl_delay_caps(_robots(spark), round_seconds=10.0)
    batch = drain_frontier(frontier, round_budget=None, per_host_budget=3, host_caps=caps).collect()
    by_host = {}
    for r in batch:
        by_host.setdefault(r["host"], []).append(r)
    slow = by_host["slow.example"]
    assert len(slow) == 2
    # both selected rows must be from the higher priority bucket (90),
    # lowest url_hash first within the bucket
    assert all(r["priority"] == 90 for r in slow)
    p90 = sorted(
        (xxhash64_str(f"http://slow.example/p/{i}"), i) for i in range(5)
    )
    expect_urls = {f"http://slow.example/p/{i}" for _, i in p90[:2]}
    assert {r["url_norm"] for r in slow} == expect_urls


def test_global_round_budget(frontier):
    batch = drain_frontier(frontier, round_budget=7, per_host_budget=None)
    rows = batch.collect()
    assert len(rows) == 7
    assert all(r["priority"] == 90 for r in rows)  # bucket-major


def test_drain_two_phase_host_cap_plan(spark, frontier):
    """Zipf-head skew safety (mirrors the stratified_cap two-phase
    contract): the FIRST window in the drain partitions by
    (host, _salt) so the head host's candidates fan out over 64
    reducers, with the host-only window running second over <= cap*64
    survivors per host. A single host-partitioned window = the head
    host's 10^7+ candidates serialized through one task at a 10^10-URL
    frontier."""
    batch = drain_frontier(frontier, round_budget=None, per_host_budget=3)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2, plan
    assert "_salt" in plan, plan


def test_drain_two_phase_identical_and_hot_host(spark):
    """One host holds 95% of a 20k-candidate frontier: the drain
    completes with the exact per-host cap and matches the naive
    single-window selection row-for-row."""
    from pyspark.sql.window import Window

    rows = []
    for i in range(20_000):
        host = "head.example" if i % 20 != 0 else f"tail{i % 100}.example"
        url = f"http://{host}/p/{i}"
        rows.append((url, host, 80 + (i % 3) * 5, 1, 0, xxhash64_str(url)))
    fr = spark.createDataFrame(rows, schemas.FRONTIER)

    batch = drain_frontier(fr, round_budget=None, per_host_budget=50)
    counts = {
        r["host"]: r["n"]
        for r in batch.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert counts["head.example"] == 50
    assert all(n <= 50 for n in counts.values())

    collapsed = fr.groupBy("url_hash", "url_norm").agg(
        F.max("priority").alias("priority"),
        F.min("depth").alias("depth"),
        F.min("round_added").alias("round_added"),
        F.max("host").alias("host"),
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url_hash"))
    naive = (
        collapsed.withColumn("_hr", F.row_number().over(w))
        .filter(F.col("_hr") <= 50)
        .drop("_hr")
    )
    a = sorted(r["url_norm"] for r in naive.collect())
    b = sorted(r["url_norm"] for r in batch.collect())
    assert a == b
