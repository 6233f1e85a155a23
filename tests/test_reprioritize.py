"""reprioritize_frontier — authority score folded into frontier
priority (north-star "priority = depth + domain score"; the oracle
twin is graded by tests/test_oracle_overflow.py / the driver compare).

Pins: exact integer bonus arithmetic, unscored-host passthrough, the
all-zero-score guard, and the scale-posture plan (score dim broadcast,
frontier never exchanged)."""

from __future__ import annotations

from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.crawl_ops import (
    reprioritize_frontier,
)


def _frontier(spark):
    rows = [
        ("a.example", "http://a.example/1", 10, 0),
        ("a.example", "http://a.example/2", 5, 1),
        ("b.example", "http://b.example/1", 10, 0),
        ("c.example", "http://c.example/1", 10, 2),
    ]
    return spark.createDataFrame(
        rows, "host string, url_norm string, priority int, depth int"
    )


def test_bonus_is_exact_integer_share(spark):
    scores = spark.createDataFrame(
        [("a.example", 0.5), ("b.example", 0.125)], "host string, score double"
    )
    out = {
        r["url_norm"]: r["priority"]
        for r in reprioritize_frontier(
            _frontier(spark), scores, weight=100
        ).collect()
    }
    # max micro = 500000: a gets +100, b gets +floor(100*125000/500000)=+25
    assert out["http://a.example/1"] == 110
    assert out["http://a.example/2"] == 105
    assert out["http://b.example/1"] == 35
    # unscored host: priority unchanged
    assert out["http://c.example/1"] == 10


def test_all_zero_scores_leave_priorities_unchanged(spark):
    scores = spark.createDataFrame(
        [("a.example", 0.0), ("b.example", 0.0)], "host string, score double"
    )
    out = reprioritize_frontier(_frontier(spark), scores, weight=100)
    assert [r["priority"] for r in out.orderBy("url_norm").collect()] == [
        10,
        5,
        10,
        10,
    ]


def test_schema_and_row_count_preserved(spark):
    scores = spark.createDataFrame([("a.example", 1.0)], "host string, score double")
    fr = _frontier(spark)
    out = reprioritize_frontier(fr, scores)
    assert set(out.columns) == set(fr.columns)
    assert out.count() == fr.count()
    assert dict(out.dtypes)["priority"] == "int"


def test_plan_broadcasts_dim_never_exchanges_frontier(spark):
    """The frontier side must reach the join without an Exchange (the
    score dim is broadcast; at 10^8 hosts the caller flips
    broadcast_scores=False and only the skinny dim shuffles)."""
    scores = spark.createDataFrame([("a.example", 1.0)], "host string, score double")
    out = reprioritize_frontier(_frontier(spark), scores, weight=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # count Exchanges that are NOT broadcast exchanges: the frontier
    # scan must not be re-partitioned (the scalar max agg exchanges a
    # 1-row dim — that side is bounded by construction)
    lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    shuffles = [ln for ln in lines if "BroadcastExchange" not in ln]
    # allowed: the SinglePartition exchange feeding the 1-row max() agg
    for ln in shuffles:
        assert "SinglePartition" in ln, plan
