"""Deterministic sampling/splitting operators (training-data
pipeline utilities): hash-split stability and stratified caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.sampling import (
    split_by_hash,
    stratified_cap,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"lang{i % 3}") for i in range(300)], "doc_id long, lang string"
    )


def test_split_fractions_and_stability(spark, docs):
    out = split_by_hash(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert sum(counts.values()) == 300
    # exact fractions hold in expectation; at n=300 allow a wide band
    assert 0.7 <= counts["train"] / 300 <= 0.9
    # stability: same assignment on rerun and under repartition
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(
            docs.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b


def test_split_append_stability(spark, docs):
    """Appending rows never changes existing rows' split — the
    property that protects already-trained-on data."""
    small = docs.filter(F.col("doc_id") < 100)
    fa = {"train": 0.5, "val": 0.5}
    before = {r["doc_id"]: r["split"] for r in split_by_hash(small, "doc_id", fa).collect()}
    after = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(docs, "doc_id", fa).collect()
        if r["doc_id"] < 100
    }
    assert before == after


def test_split_holdout_and_validation(spark, docs):
    out = split_by_hash(docs, "doc_id", {"train": 0.5})
    rows = out.collect()
    assert any(r["split"] is None for r in rows)  # held-out remainder
    with pytest.raises(ValueError):
        split_by_hash(docs, "doc_id", {"a": 0.9, "b": 0.2})


def test_stratified_cap_bounds_and_determinism(spark, docs):
    out = stratified_cap(docs, strata_col="lang", cap=15, key_col="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 15 for n in counts.values()), counts
    # deterministic under repartition (NOT scan-order dependent)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_cap(
            docs.repartition(11), strata_col="lang", cap=15, key_col="doc_id"
        ).collect()
    )
    assert a == b
    # small strata pass through untouched
    tiny = docs.filter(F.col("doc_id") < 6)
    assert stratified_cap(tiny, "lang", 15, "doc_id").count() == 6
    with pytest.raises(ValueError):
        stratified_cap(docs, "lang", 0, "doc_id")
