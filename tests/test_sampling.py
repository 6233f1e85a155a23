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


def test_stratified_cap_two_phase_plan(spark, docs):
    """Skew safety (r4 verdict #3): the FIRST window must partition by
    (strata, salt) — fanning a hot stratum over many reducers — with
    the stratum-only window running second over the bounded survivors.
    A single stratum-partitioned window = one straggler task per hot
    stratum at 100 TB."""
    out = stratified_cap(docs, strata_col="lang", cap=5, key_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two Window nodes, and the salted phase-1 spec appears in the plan
    assert plan.count("Window") >= 2, plan
    assert "_salt" in plan, plan


def test_stratified_cap_identical_to_single_window(spark, docs):
    """The two-phase form must be bit-identical to the naive single
    window (and hence to the DuckDB oracle) — phase-1 per-salt top-cap
    is a superset of the global top-cap."""
    from pyspark.sql.window import Window
    from notjusthtml_searchengine_spark.operators.sampling import split_bucket

    w = Window.partitionBy("lang").orderBy(
        split_bucket(F.col("doc_id")), F.col("doc_id")
    )
    naive = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 15)
        .drop("_rn")
    )
    a = sorted((r["lang"], r["doc_id"]) for r in naive.collect())
    b = sorted(
        (r["lang"], r["doc_id"])
        for r in stratified_cap(docs, "lang", 15, "doc_id").collect()
    )
    assert a == b
    # and with a salt count that forces many phase-1 groups per stratum
    c = sorted(
        (r["lang"], r["doc_id"])
        for r in stratified_cap(docs, "lang", 15, "doc_id", n_salts=7).collect()
    )
    assert a == c


def test_stratified_cap_hot_stratum(spark):
    """One stratum holds 90% of rows; the operator completes with the
    hot stratum spread over the salted phase-1 groups and returns the
    exact deterministic cap."""
    rows = [(i, "hot" if i % 10 != 0 else f"cold{i % 50}") for i in range(20_000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_cap(df, "lang", cap=100, key_col="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["hot"] == 100
    assert all(n <= 100 for n in counts.values())


def test_lang_temperature_sample_rates_and_determinism(spark):
    from notjusthtml_searchengine_spark.operators.sampling import (
        lang_temperature_sample,
    )

    rows = [(i, "big" if i < 900 else "rare") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = lang_temperature_sample(df, "lang", "doc_id", alpha=0.5)
    kept = (
        out.groupBy("lang")
        .agg(F.sum("keep").alias("k"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by = {r["lang"]: (r["k"], r["n"]) for r in kept}
    # the rarest language keeps everything (rate = sqrt(100/100) = 1)
    assert by["rare"] == (100, 100)
    # the big language keeps ~sqrt(100/900)=1/3 of its rows
    assert abs(by["big"][0] / 900 - 1 / 3) < 0.05
    # deterministic: a rerun produces the identical keep set
    again = lang_temperature_sample(df, "lang", "doc_id", alpha=0.5)
    assert (
        out.filter("keep = 1").select("doc_id").exceptAll(
            again.filter("keep = 1").select("doc_id")
        ).count()
        == 0
    )


def test_lang_temperature_alpha_one_keeps_all(spark):
    from notjusthtml_searchengine_spark.operators.sampling import (
        lang_temperature_sample,
    )

    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = lang_temperature_sample(df, "lang", "doc_id", alpha=1.0)
    # alpha=1 -> natural distribution -> rate 1 for every language
    assert out.filter("keep = 0").count() == 0
