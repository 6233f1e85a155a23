"""DSIR importance weights (operators/dsir.py): target-like docs
score higher; bounded model; determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.dsir import dsir_weights


def _corpus(spark):
    # two disjoint vocabularies: "science" (target) vs "spam"
    sci = "atoms orbit the nucleus while electrons share energy levels"
    spam = "click here buy now free offer win cash prize today"
    rows = (
        [(i, sci + f" run {i}", True) for i in range(10)]
        + [(100 + i, spam + f" run {i}", False) for i in range(30)]
        + [(200, sci + " extra held out", False)]  # target-like but unlabeled
    )
    return spark.createDataFrame(rows, "doc_id bigint, text string, is_target boolean")


def test_target_like_docs_score_higher(spark):
    out = dsir_weights(_corpus(spark), n_buckets=512).collect()
    by = {r["doc_id"]: r["weight"] for r in out}
    sci_mean = sum(by[i] for i in range(10)) / 10
    spam_mean = sum(by[100 + i] for i in range(30)) / 30
    assert sci_mean > spam_mean
    # the unlabeled science doc scores with the science cluster, not spam
    assert by[200] > spam_mean
    assert abs(by[200] - sci_mean) < abs(by[200] - spam_mean)


def test_every_doc_scored_and_deterministic(spark):
    docs = _corpus(spark)
    a = dsir_weights(docs, n_buckets=512)
    assert a.count() == docs.count()
    b = dsir_weights(docs, n_buckets=512)
    assert a.exceptAll(b).count() == 0


def test_model_is_bounded_by_bucket_count(spark):
    # the count table can never exceed n_buckets rows regardless of vocab
    docs = _corpus(spark)
    from notjusthtml_searchengine_spark.operators.dsir import _bucket
    from notjusthtml_searchengine_spark.operators.textops import tokens

    n = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("t"))
        .select(_bucket(F.col("t"), 16).alias("b"))
        .distinct()
        .count()
    )
    assert n <= 16
