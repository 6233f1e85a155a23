"""Sequence packing: spans tile the token stream exactly, layout is
deterministic under repartition/rerun, the two-phase prefix sum equals
the naive global running sum, and no stage funnels the corpus through
a single task."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range((i * 7) % 23))) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_tile_the_stream(spark, docs):
    rows = sorted(
        pack_sequences(docs, seq_len=16).collect(), key=lambda r: r["start_pos"]
    )
    # spans are contiguous, half-open, and start at zero
    pos = 0
    for r in rows:
        assert r["start_pos"] == pos
        pos += r["n_tokens"]
    total = sum(r["n_tokens"] for r in rows)
    assert pos == total and total > 0
    # sequence ids and offsets agree with the positions
    for r in rows:
        assert r["first_seq"] == r["start_pos"] // 16
        assert r["offset_in_first"] == r["start_pos"] % 16
        end = r["start_pos"] + max(r["n_tokens"] - 1, 0)
        assert r["last_seq"] == end // 16


def test_deterministic_under_repartition(spark, docs):
    a = {r["doc_id"]: r["start_pos"] for r in pack_sequences(docs, 32).collect()}
    b = {
        r["doc_id"]: r["start_pos"]
        for r in pack_sequences(docs.repartition(13), 32).collect()
    }
    assert a == b


def test_matches_naive_global_sum(spark, docs):
    """Two-phase prefix sum == the naive single-window running sum."""
    from notjusthtml_searchengine_spark.operators.sampling import split_bucket
    from notjusthtml_searchengine_spark.operators.textops import token_count

    naive = docs.select(
        "doc_id",
        split_bucket(F.col("doc_id")).alias("b"),
        token_count(F.col("text")).cast("bigint").alias("n"),
    ).collect()
    naive.sort(key=lambda r: (r["b"], r["doc_id"]))
    pos, want = 0, {}
    for r in naive:
        want[r["doc_id"]] = pos
        pos += r["n"]
    got = {r["doc_id"]: r["start_pos"] for r in pack_sequences(docs, 128).collect()}
    assert got == want


def test_no_global_single_partition_window(spark, docs):
    """The corpus-wide running sum must NOT be a single-partition
    window over the data: the only SinglePartition exchange allowed is
    the bounded bucket-totals table (≤ _BUCKETS rows)."""
    import re

    plan = (
        pack_sequences(docs, 64)._jdf.queryExecution().executedPlan().toString()
    )
    # the per-doc running sum must be partitioned by the hash bucket:
    # its windowspecdefinition carries _b ahead of the doc_id ordering
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    doc_specs = [s for s in specs if "doc_id" in s]
    assert doc_specs, plan
    assert all("_b" in s for s in doc_specs), doc_specs


def test_seq_len_validation(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
