"""Similarity-search operators: brute-force cosine top-k and
hyperplane-LSH bucketed ANN over array<float> embeddings."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.similarity import (
    brute_topk,
    embedding_neardup_pairs,
    lsh_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = random.Random(7)
    rows = []
    for i in range(80):
        v = [rng.gauss(0, 1) for _ in range(DIM)]
        rows.append((i, [float(x) for x in v]))
    # planted near-duplicates of vec 0
    base = rows[0][1]
    rows.append((100, [x + 0.01 for x in base]))
    rows.append((101, [x * 1.001 for x in base]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _queries(emb):
    return emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_brute_topk_finds_planted_neighbors(spark, emb):
    out = brute_topk(emb, _queries(emb), k=3).collect()
    neighbors = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rk"])]
    assert set(neighbors[:2]) == {100, 101}
    assert all(r["cosine"] <= 1.0 for r in out)


def test_brute_topk_matches_python_oracle(spark, emb):
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    q = rows[0]

    def cos_q(a, b):
        aq = [round(x * 1000) for x in a]
        bq = [round(x * 1000) for x in b]
        dot = sum(x * y for x, y in zip(aq, bq))
        return round(dot / math.sqrt(sum(x * x for x in aq) * sum(y * y for y in bq)), 4)

    expect = sorted(
        ((cos_q(q, v), vid) for vid, v in rows.items() if vid != 0),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    out = brute_topk(emb, _queries(emb), k=5).orderBy("rk").collect()
    assert [(r["cosine"], r["neighbor_id"]) for r in out] == expect


def test_lsh_topk_recalls_near_duplicates(spark, emb):
    """Near-identical vectors share every hyperplane sign → always in
    the query's bucket; LSH must recall them."""
    out = lsh_topk(emb, _queries(emb), k=3, n_planes=4, dim=DIM).collect()
    neighbors = {r["neighbor_id"] for r in out}
    assert {100, 101} <= neighbors


def test_neardup_pairs_planted(spark, emb):
    pairs = embedding_neardup_pairs(emb, threshold=0.99, n_planes=4, dim=DIM).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100) in got and (0, 101) in got and (100, 101) in got


def test_ivf_topk_recalls_planted_neighbors(spark, emb):
    """Near-identical vectors land in the same IVF bucket as their
    original (same nearest centroid) → recalled."""
    from notjusthtml_searchengine_spark.operators.similarity import ivf_topk

    out = ivf_topk(emb, _queries(emb), k=3, n_centroids=8, nprobe=2).collect()
    neighbors = {r["neighbor_id"] for r in out}
    assert {100, 101} <= neighbors
    assert all(r["cosine"] <= 1.0 for r in out)


def test_ivf_full_probe_equals_brute(spark, emb):
    """With nprobe == n_centroids the probe covers every bucket, so
    IVF must return exactly the brute-force top-k."""
    from notjusthtml_searchengine_spark.operators.similarity import ivf_topk

    brute = brute_topk(emb, _queries(emb), k=5).orderBy("rk").collect()
    ivf = ivf_topk(
        emb, _queries(emb), k=5, n_centroids=4, nprobe=4
    ).orderBy("rk").collect()
    assert [(r["neighbor_id"], r["cosine"]) for r in ivf] == [
        (r["neighbor_id"], r["cosine"]) for r in brute
    ]


def test_no_driver_action_in_operator_construction():
    """Plan-audit: building an LSH operator must not run a Spark job
    (no .first()/.collect()/.count() in the operator module)."""
    import inspect

    import notjusthtml_searchengine_spark.operators.similarity as s

    src = inspect.getsource(s)
    for action in (".first()", ".collect()", ".count()", ".take("):
        assert action not in src, action


def test_lsh_requires_explicit_dim(spark, emb):
    with pytest.raises(ValueError):
        lsh_topk(emb, _queries(emb), k=3, n_planes=4)


def test_ann_recall_query_floor(spark):
    """The driver's ann_recall query (recall@5 of LSH and IVF vs the
    brute ranking on the sf0.001 embeddings) stays above documented
    floors: IVF with nprobe=2/8 centroids ≥ 0.5 mean; single-probe
    sign-bucket LSH at 4 planes ≥ 0.05 mean (16 buckets over ~50
    vectors leaves ~3 candidates/bucket — low recall@5 is the
    documented trade of the single-probe variant; widen via fewer
    planes or multi-probe). The exact numbers are oracle-checked by
    the driver; this test pins the floors."""
    import __spark_entry__ as entry

    rows = entry.q_ann_recall(spark, "/root/testdata/sf0.001").collect()
    by_method: dict[str, list[float]] = {}
    for r in rows:
        by_method.setdefault(r["method"], []).append(r["recall_at_k"])
    assert set(by_method) == {"lsh", "lsh_mp", "ivf"}
    assert all(len(v) == 3 for v in by_method.values())
    mean = lambda xs: sum(xs) / len(xs)
    assert mean(by_method["ivf"]) >= 0.5, by_method
    assert mean(by_method["lsh"]) >= 0.05, by_method
    # the multi-probe dial buys recall: 3/16 buckets probed vs 1/16
    assert mean(by_method["lsh_mp"]) >= mean(by_method["lsh"]), by_method
    assert mean(by_method["lsh_mp"]) >= 0.15, by_method
    assert all(0.0 <= x <= 1.0 for xs in by_method.values() for x in xs)


def test_multiprobe_dial_monotone_at_8_planes(spark):
    """The recall/cost dial must be MONOTONE beyond the 16-bucket
    index ann_recall exercises: on the 256-bucket (n_planes=8) index
    over the sf0.001 embeddings, widening n_probes 1→3→5→9 never
    decreases recall@5 and strictly increases scan cost (candidates).
    Pins the dial's shape, not just one point."""
    from notjusthtml_searchengine_spark.operators.similarity import (
        brute_topk,
        lsh_probe_stats,
        lsh_topk,
    )

    emb8 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb8.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    truth = {(r["qid"], r["neighbor_id"]) for r in brute_topk(emb8, qs, k=5).collect()}
    probes = (1, 3, 5, 9)
    recalls = []
    for np_ in probes:
        got = {
            (r["qid"], r["neighbor_id"])
            for r in lsh_topk(
                emb8, qs, k=5, n_planes=8, dim=64, n_probes=np_
            ).collect()
        }
        recalls.append(len(truth & got) / len(truth))
    assert all(a <= b for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] > recalls[0], recalls  # the dial actually buys recall
    assert recalls[-1] >= 0.15, recalls
    # probe COST: total candidates scanned strictly increases with the
    # probe count (the occupancy stats the ann_probe_cost query surfaces)
    stats = lsh_probe_stats(
        emb8, qs, n_planes=8, dim=64, probe_counts=probes
    ).collect()
    totals = {}
    for r in stats:
        totals[r["n_probes"]] = totals.get(r["n_probes"], 0) + r["candidates"]
    costs = [totals.get(np_, 0) for np_ in probes]
    assert all(a < b for a, b in zip(costs, costs[1:])), costs


def test_kmeans_separates_planted_clusters(spark):
    """Two tight planted clusters → after 3 exact-integer Lloyd
    iterations every member is assigned to the same centroid as its
    clustermates, and the two clusters land on different centroids."""
    import random

    from notjusthtml_searchengine_spark.operators.similarity import (
        cosine_q,
        kmeans_centroids,
        quantized,
    )

    rng = random.Random(3)
    rows = []
    a = [1.0] * 8 + [0.0] * 8
    b = [0.0] * 8 + [1.0] * 8
    for i in range(20):
        base = a if i % 2 == 0 else b
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in base]))
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = kmeans_centroids(e, k=2, n_iter=3)
    assigned = (
        e.select(F.col("vec_id"), quantized(F.col("embedding")).alias("vq"))
        .join(F.broadcast(cents))
        .withColumn("c", cosine_q(F.col("vq"), F.col("cv")))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("cid"))
    top = (
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
        .collect()
    )
    groups: dict[int, set] = {}
    for r in top:
        groups.setdefault(r["vec_id"] % 2, set()).add(r["cid"])
    assert len(groups[0]) == 1 and len(groups[1]) == 1
    assert groups[0] != groups[1]


def test_kmeans_empty_cluster_keeps_init(spark):
    """A centroid that attracts no members must keep its previous
    (init) vector instead of vanishing — k=3 over 2 planted clusters
    still returns 3 centroid rows."""
    from notjusthtml_searchengine_spark.operators.similarity import (
        kmeans_centroids,
    )

    rows = [(i, ([1.0] * 8 if i != 2 else [-1.0] * 8)) for i in range(12)]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = kmeans_centroids(e, k=3, n_iter=2).collect()
    assert len(cents) == 3
    assert all(r["cv"] is not None and len(r["cv"]) == 8 for r in cents)


def test_kmeans_ivf_recall_floor(spark):
    """IVF over k-means-trained centroids keeps a recall@5 floor on
    the sf0.001 embeddings (nprobe=2/8; exact value oracle-checked by
    the driver as ann_ivf_kmeans)."""
    from notjusthtml_searchengine_spark.operators.similarity import (
        brute_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb8 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb8.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    truth = {(r["qid"], r["neighbor_id"]) for r in brute_topk(emb8, qs, k=5).collect()}
    km = {
        (r["qid"], r["neighbor_id"])
        for r in ivf_topk(
            emb8, qs, k=5, nprobe=2, cents=kmeans_centroids(emb8, k=8, n_iter=2)
        ).collect()
    }
    assert len(truth & km) / len(truth) >= 0.6


def test_lsh_probe_stats_validation(spark, emb):
    from notjusthtml_searchengine_spark.operators.similarity import lsh_probe_stats

    q = emb.limit(1).selectExpr("vec_id AS qid", "embedding AS qvec")
    with pytest.raises(ValueError):
        lsh_probe_stats(emb, q, n_planes=4, dim=DIM, probe_counts=(1, 6))


def test_lsh_multiprobe_validation(spark, emb):
    from notjusthtml_searchengine_spark.operators.similarity import lsh_topk

    q = emb.limit(1).selectExpr("vec_id AS qid", "embedding AS qvec")
    import pytest as _pt

    with _pt.raises(ValueError):
        lsh_topk(emb, q, dim=64, n_planes=4, n_probes=6)  # > n_planes+1
    with _pt.raises(ValueError):
        lsh_topk(emb, q, dim=64, n_planes=4, n_probes=0)


def test_semdedup_flags_planted_semantic_dups(spark, emb):
    """The planted near-duplicates of vec 0 (ids 100, 101) land in
    vec 0's cluster and are flagged as semantic dups of an earlier
    member, with vec 0 itself surviving as canonical; dup_of points at
    the smallest earlier over-threshold member."""
    from notjusthtml_searchengine_spark.operators.similarity import (
        semdedup_flags,
    )

    out = {r["vec_id"]: r for r in semdedup_flags(
        emb, k_clusters=4, threshold=0.95, n_iter=2
    ).collect()}
    assert len(out) == emb.count()
    assert out[100]["is_dup"] == 1 and out[100]["dup_of"] == 0
    assert out[101]["is_dup"] == 1 and out[101]["dup_of"] == 0
    assert out[0]["is_dup"] == 0  # lowest id of the group is canonical
    # same cluster for the semantic group
    assert out[100]["cluster_id"] == out[0]["cluster_id"]
    assert out[101]["cluster_id"] == out[0]["cluster_id"]
    # max_cos populated only when an earlier member exists
    firsts = [r for r in out.values() if r["max_cos"] is None]
    assert all(r["is_dup"] == 0 for r in firsts)


def test_semdedup_no_global_crossjoin(spark, emb):
    """The pairwise stage must self-join ON cluster_id (hash-
    partitioned per cluster) — a CartesianProduct/BroadcastNestedLoop
    over the corpus would be O(N^2) at scale."""
    from notjusthtml_searchengine_spark.operators.similarity import (
        semdedup_flags,
    )

    plan = (
        semdedup_flags(emb, k_clusters=4, threshold=0.95, n_iter=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only joins allowed are the broadcast centroid joins and the
    # cid-keyed pair join / result join
    assert "CartesianProduct" not in plan, plan


def test_semdedup_block_split_exact(spark, emb):
    """r6 hot-cluster bound: forcing multi-block decomposition
    (block_target tiny => every cluster splits into many hash blocks)
    must produce EXACTLY the rows of the single-block form — the
    block-pair fan-out is a physical re-partitioning of the same pair
    space, never a semantic change."""
    from notjusthtml_searchengine_spark.operators.similarity import (
        semdedup_flags,
    )

    base = sorted(
        map(tuple, semdedup_flags(
            emb, k_clusters=4, threshold=0.95, n_iter=1,
            block_target=1 << 20,
        ).collect())
    )
    split = sorted(
        map(tuple, semdedup_flags(
            emb, k_clusters=4, threshold=0.95, n_iter=1, block_target=7
        ).collect())
    )
    assert base == split
    assert len(base) == emb.count()
