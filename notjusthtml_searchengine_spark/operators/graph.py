"""Link-graph operators (the reference domain is a SEARCH ENGINE —
ranking the crawled link graph is the canonical consumer query over
the link_rels sink; the reference stores the graph in Postgres,
/root/reference/database.go link_rels schema, but ships no ranking).

PageRank as an iterative DataFrame loop: each iteration is one
join+aggregate over the edge table — no RDDs, and NO driver-side
actions during plan construction (the vertex count and the per-
iteration dangling mass ride along as broadcast single-row scalar
aggregates, so the whole n_iter plan is lazy — same principle as the
ANN operators' explicit-dim rule).

Scale notes (10^10-edge graph):
  * edges are the big side, scanned once per iteration; ranks are one
    row per vertex. The contribution join shuffles on src — pre-
    bucketing the edge table by src makes the rank side the only
    exchange, exactly the seen-anti-join pattern.
  * with ``persist_each=True`` (the scale path) each iteration is
    localCheckpoint'ed (eager): the logical plan references the
    previous iteration TWICE (dangling mass + contributions), so an
    unbroken lineage DOUBLES per iteration — 2^n_iter plan nodes blew
    the driver heap at n_iter=10 during planning, long before any
    data moved. localCheckpoint truncates the lineage AND provides
    the materialization barrier in one call. Lazy mode
    (persist_each=False) keeps construction action-free and is for
    bounded n_iter (the oracle query uses 5 ≈ 32 leaf copies).
  * dangling vertices (no out-edges) are handled mass-conservingly:
    their rank is redistributed uniformly each iteration (sum of
    ranks stays 1.0 — property-tested). The dangling mass is a
    broadcast 1-row cross join, not a driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src_col: str = "src") -> DataFrame:
    return edges.groupBy(F.col(src_col).alias("vertex")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


def vertices_of(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    return (
        edges.select(F.col(src_col).alias("vertex"))
        .unionByName(edges.select(F.col(dst_col).alias("vertex")))
        .distinct()
    )


#: iteration count above which lineage truncation turns itself on:
#: the logical plan doubles per iteration (~2^n leaf copies), and
#: planning alone OOM'd the driver at n=10 — 6 ≈ 64 copies is the
#: last comfortably-cheap lazy depth
_AUTO_CHECKPOINT_ITERS = 6


def _resolve_persist(persist_each: bool | None, n_iter: int) -> bool:
    """persist_each=None (the default) auto-enables localCheckpoint
    beyond _AUTO_CHECKPOINT_ITERS so a caller asking for a deep
    iteration count cannot hit the 2^n planning blow-up by accident;
    an explicit True/False is honored as given (False + deep n_iter is
    for tests that pin the lazy-mode contract)."""
    if persist_each is None:
        return n_iter > _AUTO_CHECKPOINT_ITERS
    return persist_each


def connected_components(
    edges: DataFrame,
    n_iter: int,
    src_col: str = "src",
    dst_col: str = "dst",
    persist_each: bool | None = None,
) -> DataFrame:
    """Connected components by MIN-label propagation → (vertex,
    component), component = the smallest vertex id in the component.

    Exact once ``n_iter`` ≥ the graph diameter (one hop of label
    travel per iteration); deterministic for any fixed n_iter, so the
    k-step result is DuckDB-oracle-checkable with the same unrolled
    iterations. Each iteration is one join+agg over the symmetrized
    edge table (same shuffle shape as pagerank — bucketing the edges
    by src makes the label side the only exchange). At 10^10 edges
    prefer the alternating small-star/large-star formulation
    (Kiveris et al., "Connected Components in MapReduce") which
    converges in O(log n) rounds; this k-hop form is its exact,
    oracle-checkable core."""
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(
            F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
        )
    )
    persist_each = _resolve_persist(persist_each, n_iter)
    verts = vertices_of(edges, src_col, dst_col)
    labels = verts.select("vertex", F.col("vertex").alias("component"))
    if persist_each:
        labels = labels.localCheckpoint()
    for _ in range(n_iter):
        neigh = (
            sym.join(labels.withColumnRenamed("vertex", "src"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min("component").alias("_nc"))
        )
        new_labels = labels.join(neigh, "vertex", "left").select(
            "vertex",
            F.least(
                F.col("component"), F.coalesce(F.col("_nc"), F.col("component"))
            ).alias("component"),
        )
        if persist_each:
            labels = new_labels.localCheckpoint()  # barrier + lineage cut
        else:
            labels = new_labels
    return labels


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    persist_each: bool | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Power-iteration PageRank → (vertex, rank).

    Deterministic for a fixed ``n_iter`` (no convergence test — that
    would cost a driver action per iteration; callers at scale add
    one on top). ``round_to`` rounds the final rank for cross-engine
    comparison (the DuckDB oracle mirrors the same unrolled
    iterations)."""
    persist_each = _resolve_persist(persist_each, n_iter)
    verts = vertices_of(edges, src_col, dst_col)
    deg = out_degrees(edges, src_col)
    n_row = F.broadcast(verts.agg(F.count(F.lit(1)).alias("_n")))
    # state carried between iterations: (vertex, out_degree, rank, _n)
    ranks = (
        verts.join(deg, "vertex", "left")
        .crossJoin(n_row)
        .select(
            "vertex", "out_degree", "_n", (F.lit(1.0) / F.col("_n")).alias("rank")
        )
    )
    if persist_each:
        ranks = ranks.localCheckpoint()
    for _ in range(n_iter):
        dang = F.broadcast(
            ranks.filter(F.col("out_degree").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
        )
        contribs = (
            edges.join(ranks.withColumnRenamed("vertex", src_col), src_col)
            .select(
                F.col(dst_col).alias("vertex"),
                (F.col("rank") / F.col("out_degree")).alias("c"),
            )
            .groupBy("vertex")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            verts.join(contribs, "vertex", "left")
            .join(deg, "vertex", "left")
            .crossJoin(n_row)
            .crossJoin(dang)
            .select(
                "vertex",
                "out_degree",
                "_n",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("_n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("_dm") / F.col("_n")
                    )
                ).alias("rank"),
            )
        )
        if persist_each:
            ranks = new_ranks.localCheckpoint()  # barrier + lineage cut
        else:
            ranks = new_ranks
    out = ranks.select("vertex", "rank")
    if round_to is not None:
        out = out.select("vertex", F.round("rank", round_to).alias("rank"))
    return out
