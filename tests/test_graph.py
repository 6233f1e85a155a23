"""PageRank over the link graph (operators/graph.py): exact analytic
cases, mass conservation with dangling vertices, and persist-mode
equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from notjusthtml_searchengine_spark.operators.graph import (
    out_degrees,
    pagerank,
    vertices_of,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_ring_graph_is_uniform(spark):
    """On a k-regular graph the uniform distribution is the exact
    fixed point — every iteration must reproduce 1/N exactly."""
    n = 10
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    rows = pagerank(e, n_iter=7, round_to=9).collect()
    assert len(rows) == n
    for r in rows:
        assert r["rank"] == pytest.approx(1.0 / n, abs=1e-9)


def test_dangling_mass_conserved_and_exact(spark):
    """0→1 with 1 dangling: hand-computed two iterations (d=0.85).
    iter1: v0=.075+.85*.25=.2875, v1=.075+.85*(.5+.25)=.7125
    iter2: dang=.7125 → v0=.075+.85*.35625=.3778125,
           v1=.075+.85*(.2875+.35625)=.6221875"""
    e = _edges(spark, [(0, 1)])
    got = {r["vertex"]: r["rank"] for r in pagerank(e, n_iter=2).collect()}
    assert got[0] == pytest.approx(0.3778125, abs=1e-12)
    assert got[1] == pytest.approx(0.6221875, abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_mass_conserved_on_arbitrary_graph(spark):
    e = _edges(
        spark,
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (5, 0)],  # 4 dangling-ish
    )
    rows = pagerank(e, n_iter=6).collect()
    assert sum(r["rank"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert all(r["rank"] > 0 for r in rows)


def test_persist_mode_equals_lazy(spark):
    e = _edges(spark, [(i, (i * 3 + 1) % 7) for i in range(7) if i % 3 != 0])
    lazy = {r["vertex"]: r["rank"] for r in pagerank(e, n_iter=4).collect()}
    mat = {
        r["vertex"]: r["rank"]
        for r in pagerank(e, n_iter=4, persist_each=True).collect()
    }
    assert lazy.keys() == mat.keys()
    for v in lazy:
        assert lazy[v] == pytest.approx(mat[v], abs=1e-12)


def test_helpers(spark):
    e = _edges(spark, [(0, 1), (0, 2), (1, 2)])
    assert {r["vertex"] for r in vertices_of(e).collect()} == {0, 1, 2}
    degs = {r["vertex"]: r["out_degree"] for r in out_degrees(e).collect()}
    assert degs == {0: 2, 1: 1}


def test_connected_components_paths_exact(spark):
    """Three path components of diameter ≤ 3 → exact at n_iter=3:
    every vertex labeled with its component's minimum id."""
    from notjusthtml_searchengine_spark.operators.graph import (
        connected_components,
    )

    e = _edges(
        spark,
        [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (20, 21)],
    )
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(e, n_iter=3).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_direction_agnostic(spark):
    """Edges are symmetrized: a component connected only 'backwards'
    (high→low) still collapses to the minimum id."""
    from notjusthtml_searchengine_spark.operators.graph import (
        connected_components,
    )

    e = _edges(spark, [(5, 4), (4, 3)])
    got = {
        r["vertex"]: r["component"]
        for r in connected_components(e, n_iter=2).collect()
    }
    assert got == {3: 3, 4: 3, 5: 3}


def test_connected_components_persist_mode_equal(spark):
    from notjusthtml_searchengine_spark.operators.graph import (
        connected_components,
    )

    e = _edges(spark, [(0, 1), (1, 2), (7, 8)])
    lazy = {
        r["vertex"]: r["component"]
        for r in connected_components(e, n_iter=3).collect()
    }
    mat = {
        r["vertex"]: r["component"]
        for r in connected_components(e, n_iter=3, persist_each=True).collect()
    }
    assert lazy == mat


def test_no_action_during_lazy_construction(spark):
    """persist_each=False must not run ANY job while building the
    plan (the ANN explicit-dim rule): construction on a frame whose
    evaluation would raise only fails at collect time."""
    bomb = spark.createDataFrame([(1, 2)], "src long, dst long").filter(
        F.udf(lambda: (_ for _ in ()).throw(RuntimeError("boom")), "boolean")()
    )
    df = pagerank(bomb, n_iter=2)  # must not raise here
    with pytest.raises(Exception):
        df.collect()


def test_deep_iteration_auto_checkpoints(spark):
    """r4 verdict #7: persist_each defaults to None = auto-enable
    localCheckpoint above 6 iterations, so pagerank(n_iter=12) plans
    and runs WITHOUT the caller passing the flag (lazy mode at that
    depth previously OOM'd the driver during planning)."""
    e = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    from notjusthtml_searchengine_spark.operators.graph import (
        connected_components,
    )

    rows = pagerank(e, n_iter=12, round_to=9).collect()
    assert len(rows) == 6
    # ring → uniform 1/6 regardless of iteration count
    assert all(abs(r["rank"] - 1 / 6) < 1e-6 for r in rows)
    labels = connected_components(e, n_iter=8).collect()
    assert {r["component"] for r in labels} == {0}


def test_explicit_lazy_honored_at_depth(spark):
    """persist_each=False is still honored as given (the auto default
    only applies to None) — construction stays action-free."""
    from notjusthtml_searchengine_spark.operators.graph import _resolve_persist

    assert _resolve_persist(None, 6) is False
    assert _resolve_persist(None, 7) is True
    assert _resolve_persist(False, 100) is False
    assert _resolve_persist(True, 1) is True
