"""Label propagation: clique fixture + synchronous oracle differential."""

from __future__ import annotations

import pytest

from tests.oracles import er_arcs, lpa_sync
from webgraph_spark.algo.labelprop import label_propagation


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_cliques_converge_to_min_label(spark):
    # Two disjoint cliques {0,1,2} and {5,6,7,8}: LPA settles on min id.
    cl = lambda vs: [(a, b) for a in vs for b in vs if a != b]
    arcs = cl([0, 1, 2]) + cl([5, 6, 7, 8])
    edges = spark.createDataFrame(arcs, "src long, dst long")
    res = label_propagation(edges, max_iter=10)
    got = _labels(res.labels)
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 5, 8: 5}
    assert res.changed_per_iter[-1] == 0


def test_isolated_keeps_label(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,), (9,)], "id long")
    res = label_propagation(edges, nodes, max_iter=5)
    assert _labels(res.labels)[9] == 9


@pytest.mark.parametrize("seed,iters", [(1, 3), (2, 5)])
def test_er_vs_python_oracle_fixed_iters(spark, seed, iters):
    # Fixed iteration count: engine and oracle run the same number of
    # synchronous rounds and must agree exactly (deterministic tie-break).
    n = 60
    arcs = er_arcs(n, 0.05, seed)
    edges = spark.createDataFrame(arcs, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    res = label_propagation(edges, nodes, max_iter=iters)
    got = _labels(res.labels)
    # oracle runs exactly the same rounds unless it converged earlier
    expect = lpa_sync(arcs, list(range(n)), iters)
    assert got == expect
