"""SCC vs sequential Tarjan (the reference's own differential pattern,
``ConnectedComponentsTest.java:30-62``) + diameter sweep bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.oracles import er_arcs, scc_tarjan
from webgraph_spark.algo.diameter import distance_cdf, double_sweep_lower_bound
from webgraph_spark.algo.scc import (
    strongly_connected_components,
    terminal_components,
)
from webgraph_spark.sources.generators import directed_cycle


def _edges(spark, arcs):
    return spark.createDataFrame(arcs, "src long, dst long")


def _scc_map(edges, nodes=None):
    res = strongly_connected_components(edges, nodes)
    return {r["id"]: r["comp"] for r in res.components.collect()}


def test_scc_two_cycles_and_bridge(spark):
    # 0->1->2->0 (SCC {0,1,2}), 3->4->3 (SCC {3,4}), bridge 2->3, tail 4->5
    arcs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (4, 5)]
    got = _scc_map(_edges(spark, arcs))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_scc_dag_all_singletons(spark):
    arcs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _scc_map(_edges(spark, arcs))
    assert got == {v: v for v in range(4)}


def test_scc_matches_tarjan_on_er(spark):
    for seed in (3, 4, 5):
        arcs = er_arcs(30, 0.08, seed)
        nodes = list(range(30))
        edges = _edges(spark, arcs)
        ndf = spark.createDataFrame([(v,) for v in nodes], "id long")
        got = _scc_map(edges, ndf)
        want = scc_tarjan(arcs, nodes)
        assert got == want, f"seed {seed}"


def test_terminal_components(spark):
    arcs = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)]
    edges = _edges(spark, arcs)
    res = strongly_connected_components(edges)
    term = {r["comp"] for r in terminal_components(edges, res.components).collect()}
    assert term == {2}  # only SCC {2,3} has no outgoing condensation arc


def test_double_sweep_cycle_exact(spark):
    edges = directed_cycle(spark, 7)
    out = double_sweep_lower_bound(edges, start=0)
    assert out["diameter_lower_bound"] == 6  # directed cycle diameter n-1


def test_distance_cdf(spark):
    edges = directed_cycle(spark, 5)
    src = spark.createDataFrame([(0,)], "id long")
    rows = {r["dist"]: (r["pairs"], r["cum_pairs"]) for r in
            distance_cdf(edges, src).collect()}
    assert rows == {0: (1, 1), 1: (1, 2), 2: (1, 3), 3: (1, 4), 4: (1, 5)}
