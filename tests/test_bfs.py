"""BFS distances + neighbourhood function vs python oracle."""

from __future__ import annotations

from tests.oracles import bfs_dists, er_arcs
from webgraph_spark.algo.bfs import (
    bfs_distances,
    eccentricity_info,
    neighbourhood_function,
)


def test_chain_distances(spark):
    arcs = [(i, i + 1) for i in range(10)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    src = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(edges, src).collect()}
    assert got == {i: i for i in range(11)}
    info = eccentricity_info(bfs_distances(edges, src))
    assert info["eccentricity"] == 10 and info["node_at_max_distance"] == 10


def test_multi_source_and_unreachable(spark):
    arcs = [(0, 1), (1, 2), (5, 6)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    src = spark.createDataFrame([(0,), (5,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(edges, src).collect()}
    assert got == {0: 0, 5: 0, 1: 1, 6: 1, 2: 2}  # node 3/4 absent entirely


def test_er_vs_oracle(spark):
    arcs = er_arcs(50, 0.05, 9)
    edges = spark.createDataFrame(arcs, "src long, dst long")
    src = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs_distances(edges, src).collect()}
    assert got == bfs_dists(arcs, [0])


def test_neighbourhood_function_cycle(spark):
    # Directed 8-cycle: N(t) = 8*(t+1) until saturation at 64.
    n = 8
    arcs = [(i, (i + 1) % n) for i in range(n)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    nodes = spark.range(n).selectExpr("id")
    nf = neighbourhood_function(edges, nodes, max_t=10)
    assert nf == [8, 16, 24, 32, 40, 48, 56, 64]


def test_geometric_centralities_exact(spark):
    from tests.oracles import bfs_dists
    from webgraph_spark.algo.geometric import geometric_centralities

    arcs = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    got = {r["id"]: r for r in geometric_centralities(edges, nodes).collect()}
    for s in range(5):
        d = bfs_dists(arcs, [s])
        dists = [v for k, v in d.items() if v > 0]
        assert got[s]["reachable"] == len(d)
        assert got[s]["sum_dist"] == sum(dists)
        if dists:
            assert abs(got[s]["harmonic"] - sum(1 / x for x in dists)) < 1e-9
            assert abs(got[s]["closeness"] - 1 / sum(dists)) < 1e-12
            assert abs(got[s]["lin"] - len(d) ** 2 / sum(dists)) < 1e-9
        else:
            assert got[s]["closeness"] == 0.0 and got[s]["lin"] == 1.0
