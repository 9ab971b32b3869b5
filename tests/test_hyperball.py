"""HyperBall-lite vs the exact neighbourhood function (reference test
pattern: HyperBall vs NeighbourhoodFunction, ``HyperBallSlowTest.java:43-69``
— approximate within a band of the exact value on seeded fixtures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webgraph_spark.algo.bfs import neighbourhood_function
from webgraph_spark.algo.hyperball import centralities, hyperball
from webgraph_spark.sources.generators import complete_graph, directed_cycle, erdos_renyi


def _nodes(edges):
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def test_hyperball_complete_graph(spark):
    edges = complete_graph(spark, 8)
    res = hyperball(edges, _nodes(edges), log2m=7, max_iter=8)
    assert res.converged and res.iterations <= 3
    # after 1 step every ball is the whole graph: NF(1) ~= 64
    assert res.nf[-1] == pytest.approx(64, rel=0.25)
    # monotone NF
    assert all(b >= a * 0.999 for a, b in zip(res.nf, res.nf[1:]))


def test_hyperball_vs_exact_nf_er(spark):
    edges = erdos_renyi(spark, 40, 0.08, seed=11).persist()
    nodes = _nodes(edges)
    exact = neighbourhood_function(edges, nodes, max_t=16)
    res = hyperball(edges, nodes, log2m=7, max_iter=16)
    assert res.converged
    # same support length (fixpoint at the same t) and close totals
    assert res.nf[-1] == pytest.approx(exact[-1], rel=0.25)
    assert res.nf[0] == pytest.approx(exact[0], rel=0.25)


def test_hyperball_centralities_cycle(spark):
    n = 6
    edges = directed_cycle(spark, n)
    res = hyperball(edges, _nodes(edges), log2m=8, max_iter=10)
    # n-1 growth rounds (distances 1..n-1) + one confirming no-change round
    assert res.converged and res.iterations == n
    cents = centralities(res).collect()
    # cycle is vertex-transitive: all nodes should agree closely
    harmonics = [r["harmonic"] for r in cents]
    assert max(harmonics) <= min(harmonics) * 1.3 + 1e-9
    # exact harmonic for a directed cycle: sum_{d=1..n-1} 1/d
    h_exact = sum(1.0 / d for d in range(1, n))
    assert sum(harmonics) / n == pytest.approx(h_exact, rel=0.3)
    closeness = [r["closeness"] for r in cents]
    c_exact = 1.0 / sum(d for d in range(1, n))
    assert sum(closeness) / n == pytest.approx(c_exact, rel=0.35)


def test_nf_statistics_exact_on_cycle(spark):
    from webgraph_spark.algo.hyperball import combine_nfs, jackknife, nf_statistics

    # exact NF of a directed 5-cycle: N(t) = 5*(t+1) for t=0..4
    nf = [5.0, 10.0, 15.0, 20.0, 25.0]
    s = nf_statistics(nf)
    assert s["reachable_pairs"] == 25.0
    assert s["average_distance"] == pytest.approx(2.0)  # mean of 0..4
    assert s["median_distance"] == 2
    # combine: mean of identical runs is the run itself; ragged tails pad
    assert combine_nfs([nf, nf]) == nf
    assert combine_nfs([[5.0, 10.0], [5.0, 10.0, 15.0]])[2] == pytest.approx(12.5)
    jk = jackknife([nf, [x * 1.1 for x in nf], [x * 0.9 for x in nf]],
                   lambda v: v[-1])
    assert jk["raw"] == pytest.approx(25.0, rel=0.01)
    assert jk["standard_error"] > 0


def test_systolic_converges_same_as_before(spark):
    # frontier shrinks but the fixpoint must be identical: star graph where
    # leaves stabilize after 1 round
    from webgraph_spark.sources.generators import star
    edges = star(spark, 6)
    res = hyperball(edges, _nodes(edges), log2m=7, max_iter=6)
    assert res.converged
    # center reaches 7 nodes' worth of ball; leaves only themselves
    cents = {r["id"]: r["reachable"] for r in centralities(res).collect()}
    assert cents[0] == pytest.approx(7, rel=0.3)
    for leaf in range(1, 7):
        assert cents[leaf] == pytest.approx(1, rel=0.3)
