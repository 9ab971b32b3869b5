"""Betweenness vs sequential Brandes (the reference's own algorithm)."""

from __future__ import annotations

import pytest

from tests.oracles import betweenness_brandes, er_arcs
from webgraph_spark.algo.betweenness import betweenness


def _check(spark, arcs, n):
    edges = spark.createDataFrame(arcs, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r["id"]: r["betweenness"] for r in betweenness(edges, nodes).collect()}
    want = betweenness_brandes(arcs, list(range(n)))
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9), f"node {v}"


def test_betweenness_path(spark):
    # path 0->1->2->3: inner nodes carry all the load
    _check(spark, [(0, 1), (1, 2), (2, 3)], 4)


def test_betweenness_diamond(spark):
    # two equal shortest paths 0->{1,2}->3: split dependencies
    _check(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], 5)


def test_betweenness_er(spark):
    for seed in (2, 7):
        arcs = er_arcs(14, 0.18, seed)
        _check(spark, arcs, 14)
