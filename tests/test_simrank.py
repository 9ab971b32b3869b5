"""SimRank vs dense numpy oracle (Jeh–Widom iteration)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.oracles import er_arcs
from webgraph_spark.algo.simrank import simrank


def simrank_numpy(arcs, n, c=0.8, iters=10):
    in_nbrs = [[] for _ in range(n)]
    for a, b in arcs:
        in_nbrs[b].append(a)
    s = np.eye(n)
    for _ in range(iters):
        new = np.eye(n)
        for a in range(n):
            for b in range(n):
                if a == b or not in_nbrs[a] or not in_nbrs[b]:
                    continue
                tot = sum(s[i, j] for i in in_nbrs[a] for j in in_nbrs[b])
                new[a, b] = c * tot / (len(in_nbrs[a]) * len(in_nbrs[b]))
        if np.abs(new - s).max() < 1e-12:
            s = new
            break
        s = new
    return s


def test_simrank_simple_fixture(spark):
    # classic univ example-ish: two nodes pointed at by the same parents
    arcs = [(0, 2), (0, 3), (1, 2), (1, 3), (2, 4)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    res = simrank(edges, max_iter=8, tol=1e-9)
    got = {(r["a"], r["b"]): r["s"] for r in res.scores.collect()}
    want = simrank_numpy(arcs, 5, iters=8)
    # 2 and 3 share both in-neighbours {0,1}:
    # s = c/4 * (s(0,0)+s(0,1)+s(1,0)+s(1,1)) = c/4 * 2 = c/2
    assert got[(2, 3)] == pytest.approx(0.4, abs=1e-9)
    for (a, b), s in got.items():
        assert s == pytest.approx(want[a, b], abs=1e-9)
    # zeros omitted, but every present pair must match; spot-check a zero
    assert (0, 1) not in got  # sources have no in-neighbours


def test_simrank_vs_numpy_er(spark):
    arcs = er_arcs(12, 0.2, seed=6)
    edges = spark.createDataFrame(arcs, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    res = simrank(edges, nodes, max_iter=6, tol=0.0)
    want = simrank_numpy(arcs, 12, iters=6)
    got = {(r["a"], r["b"]): r["s"] for r in res.scores.collect()}
    for a in range(12):
        for b in range(12):
            assert got.get((a, b), 0.0) == pytest.approx(want[a, b], abs=1e-9)
