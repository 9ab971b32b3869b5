"""k-core, HITS, clustering coefficients vs brute-force references."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import edge_df

from webgraph_spark.algo.hits import hits
from webgraph_spark.algo.kcore import degeneracy_order_bound, k_core, k_core_edges
from webgraph_spark.algo.triangles import (
    global_clustering_coefficient,
    local_clustering_coefficient,
)


def _sym_adj(arcs):
    adj: dict[int, set[int]] = {}
    for s, d in arcs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return adj


def _kcore_ref(arcs, k):
    """Sequential peeling reference."""
    adj = {u: set(vs) for u, vs in _sym_adj(arcs).items()}
    changed = True
    while changed:
        changed = False
        for u in list(adj):
            if len(adj[u]) < k:
                for v in adj[u]:
                    adj[v].discard(u)
                del adj[u]
                changed = True
    return set(adj)


# triangle + pendant + 4-clique, plus an isolated-ish chain
ARCS = [
    (1, 2), (2, 3), (3, 1),          # triangle
    (3, 4),                          # pendant off the triangle
    (10, 11), (10, 12), (10, 13),    # 4-clique
    (11, 12), (11, 13), (12, 13),
    (20, 21), (21, 22),              # chain
]


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_k_core_matches_sequential_peel(spark, k):
    got = {
        r["id"] for r in k_core(edge_df(spark, ARCS), k).nodes.collect()
    }
    assert got == _kcore_ref(ARCS, k)


@pytest.mark.parametrize("seed,k", [(0, 2), (1, 3), (2, 4)])
def test_k_core_random_graph_matches_peel(spark, seed, k):
    # random multigraph with self-loops, duplicate arcs, and both
    # orientations — exercises the dedup/symmetrize front and the
    # incremental decrement bookkeeping over multi-round peels
    rng = np.random.default_rng(seed)
    arcs = [
        (int(s), int(d))
        for s, d in rng.integers(0, 40, size=(300, 2))
    ]
    got = {r["id"] for r in k_core(edge_df(spark, arcs), k).nodes.collect()}
    assert got == _kcore_ref(arcs, k)


def test_k_core_edges_induced(spark):
    e = k_core_edges(edge_df(spark, ARCS), 3).collect()
    got = {(r["src"], r["dst"]) for r in e}
    clique = {10, 11, 12, 13}
    assert got == {(s, d) for (s, d) in ARCS if s in clique and d in clique}


def test_degeneracy_bound(spark):
    # densest subgraph is the 4-clique: degeneracy 3
    assert degeneracy_order_bound(edge_df(spark, ARCS)) == 3


def _hits_ref(arcs, iters=200):
    nodes = sorted({x for a in arcs for x in a})
    idx = {v: i for i, v in enumerate(nodes)}
    a_mat = np.zeros((len(nodes), len(nodes)))
    for s, d in arcs:
        a_mat[idx[s], idx[d]] = 1.0
    hub = np.ones(len(nodes)) / np.sqrt(len(nodes))
    for _ in range(iters):
        auth = a_mat.T @ hub
        auth /= np.linalg.norm(auth)
        hub = a_mat @ auth
        hub /= np.linalg.norm(hub)
    return (
        {v: hub[idx[v]] for v in nodes},
        {v: auth[idx[v]] for v in nodes},
    )


def test_hits_matches_numpy_power_iteration(spark):
    arcs = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (4, 5), (5, 1)]
    res = hits(edge_df(spark, arcs), max_iter=200, tol=1e-12)
    hub_ref, auth_ref = _hits_ref(arcs)
    got = {r["id"]: (r["hub"], r["auth"]) for r in res.scores.collect()}
    for v, (h, a) in got.items():
        assert h == pytest.approx(hub_ref[v], abs=1e-6)
        assert a == pytest.approx(auth_ref[v], abs=1e-6)
    assert res.converged


def test_hits_empty_graph_keeps_uniform(spark):
    arcs_only_loops = [(1, 1), (2, 2)]
    res = hits(edge_df(spark, arcs_only_loops), max_iter=5)
    got = {r["id"]: r["hub"] for r in res.scores.collect()}
    # self-loops: every node is its own hub/auth; just assert it runs and
    # returns a row per node with finite scores
    assert set(got) == {1, 2}
    assert all(np.isfinite(v) for v in got.values())


def _lcc_ref(arcs):
    adj = _sym_adj(arcs)
    out = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            out[v] = 0.0
            continue
        t = sum(
            1
            for u in nbrs
            for w in nbrs
            if u < w and w in adj[u]
        )
        out[v] = 2.0 * t / (d * (d - 1))
    return out


def test_local_clustering_coefficient(spark):
    got = {
        r["id"]: r["lcc"]
        for r in local_clustering_coefficient(edge_df(spark, ARCS)).collect()
    }
    ref = _lcc_ref(ARCS)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-12)


def test_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert k_core(empty, 2).nodes.count() == 0
    assert local_clustering_coefficient(empty).count() == 0
    assert global_clustering_coefficient(empty) == 0.0
    res = hits(empty, nodes=spark.createDataFrame([(1,), (2,)], "id long"))
    got = {r["id"]: (r["hub"], r["auth"]) for r in res.scores.collect()}
    assert set(got) == {1, 2}  # arcless graph keeps the uniform start
    only_loops = edge_df(spark, [(5, 5)])
    assert k_core(only_loops, 1).nodes.count() == 0  # loops dropped


def test_global_clustering_coefficient(spark):
    adj = _sym_adj(ARCS)
    wedges = sum(len(n) * (len(n) - 1) / 2 for n in adj.values())
    tri = sum(
        1
        for u in adj
        for v in adj[u]
        for w in adj[v]
        if u < v < w and w in adj[u]
    )
    ref = 3.0 * tri / wedges
    assert global_clustering_coefficient(
        edge_df(spark, ARCS)
    ) == pytest.approx(ref, abs=1e-12)
