"""Driver-side reference implementations (independent of the engine code).

Mirrors the reference's differential-testing discipline
(``ConnectedComponentsTest.java:30-62``: parallel BFS CC vs sequential
Tarjan; ``HyperBallTest``: HyperBall vs SequentialHyperBall).
"""

from __future__ import annotations

from collections import Counter


def cc_union_find(arcs, nodes):
    """Undirected connected components; comp = min member id."""
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in arcs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, list[int]] = {}
    for v in nodes:
        groups.setdefault(find(v), []).append(v)
    out = {}
    for members in groups.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def lpa_sync(arcs, nodes, max_iter):
    """Synchronous LPA, min tie-break, over the symmetrized graph."""
    nbrs: dict[int, list[int]] = {v: [] for v in nodes}
    seen = set()
    for a, b in arcs:
        for x, y in ((a, b), (b, a)):
            if x != y or True:  # loops allowed; symmetrize
                if (x, y) not in seen:
                    seen.add((x, y))
                    nbrs[y].append(x)  # in-neighbours under symmetrized arcs
    labels = {v: v for v in nodes}
    for _ in range(max_iter):
        new = {}
        for v in nodes:
            if not nbrs[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            labels = new
            break
        labels = new
    return labels


def triangles_brute(arcs, nodes):
    """Exact triangle enumeration on the simple (symmetrized, loop-free) graph."""
    adj: dict[int, set[int]] = {v: set() for v in nodes}
    for a, b in arcs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    count = 0
    per_vertex = Counter()
    vs = sorted(nodes)
    for i, a in enumerate(vs):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    count += 1
                    per_vertex[a] += 1
                    per_vertex[b] += 1
                    per_vertex[c] += 1
    return count, dict(per_vertex)


def bfs_dists(arcs, sources):
    adj: dict[int, list[int]] = {}
    for a, b in arcs:
        adj.setdefault(a, []).append(b)
    dist = {s: 0 for s in sources}
    frontier = list(sources)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


def er_arcs(n, p, seed):
    """Seeded Erdős–Rényi G(n,p) arcs (reference: examples/ErdosRenyiGraph.java:59)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < p
    np.fill_diagonal(m, False)
    src, dst = np.nonzero(m)
    return list(zip(src.tolist(), dst.tolist()))


def scc_tarjan(arcs, nodes):
    """Iterative Tarjan; returns {node: min member id of its SCC}
    (the reference's sequential algorithm, StronglyConnectedComponents.java)."""
    adj: dict[int, list[int]] = {v: [] for v in nodes}
    for a, b in arcs:
        adj[a].append(b)
    index = {}
    low = {}
    on_stack = set()
    stack: list[int] = []
    counter = [0]
    comps: list[list[int]] = []

    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                comps.append(comp)
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    out = {}
    for comp in comps:
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def betweenness_brandes(arcs, nodes):
    """Sequential Brandes (directed, endpoints excluded) — the reference's
    algorithm (BetweennessCentrality.java:79)."""
    from collections import deque

    adj: dict[int, list[int]] = {v: [] for v in nodes}
    for a, b in arcs:
        adj[a].append(b)
    bc = {v: 0.0 for v in nodes}
    for s in nodes:
        sigma = {v: 0.0 for v in nodes}
        dist = {v: -1 for v in nodes}
        preds: dict[int, list[int]] = {v: [] for v in nodes}
        sigma[s], dist[s] = 1.0, 0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in nodes}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc
