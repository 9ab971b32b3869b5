"""Exact directed diameter/radius via SumSweep bound refinement.

Reference: ``algo/SumSweepDirectedDiameterRadius.java:137`` (Borassi,
Crescenzi, Habib, Kosters, Marino, Takes — "Fast diameter and radius
BFS-based computation in (weakly connected) real-world graphs", 2015) and
the warm-up heuristic ``algo/FourSweepIterativeFringeDiameter.java:104``.
The reference runs sequential BFS visits and keeps per-node eccentricity
bounds in arrays; here each sweep is the existing frontier BFS
(:func:`webgraph_spark.algo.bfs.bfs_distances`) over the pre-partitioned
cached graph, and the bounds live in a small ``(id, lF, uF)`` DataFrame
updated by one join per sweep — O(n) state, never O(n²).

Bound rules per sweep from pivot ``w`` (one forward + one backward BFS):

- forward distances d(w, ·): ``eccF(w)`` becomes exact;
- backward distances d(·, w): ``lF(v) = max(lF(v), d(v, w))`` and
  ``uF(v) = min(uF(v), d(v, w) + eccF(w))``.

Diameter is resolved when every node's ``uF`` is ≤ the best lower bound
``DL``; radius when no node's ``lF`` is below the best upper bound ``RU``.
Exactness requires every node to reach the pivots used in its upper bound —
guaranteed on a strongly connected graph, which is the reference's effective
operating regime too (it condenses SCCs first); run on
``extract_component``'s largest SCC for general graphs. Nodes that never
acquire a finite upper bound fall back to their own exact BFS, so the result
is exact in all cases — worst case O(n) sweeps, same as the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.plans.iterate import checkpoint_state

from webgraph_spark.algo.bfs import bfs_distances
from webgraph_spark.operators.transform import transpose

_INF = 1 << 30


def _sssp(edges: DataFrame, node: int, max_depth: int) -> DataFrame:
    spark = edges.sparkSession
    src = spark.createDataFrame([(int(node),)], "id long")
    return bfs_distances(edges, src, max_depth=max_depth)


def _ecc_far(dist: DataFrame) -> tuple[int, int]:
    row = dist.agg(
        F.max("dist").alias("ecc"), F.max_by("id", "dist").alias("far")
    ).collect()[0]
    return int(row["ecc"]), int(row["far"])


def four_sweep(edges: DataFrame, start: int | None = None, max_depth: int = 1024) -> dict:
    """FourSweep warm-up (``FourSweepIterativeFringeDiameter.java:104``):
    fwd(r) → a1, bwd(a1) → b1, fwd(b1) → a2, bwd(a2) → b2. Returns the
    diameter lower bound (max ecc seen) and the midpoint-ish pivots the
    exact phase should start from."""
    fwd = edges.select("src", "dst").persist()
    bwd = transpose(edges).persist()
    fwd.count(), bwd.count()
    if start is None:
        start = int(edges.agg(F.min("src")).collect()[0][0])
    pivots, lb, node = [], 0, start
    for g in (fwd, bwd, fwd, bwd):
        ecc, far = _ecc_far(_sssp(g, node, max_depth))
        pivots.append(node)
        lb = max(lb, ecc)
        node = far
    fwd.unpersist(), bwd.unpersist()
    return {"diameter_lower_bound": lb, "pivots": pivots, "last_far": node}


@dataclass
class DiameterRadiusResult:
    diameter: int
    radius: int
    diameter_node: int  # a node attaining eccF == diameter
    radius_node: int  # a node attaining eccF == radius
    sweeps: int = 0
    bfs_runs: int = 0
    ecc_exact: dict[int, int] = field(default_factory=dict)


def sumsweep_diameter_radius(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    warmup_sweeps: int = 4,
    max_depth: int = 1024,
    max_sweeps: int = 10_000,
    symmetric: bool = False,
) -> DiameterRadiusResult:
    """Exact directed diameter and radius (forward eccentricities).

    Intended for strongly connected inputs (pass the largest SCC); on other
    graphs eccentricities are over each node's reachable set and the
    per-node exact-BFS fallback keeps the result exact.

    ``symmetric=True`` declares the edge set symmetric (the undirected
    variant, ``SumSweepUndirectedDiameterRadius.java:115``): forward and
    backward distances coincide, so each sweep costs ONE BFS instead of
    two — pass a symmetrized edge table (see :func:`sumsweep_undirected`).
    """
    from webgraph_spark.plans.partitioning import partition_for_join

    edges = edges.select("src", "dst")
    fwd = partition_for_join(edges, "src").persist()
    if symmetric:
        bwd = fwd
        fwd.count()
    else:
        bwd = partition_for_join(transpose(edges), "src").persist()
        fwd.count(), bwd.count()
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    # bounds table: (id, lF, uF) — lF/uF bound the forward eccentricity
    bounds = (
        nodes.select("id")
        .withColumn("lF", F.lit(0))
        .withColumn("uF", F.lit(_INF))
        .transform(checkpoint_state)
    )
    res = DiameterRadiusResult(diameter=0, radius=_INF, diameter_node=-1, radius_node=-1)
    dl, ru = 0, _INF  # best diameter lower / radius upper bound so far
    done: set[int] = set()

    def sweep(w: int) -> tuple[int, int]:
        """Forward+backward BFS from w; returns the two farthest nodes
        (forward, backward) so callers can chain sweeps without extra BFS."""
        nonlocal bounds, dl, ru
        dist_f = _sssp(fwd, w, max_depth).persist()
        ecc_f, far_f = _ecc_far(dist_f)
        dist_b = dist_f if symmetric else _sssp(bwd, w, max_depth)
        res.bfs_runs += 1 if symmetric else 2
        res.ecc_exact[w] = ecc_f
        done.add(w)
        if ecc_f > dl:
            dl, res.diameter_node = ecc_f, w
        if ecc_f < ru:
            ru, res.radius_node = ecc_f, w
        # d(v, w) = backward distance from w; one join updates both bounds.
        # The pivot's own eccentricity is now exact: pin lF(w) = uF(w).
        db = dist_b.select("id", F.col("dist").alias("__d"))
        bounds = (
            bounds.join(db, "id", "left")
            .select(
                "id",
                F.when(F.col("id") == w, F.lit(ecc_f))
                .otherwise(F.greatest("lF", F.coalesce("__d", F.lit(0))))
                .alias("lF"),
                F.when(F.col("id") == w, F.lit(ecc_f))
                .otherwise(
                    F.least(
                        "uF", F.coalesce(F.col("__d") + ecc_f, F.lit(_INF))
                    )
                )
                .alias("uF"),
            )
            .transform(checkpoint_state)
        )
        dist_f.unpersist()
        res.sweeps += 1
        _, far_b = _ecc_far(dist_b) if ecc_f else (0, w)
        return far_f, far_b

    # -- warm-up: four-sweep style alternation from min id ----------------
    start = int(nodes.agg(F.min("id")).collect()[0][0])
    node = start
    for s in range(warmup_sweeps):
        far_f, far_b = sweep(node)
        # farthest node of the sweep just done seeds the next sweep
        node = far_f if s % 2 == 0 else far_b
        if node in done:
            break  # refinement loop picks real targets

    # -- refinement: resolve diameter (max uF) and radius (min lF) --------
    for _ in range(max_sweeps):
        row = bounds.agg(
            F.max(F.when(F.col("uF") > dl, F.col("uF"))).alias("mu"),
            F.max_by("id", F.when(F.col("uF") > dl, F.col("uF"))).alias("wu"),
            F.min(F.when(F.col("lF") < ru, F.col("lF"))).alias("ml"),
            F.min_by("id", F.when(F.col("lF") < ru, F.col("lF"))).alias("wl"),
        ).collect()[0]
        diam_open = row["mu"] is not None
        rad_open = row["ml"] is not None
        if not diam_open and not rad_open:
            break
        # alternate targets like the reference's strategy rotation: attack
        # the larger gap first
        if diam_open:
            sweep(int(row["wu"]))
        if rad_open:
            w2 = int(row["wl"])
            if w2 not in done:
                sweep(w2)
    res.diameter, res.radius = dl, ru
    fwd.unpersist(), bwd.unpersist()
    return res


def sumsweep_undirected(
    edges: DataFrame, nodes: DataFrame | None = None, **kwargs
) -> DiameterRadiusResult:
    """Exact UNDIRECTED diameter/radius
    (``SumSweepUndirectedDiameterRadius.java:115``): symmetrize the arcs,
    then run the directed machinery with ``symmetric=True`` — forward and
    backward distances coincide, so each sweep is a single BFS. Intended
    for one connected component (compose with ``extract_component``)."""
    from webgraph_spark.operators.transform import symmetrize

    return sumsweep_diameter_radius(
        symmetrize(edges), nodes, symmetric=True, **kwargs
    )
