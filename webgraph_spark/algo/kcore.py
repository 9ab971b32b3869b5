"""k-core: maximal subgraph where every node has undirected degree >= k.

No reference counterpart (lfoscari/webgraph has no core decomposition); the
semantics are the standard peeling fixpoint (Seidman 1983): repeatedly drop
nodes of degree < k in the remaining subgraph. Deterministic given (graph, k).

Scale shape: the symmetrized edge set is cached hash-partitioned by src once
(one shuffle); each peel round re-derives the surviving degree table with a
semi-join + one aggregate, and the dropped-count rides the eager state
checkpoint as an observed metric — one Spark action per round. Rounds are
bounded by the peeling depth (<= n, in practice tiny: each round removes
every node below k simultaneously, the parallel variant of the sequential
peel). State per round is the surviving node set — O(n), never O(m).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from webgraph_spark.plans.iterate import checkpoint_state
from webgraph_spark.plans.partitioning import symmetrize_for_join


@dataclass
class KCoreResult:
    nodes: DataFrame  # (id) — members of the k-core
    iterations: int
    dropped_per_iter: list[int] = field(default_factory=list)
    iter_seconds: list[float] = field(default_factory=list)


def k_core(edges: DataFrame, k: int, max_iter: int = 1000) -> KCoreResult:
    """Node set of the k-core of the symmetrized, loop-free graph."""
    sym = (
        symmetrize_for_join(edges, "src")
        .filter(F.col("src") != F.col("dst"))
        .persist()
    )
    sym.count()
    alive = (
        sym.select(F.col("src").alias("id")).distinct().transform(checkpoint_state)
    )
    result = KCoreResult(nodes=alive, iterations=0)
    for it in range(max_iter):
        t0 = time.monotonic()
        # degree of each survivor counting only edges whose BOTH endpoints
        # survive; sym is cached partitioned by src so the groupBy reuses it
        deg = (
            sym.join(alive.withColumnRenamed("id", "dst"), "dst", "leftsemi")
            .join(alive.withColumnRenamed("id", "src"), "src", "leftsemi")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        obs = Observation()
        survivors = (
            alive.join(deg, "id", "left")
            .select(
                "id",
                (F.coalesce("deg", F.lit(0)) >= k).cast("int").alias("__keep"),
            )
            .observe(obs, F.sum(1 - F.col("__keep")).alias("dropped"))
            .filter(F.col("__keep") == 1)
            .select("id")
            .transform(checkpoint_state)
        )
        dropped = int(obs.get["dropped"] or 0)
        wall = time.monotonic() - t0
        alive = survivors
        result.dropped_per_iter.append(dropped)
        result.iter_seconds.append(wall)
        result.iterations = it + 1
        if dropped == 0:
            break
    sym.unpersist()
    result.nodes = alive
    return result


def k_core_edges(edges: DataFrame, k: int) -> DataFrame:
    """Arcs of the original (directed) graph induced on the k-core nodes."""
    core = k_core(edges, k).nodes
    return (
        edges.join(core.withColumnRenamed("id", "src"), "src", "leftsemi")
        .join(core.withColumnRenamed("id", "dst"), "dst", "leftsemi")
    )


def degeneracy_order_bound(edges: DataFrame, k_max: int = 64) -> int:
    """Largest k <= k_max with a non-empty k-core (the graph's degeneracy,
    capped) — found by doubling + binary search over k, each probe one
    peeling fixpoint. Test-scale helper; at corpus scale run the single
    ``k_core`` you need instead."""
    lo_k, hi_k = 0, 1
    while hi_k <= k_max and k_core(edges, hi_k).nodes.limit(1).count() > 0:
        lo_k, hi_k = hi_k, hi_k * 2
    hi_k = min(hi_k, k_max + 1)
    while lo_k + 1 < hi_k:
        mid = (lo_k + hi_k) // 2
        if k_core(edges, mid).nodes.limit(1).count() > 0:
            lo_k = mid
        else:
            hi_k = mid
    return lo_k
