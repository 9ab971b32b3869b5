"""Frontier BFS: single/multi-source distances + neighbourhood function.

Reference: ``algo/ParallelBreadthFirstVisit.java:65-245`` (level-synchronous
parallel BFS, frontier queue + cutpoints per level). The Spark formulation:
the frontier is a DataFrame; one join per level expands it; visited state is
the accumulated distance table. ``NeighbourhoodFunction``
(``algo/NeighbourhoodFunction.java:58-100``) = n BFS runs, used here only as
a test-scale oracle exactly as the reference uses it for HyperBall tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.plans.iterate import checkpoint_state


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 64,
) -> DataFrame:
    """Distances from a source set ``(id)`` along directed arcs -> (id, dist).

    Unreached nodes are absent (the reference marks them -1). Level loop =
    driver iterations; each level is ONE Spark action: the frontier size
    rides the eager checkpoint as an observed metric (no separate
    ``isEmpty`` job), and ``visited`` stays a lazy union of the
    already-checkpointed level frames (re-checkpointing the growing union
    every level would re-copy all visited rows per level — O(levels·n)).
    """
    from pyspark.sql import Observation

    frontier = (
        sources.select("id").withColumn("dist", F.lit(0))
        .transform(checkpoint_state)
    )
    visited = frontier
    for depth in range(1, max_depth + 1):
        obs = Observation()
        # checkpointed frames scan as ExistingRDD with UNKNOWN stats, so
        # without hints AQE can pick the persisted EDGE side as the
        # broadcast build (re-broadcasting the graph every level). The
        # SHUFFLE_HASH hints pin the O(frontier)/O(visited) sides as the
        # shuffled hash-build sides; a pre-partitioned edge set streams
        # with no exchange.
        nxt = (
            edges.join(
                frontier.hint("shuffle_hash"), edges["src"] == frontier["id"]
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id").hint("shuffle_hash"), "id", "left_anti")
            .withColumn("dist", F.lit(depth))
            .observe(obs, F.count(F.lit(1)).alias("c"))
            .transform(checkpoint_state)
        )
        if int(obs.get["c"] or 0) == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def eccentricity_info(distances: DataFrame) -> dict:
    """max distance + node attaining it (``ParallelBreadthFirstVisit.java:315-330``)."""
    row = distances.agg(
        F.max("dist").alias("ecc"), F.max_by("id", "dist").alias("node")
    ).collect()[0]
    return {"eccentricity": row["ecc"], "node_at_max_distance": row["node"]}


def neighbourhood_function(
    edges: DataFrame, nodes: DataFrame, max_t: int = 32
) -> list[int]:
    """Exact N(t) = number of pairs within distance <= t, by iterative pair
    expansion (test-scale oracle; ``NeighbourhoodFunction.java:100``).

    State = reachable pair set (src, id, dist<=t); grows to n^2 worst case —
    use only on fixtures, exactly like the reference's exact NF.
    """
    pairs = nodes.select(F.col("id").alias("s"), F.col("id").alias("v"))
    pairs = pairs.transform(checkpoint_state)
    nf = [pairs.count()]
    for _ in range(1, max_t + 1):
        expanded = (
            pairs.join(edges, pairs["v"] == edges["src"])
            .select("s", F.col("dst").alias("v"))
            .unionByName(pairs)
            .distinct()
            .transform(checkpoint_state)
        )
        cnt = expanded.count()
        if cnt == nf[-1]:
            break
        nf.append(cnt)
        pairs = expanded
    return nf
