"""Exact betweenness centrality — batched Brandes over all sources.

Reference: ``algo/BetweennessCentrality.java:79-256`` (Brandes 2001 with one
BFS per source on a thread pool, overflow-checked path counts). The Spark
formulation batches EVERY source into one level-synchronous job, keyed by
``(s, v)``:

- forward sweep: BFS levels carrying σ(s, v) = number of shortest s→v paths
  (summed over parents per level — one join + aggregate per level);
- backward sweep: dependencies δ(s, v) accumulated from the deepest level
  up, δ(v) += σ(v)/σ(w) · (1 + δ(w)) over arcs (v, w) one level apart;
- betweenness(v) = Σ_s δ(s, v).

State is O(reachable pairs) — exact/test-scale like the reference (its
javadoc warns the same); sampling sources (pass ``sources``) is the standard
approximation at scale. Directed-graph convention, endpoints excluded,
matching the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.plans.iterate import checkpoint_state


def betweenness(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    sources: DataFrame | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """``(id, betweenness)`` for every node (zeros included)."""
    edges = edges.select("src", "dst").persist()
    edges.count()
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    nodes = nodes.select("id").persist()
    if sources is None:
        sources = nodes

    # -- forward: visited(s, v, dist, sigma) ------------------------------
    visited = (
        sources.select(F.col("id").alias("s"), F.col("id").alias("v"))
        .withColumn("dist", F.lit(0))
        .withColumn("sigma", F.lit(1.0))
        .transform(checkpoint_state)
    )
    frontier = visited
    depth = 0
    drained = False
    for depth in range(1, max_depth + 2):
        expand = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .groupBy("s", F.col("dst").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited.select("s", "v"), ["s", "v"], "left_anti")
            .withColumn("dist", F.lit(depth))
            .select("s", "v", "dist", "sigma")
            .transform(checkpoint_state)
        )
        if expand.isEmpty():
            depth -= 1
            drained = True
            break
        if depth > max_depth:
            break
        visited = visited.unionByName(expand).transform(checkpoint_state)
        frontier = expand
    if not drained:
        # paths deeper than max_depth exist: values would be silently wrong
        raise ValueError(
            f"betweenness forward sweep truncated at max_depth={max_depth} "
            "with a non-empty frontier; raise max_depth"
        )

    # -- backward: delta accumulation from deepest level up ----------------
    # arcs one level apart, per source: (s, v, w) with dist_w = dist_v + 1
    vstate = visited.persist()
    deltas = vstate.select("s", "v").withColumn(
        "delta", F.lit(0.0)
    ).transform(checkpoint_state)
    for d in range(depth, 0, -1):
        upper = (
            vstate.filter(F.col("dist") == d)
            .join(deltas, ["s", "v"])
            .select(
                "s",
                F.col("v").alias("w"),
                (F.lit(1.0) + F.col("delta")).alias("__t"),
                F.col("sigma").alias("__sw"),
            )
        )
        lower = vstate.filter(F.col("dist") == d - 1).select(
            "s", F.col("v"), F.col("sigma").alias("__sv")
        )
        contribs = (
            lower.join(edges, lower["v"] == edges["src"])
            .join(
                upper,
                (F.col("dst") == upper["w"]) & (lower["s"] == upper["s"]),
            )
            .groupBy(lower["s"].alias("s"), "v")
            .agg(F.sum(F.col("__sv") / F.col("__sw") * F.col("__t")).alias("__c"))
        )
        deltas = (
            deltas.join(contribs, ["s", "v"], "left")
            .select(
                "s",
                "v",
                (F.col("delta") + F.coalesce("__c", F.lit(0.0))).alias("delta"),
            )
            .transform(checkpoint_state)
        )
    out = (
        deltas.filter(F.col("s") != F.col("v"))
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum("delta").alias("betweenness"))
    )
    return (
        nodes.join(out, "id", "left")
        .na.fill({"betweenness": 0.0})
        .select("id", "betweenness")
    )
