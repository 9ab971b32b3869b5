"""Exact geometric centralities via all-sources BFS.

Reference: ``algo/GeometricCentralities.java:70-211`` — one BFS per node
(thread pool), accumulating closeness (1/Σd), harmonic (Σ 1/d), Lin
(r²/Σd with r = reachable count incl. the node), exponential (Σ α^d), and
reachable counts; update rule at ``:184-202``. The distributed form runs all
sources as ONE level-synchronous job over a `(source, node, dist)` pair
table — the frontier is a DataFrame keyed by source, so every BFS advances
in the same Spark job instead of one thread per source.

State is O(reachable pairs): exact path, meant for moderate graphs or a
sampled source set (pass ``sources``); the approximate scale path is
:mod:`webgraph_spark.algo.hyperball`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.plans.iterate import checkpoint_state


def all_pairs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 64,
) -> DataFrame:
    """``(s, v, dist)`` for every source s and node v reachable from it."""
    from pyspark.sql import Observation

    visited = sources.select(
        F.col("id").alias("s"), F.col("id").alias("v")
    ).withColumn("dist", F.lit(0)).transform(checkpoint_state)
    frontier = visited
    for depth in range(1, max_depth + 1):
        # one action per level: the frontier count rides the eager
        # checkpoint (no separate isEmpty job); visited stays a lazy union
        # of checkpointed level frames (bfs.py pattern).
        obs = Observation()
        nxt = (
            frontier.join(edges, frontier["v"] == edges["src"])
            .select("s", F.col("dst").alias("v"))
            .distinct()
            .join(visited.select("s", "v"), ["s", "v"], "left_anti")
            .withColumn("dist", F.lit(depth))
            .observe(obs, F.count(F.lit(1)).alias("c"))
            .transform(checkpoint_state)
        )
        if int(obs.get["c"] or 0) == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def geometric_centralities(
    edges: DataFrame,
    nodes: DataFrame,
    alpha: float = 0.5,
    max_depth: int = 64,
) -> DataFrame:
    """Exact ``(id, reachable, sum_dist, closeness, harmonic, lin, exponential)``
    (``GeometricCentralities.java:184-211`` accumulators; conventions: nodes
    reaching nothing have closeness 0 and Lin 1)."""
    pairs = all_pairs_distances(edges, nodes.select("id"), max_depth)
    agg = (
        pairs.filter(F.col("dist") > 0)
        .groupBy(F.col("s").alias("id"))
        .agg(
            F.count(F.lit(1)).alias("__r_out"),
            F.sum("dist").alias("sum_dist"),
            F.sum(1.0 / F.col("dist")).alias("harmonic"),
            F.sum(F.pow(F.lit(alpha), F.col("dist"))).alias("exponential"),
        )
    )
    return (
        nodes.select("id")
        .join(agg, "id", "left")
        .na.fill({"__r_out": 0, "sum_dist": 0, "harmonic": 0.0, "exponential": 0.0})
        .select(
            "id",
            (F.col("__r_out") + 1).alias("reachable"),
            "sum_dist",
            F.when(F.col("sum_dist") > 0, 1.0 / F.col("sum_dist"))
            .otherwise(0.0)
            .alias("closeness"),
            "harmonic",
            F.when(
                F.col("sum_dist") > 0,
                (F.col("__r_out") + 1) * (F.col("__r_out") + 1)
                / F.col("sum_dist").cast("double"),
            )
            .otherwise(1.0)
            .alias("lin"),
            "exponential",
        )
    )


def top_k_geometric(
    edges: DataFrame,
    nodes: DataFrame,
    k: int = 10,
    metric: str = "harmonic",
    log2m: int = 8,
    slack: float = 3.0,
    max_depth: int = 64,
    alpha: float = 0.5,
    rank_round: int | None = None,
) -> DataFrame:
    """Top-k nodes by a geometric centrality, HyperBall-pruned.

    ``rank_round`` rounds the metric to that many decimals BEFORE the final
    ranking (and in the output) — nodes whose scores are mathematically
    equal (same distance multiset) then tie-break by id identically in any
    engine, instead of by float summation-order noise. Use it whenever the
    ranking must be reproducible across engines/runs.

    Reference: ``algo/TopKGeometricCentrality.java:80`` prunes per-source
    BFS with running cutoff bounds. The distributed analogue prunes the
    SOURCE SET instead: one HyperBall pass scores every node approximately;
    only nodes whose approximate score could plausibly reach the k-th
    approximate score — within ``slack`` relative standard deviations
    (RSD ≈ 1.06/√m, m = 2^log2m) — run the exact all-sources BFS. The
    exact phase then re-ranks the (typically ≪ n) candidates.

    The guarantee is probabilistic with the standard HLL confidence (each
    score within slack·RSD in the usual concentration sense); slack=3 makes
    a missed true-top-k node a ≥3σ event per node. Exact fallback: pass
    ``slack=float('inf')`` to score everything (degenerates to
    :func:`geometric_centralities` + sort).
    """
    from webgraph_spark.algo.hyperball import centralities, hyperball

    if metric not in ("harmonic", "closeness", "lin", "reachable"):
        raise ValueError(f"unsupported metric {metric!r}")
    rsd = 1.06 / (1 << log2m) ** 0.5
    approx = centralities(hyperball(edges, nodes, log2m=log2m)).persist()
    kth = (
        approx.orderBy(F.desc(metric))
        .limit(k)
        .agg(F.min(metric))
        .collect()[0][0]
        or 0.0
    )
    # any node whose approx score could exceed the k-th approx score after
    # undoing up to slack·RSD error on both sides is a candidate
    threshold = kth * (1.0 - slack * rsd) / (1.0 + slack * rsd)
    cands = approx.filter(F.col(metric) >= threshold).select("id")
    pairs = all_pairs_distances(edges, cands, max_depth)
    agg = (
        pairs.filter(F.col("dist") > 0)
        .groupBy(F.col("s").alias("id"))
        .agg(
            F.count(F.lit(1)).alias("__r_out"),
            F.sum("dist").alias("sum_dist"),
            F.sum(1.0 / F.col("dist")).alias("harmonic"),
            F.sum(F.pow(F.lit(alpha), F.col("dist"))).alias("exponential"),
        )
    )
    exact = (
        cands.join(agg, "id", "left")
        .na.fill({"__r_out": 0, "sum_dist": 0, "harmonic": 0.0})
        .select(
            "id",
            (F.col("__r_out") + 1).cast("double").alias("reachable"),
            F.when(F.col("sum_dist") > 0, 1.0 / F.col("sum_dist"))
            .otherwise(0.0)
            .alias("closeness"),
            "harmonic",
            F.when(
                F.col("sum_dist") > 0,
                (F.col("__r_out") + 1) * (F.col("__r_out") + 1)
                / F.col("sum_dist").cast("double"),
            )
            .otherwise(1.0)
            .alias("lin"),
        )
    )
    from pyspark.sql import Window

    if rank_round is not None:
        exact = exact.withColumn(metric, F.round(metric, rank_round))
    w = Window.orderBy(F.desc(metric), F.asc("id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "id", metric)
    )
