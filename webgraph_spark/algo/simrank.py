"""SimRank: structural similarity by iterated in-neighbour averaging.

Reference: ``scratch/SimRank.java`` (package-named "scratch" — unsupported
experiment; SURVEY §2.6 lists it as the one stretch op). Semantics from the
Jeh–Widom KDD'02 definition::

    s(a, a) = 1
    s(a, b) = C / (|I(a)||I(b)|) * sum_{i in I(a), j in I(b)} s(i, j)
    s(a, b) = 0 when I(a) or I(b) is empty (a != b)

State is the dense pair table ``(a, b, s)`` — O(n²) rows: a test-scale /
per-query operator like the reference's, not a whole-graph 10^12 job (for
that one uses the single-source push variant or random-walk sampling —
noted, not implemented). Each iteration is two joins against the in-edge
table + one aggregate; only nonzero pairs are materialized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.plans.iterate import checkpoint_state


@dataclass
class SimRankResult:
    scores: DataFrame  # (a, b, s) — symmetric, diagonal = 1, zeros omitted
    iterations: int = 0
    deltas: list[float] = field(default_factory=list)


def simrank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    c: float = 0.8,
    max_iter: int = 10,
    tol: float = 1e-4,
) -> SimRankResult:
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    nodes = nodes.select("id").persist()
    # in-edges: (node, in_nbr)
    ine = edges.select(
        F.col("dst").alias("node"), F.col("src").alias("nbr")
    ).persist()
    ine.count()
    indeg = ine.groupBy("node").agg(F.count(F.lit(1)).alias("d")).persist()

    diag = nodes.select(
        F.col("id").alias("a"), F.col("id").alias("b"), F.lit(1.0).alias("s")
    )
    scores = diag.transform(checkpoint_state)
    result = SimRankResult(scores=scores)
    e_a = ine.select(F.col("node").alias("a"), F.col("nbr").alias("i"))
    e_b = ine.select(F.col("node").alias("b"), F.col("nbr").alias("j"))
    d_a = indeg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    d_b = indeg.select(F.col("node").alias("b"), F.col("d").alias("db"))

    for it in range(max_iter):
        summed = (
            e_a.join(scores.withColumnRenamed("a", "i").withColumnRenamed("b", "j"), "i")
            .join(e_b, "j")
            .groupBy("a", "b")
            .agg(F.sum("s").alias("ss"))
        )
        offdiag = (
            summed.join(d_a, "a")
            .join(d_b, "b")
            .filter(F.col("a") != F.col("b"))
            .select(
                "a",
                "b",
                (F.lit(c) * F.col("ss") / (F.col("da") * F.col("db"))).alias("s"),
            )
        )
        new_scores = diag.unionByName(offdiag).transform(checkpoint_state)
        delta = (
            new_scores.alias("n")
            .join(scores.alias("o"), ["a", "b"], "outer")
            .agg(
                F.max(
                    F.abs(
                        F.coalesce(F.col("n.s"), F.lit(0.0))
                        - F.coalesce(F.col("o.s"), F.lit(0.0))
                    )
                ).alias("d")
            )
            .collect()[0]["d"]
            or 0.0
        )
        scores = new_scores
        result.iterations = it + 1
        result.deltas.append(float(delta))
        if delta < tol:
            break
    result.scores = scores
    return result
