"""Deterministic graph generators and fixture families.

Reference counterparts: ``examples/ErdosRenyiGraph.java:59`` (seeded G(n,p))
and the ``ArrayListMutableGraph`` factory families used throughout the
reference's tests (``ArrayListMutableGraph.java:49``: newCompleteGraph,
newBidirectionalCycle, newCompleteBinaryIntree/Outtree, ...).

All generators are pure functions of (shape, seed) built from
``spark.range`` + hash expressions — identical output at any parallelism,
no driver-side data. G(n, p) evaluates all n² candidate pairs (as the
reference's generator conceptually does); it is a fixture generator, not a
bulk loader — for big synthetic graphs use
:func:`webgraph_spark.sources.corpus.synth_corpus`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DENOM = float(1 << 30)


def erdos_renyi(
    spark: SparkSession,
    n: int,
    p: float,
    seed: int = 42,
    loops: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Seeded directed G(n, p) (``examples/ErdosRenyiGraph.java:59``):
    each ordered pair (i, j) is an arc independently with probability p."""
    pairs = spark.range(n * n, numPartitions=num_partitions).select(
        (F.col("id") / n).cast("long").alias("src"),
        F.pmod(F.col("id"), F.lit(n)).cast("long").alias("dst"),
    )
    keep = (
        F.pmod(F.xxhash64(F.lit(seed), F.col("src"), F.col("dst")), F.lit(1 << 30))
        / F.lit(_DENOM)
    ) < F.lit(p)
    out = pairs.filter(keep)
    if not loops:
        out = out.filter(F.col("src") != F.col("dst"))
    return out


def complete_graph(spark: SparkSession, n: int, loops: bool = False) -> DataFrame:
    """K_n (``ArrayListMutableGraph.newCompleteGraph``)."""
    return (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("src"),
            F.pmod(F.col("id"), F.lit(n)).cast("long").alias("dst"),
        )
        .filter(F.lit(loops) | (F.col("src") != F.col("dst")))
    )


def bidirectional_cycle(spark: SparkSession, n: int) -> DataFrame:
    """C_n with arcs both ways (``ArrayListMutableGraph.newBidirectionalCycle``)."""
    r = spark.range(n)
    fwd = r.select(
        F.col("id").alias("src"), F.pmod(F.col("id") + 1, F.lit(n)).alias("dst")
    )
    bwd = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(bwd)


def directed_cycle(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("src"), F.pmod(F.col("id") + 1, F.lit(n)).alias("dst")
    )


def complete_binary_outtree(spark: SparkSession, height: int) -> DataFrame:
    """Arcs parent -> children in a complete binary tree of given height
    (``ArrayListMutableGraph.newCompleteBinaryOuttree``): nodes 0..2^(h+1)-2."""
    n_internal = (1 << height) - 1
    r = spark.range(n_internal)
    left = r.select(F.col("id").alias("src"), (F.col("id") * 2 + 1).alias("dst"))
    right = r.select(F.col("id").alias("src"), (F.col("id") * 2 + 2).alias("dst"))
    return left.unionByName(right)


def complete_binary_intree(spark: SparkSession, height: int) -> DataFrame:
    """Transpose of the out-tree (``newCompleteBinaryIntree``)."""
    t = complete_binary_outtree(spark, height)
    return t.select(F.col("dst").alias("src"), F.col("src").alias("dst"))


def star(spark: SparkSession, n_leaves: int) -> DataFrame:
    """Node 0 -> each of 1..n_leaves."""
    return spark.range(1, n_leaves + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )


def path(spark: SparkSession, n: int) -> DataFrame:
    """0 -> 1 -> ... -> n-1."""
    return spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
