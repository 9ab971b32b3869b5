"""Labelled-graph algebra: arc labels, merge strategies, semiring compose.

Reference counterparts: ``labelling/Label.java:72`` (self-delimiting arc
attributes -> here plain extra columns on the edge table),
``labelling/LabelMergeStrategy.java:28`` (duplicate-arc label resolution),
``labelling/LabelSemiring.java:20-39`` (add/multiply/zero/one for path
composition — (min,+) gives shortest paths), and the fork's labelled
scattered-arc ingestion ``labelling/ScatteredLabelledArcsASCIIGraph.java:139``
(duplicate-arc merge during ingestion).

A labelled graph is ``edges(src, dst, label)``; everything is a plain
aggregate/join, fully inside Catalyst.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Merge strategies for duplicate arcs (LabelMergeStrategy implementations).
# "last"/"first" — the fork's DEFAULT duplicate-arc resolution
# (``ScatteredLabelledArcsASCIIGraph.java:197-294``, keep-last) — are
# order-dependent in the file but deterministic distributed once each row
# carries its input sequence number (``seq_col``): keep-last is
# ``max(struct(seq, label))``, a hash-aggregable declarative form (not
# ``max_by``, which plans as SortAggregate).
MERGE_STRATEGIES: dict[str, Callable[[Column], Column]] = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
}


def merge_duplicate_arcs(
    labelled_edges: DataFrame,
    strategy: str = "min",
    label_col: str = "label",
    seq_col: str | None = None,
) -> DataFrame:
    """Collapse duplicate (src, dst) arcs, merging labels
    (``ScatteredLabelledArcsASCIIGraph.java:197-294`` ingestion semantics).

    ``strategy="last"``/``"first"`` require ``seq_col`` — a column totally
    ordering the input rows (the reader's line number); the kept label is
    the one on the max/min-sequence duplicate, matching the sequential
    reference reader's keep-last default bit-for-bit. If ``seq_col`` is NOT
    unique within a (src, dst) group, ties break deterministically by
    max/min label (the struct comparison's second component).
    """
    if strategy in ("last", "first"):
        if seq_col is None:
            raise ValueError(
                f"strategy {strategy!r} needs seq_col (input order column)"
            )
        pick = F.max if strategy == "last" else F.min
        agg = pick(
            F.struct(F.col(seq_col).alias("s"), F.col(label_col).alias("l"))
        )["l"].alias(label_col)
        return labelled_edges.groupBy("src", "dst").agg(agg)
    agg = MERGE_STRATEGIES[strategy](F.col(label_col)).alias(label_col)
    return labelled_edges.groupBy("src", "dst").agg(agg)


def union_labelled(
    g0: DataFrame, g1: DataFrame, strategy: str = "min", label_col: str = "label"
) -> DataFrame:
    """Labelled union: arcs in either graph, coincident arcs label-merged
    (``Transform.java:2071``, ``labelling/UnionArcLabelledImmutableGraph.java:47``)."""
    cols = ["src", "dst", label_col]
    return merge_duplicate_arcs(
        g0.select(*cols).unionByName(g1.select(*cols)), strategy, label_col
    )


def lower_bound_filter(
    labelled_edges: DataFrame, threshold, label_col: str = "label"
) -> DataFrame:
    """Keep arcs with label >= threshold (``Transform.LowerBound``,
    ``Transform.java:188-206``)."""
    return labelled_edges.filter(F.col(label_col) >= threshold)


def label_isin_filter(
    labelled_edges: DataFrame, values, label_col: str = "label"
) -> DataFrame:
    """Keep arcs whose label is in a set (``labelling/IntegerLabelFilter.java:29``)."""
    return labelled_edges.filter(F.col(label_col).isin(list(values)))


def compose_semiring(
    g0: DataFrame,
    g1: DataFrame,
    multiply: Callable[[Column, Column], Column] | None = None,
    add: Callable[[Column], Column] | None = None,
    label_col: str = "label",
) -> DataFrame:
    """Labelled compose over a semiring: label(x,z) = ADD over y of
    MULTIPLY(label0(x,y), label1(y,z)) (``Transform.java:2200-2350``,
    ``labelling/LabelSemiring.java:39``).

    Defaults to the (min, +) semiring — shortest path through one
    intermediate hop. ``multiply`` maps two label Columns to one;
    ``add`` is an aggregate function over the products.
    """
    multiply = multiply or (lambda a, b: a + b)
    add = add or F.min
    a = g0.select(
        F.col("src"), F.col("dst").alias("__mid"), F.col(label_col).alias("__l0")
    )
    b = g1.select(
        F.col("src").alias("__mid"), F.col("dst"), F.col(label_col).alias("__l1")
    )
    return (
        a.join(b, "__mid")
        .select("src", "dst", multiply(F.col("__l0"), F.col("__l1")).alias("__prod"))
        .groupBy("src", "dst")
        .agg(add(F.col("__prod")).alias(label_col))
    )
