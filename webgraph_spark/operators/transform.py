"""Graph transformations over the canonical edge DataFrame ``edges(src, dst)``.

Each function mirrors one reference transform (file:line cited per function)
but is expressed as a lazy DataFrame plan: Catalyst's filter/projection fusion
plays the role of the reference's lazy wrapper views (``Transform.java:213-338``),
and Spark's sort-based shuffle plays the role of its external-sort batch
pipeline (``Transform.java:1563-1599``, ``:1052-1123``).

Graph semantics invariant: an edge set is **duplicate-free**; every transform
that could create duplicates ends in ``dropDuplicates`` — the reference
enforces the same at batch-sort time (``Transform.java:1575-1592``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize(edges: DataFrame) -> DataFrame:
    """Canonical form: columns (src, dst) long, duplicates removed."""
    return edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).dropDuplicates(["src", "dst"])


def transpose(edges: DataFrame) -> DataFrame:
    """Reverse all arcs (``Transform.transpose``, ``Transform.java:959-1047``;
    offline variant ``:1719-1808`` — Spark's shuffle is that external sort)."""
    return edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))


def symmetrize(edges: DataFrame) -> DataFrame:
    """Union with the transpose (``Transform.symmetrize``, ``Transform.java:908-946``)."""
    return edges.unionByName(transpose(edges)).dropDuplicates(["src", "dst"])


def no_loops(edges: DataFrame) -> DataFrame:
    """Drop self-loops (``Transform.NO_LOOPS``, ``Transform.java:125-139``)."""
    return edges.filter(F.col("src") != F.col("dst"))


def simplify(edges: DataFrame) -> DataFrame:
    """Symmetrize + drop loops (``Transform.simplify``, ``Transform.java:835-894``)."""
    return no_loops(symmetrize(edges))


def filter_arcs(edges: DataFrame, predicate: Column | str) -> DataFrame:
    """Per-arc predicate view (``Transform.filterArcs``, ``Transform.java:94-104``).

    ``predicate`` is any boolean Column/SQL string over (src, dst[, label...]);
    Catalyst pushes it into the scan, which is the fusion the reference's
    lazy filtered view does by hand during iteration.
    """
    return edges.filter(predicate)


def node_class_filter(
    edges: DataFrame, node_class: DataFrame, keep_only_same: bool = True
) -> DataFrame:
    """Keep intra-class (or inter-class) arcs given a ``(id, cls)`` table
    (``Transform.NodeClassFilter``, ``Transform.java:145-185``)."""
    s = node_class.select(F.col("id").alias("src"), F.col("cls").alias("__cs"))
    d = node_class.select(F.col("id").alias("dst"), F.col("cls").alias("__cd"))
    joined = edges.join(s, "src").join(d, "dst")
    cond = F.col("__cs") == F.col("__cd")
    return joined.filter(cond if keep_only_same else ~cond).select("src", "dst")


def map_nodes(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Relabel/quotient/delete nodes through a map table ``(id, new_id)``
    (``Transform.map``, ``Transform.java:623-720``; shuffle-based
    ``mapOffline`` ``:1824-1853`` is the Spark default execution).

    ``new_id`` NULL or -1 deletes the node (and its arcs); non-injective maps
    produce quotient graphs (duplicates collapsed).
    """
    m = mapping.select("id", "new_id").filter(
        F.col("new_id").isNotNull() & (F.col("new_id") >= 0)
    )
    ms = m.select(F.col("id").alias("src"), F.col("new_id").alias("__ns"))
    md = m.select(F.col("id").alias("dst"), F.col("new_id").alias("__nd"))
    return (
        edges.join(ms, "src")
        .join(md, "dst")
        .select(F.col("__ns").alias("src"), F.col("__nd").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def union_graphs(g0: DataFrame, g1: DataFrame) -> DataFrame:
    """Arc in result iff in either input (``Transform.union``,
    ``Transform.java:2075-2088``)."""
    return g0.select("src", "dst").unionByName(g1.select("src", "dst")).dropDuplicates(
        ["src", "dst"]
    )


def compose(g0: DataFrame, g1: DataFrame) -> DataFrame:
    """Graph/matrix product: arc (x,z) iff exists y with (x,y) in g0, (y,z) in g1
    (``Transform.compose``, ``Transform.java:2091-2197``) — an equi hash join;
    AQE picks broadcast vs sort-merge at runtime."""
    a = g0.select(F.col("src"), F.col("dst").alias("__mid"))
    b = g1.select(F.col("src").alias("__mid"), F.col("dst"))
    return a.join(b, "__mid").select("src", "dst").dropDuplicates(["src", "dst"])


def line_graph(edges: DataFrame) -> DataFrame:
    """Line graph as arc 4-tuples: one row per pair of consecutive arcs
    ⟨x,y⟩→⟨y,z⟩ (``Transform.line``, ``Transform.java:2352-2447``).

    Returns ``(a_src, a_dst, b_src, b_dst)`` with ``a_dst == b_src``. Arc ids
    (the reference's ``.source/.target`` maps) can be minted with
    :func:`webgraph_spark.sources.ids.mint_dense_ids` on the distinct arcs.
    """
    e1 = edges.select(F.col("src").alias("a_src"), F.col("dst").alias("a_dst"))
    e2 = edges.select(F.col("src").alias("b_src"), F.col("dst").alias("b_dst"))
    return e1.join(e2, e1["a_dst"] == e2["b_src"]).select(
        "a_src", "a_dst", "b_src", "b_dst"
    )


def subgraph(edges: DataFrame, node_subset: DataFrame) -> DataFrame:
    """Induced subgraph on a node subset ``(id)`` — ids kept, not re-ranked
    (``ImmutableSubgraph.java:82``; re-ranking = :func:`map_nodes` with a
    minted dense map)."""
    ns = node_subset.select("id")
    return (
        edges.join(ns.withColumnRenamed("id", "src"), "src", "leftsemi")
        .join(ns.withColumnRenamed("id", "dst"), "dst", "leftsemi")
        .select("src", "dst")
    )


def degree_range_subgraph(
    edges: DataFrame, min_deg: int, max_deg: int
) -> DataFrame:
    """Induced subgraph of nodes with outdegree in [min_deg, max_deg)
    (``DegreeRangeImmutableSubgraph.java:31-45``). Nodes with no outgoing
    arcs have outdegree 0 and are kept iff min_deg == 0."""
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    all_nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    degs = all_nodes.join(out_deg, "id", "left").na.fill({"deg": 0})
    keep = degs.filter(
        (F.col("deg") >= min_deg) & (F.col("deg") < max_deg)
    ).select("id")
    return subgraph(edges, keep)


def remove_dangling(edges: DataFrame) -> DataFrame:
    """Drop arcs into nodes with outdegree 0 and those nodes themselves
    (``Transform.removeDangling``, ``Transform.java:2929-2963``): keeps arcs
    whose dst has at least one outgoing arc."""
    with_out = edges.select(F.col("src").alias("id")).distinct()
    return edges.join(
        with_out.withColumnRenamed("id", "dst"), "dst", "leftsemi"
    ).select("src", "dst")
