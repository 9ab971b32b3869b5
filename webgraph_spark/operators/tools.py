"""Small graph tools: component extraction, Graphviz sink, gap/locality stats.

Reference counterparts: ``tool/ExtractComponent.java:48`` (filter a graph to
one component), ``tool/WebGraph2Dot.java:38`` (Graphviz dump), and the
successor-gap statistics block of ``Stats.java`` (``successoravggap``,
``avglocality`` — outputs at ``Stats.java:167-258``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.operators.transform import subgraph


def extract_component(
    edges: DataFrame, components: DataFrame, comp_id: int | None = None
) -> DataFrame:
    """Induced subgraph of one component (``tool/ExtractComponent.java:48``);
    default: the largest (ties by min comp id)."""
    if comp_id is None:
        top = (
            components.groupBy("comp")
            .agg(F.count(F.lit(1)).alias("size"))
            .orderBy(F.desc("size"), F.asc("comp"))
            .limit(1)
        )
        keep = components.join(top.select("comp"), "comp").select("id")
    else:
        keep = components.filter(F.col("comp") == comp_id).select("id")
    return subgraph(edges, keep)


def to_dot(edges: DataFrame, name: str = "graph", max_arcs: int = 10_000) -> str:
    """Graphviz digraph text (``tool/WebGraph2Dot.java:38``) — debug sink;
    refuses silently-truncated dumps by capping explicitly."""
    rows = edges.select("src", "dst").limit(max_arcs + 1).collect()
    if len(rows) > max_arcs:
        raise ValueError(
            f"graph has more than {max_arcs} arcs; raise max_arcs explicitly"
        )
    lines = [f"digraph {name} {{"]
    lines += [f"  {r['src']} -> {r['dst']};" for r in rows]
    lines.append("}")
    return "\n".join(lines)


def gap_stats(edges: DataFrame) -> dict:
    """Successor gap / locality statistics (``Stats.java`` gap block):

    - ``avg_locality``: mean |dst − src| over all arcs;
    - ``avg_gap``: mean gap between consecutive successors within a node's
      sorted successor list (the quantity our varint gap codec stores —
      smaller avg_gap ⇒ fewer bytes/edge after :mod:`plans.csr` encoding);
    - ``avg_first_gap``: mean |first_successor − src| (zig-zag head cost).
    """
    loc = edges.agg(
        F.avg(F.abs(F.col("dst") - F.col("src"))).alias("avg_locality")
    ).collect()[0]["avg_locality"]
    # min/max/count per src suffice (mean consecutive-gap telescopes to
    # (max-min)/(count-1)) — no collect_list, hub-safe at any degree
    per_list = (
        edges.groupBy("src")
        .agg(
            F.min("dst").alias("mn"),
            F.max("dst").alias("mx"),
            F.count(F.lit(1)).alias("c"),
        )
        .select(
            F.abs(F.col("mn") - F.col("src")).alias("first_gap"),
            F.when(
                F.col("c") > 1, (F.col("mx") - F.col("mn")) / (F.col("c") - 1)
            ).alias("mean_gap"),
        )
        .agg(
            F.avg("first_gap").alias("avg_first_gap"),
            F.avg("mean_gap").alias("avg_gap"),
        )
        .collect()[0]
    )
    return {
        "avg_locality": float(loc),
        "avg_gap": float(per_list["avg_gap"] or 0.0),
        "avg_first_gap": float(per_list["avg_first_gap"] or 0.0),
    }
