"""Text graph formats: arc lists, .graph-txt, scattered (arbitrary-id) arcs.

Reference counterparts:

- ``ArcListASCIIGraph.java:52-98`` — one ``src TAB dst`` line per arc
  (reference requires non-decreasing sources; Spark needs no such order);
  ``ShiftedByOneArcListASCIIGraph.java:47`` — the same, 1-based.
- ``ASCIIGraph.java:55-96`` — ``.graph-txt``: first line is n, line i+1 is
  the sorted successor list of node i.
- ``ScatteredArcsASCIIGraph.java:57-139`` — arcs in arbitrary order with
  arbitrary ids, remapped to a compact space (``Id2NodeMap`` ``:149``),
  deduplicated, optionally symmetrized / loop-stripped. The fork's labelled
  variant (``labelling/ScatteredLabelledArcsASCIIGraph.java:139``) adds a
  third column and duplicate-arc label merging.

Scale notes: arc lists parse as a plain CSV scan (splittable, predicate
pushdown on the parsed columns). ``.graph-txt`` needs global line numbers —
assigned with the same two-pass per-partition-offset pattern as
``mint_dense_ids`` (no RDD zipWithIndex, no single-partition window).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webgraph_spark.operators.labels import merge_duplicate_arcs
from webgraph_spark.operators.transform import normalize
from webgraph_spark.sources.ids import mint_dense_ids, remap_edges


def read_arc_list(
    spark: SparkSession, path: str, sep: str = "\t", shift: int = 0
) -> DataFrame:
    """Arc-list reader (``ArcListASCIIGraph.loadOnce``; ``shift=-1`` gives
    ``ShiftedByOneArcListASCIIGraph`` semantics). Sources need NOT be sorted."""
    raw = spark.read.csv(path, sep=sep, schema="src long, dst long", comment="#")
    out = raw.select(
        (F.col("src") + shift).alias("src"), (F.col("dst") + shift).alias("dst")
    )
    return normalize(out)


def write_arc_list(edges: DataFrame, path: str, sep: str = "\t") -> None:
    """Arc-list sink, sorted by (src, dst) within range partitions."""
    (
        edges.repartitionByRange("src")
        .sortWithinPartitions("src", "dst")
        .select(
            F.concat_ws(sep, F.col("src"), F.col("dst")).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )


def _with_line_numbers(lines: DataFrame) -> DataFrame:
    """Global 0-based line numbers via per-partition counts + offsets.

    Text-file splits of ONE file preserve in-file order across ascending
    partition ids; a multi-file directory does not (FileScan packs splits
    largest-first, so partition order != filename order) — the input must be
    a single file, enforced below.
    """
    lines = lines.persist()
    stats = (
        lines.select(
            F.spark_partition_id().alias("pid"),
            F.input_file_name().alias("fn"),
        )
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct("fn").alias("nf"),
            F.min("fn").alias("f"),
        )
        .collect()
    )
    if len({r["f"] for r in stats}) > 1 or any(r["nf"] > 1 for r in stats):
        raise ValueError(
            ".graph-txt ingestion requires a single input file (got a "
            "multi-file directory: line order would be scrambled)"
        )
    counts = {r["pid"]: r["cnt"] for r in stats}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, 0)
        for pdf in batches:
            out = pdf.copy()
            out.insert(0, "line_no", range(pos, pos + len(pdf)))
            pos += len(pdf)
            yield out

    return lines.mapInPandas(assign, schema="line_no long, value string")


def read_ascii_graph(spark: SparkSession, path: str) -> tuple[int, DataFrame]:
    """``.graph-txt`` reader (``ASCIIGraph.java:52-93``): returns
    ``(num_nodes, edges)``. Line 0 holds n; line i+1 holds node i's sorted
    successor list (possibly empty)."""
    numbered = _with_line_numbers(spark.read.text(path))
    n = int(numbered.filter(F.col("line_no") == 0).collect()[0]["value"])
    succ = numbered.filter(F.col("line_no") > 0).select(
        (F.col("line_no") - 1).alias("src"),
        F.filter(
            F.split(F.trim("value"), r"\s+"), lambda t: t != F.lit("")
        ).alias("succs"),
    )
    edges = succ.select("src", F.explode("succs").alias("dst")).select(
        "src", F.col("dst").cast("long").alias("dst")
    )
    return n, normalize(edges)


def write_ascii_graph(edges: DataFrame, path: str, num_nodes: int) -> None:
    """``.graph-txt`` sink (``ASCIIGraph.store``). Collects successor lines
    grouped per node — a debug/test sink like the reference's, not a bulk
    format (BVGraph ↔ our CSR/parquet tables are the bulk formats)."""
    spark = edges.sparkSession
    rows = (
        spark.range(num_nodes)
        .select(F.col("id").alias("src"))
        .join(
            edges.groupBy("src").agg(
                F.array_join(F.array_sort(F.collect_list("dst")), " ").alias("line")
            ),
            "src",
            "left",
        )
        .na.fill({"line": ""})
        .orderBy("src")
        .collect()
    )
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(f"{num_nodes}\n")
        for r in rows:
            f.write(r["line"] + "\n")


def read_scattered_arcs(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    symmetrize: bool = False,
    no_loops: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Scattered-arc ingestion (``ScatteredArcsASCIIGraph.java:57-139``):
    arbitrary-order, arbitrary-id arcs -> ``(node_map(id, key), edges)``.

    Ids are compacted in key sort order (deterministic at any parallelism;
    the reference's appearance order is single-reader-specific). Dedup here
    = the reference's batch-sort dedup (``Transform.java:1575-1592``).
    """
    raw = spark.read.csv(path, sep=sep, schema="k_src long, k_dst long", comment="#")
    keys = raw.select(F.col("k_src").alias("key")).unionAll(
        raw.select(F.col("k_dst").alias("key"))
    )
    node_map = mint_dense_ids(keys, ["key"])
    edges = remap_edges(raw, node_map, src_key=["k_src"], dst_key=["k_dst"])
    if symmetrize:
        from webgraph_spark.operators.transform import symmetrize as sym

        edges = sym(edges)
    if no_loops:
        edges = edges.filter(F.col("src") != F.col("dst"))
    return node_map, edges


def read_scattered_labelled_arcs(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    merge_strategy: str = "last",
) -> tuple[DataFrame, DataFrame]:
    """Labelled scattered arcs (fork surface,
    ``labelling/ScatteredLabelledArcsASCIIGraph.java:139``): third column is
    an integer label; duplicate arcs merge labels via ``merge_strategy``.

    Default is ``"last"`` — the fork's own default duplicate resolution
    (``ScatteredLabelledArcsASCIIGraph.java:197-294``; exercised by its
    ``ScatteredLabelledArcsASCIIGraphTest.java:89-295``) — made
    deterministic distributed by carrying each arc's input line number and
    merging with ``max(struct(line_no, label))``. The aggregate strategies
    (min/max/sum/count) skip the line-number pass entirely."""
    if merge_strategy in ("last", "first"):
        import re as _re

        # F.split takes a REGEX; escape so a metachar sep ('|', '.', '+')
        # splits literally, exactly like the csv path's literal separator.
        # (This path needs global line order, so it also requires a single
        # input file — _with_line_numbers enforces that.)
        numbered = _with_line_numbers(spark.read.text(path))
        parts = F.split(F.col("value"), _re.escape(sep))
        raw = (
            numbered.filter(
                (F.length(F.trim("value")) > 0)
                & ~F.col("value").startswith("#")
            )
            .select(
                F.element_at(parts, 1).cast("long").alias("k_src"),
                F.element_at(parts, 2).cast("long").alias("k_dst"),
                F.element_at(parts, 3).cast("long").alias("label"),
                F.col("line_no").alias("__seq"),
            )
        )
    else:
        raw = spark.read.csv(
            path, sep=sep, schema="k_src long, k_dst long, label long", comment="#"
        )
    keys = raw.select(F.col("k_src").alias("key")).unionAll(
        raw.select(F.col("k_dst").alias("key"))
    )
    node_map = mint_dense_ids(keys, ["key"])
    src_m = node_map.select(F.col("id").alias("src"), F.col("key").alias("__ks"))
    dst_m = node_map.select(F.col("id").alias("dst"), F.col("key").alias("__kd"))
    extra = ["__seq"] if merge_strategy in ("last", "first") else []
    labelled = (
        raw.join(src_m, raw["k_src"] == src_m["__ks"])
        .join(dst_m, raw["k_dst"] == dst_m["__kd"])
        .select("src", "dst", "label", *extra)
    )
    merged = merge_duplicate_arcs(
        labelled,
        merge_strategy,
        seq_col="__seq" if merge_strategy in ("last", "first") else None,
    )
    return node_map, merged
