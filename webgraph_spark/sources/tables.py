"""Graph table persistence with properties metadata + integrity checks.

The reference serializes every graph as ``basename + .properties`` whose
keys record the class, node/arc counts, and compression accounting
(``ImmutableGraph.java:140-149``, ``:647-685``; properties written at
``BVGraph.java:2436-2581``). The Spark-native analogue: a parquet (or
Iceberg, when a catalog is configured) table plus a ``_meta.json`` sidecar
carrying the same record — counts, build parameters, an order-insensitive
arc checksum, and writer lineage. ``load_graph`` re-verifies counts and
checksum, the same fail-fast contract as the reference's loader checking
``graphclass``.

On a cluster with an Iceberg catalog these properties belong in
``TBLPROPERTIES``; the sidecar keeps the contract identical on plain
parquet (this sandbox has no Iceberg jars).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_NAME = "_meta.json"
FORMAT_VERSION = 1


def _arc_checksum(edges: DataFrame) -> int:
    # bit_xor: order-insensitive and overflow-free (ANSI mode rejects a
    # wrapping sum of xxhash64 values)
    row = edges.select(
        F.expr("bit_xor(xxhash64(src, dst))").alias("h")
    ).collect()[0]
    return int(row["h"] or 0)


def save_graph(
    edges: DataFrame,
    path: str,
    properties: dict | None = None,
    range_partition: bool = True,
) -> dict:
    """Write ``edges(src, dst)`` + ``_meta.json``; returns the metadata.

    ``range_partition=True`` clusters rows by src before writing (the
    adjacency clustering of the reference's on-disk layout: successor data
    for one node lands contiguously, min/max stats enable range pruning).
    """
    out = edges.select("src", "dst")
    if range_partition:
        out = out.repartitionByRange("src").sortWithinPartitions("src", "dst")
    out.write.mode("overwrite").parquet(path)
    n = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    meta = {
        "format_version": FORMAT_VERSION,
        "graphclass": "webgraph_spark.edges.v1",
        "nodes": n,
        "arcs": edges.count(),
        "arc_checksum": _arc_checksum(edges),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **(properties or {}),
    }
    with open(os.path.join(path, META_NAME), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return meta


def load_graph(
    spark: SparkSession, path: str, verify: bool = True
) -> tuple[DataFrame, dict]:
    """Load an edge table + metadata; with ``verify`` re-checks arc count and
    checksum (fail-fast like the reference's reflective loader)."""
    meta_path = os.path.join(path, META_NAME)
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("graphclass") != "webgraph_spark.edges.v1":
        raise ValueError(f"unknown graphclass {meta.get('graphclass')!r}")
    edges = spark.read.parquet(path).select("src", "dst")
    if verify:
        m = edges.count()
        if m != meta["arcs"]:
            raise ValueError(f"arc count mismatch: {m} != {meta['arcs']}")
        cs = _arc_checksum(edges)
        if cs != meta["arc_checksum"]:
            raise ValueError("arc checksum mismatch — table corrupted/edited")
    return edges, meta


def save_csr(csr_blocks: DataFrame, path: str, properties: dict | None = None) -> dict:
    """Persist a CSR block table + accounting properties (bits/link etc.,
    mirroring ``BVGraph``'s properties block)."""
    csr_blocks.write.mode("overwrite").parquet(path)
    agg = csr_blocks.agg(
        F.sum("n_edges").alias("arcs"),
        F.sum("n_rows").alias("rows"),
        F.count(F.lit(1)).alias("blocks"),
        F.sum(F.length("succ")).alias("succ_bytes"),
    ).collect()[0]
    arcs = int(agg["arcs"] or 0)
    meta = {
        "format_version": FORMAT_VERSION,
        "graphclass": "webgraph_spark.csr.v1",
        "arcs": arcs,
        "rows": int(agg["rows"] or 0),
        "blocks": int(agg["blocks"] or 0),
        "succ_bytes": int(agg["succ_bytes"] or 0),
        "bits_per_link": round(int(agg["succ_bytes"] or 0) * 8.0 / arcs, 3)
        if arcs
        else 0.0,
        **(properties or {}),
    }
    with open(os.path.join(path, META_NAME), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    return meta
