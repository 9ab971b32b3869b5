"""Streaming arc ingestion: arriving arc files → canonical edge table.

``readStream`` over a directory of TAB arc-list files (the streaming version
of ``ArcListASCIIGraph``); each micro-batch is deduplicated against the
current edge table and the union is atomically published (write to a
versioned directory, flip a pointer file — same atomic-rename discipline as
:mod:`webgraph_spark.checkpoint`). ``trigger=availableNow`` drains what has
arrived and stops, which is the batch-incremental mode a corpus refresh
pipeline runs on a schedule; leaving the default trigger gives continuous
micro-batches.

At 100 TB the edge table would be an Iceberg table and the merge a
``MERGE INTO`` (row-level commit); the versioned-directory publish here is
the same atomicity contract on plain parquet.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webgraph_spark.operators.transform import normalize

POINTER = "_current.json"


def current_version_path(table_dir: str) -> str | None:
    p = os.path.join(table_dir, POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return os.path.join(table_dir, json.load(f)["version"])


def read_edge_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    path = current_version_path(table_dir)
    return spark.read.parquet(path) if path else None


def _publish(edges: DataFrame, table_dir: str, version: int) -> None:
    vdir = f"v{version:06d}"
    edges.write.mode("overwrite").parquet(os.path.join(table_dir, vdir))
    tmp = os.path.join(table_dir, POINTER + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"version": vdir}, f)
    os.replace(tmp, os.path.join(table_dir, POINTER))  # atomic flip


def arc_file_stream(spark: SparkSession, in_dir: str, sep: str = "\t") -> DataFrame:
    """Streaming source over arc-list files appearing in ``in_dir``."""
    return (
        spark.readStream.schema("src long, dst long")
        .option("sep", sep)
        .option("maxFilesPerTrigger", 16)
        .csv(in_dir)
    )


def ingest_arcs(
    spark: SparkSession,
    in_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> None:
    """Run the ingestion stream until the directory is drained
    (``available_now=True``) or indefinitely.

    Each micro-batch: normalize + dedup against the published table, publish
    the union as a new version. foreachBatch gives exactly-once table state
    per batch (re-run batches republish the same union — idempotent).
    """
    os.makedirs(table_dir, exist_ok=True)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # malformed lines parse to NULL under the permissive CSV reader;
        # drop them — NULL arcs must never reach the edge table
        new_edges = normalize(batch_df.na.drop(subset=["src", "dst"]))
        existing = read_edge_table(spark, table_dir)
        merged = (
            existing.unionByName(new_edges).dropDuplicates(["src", "dst"])
            if existing is not None
            else new_edges
        )
        _publish(merged, table_dir, batch_id)

    writer = (
        arc_file_stream(spark, in_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()
