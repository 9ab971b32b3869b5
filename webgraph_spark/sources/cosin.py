"""COSIN legacy binary graph format (``cosin/CosinGraph.java:48-190``).

Format — a single-file pair of little-endian int32s:

- ``<basename>.info``: one 24-byte record per node, six int32s of which the
  reference reader consumes only (indegree, outdegree) and skips the other
  four (``CosinGraph.java:100-106``); ``numNodes = info_size / 24``
  (``CosinGraph.java:58``).
- ``<basename>.succ``: every node's successor ids as consecutive int32s,
  lists stored contiguously in node order (``CosinGraph.java:127-171``).
  The reference notes the pieces can simply be ``cat``-ed together.

The reference exposes this offline-only (sequential ``nodeIterator``). The
Spark-first re-expression exploits the *fixed-width* ``.info`` records: any
node range's byte extent is computable without scanning, so the reader is a
two-pass chunked range read (the same two-pass shape as ``mint_dense_ids``):

1. chunk the node range; each task reads ONLY its 24-byte-aligned ``.info``
   slice (``np.fromfile`` with offset/count — an O(chunk) pread, no full
   scan) and returns its outdegree sum: a P-row collect;
2. an exclusive scan over the chunk sums (driver, P values) gives each
   chunk its starting ``.succ`` element offset; the second pass re-reads
   the info slice, preads exactly its succ slice, and emits ``(src, dst)``
   rows Arrow-batched.

Nothing graph-sized ever touches the driver; parallelism = chunk count.
Files must be visible to executors (shared/distributed FS — the assumption
every file-based source in this engine makes). Byte order is fixed
little-endian where ``CosinGraph.java:91-92`` uses ``nativeOrder()`` —
deterministic across machines rather than host-dependent.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REC = 24  # six int32s per .info record
_OUTDEG = 1  # field index of outdegree within the record


def cosin_num_nodes(basename: str) -> int:
    """``numNodes = len(.info) / 24`` (``CosinGraph.java:58``)."""
    return os.path.getsize(basename + ".info") // _REC


def read_cosin(
    spark: SparkSession, basename: str, chunks: int | None = None
) -> tuple[int, DataFrame]:
    """Distributed COSIN reader -> ``(num_nodes, edges(src, dst))``.

    Two chunked range-read passes over ``.info``/``.succ`` (module
    docstring); zero-outdegree nodes produce no arc rows (recover them from
    ``num_nodes``, exactly as the reference's ``NodeIterator`` does).
    """
    info_path, succ_path = basename + ".info", basename + ".succ"
    n = cosin_num_nodes(basename)
    p = chunks or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    p = max(1, min(p, n)) if n else 1
    bounds = [(i * n // p, (i + 1) * n // p) for i in range(p)]
    # range-partition the chunk specs: p distinct keys into p ranges lands
    # one chunk per task (hash-partitioning would leave ~1/e of the tasks
    # empty by birthday collision and double-load others)
    spec = spark.createDataFrame(bounds, "lo long, hi long").repartitionByRange(
        p, "lo"
    )

    def deg_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                info = np.fromfile(
                    info_path, dtype="<i4", count=(hi - lo) * 6, offset=lo * _REC
                )
                rows.append((int(lo), int(info[_OUTDEG::6].astype(np.int64).sum())))
            yield pd.DataFrame(rows, columns=["lo", "degsum"])

    sums = {
        int(r["lo"]): int(r["degsum"])
        for r in spec.mapInPandas(deg_sums, "lo long, degsum long").collect()
    }
    succ_off: dict[int, int] = {}
    acc = 0
    for lo in sorted(sums):
        succ_off[lo] = acc
        acc += sums[lo]

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                info = np.fromfile(
                    info_path, dtype="<i4", count=(hi - lo) * 6, offset=lo * _REC
                )
                degs = info[_OUTDEG::6].astype(np.int64)
                total = int(degs.sum())
                succ = np.fromfile(
                    succ_path, dtype="<i4", count=total, offset=succ_off[int(lo)] * 4
                )
                yield pd.DataFrame(
                    {
                        "src": np.repeat(
                            np.arange(lo, hi, dtype=np.int64), degs
                        ),
                        "dst": succ.astype(np.int64),
                    }
                )

    return n, spec.mapInPandas(emit, "src long, dst long")


def write_cosin(edges: DataFrame, basename: str, num_nodes: int) -> None:
    """COSIN sink: successor lists sorted per node, indegree/outdegree filled,
    the four reader-skipped info fields zeroed (``CosinGraph.java:100-106``
    ignores them, so zeros round-trip).

    A debug/test sink like :func:`write_ascii_graph` — collects grouped
    successors to the driver; the engine's bulk formats are CSR/parquet.
    """
    rows = (
        edges.groupBy("src")
        .agg(F.array_sort(F.collect_list("dst")).alias("succs"))
        .collect()
    )
    indeg_rows = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("c")).collect()
    succs = {int(r["src"]): r["succs"] for r in rows}
    indeg = {int(r["dst"]): int(r["c"]) for r in indeg_rows}
    info = np.zeros((num_nodes, 6), dtype="<i4")
    chunks = []
    for v in range(num_nodes):
        s = succs.get(v, [])
        info[v, 0] = indeg.get(v, 0)
        info[v, _OUTDEG] = len(s)
        if s:
            chunks.append(np.asarray(s, dtype="<i4"))
    os.makedirs(os.path.dirname(basename) or ".", exist_ok=True)
    info.tofile(basename + ".info")
    (np.concatenate(chunks) if chunks else np.empty(0, dtype="<i4")).tofile(
        basename + ".succ"
    )
