"""CSR block table: adjacency compacted into gap-encoded Arrow batches.

The Spark analogue of ``BVGraph.store`` (``BVGraph.java:1679``): the edge
table is range-partitioned on src by **edge-count-balanced** boundaries
(:mod:`webgraph_spark.plans.partitioning`), sorted within partitions by
(src, dst), and compacted by a ``mapInArrow`` kernel into one row per block:

    csr_blocks(block_id, src_min, src_max, n_rows, n_edges,
               srcs array<long>, degs array<int>, succ binary, checksum)

``succ`` is the varint-packed gap stream of all successor lists in the block
(zig-zag head + gap-1 tail per list — the WebGraph residual layout,
``BVGraph.java:205-221``). ``degs`` cumsums to the indptr offsets array (the
``.offsets`` Elias–Fano analogue, ``BVGraph.java:223-236``). ``checksum`` and
the count columns are the accounting invariants the reference's tests assert
(``BVGraphTest.java:62-74``): sum(n_edges) == |edges|, per-block checksum
reproducible on decode.

Reference compression (copy blocks from a window of previous lists,
``BVGraph.java:139-196``) is intentionally NOT reproduced: parquet+zstd on
the varint stream plays that role; the north_star requires only gap coding.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.functions.codes import (
    gap_decode_concat,
    gap_encode_concat,
    varint_decode,
    varint_encode,
)
from webgraph_spark.plans.partitioning import block_id_column, degree_balanced_cuts

CSR_SCHEMA = (
    "block_id long, src_min long, src_max long, n_rows long, n_edges long, "
    "srcs array<long>, degs array<int>, succ binary, checksum long"
)

_ARROW_OUT = pa.schema(
    [
        ("block_id", pa.int64()),
        ("src_min", pa.int64()),
        ("src_max", pa.int64()),
        ("n_rows", pa.int64()),
        ("n_edges", pa.int64()),
        ("srcs", pa.list_(pa.int64())),
        ("degs", pa.list_(pa.int32())),
        ("succ", pa.binary()),
        ("checksum", pa.int64()),
    ]
)


def _edge_checksum(srcs: np.ndarray, degs: np.ndarray, succs: np.ndarray) -> int:
    """Order-insensitive-enough checksum over the block's (src, dst) pairs."""
    src_rep = np.repeat(srcs, degs).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (
            src_rep * np.uint64(0x9E3779B97F4A7C15) + succs.astype(np.uint64)
        ) * np.uint64(0xC2B2AE3D27D4EB4F)
    return int(np.bitwise_xor.reduce(h).astype(np.int64)) if h.size else 0


@dataclass
class CsrGraph:
    """Handle for a built CSR table: blocks plus the boundary cut points."""

    blocks: DataFrame
    cuts: list[int]
    num_edges: int

    def node_block_id_col(self, col: str = "id"):
        """Block id for ANY node id (not just srcs) under the same cuts."""
        return block_id_column(self.cuts, col)


def build_csr(
    edges: DataFrame,
    target_edges_per_block: int = 250_000,
    num_blocks: int | None = None,
) -> CsrGraph:
    """Compact ``edges(src, dst)`` into a CSR block table.

    One shuffle (range repartition on block_id/src) + one Arrow pass.
    Block count defaults to ceil(m / target), min 1; boundaries balance
    edge counts, so power-law out-degree does not starve/overload tasks
    (the ``EliasFanoCumulativeOutdegreeList`` idea).
    """
    m = edges.count()
    if num_blocks is None:
        num_blocks = max(1, -(-m // target_edges_per_block))
    cuts = degree_balanced_cuts(edges, num_blocks, "src")

    tagged = edges.withColumn("block_id", block_id_column(cuts, "src"))
    arranged = tagged.repartitionByRange(
        max(num_blocks, 1), "block_id"
    ).sortWithinPartitions("block_id", "src", "dst")

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # Accumulate the partition (bounded by block sizing), then emit one
        # row per block_id present.
        tables = [pa.Table.from_batches([b]) for b in batches]
        if not tables:
            return
        tbl = pa.concat_tables(tables)
        if tbl.num_rows == 0:
            return
        src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        bid = tbl.column("block_id").to_numpy(zero_copy_only=False).astype(np.int64)
        rows = []
        for b in np.unique(bid):
            sel = bid == b
            s, d = src[sel], dst[sel]
            # rows are sorted by (src, dst); group into successor lists
            uniq, degs = np.unique(s, return_counts=True)
            indptr = np.zeros(uniq.size + 1, dtype=np.int64)
            np.cumsum(degs, out=indptr[1:])
            gaps = gap_encode_concat(uniq, indptr, d)
            rows.append(
                {
                    "block_id": int(b),
                    "src_min": int(s[0]),
                    "src_max": int(s[-1]),
                    "n_rows": int(uniq.size),
                    "n_edges": int(s.size),
                    "srcs": uniq.tolist(),
                    "degs": degs.astype(np.int32).tolist(),
                    "succ": varint_encode(gaps).tobytes(),
                    "checksum": _edge_checksum(uniq, degs, d),
                }
            )
        yield pa.RecordBatch.from_pylist(rows, schema=_ARROW_OUT)

    blocks = arranged.mapInArrow(encode, schema=CSR_SCHEMA)
    return CsrGraph(blocks=blocks, cuts=cuts, num_edges=m)


def decode_block(
    srcs: np.ndarray, degs: np.ndarray, succ_bytes: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One block -> (srcs, indptr, successor ids) numpy triple."""
    srcs = np.asarray(srcs, dtype=np.int64)
    degs = np.asarray(degs, dtype=np.int64)
    indptr = np.zeros(srcs.size + 1, dtype=np.int64)
    np.cumsum(degs, out=indptr[1:])
    n_edges = int(indptr[-1])
    gaps = varint_decode(np.frombuffer(succ_bytes, dtype=np.uint8), n_edges)
    succs = gap_decode_concat(srcs, indptr, gaps)
    return srcs, indptr, succs


def csr_to_edges(blocks: DataFrame) -> DataFrame:
    """Decode the CSR table back to ``edges(src, dst)`` (round-trip oracle)."""

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            srcs_col, degs_col = batch.column("srcs"), batch.column("degs")
            succ_col = batch.column("succ")
            for i in range(batch.num_rows):
                srcs, indptr, succs = decode_block(
                    np.asarray(srcs_col[i].values, dtype=np.int64),
                    np.asarray(degs_col[i].values, dtype=np.int64),
                    succ_col[i].as_py(),
                )
                degs = np.diff(indptr)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.repeat(srcs, degs), pa.int64()),
                        pa.array(succs, pa.int64()),
                    ],
                    names=["src", "dst"],
                )

    return blocks.mapInArrow(decode, schema="src long, dst long")


def csr_has_arcs(csr: CsrGraph, pairs: DataFrame) -> DataFrame:
    """Bulk adjacency test over the CSR blocks: ``(src, dst, exists)``.

    The user-facing form of EFGraph's ``skipTo`` successor search
    (``EFGraph.java:78,147``; exercised by ``test/SpeedTest.java:138-146``
    as random adjacency probes). Queries are routed to their block by the
    same cut points that placed the edges (one shuffle of the QUERY table
    only — blocks are matched by block_id), then answered inside one Arrow
    kernel with a vectorized sorted-merge against the decoded successor
    stream: O((E_blk + Q_blk) log) per block, no per-query Python loop.

    Pairs whose src falls in a block with no edges (or outside every block's
    src range) come back ``exists = false``.
    """
    import pandas as pd

    tagged = pairs.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).withColumn("block_id", block_id_column(csr.cuts, "src"))

    def probe(key, queries: "pd.DataFrame", blocks: "pd.DataFrame"):
        if queries.empty:
            return pd.DataFrame(
                {"src": [], "dst": [], "exists": []}
            ).astype({"src": "int64", "dst": "int64", "exists": "bool"})
        qs = queries["src"].to_numpy(np.int64)
        qd = queries["dst"].to_numpy(np.int64)
        esrc = np.empty(0, np.int64)
        edst = np.empty(0, np.int64)
        if not blocks.empty:
            parts_s, parts_d = [], []
            for _, row in blocks.iterrows():
                srcs, indptr, succs = decode_block(
                    np.asarray(row["srcs"], dtype=np.int64),
                    np.asarray(row["degs"], dtype=np.int64),
                    row["succ"],
                )
                parts_s.append(np.repeat(srcs, np.diff(indptr)))
                parts_d.append(succs)
            esrc = np.concatenate(parts_s)
            edst = np.concatenate(parts_d)
        # sorted merge: block rows (tag 0) sort before equal query rows
        # (tag 1); a query exists iff its equal-(src,dst) run contains a
        # block row — min-tag per run, fully vectorized.
        allsrc = np.concatenate([esrc, qs])
        alldst = np.concatenate([edst, qd])
        tag = np.concatenate(
            [np.zeros(esrc.size, np.int8), np.ones(qs.size, np.int8)]
        )
        order = np.lexsort((tag, alldst, allsrc))
        s_, d_, t_ = allsrc[order], alldst[order], tag[order]
        starts = np.flatnonzero(
            np.concatenate(
                [[True], (s_[1:] != s_[:-1]) | (d_[1:] != d_[:-1])]
            )
        )
        run_has_edge = np.minimum.reduceat(t_, starts) == 0
        run_id = np.cumsum(
            np.concatenate(
                [[0], ((s_[1:] != s_[:-1]) | (d_[1:] != d_[:-1])).astype(np.int64)]
            )
        )
        exists_sorted = run_has_edge[run_id] & (t_ == 1)
        # scatter back to original query order
        out = np.zeros(allsrc.size, dtype=bool)
        out[order] = exists_sorted
        return pd.DataFrame(
            {"src": qs, "dst": qd, "exists": out[esrc.size:]}
        )

    return (
        tagged.groupBy("block_id")
        .cogroup(csr.blocks.groupBy("block_id"))
        .applyInPandas(probe, schema="src long, dst long, exists boolean")
    )


def compression_stats(csr: CsrGraph) -> dict:
    """Compression accounting, the ``bitsperlink``/``bitspernode`` analogue
    (``BVGraph.java:2560-2581``; cnr-2000 reference point: 3.56 bits/link
    with full reference+interval coding, which we intentionally skip —
    varint-gap inside zstd parquet is our operating point)."""
    agg = csr.blocks.agg(
        F.sum(F.length("succ")).alias("succ_bytes"),
        F.sum("n_edges").alias("edges"),
        F.sum("n_rows").alias("rows"),
        F.count(F.lit(1)).alias("blocks"),
    ).collect()[0]
    edges = int(agg["edges"] or 0)
    rows = int(agg["rows"] or 0)
    succ_bytes = int(agg["succ_bytes"] or 0)
    return {
        "succ_bytes": succ_bytes,
        "edges": edges,
        "rows": rows,
        "blocks": int(agg["blocks"] or 0),
        "bits_per_link": round(succ_bytes * 8.0 / edges, 3) if edges else 0.0,
        "bytes_per_node": round(succ_bytes / rows, 3) if rows else 0.0,
    }


def verify_accounting(csr: CsrGraph) -> dict:
    """The BVGraphTest-style invariants: edge totals and checksum agreement."""
    agg = csr.blocks.agg(
        F.sum("n_edges").alias("edges"),
        F.sum("n_rows").alias("rows"),
        F.count(F.lit(1)).alias("blocks"),
    ).collect()[0]
    return {
        "edges_in_blocks": int(agg["edges"] or 0),
        "num_edges_expected": csr.num_edges,
        "rows_in_blocks": int(agg["rows"] or 0),
        "blocks": int(agg["blocks"] or 0),
        "ok": int(agg["edges"] or 0) == csr.num_edges,
    }
