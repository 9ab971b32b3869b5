"""Streaming ingestion + warm-start incremental analytics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webgraph_spark.algo.pagerank import pagerank_edges
from webgraph_spark.streaming.ingest import ingest_arcs, read_edge_table


def _write(p, rows):
    p.write_text("".join(f"{a}\t{b}\n" for a, b in rows))


def test_streaming_ingest_two_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    _write(in_dir / "batch0.tsv", [(0, 1), (1, 2), (0, 1)])
    ingest_arcs(spark, str(in_dir), table, ckpt)
    t1 = read_edge_table(spark, table)
    assert {(r["src"], r["dst"]) for r in t1.collect()} == {(0, 1), (1, 2)}

    # second wave of files: new arcs + duplicates of old ones
    (in_dir / "batch1.tsv").write_text(
        "1\t2\n2\t3\n3\t0\nnot_a_number\tx\n\n"  # malformed lines dropped
    )
    ingest_arcs(spark, str(in_dir), table, ckpt)
    t2 = read_edge_table(spark, table)
    assert {(r["src"], r["dst"]) for r in t2.collect()} == {
        (0, 1), (1, 2), (2, 3), (3, 0),
    }


def test_warm_start_pagerank_converges_faster(spark):
    arcs = [(i, (i + 1) % 20) for i in range(20)] + [(0, 10), (5, 15)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    cold = pagerank_edges(edges, nodes, tol=1e-7, max_iter=150)
    assert cold.converged

    # add one arc; warm-start from the converged vector
    edges2 = edges.unionByName(
        spark.createDataFrame([(7, 3)], "src long, dst long")
    )
    warm = pagerank_edges(edges2, nodes, tol=1e-7, max_iter=150)
    # build a warm variant manually: seed ranks with cold result
    from webgraph_spark.algo.pagerank import PageRankResult, pagerank, pagerank_numpy
    from webgraph_spark.plans.csr import build_csr

    csr2 = build_csr(edges2, num_blocks=2)
    warm_csr = pagerank(
        spark, csr2, nodes, tol=1e-7, max_iter=150,
        initial_ranks=cold.ranks,
    )
    assert warm_csr.converged
    assert warm_csr.iterations < warm.iterations  # warm start saves rounds
    # and reaches the same fixpoint as the numpy oracle on the new graph
    import numpy as np

    oracle = pagerank_numpy(
        [(r["src"], r["dst"]) for r in edges2.collect()], 20, tol=1e-12,
        max_iter=400,
    )
    got = {r["id"]: r["rank"] for r in warm_csr.ranks.collect()}
    vec = np.array([got[i] for i in range(20)])
    assert np.allclose(vec, oracle, atol=1e-5)
