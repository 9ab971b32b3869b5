"""CSR block build/decode roundtrip + accounting invariants (M1).

Reference pattern: compress/decompress roundtrips + internal accounting
(``BVGraphTest.java:50-99``: file length == sum of component bits,
arcs == copied+intervalised+residual). Here: decode(build(edges)) == edges
and sum(n_edges) == |edges|, checksums reproducible.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webgraph_spark.plans.csr import (
    build_csr,
    csr_to_edges,
    decode_block,
    verify_accounting,
)
from webgraph_spark.sources.corpus import corpus_edges, synth_corpus


def _arcset(df):
    return {(r["src"], r["dst"]) for r in df.select("src", "dst").collect()}


@pytest.mark.parametrize("num_blocks", [1, 3, 8])
def test_roundtrip_small(spark, num_blocks):
    arcs = [(i, (i * 7 + j) % 50) for i in range(50) for j in range(i % 5)]
    edges = spark.createDataFrame(sorted(set(arcs)), "src long, dst long")
    csr = build_csr(edges, num_blocks=num_blocks)
    assert _arcset(csr_to_edges(csr.blocks)) == set(sorted(set(arcs)))
    acc = verify_accounting(csr)
    assert acc["ok"], acc


def test_roundtrip_corpus_graph(spark):
    corpus = synth_corpus(spark, n_repos=5, files_per_repo=50, seed=42)
    edges = corpus_edges(corpus).cache()
    csr = build_csr(edges, target_edges_per_block=200)
    back = csr_to_edges(csr.blocks)
    assert back.exceptAll(edges).isEmpty() and edges.exceptAll(back).isEmpty()
    acc = verify_accounting(csr)
    assert acc["ok"] and acc["blocks"] >= 2


def test_blocks_are_degree_balanced(spark):
    # Zipf-ish skew: node 0 is a huge hub src; balanced cuts must split edges
    # roughly evenly anyway.
    arcs = [(0, j) for j in range(1, 901)] + [(i, 0) for i in range(1, 101)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    csr = build_csr(edges, num_blocks=4)
    counts = [r["n_edges"] for r in csr.blocks.select("n_edges").collect()]
    assert sum(counts) == 1000
    # src 0 carries 90% of edges; it must sit alone in its block(s) rather
    # than dragging the rest with it.
    assert max(counts) <= 950


def test_block_ranges_disjoint_and_sorted(spark):
    corpus = synth_corpus(spark, n_repos=3, files_per_repo=40, seed=7)
    edges = corpus_edges(corpus)
    csr = build_csr(edges, num_blocks=5)
    rows = csr.blocks.orderBy("block_id").collect()
    prev_max = -1
    for r in rows:
        assert r["src_min"] <= r["src_max"]
        assert r["src_min"] > prev_max  # disjoint, increasing ranges
        prev_max = r["src_max"]
        srcs = np.array(r["srcs"], dtype=np.int64)
        assert np.all(np.diff(srcs) > 0)  # strictly sorted srcs
        s, indptr, succs = decode_block(srcs, np.array(r["degs"]), r["succ"])
        for i in range(s.size):  # successor lists sorted, duplicate-free
            sl = succs[indptr[i] : indptr[i + 1]]
            assert np.all(np.diff(sl) > 0) if sl.size > 1 else True


def test_checksum_detects_corruption(spark):
    edges = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "src long, dst long")
    csr = build_csr(edges, num_blocks=1)
    row = csr.blocks.collect()[0]
    from webgraph_spark.plans.csr import _edge_checksum

    srcs, indptr, succs = decode_block(
        np.array(row["srcs"]), np.array(row["degs"]), row["succ"]
    )
    degs = np.diff(indptr)
    assert _edge_checksum(srcs, degs, succs) == row["checksum"]
    succs2 = succs.copy()
    succs2[0] += 1
    assert _edge_checksum(srcs, degs, succs2) != row["checksum"]


def test_locality_ordering_improves_compression(spark):
    """The reference's permutations exist to shrink gap codes
    (Transform.java:2468-2665); verify the effect end-to-end: corpus ids
    minted in (repo, path) order compress better than a random relabeling."""
    from webgraph_spark.operators.permutations import random_permutation
    from webgraph_spark.operators.transform import map_nodes
    from webgraph_spark.plans.csr import build_csr, compression_stats
    from webgraph_spark.sources.corpus import corpus_edges, corpus_nodes, synth_corpus

    corpus = synth_corpus(spark, n_repos=10, files_per_repo=40)
    nodes = corpus_nodes(corpus)
    edges = corpus_edges(corpus, nodes, no_loops=True).persist()
    ordered = compression_stats(build_csr(edges, num_blocks=2))
    shuffled = map_nodes(edges, random_permutation(nodes.select("id"), seed=5))
    randomized = compression_stats(build_csr(shuffled, num_blocks=2))
    assert ordered["edges"] == randomized["edges"]
    # (repo, path)-ordered ids -> smaller successor gaps -> fewer bytes
    assert ordered["bits_per_link"] < randomized["bits_per_link"]
