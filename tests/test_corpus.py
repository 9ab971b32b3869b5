"""Corpus synthesis + edge derivation (SURVEY §2.1 ingestion; M0)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from webgraph_spark.sources.corpus import (
    corpus_edges,
    corpus_nodes,
    extract_references,
    synth_corpus,
    verify_content_sha,
)
from webgraph_spark.sources.ids import mint_dense_ids


def test_corpus_shape_and_determinism(spark):
    c1 = synth_corpus(spark, n_repos=3, files_per_repo=10, seed=42)
    c2 = synth_corpus(spark, n_repos=3, files_per_repo=10, seed=42, num_partitions=7)
    assert c1.count() == 30
    # Deterministic across partitioning: identical rows.
    assert c1.exceptAll(c2).isEmpty() and c2.exceptAll(c1).isEmpty()
    cols = set(c1.columns)
    assert {"repo", "path", "commit", "lang", "content", "content_sha"} <= cols


def test_content_sha_invariant_matches_hashlib(spark):
    corpus = synth_corpus(spark, n_repos=2, files_per_repo=5, seed=42)
    assert verify_content_sha(corpus) == 0
    # Cross-implementation check: Python hashlib agrees with Spark sha2.
    for row in corpus.limit(5).collect():
        expect = hashlib.sha256(row["content"].encode()).hexdigest()
        assert row["content_sha"] == expect


def test_mint_dense_ids_bijection(spark):
    corpus = synth_corpus(spark, n_repos=3, files_per_repo=10, seed=42)
    nodes = mint_dense_ids(corpus, ["repo", "path"])
    rows = nodes.collect()
    ids = sorted(r["id"] for r in rows)
    assert ids == list(range(30))  # dense 0..n-1
    # Sort-order minting: id order == key order.
    by_key = sorted(rows, key=lambda r: (r["repo"], r["path"]))
    assert [r["id"] for r in by_key] == list(range(30))


def test_edges_match_reparse_oracle(spark):
    corpus = synth_corpus(spark, n_repos=3, files_per_repo=10, seed=42).cache()
    nodes = corpus_nodes(corpus).cache()
    edges = corpus_edges(corpus, nodes)
    # Independent driver-side oracle: re-parse content with Python re.
    import re

    key2id = {(r["repo"], r["path"]): r["id"] for r in nodes.collect()}
    expect = set()
    for row in corpus.collect():
        src = key2id[(row["repo"], row["path"])]
        for m in re.finditer(r"import ([A-Za-z0-9_]+)/([A-Za-z0-9_/.]+)", row["content"]):
            tgt = key2id.get((m.group(1), m.group(2)))
            if tgt is not None:
                expect.add((src, tgt))
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == expect
    assert len(got) > 10


def test_edges_dedup_and_noloops(spark):
    corpus = synth_corpus(spark, n_repos=2, files_per_repo=20, seed=1)
    e = corpus_edges(corpus)
    assert e.count() == e.dropDuplicates(["src", "dst"]).count()
    e2 = corpus_edges(corpus, no_loops=True)
    assert e2.filter(F.col("src") == F.col("dst")).count() == 0


def test_references_skewed_indegree(spark):
    # The log-uniform target law must produce hub files (power-ish in-degree).
    corpus = synth_corpus(spark, n_repos=5, files_per_repo=100, seed=42)
    refs = extract_references(corpus)
    top = (
        refs.groupBy("dst_repo", "dst_path")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]["count"]
    )
    avg = refs.count() / 500
    assert top > 10 * avg  # heavy hitter exists
