"""Portable (md5-based) hash paths: cross-engine determinism + parity of
the sketch pipelines with their xxhash64 throughput defaults.

The driver's oracle queries run MinHash/SimHash/hyperplane-LSH/HyperBall
over ``functions/porthash.py`` so DuckDB can replay them; these tests pin
(a) Spark-vs-Python bit equality of the hash itself, and (b) that the
portable pipelines still find what the default pipelines find on the
dedup fixtures.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from webgraph_spark.functions.dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
)
from webgraph_spark.functions.porthash import portable_hash60


def _ph60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "The quick  brown fox jumps over the lazy dog again and again"),
    (3, "the quick brown fox jumps over the lazy dog again and again "),
    (4, "the quick brown fox jumps over the lazy cat again and again"),
    (5, "completely different content about spark dataframes and shuffles"),
    (6, "yet another unrelated document mentioning varint gap encoding"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_portable_hash60_matches_python(spark):
    samples = ["", "a", "the quick", "zebra#42", "7:0#j42", "ünïcode"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash60("s", "#x").alias("h")).collect()
    }
    for s in samples:
        assert got[s] == _ph60_py(s + "#x")
        assert 0 <= got[s] < 1 << 60


def test_minhash_portable_matches_default_verified_pairs(spark):
    docs = _docs(spark)
    kw = dict(num_hashes=64, bands=32, threshold=0.5)
    default = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, **kw).collect()
    }
    portable = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, hash_fn="portable", **kw).collect()
    }
    # verification makes both exact on whatever candidates band-collide;
    # at 32x2 bands the s-curve recall is ~1 for these near-identical docs,
    # so both must surface the duplicate cluster with identical jaccards
    for k in [(1, 2), (1, 3), (2, 3), (1, 4)]:
        assert k in default and k in portable
        assert default[k] == pytest.approx(portable[k], abs=0.0)
    assert set(portable) <= set(default) | set(portable)  # no bogus schema


def test_simhash_portable_signature_is_60_bit(spark):
    from webgraph_spark.functions.dedup import simhash_col

    sigs = (
        _docs(spark)
        .select(simhash_col("text", hash_fn="portable").alias("sig"))
        .collect()
    )
    for r in sigs:
        assert 0 <= r["sig"] < 1 << 60  # bits 60-63 always clear


def test_simhash_portable_finds_duplicates(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(
            _docs(spark), max_hamming=10, hash_fn="portable"
        ).collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(2, 3)] == 0
    assert (1, 4) in pairs
    assert (1, 5) not in pairs


def test_lsh_buckets_portable_deterministic(spark):
    import numpy as np

    from webgraph_spark.functions.similarity import (
        _portable_hyperplane_bits_udf,
        cosine_topk,
        cosine_topk_lsh,
    )

    rng = np.random.default_rng(7)
    rows = [(int(i), rng.normal(size=16).astype("float32").tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 4)
    # buckets are a pure function of the vector — same input, same bucket
    b = _portable_hyperplane_bits_udf(16, 8, 42, 0)
    one = emb.select(b(F.col("embedding")).alias("bk")).collect()
    two = emb.select(b(F.col("embedding")).alias("bk")).collect()
    assert [r["bk"] for r in one] == [r["bk"] for r in two]
    # the approximate result is a subset of brute-force scores (re-score is
    # exact), with identical scores where present
    exact = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in cosine_topk(emb, q, k=40).collect()
    }
    approx = cosine_topk_lsh(
        emb, q, dim=16, k=5, num_planes=6, num_tables=4, hash_fn="portable"
    ).collect()
    assert approx  # non-degenerate: some candidates collide
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact
        assert r["score"] == pytest.approx(exact[key], abs=0.0)


def test_hyperball_portable_estimates_reachability(spark):
    from webgraph_spark.algo.hyperball import hyperball

    # directed 12-cycle: every ball is exact size t+1 until wrap, NF known
    n = 12
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    res = hyperball(edges, nodes, log2m=5, max_iter=20, hash_fn="portable")
    assert res.converged
    # linear counting regime at these sizes: estimates track the exact ball
    # sizes closely; the final NF must be near n*n reachable pairs
    assert res.nf[0] == pytest.approx(n, rel=0.25)
    assert res.nf[-1] == pytest.approx(n * n, rel=0.25)
    assert all(b >= a * 0.999 for a, b in zip(res.nf, res.nf[1:]))
