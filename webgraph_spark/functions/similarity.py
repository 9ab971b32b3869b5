"""Similarity search over an embedding column (array<float>).

Training-data pipeline operator (no reference counterpart). Two paths:

- :func:`cosine_topk` — brute-force baseline: broadcast the (small) query
  set, JVM-side dot products (``aggregate(zip_with(...))`` — codegen, no
  Python), window top-k. Exact; O(|corpus| x |queries|).
- :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH buckets
  (sign bits of dot products with hash-derived ±1 planes, one vectorized
  numpy matmul per Arrow batch), candidates restricted to matching buckets
  (multi-table OR), then exact re-scoring. Recall < 1 by construction; the
  bucket tables trade recall for candidate count exactly like MinHash bands.
- :func:`cosine_neardup_pairs` — embedding near-duplicate pairs (cos >= t)
  via the same LSH bucketing, verified exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from webgraph_spark.plans.partitioning import widen_small_input


def _dot(a: Column, b: Column) -> Column:
    # cast each element to double BEFORE multiplying: float*float-then-widen
    # rounds differently from widen-then-multiply, and the DuckDB oracle
    # (embedding::DOUBLE[]) does the latter — IEEE parity requires matching
    # operand widths per op
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours for each query row.

    Returns (query_id, neighbor_id, score); self-matches excluded; ties
    broken by neighbor id (deterministic). The query side is broadcast —
    this is the 'small probe set against huge corpus' shape.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = widen_small_input(embeddings).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score", _dot("qv", "cv") / (_norm("qv") * _norm("cv"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score", "rn")
    )


def _hyperplane_bits_udf(dim: int, num_planes: int, seed: int, table: int):
    """Vectorized bucket id: sign bits of V @ P for deterministic ±1 planes."""
    rng = np.random.default_rng(seed * 1_000_003 + table)
    planes = rng.choice([-1.0, 1.0], size=(dim, num_planes)).astype(np.float64)

    @pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in vecs]
        )  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, planes)
        weights = (1 << np.arange(num_planes, dtype=np.int64))
        return pd.Series(bits.astype(np.int64) @ weights)

    return bucket


def _portable_hyperplane_bits_udf(dim: int, num_planes: int, seed: int, table: int):
    """DuckDB-replayable bucket id (``hash_fn="portable"``).

    The ±1 plane entries come from md5 bits (the porthash scheme:
    ``sign(p, d) = bit (d mod 60) of ph60("hp{seed}:{table}:{p}:{d//60}")``)
    and the sign test runs on a floor-quantized INTEGER projection
    (``floor(x * 2^20)``, |sum| < 2^28 — exact int64 in numpy AND SQL), so
    bucket ids are bit-identical across engines: a float dot product's
    last-ulp summation-order difference would otherwise flip sign bits near
    zero. Quantization only perturbs the LSH partition boundary, not the
    exact re-scoring downstream.
    """
    import hashlib

    signs = np.empty((dim, num_planes), dtype=np.int64)
    for p in range(num_planes):
        for d in range(dim):
            key = f"hp{seed}:{table}:{p}:{d // 60}"
            h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
            signs[d, p] = 1 if (h >> (d % 60)) & 1 else -1

    @pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        qz = np.floor(mat * 1048576.0).astype(np.int64)  # (batch, dim)
        bits = (qz @ signs) > 0  # (batch, planes)
        weights = (1 << np.arange(num_planes, dtype=np.int64))
        return pd.Series(bits.astype(np.int64) @ weights)

    return bucket


def with_lsh_buckets(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Add ``buckets array<long>`` — one random-hyperplane bucket per table."""
    make = (
        _portable_hyperplane_bits_udf
        if hash_fn == "portable"
        else _hyperplane_bits_udf
    )
    cols = [
        make(dim, num_planes, seed, t)(F.col(vec_col)).alias(f"__b{t}")
        for t in range(num_tables)
    ]
    out = df.select("*", *cols)
    return out.withColumn(
        "buckets", F.array(*[F.col(f"__b{t}") for t in range(num_tables)])
    ).drop(*[f"__b{t}" for t in range(num_tables)])


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 10,
    num_tables: int = 6,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in >= 1 table, then
    exact cosine re-scoring. Same output schema as :func:`cosine_topk`.

    ``hash_fn="portable"`` swaps in md5-derived integer-exact buckets
    (:func:`_portable_hyperplane_bits_udf`) so a DuckDB oracle replays the
    whole pipeline — bucketing, candidate join, re-score, top-k."""
    e = with_lsh_buckets(
        widen_small_input(embeddings).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        dim, "cv", num_planes, num_tables, seed, hash_fn,
    ).select(
        "neighbor_id", "cv",
        F.explode(
            F.transform(
                "buckets",
                lambda b, i: F.struct(i.alias("t"), b.alias("bk")),
            )
        ).alias("tb"),
    ).select("neighbor_id", "cv", F.col("tb.t").alias("t"), F.col("tb.bk").alias("bk"))
    q = with_lsh_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        dim, "qv", num_planes, num_tables, seed, hash_fn,
    ).select(
        "query_id", "qv",
        F.explode(
            F.transform(
                "buckets", lambda b, i: F.struct(i.alias("t"), b.alias("bk"))
            )
        ).alias("tb"),
    ).select("query_id", "qv", F.col("tb.t").alias("t"), F.col("tb.bk").alias("bk"))
    cands = (
        e.join(F.broadcast(q), ["t", "bk"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "score", _dot("qv", "cv") / (_norm("qv") * _norm("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score", "rn")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 5,
) -> np.ndarray:
    """Deterministic mini-Lloyd coarse quantizer for IVF: seeds are the
    vectors of the k smallest ids (reproducible at any parallelism), then
    ``n_iter`` assign/average rounds. Assignment is one numpy matmul per
    Arrow batch; the mean-update is a JVM aggregate over exploded
    components (k·dim rows — tiny). Returns a (k, dim) float64 array the
    caller broadcasts into the probe kernels."""
    seeds = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seeds])
    vecs = embeddings.select(F.col(vec_col).alias("v"))
    for _ in range(n_iter):
        assign = _assign_udf(cents)
        comp = (
            vecs.withColumn("c", assign(F.col("v")))
            .select("c", F.posexplode("v").alias("i", "x"))
            .groupBy("c", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = cents.copy()
        for r in comp:
            new[r["c"], r["i"]] = r["m"]
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def _assign_udf(centroids: np.ndarray):
    cents = centroids.copy()

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # nearest centroid by L2: argmin ||x-c||² = argmin (||c||² - 2x·c)
        d = (cents**2).sum(axis=1)[None, :] - 2.0 * (mat @ cents.T)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed by nearest
    coarse centroid; each query exactly re-scores only its ``nprobe``
    nearest buckets. Same output schema as :func:`cosine_topk`.

    The scale shape: the corpus partitions by centroid id (one shuffle at
    index-build time, reusable across query batches); a query touches
    nprobe/n_centroids of the data. Recall rises with nprobe and hits 1.0
    at nprobe = n_centroids (degenerating to the brute baseline).
    """
    if centroids is None:
        centroids = kmeans_centroids(embeddings, n_centroids, vec_col, id_col)
    assign = _assign_udf(centroids)
    cents = centroids

    @pandas_udf("array<int>")
    def probe_buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d = (cents**2).sum(axis=1)[None, :] - 2.0 * (mat @ cents.T)
        order = np.argsort(d, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    corpus = widen_small_input(embeddings).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        assign(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probe_buckets(F.col(vec_col))).alias("bucket"),
    )
    scored = (
        corpus.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", _dot("qv", "cv") / (_norm("qv") * _norm("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score", "rn")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 6,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= threshold), LSH-bucketed
    candidates verified exactly. Returns (id_a, id_b, score), id_a < id_b.

    The embedding-space twin of the MinHash near-dup pipeline: bucket
    collisions (any of ``num_tables`` hyperplane tables) propose candidates,
    an exact cosine filter keeps pairs at/above ``threshold``. At corpus
    scale the pair join is bounded by bucket occupancy — no all-pairs
    product — and ``hash_fn="portable"`` swaps in the md5-derived
    integer-exact buckets so a DuckDB oracle replays bucketing, candidate
    join, and verification bit-for-bit."""
    e = with_lsh_buckets(
        widen_small_input(embeddings).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ),
        dim, "v", num_planes, num_tables, seed, hash_fn,
    ).select(
        "id", "v",
        F.explode(
            F.transform("buckets", lambda b, i: F.struct(i.alias("t"), b.alias("bk")))
        ).alias("tb"),
    ).select("id", "v", F.col("tb.t").alias("t"), F.col("tb.bk").alias("bk"))
    # persisted + materialized BEFORE the self-join: both join sides are
    # projections of this frame, and inside one action they would otherwise
    # race to populate the cache and run the signature UDF twice per row
    # (the same fix the minhash/simhash pipelines carry)
    e = e.persist()
    e.count()
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "t", "bk")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "t", "bk")
    return (
        a.join(b, ["t", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("score", _dot("va", "vb") / (_norm("va") * _norm("vb")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
