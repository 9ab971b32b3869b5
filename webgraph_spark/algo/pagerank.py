"""PageRank: power iteration as a partition-local SpMV over CSR blocks.

Not present in the reference (no pagerank anywhere in /root/reference); the
iteration skeleton mirrors HyperBall's (``algo/HyperBall.java:1119,1330``):
driver loop, per-partition kernels over degree-balanced node ranges, a
convergence aggregate per pass, systolic state updates.

Update rule (standard power iteration with uniform teleport + dangling
redistribution)::

    r'[v] = (1-a)/n + a * ( sum_{u->v} r[u]/outdeg(u)  +  dangling_mass/n )
    dangling_mass = 1 - sum_{u: outdeg(u)>0} r[u]        (since sum r == 1)

Two execution strategies, differentially tested against each other and a
driver numpy oracle:

- :func:`pagerank` — the scale path. Each iteration cogroups the CSR block
  table with the rank table on ``block_id`` (ranks get their block id by
  vectorized binary search over the same cuts — no join needed; the block
  table is persisted pre-partitioned on block_id so the graph side is never
  re-exchanged), runs a numpy gather-scatter per block (rank/deg gathered by
  searchsorted, partials combined per dst with bincount — a map-side
  combine), then a single ``groupBy(dst).sum`` shuffle whose input is
  already reduced to at most one row per (block, dst). The dangling mass
  for iteration t is the non-dangling rank sum measured at the END of
  iteration t-1 — it rides on the same aggregate as the L1 delta, so one
  iteration is exactly two driver actions (update job + one aggregate).
  (:func:`personalized_pagerank` still uses the kernel's dst=-1 sentinel
  row for the same quantity.)

- :func:`pagerank_edges` — plain DataFrame join/agg formulation, used as the
  differential oracle and as the SQL-expressible fixed-iteration variant.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from webgraph_spark.plans.iterate import checkpoint_state

from webgraph_spark.plans.csr import CsrGraph, decode_block

_DANGLING_KEY = -1


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id, rank)
    iterations: int
    deltas: list[float] = field(default_factory=list)
    iter_seconds: list[float] = field(default_factory=list)
    converged: bool = False


def _spmv_arrow_kernel_factory():
    """Arrow-native kernel for cogroup(csr_blocks, ranks) — zero-copy in
    (block buffers stay Arrow), zero-copy out (RecordBatch wraps the numpy
    outputs). ~2× the pandas kernel's throughput: no pandas block
    consolidation on the 10M+-row output, no list-cell materialization."""
    import pyarrow as pa

    def kernel(blocks_tbl: "pa.Table", ranks_tbl: "pa.Table") -> "pa.Table":
        schema = pa.schema([("dst", pa.int64()), ("val", pa.float64())])
        if ranks_tbl.num_rows == 0:
            return pa.table(
                {"dst": pa.array([], pa.int64()), "val": pa.array([], pa.float64())}
            )
        rid = ranks_tbl.column("id").to_numpy(zero_copy_only=False)
        rval = ranks_tbl.column("rank").to_numpy(zero_copy_only=False)
        order = np.argsort(rid)
        rid, rval = rid[order], rval[order]
        out_dst: list[np.ndarray] = []
        out_val: list[np.ndarray] = []
        nd_partial = 0.0
        srcs_col = blocks_tbl.column("srcs")
        degs_col = blocks_tbl.column("degs")
        succ_col = blocks_tbl.column("succ")
        for i in range(blocks_tbl.num_rows):
            srcs = np.asarray(srcs_col[i].values, dtype=np.int64)
            degs = np.asarray(degs_col[i].values, dtype=np.int64)
            succ_bytes = succ_col[i].as_py()
            srcs, indptr, succs = decode_block(srcs, degs, succ_bytes)
            pos = np.searchsorted(rid, srcs)
            src_rank = rval[pos]
            nd_partial += float(src_rank.sum())
            d = np.diff(indptr)
            per_edge = np.repeat(src_rank / d, d)
            counts = np.bincount(succs, weights=per_edge)
            nz = np.flatnonzero(counts)
            out_dst.append(nz)
            out_val.append(counts[nz])
        out_dst.append(np.array([_DANGLING_KEY], dtype=np.int64))
        out_val.append(np.array([nd_partial], dtype=np.float64))
        return pa.table(
            {
                "dst": pa.array(np.concatenate(out_dst), pa.int64()),
                "val": pa.array(np.concatenate(out_val), pa.float64()),
            },
            schema=schema,
        )

    return kernel


def _spmv_kernel_factory():
    """Kernel for cogroup(csr_blocks, ranks) -> pre-aggregated contributions."""

    def kernel(key, blocks_pdf: pd.DataFrame, ranks_pdf: pd.DataFrame) -> pd.DataFrame:
        if ranks_pdf.empty:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"),
                                 "val": pd.Series(dtype="float64")})
        rid = ranks_pdf["id"].to_numpy(np.int64)
        rval = ranks_pdf["rank"].to_numpy(np.float64)
        order = np.argsort(rid)
        rid, rval = rid[order], rval[order]
        out_dst: list[np.ndarray] = []
        out_val: list[np.ndarray] = []
        nd_partial = 0.0
        for _, row in blocks_pdf.iterrows():
            srcs, indptr, succs = decode_block(
                np.asarray(row["srcs"], dtype=np.int64),
                np.asarray(row["degs"], dtype=np.int64),
                row["succ"],
            )
            pos = np.searchsorted(rid, srcs)
            # Every src must have a rank row in its own block range.
            src_rank = rval[pos]
            nd_partial += float(src_rank.sum())
            degs = np.diff(indptr)
            per_edge = np.repeat(src_rank / degs, degs)
            # Dense ids -> direct weighted bincount (O(edges + max_id),
            # no sort): ~5x faster than unique+bincount per block.
            counts = np.bincount(succs, weights=per_edge)
            nz = np.flatnonzero(counts)
            out_dst.append(nz)
            out_val.append(counts[nz])
        out_dst.append(np.array([_DANGLING_KEY], dtype=np.int64))
        out_val.append(np.array([nd_partial], dtype=np.float64))
        return pd.DataFrame(
            {"dst": np.concatenate(out_dst), "val": np.concatenate(out_val)}
        )

    return kernel


def pagerank(
    spark: SparkSession,
    csr: CsrGraph,
    nodes: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 200,
    checkpointer=None,
    initial_ranks: DataFrame | None = None,
    start_iteration: int = 0,
) -> PageRankResult:
    """CSR-kernel PageRank to convergence (L1 delta < tol).

    ``nodes`` is the full node table ``(id)`` (dangling nodes included).
    ``checkpointer`` (optional :class:`webgraph_spark.checkpoint.CheckpointManager`)
    persists per-iteration state + lineage and enables resume via
    ``initial_ranks``/``start_iteration``.
    """
    n = nodes.count()
    # Persist the CSR table ALREADY hash-partitioned and sorted on block_id:
    # the cogroup's required distribution is then satisfied by the cached
    # partitioning, so the graph (the big side) is shuffled ZERO times per
    # iteration — only the small rank table moves. Without this, every
    # iteration re-exchanges the whole compressed graph (verified via
    # .explain: Exchange+Sort above the InMemoryTableScan disappear).
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    blocks = (
        csr.blocks.repartition(shuffle_parts, "block_id")
        .sortWithinPartitions("block_id")
        .persist()
    )
    blocks.count()  # materialize once; reused every iteration
    # has-out flag per node: the dangling mass of iteration t is known at
    # the END of iteration t-1 (sum of rank over non-dangling nodes rides
    # on the same checkpoint scan as the L1 delta) — so each iteration is
    # exactly TWO driver actions: the update job and one aggregate. No
    # dangling collect, no sums persist/unpersist.
    srcs = blocks.select(F.explode("srcs").alias("id")).distinct()
    n_src = srcs.count()
    nodes = (
        nodes.select("id")
        .join(srcs.withColumn("__has_out", F.lit(1.0)), "id", "left")
        .na.fill({"__has_out": 0.0})
        .persist()
    )

    bid_col = csr.node_block_id_col("id")
    if initial_ranks is not None:
        ranks = nodes.join(initial_ranks.select("id", "rank"), "id")
        ranks = ranks.transform(checkpoint_state)
        non_dangling = float(
            ranks.agg(F.sum(F.col("rank") * F.col("__has_out"))).collect()[0][0]
            or 0.0
        )
    else:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        non_dangling = n_src / n

    kernel = _spmv_arrow_kernel_factory()
    result = PageRankResult(ranks=ranks, iterations=start_iteration)
    for it in range(start_iteration, max_iter):
        t0 = time.monotonic()
        ranks_b = ranks.select("id", "rank").withColumn("block_id", bid_col)
        contribs = (
            blocks.groupby("block_id")
            .cogroup(ranks_b.groupby("block_id"))
            .applyInArrow(kernel, schema="dst long, val double")
        )
        # One shuffle: inputs are pre-combined to <=1 row per (block, dst).
        sums = (
            contribs.filter(F.col("dst") >= 0)
            .groupBy("dst")
            .agg(F.sum("val").alias("contrib"))
        )
        dangling = 1.0 - non_dangling
        base = (1.0 - alpha) / n + alpha * dangling / n
        updated = (
            ranks.join(sums.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                "__has_out",
                (
                    F.lit(base)
                    + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("new_rank"),
                F.col("rank").alias("old_rank"),
            )
            .select(
                "id",
                "__has_out",
                F.col("new_rank").alias("rank"),
                F.abs(F.col("new_rank") - F.col("old_rank")).alias("__delta"),
            )
        )
        # ONE action per iteration: the L1 delta and next iteration's
        # non-dangling mass ride on the eager checkpoint job itself as
        # observed metrics — no separate aggregate scan, halving the
        # per-iteration serial floor.
        obs = Observation()
        updated = updated.observe(
            obs,
            F.sum("__delta").alias("d"),
            F.sum(F.col("rank") * F.col("__has_out")).alias("nd"),
        ).transform(checkpoint_state)
        agg = obs.get
        delta = agg["d"]
        non_dangling = float(agg["nd"] or 0.0)
        new_ranks = updated.select("id", "__has_out", "rank")
        wall = time.monotonic() - t0
        result.deltas.append(float(delta))
        result.iter_seconds.append(wall)
        result.iterations = it + 1
        if checkpointer is not None:
            checkpointer.save_iteration(
                updated.select("id", "rank"), it + 1, wall_s=wall,
                delta=float(delta),
            )
        ranks = new_ranks
        if delta < tol:
            result.converged = True
            break
    result.ranks = ranks.select("id", "rank")
    return result


def pagerank_edges(
    edges: DataFrame,
    nodes: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 200,
    n_iter: int | None = None,
) -> PageRankResult:
    """Plain join/agg PageRank — the differential/SQL-expressible path.

    ``n_iter`` runs exactly that many iterations (no convergence check),
    matching a fixed-iteration SQL oracle term for term.
    """
    n = nodes.count()
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    ).persist()
    n_src = deg.count()
    nodes = (
        nodes.select("id")
        .join(deg.select("id", F.lit(1.0).alias("__has_out")), "id", "left")
        .na.fill({"__has_out": 0.0})
        .persist()
    )
    from webgraph_spark.plans.partitioning import partition_for_join

    # big side cached hash-partitioned+sorted on the join key: the per-
    # iteration sort-merge join re-exchanges ONLY the O(n) rank table
    edeg = partition_for_join(
        edges.join(deg.withColumnRenamed("id", "src"), "src"), "src"
    ).persist()
    edeg.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).transform(checkpoint_state)
    non_dangling = n_src / n
    result = PageRankResult(ranks=ranks, iterations=0)
    total = n_iter if n_iter is not None else max_iter
    for it in range(total):
        # SHUFFLE_HASH on the rank side: the checkpointed rank state has
        # unknown stats while the persisted edeg side is small enough at
        # bench scale that AQE otherwise broadcast-builds the whole O(m)
        # edge table every iteration (verified via executedPlan) — the same
        # trap labelprop/CC hit. The hint keeps edeg's cached hash layout
        # (zero edge exchange); only the O(n) rank table shuffles.
        # Self-row fusion: the contrib-vs-ranks back-join (an O(n) exchange
        # of ranks by id plus a join build per iteration) is folded into the
        # contribution aggregation — each node's state row rides in as a
        # tagged self row contributing 0.0 to the sum while carrying the old
        # rank and the __has_out flag through the same hash aggregate. The
        # rank update + L1 delta are then a pure projection. Per iteration:
        # 2 exchanges (ranks by src for the gather, partials by id) and 1
        # join, versus 3 exchanges and 2 joins for the join-back form.
        gather = edeg.join(
            ranks.hint("shuffle_hash"), edeg["src"] == ranks["id"]
        ).select(
            F.col("dst").alias("id"),
            (F.col("rank") / F.col("deg")).alias("__v"),
            F.lit(0).alias("__s"),
            F.lit(0.0).alias("__ho"),
        )
        self_rows = ranks.select(
            "id",
            F.col("rank").alias("__v"),
            F.lit(1).alias("__s"),
            F.col("__has_out").alias("__ho"),
        )
        # dangling mass of iteration t = 1 - non-dangling rank sum measured
        # on iteration t-1's OUTPUT (observed metric) — no extra scan job
        dangling = 1.0 - float(non_dangling)
        base = (1.0 - alpha) / n + alpha * dangling / n
        new_rank = F.lit(base) + F.lit(alpha) * F.col("__contrib")
        obs = Observation()
        updated = (
            gather.unionByName(self_rows)
            .groupBy("id")
            .agg(
                F.sum(
                    F.when(F.col("__s") == 0, F.col("__v")).otherwise(0.0)
                ).alias("__contrib"),
                F.max(F.when(F.col("__s") == 1, F.col("__v"))).alias("__oldr"),
                F.max("__ho").alias("__has_out"),
            )
            .select(
                "id",
                "__has_out",
                new_rank.alias("rank"),
                F.abs(new_rank - F.col("__oldr")).alias("__delta"),
            )
            .observe(
                obs,
                F.sum("__delta").alias("d"),
                F.sum(F.col("rank") * F.col("__has_out")).alias("nd"),
            )
            .transform(checkpoint_state)
        )
        agg = obs.get
        non_dangling = float(agg["nd"] or 0.0)
        result.iterations = it + 1
        ranks = updated.select("id", "__has_out", "rank")
        if n_iter is None:
            delta = float(agg["d"])
            result.deltas.append(delta)
            if delta < tol:
                result.converged = True
                break
    result.ranks = ranks.select("id", "rank")
    return result


def personalized_pagerank(
    spark: SparkSession,
    csr: CsrGraph,
    nodes: DataFrame,
    sources: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 200,
) -> PageRankResult:
    """Personalized PageRank: teleport (and dangling mass) goes to the
    ``sources`` set uniformly instead of all nodes.

    No reference counterpart (the reference has no PageRank at all); the
    standard PPR definition with the same CSR SpMV kernel. Nodes outside
    the reachable set of ``sources`` converge to rank 0.
    """
    n_src = sources.count()
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    blocks = (
        csr.blocks.repartition(shuffle_parts, "block_id")
        .sortWithinPartitions("block_id")
        .persist()
    )
    blocks.count()
    srcs_with_out = blocks.select(F.explode("srcs").alias("id")).distinct()
    src_flag = sources.select("id").withColumn("__is_src", F.lit(1.0))
    base_nodes = (
        nodes.select("id")
        .join(src_flag, "id", "left")
        .join(srcs_with_out.withColumn("__has_out", F.lit(1.0)), "id", "left")
        .na.fill({"__is_src": 0.0, "__has_out": 0.0})
        .persist()
    )
    ranks = base_nodes.select(
        "id", "__is_src", "__has_out", (F.col("__is_src") / n_src).alias("rank")
    ).transform(checkpoint_state)
    # non-dangling mass of the initial vector: sources that have out-arcs
    non_dangling = (
        base_nodes.filter(F.col("__is_src") > 0)
        .agg(F.sum(F.col("__has_out") / n_src))
        .collect()[0][0]
        or 0.0
    )

    bid_col = csr.node_block_id_col("id")
    kernel = _spmv_kernel_factory()
    result = PageRankResult(ranks=ranks, iterations=0)
    for it in range(max_iter):
        t0 = time.monotonic()
        ranks_b = ranks.select("id", "rank").withColumn("block_id", bid_col)
        contribs = (
            blocks.groupby("block_id")
            .cogroup(ranks_b.groupby("block_id"))
            .applyInPandas(kernel, schema="dst long, val double")
        )
        sums = (
            contribs.filter(F.col("dst") >= 0)
            .groupBy("dst")
            .agg(F.sum("val").alias("contrib"))
        )
        dangling = 1.0 - float(non_dangling)
        # teleport + dangling mass concentrate on the source set
        src_mass = (1.0 - alpha) / n_src + alpha * dangling / n_src
        new_rank = (
            F.col("__is_src") * F.lit(src_mass)
            + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
        )
        obs = Observation()
        updated = (
            ranks.join(sums.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                "__is_src",
                "__has_out",
                new_rank.alias("rank"),
                F.abs(new_rank - F.col("rank")).alias("__delta"),
            )
            .observe(
                obs,
                F.sum("__delta").alias("d"),
                F.sum(F.col("rank") * F.col("__has_out")).alias("nd"),
            )
            .transform(checkpoint_state)
        )
        agg = obs.get
        delta = float(agg["d"])
        non_dangling = float(agg["nd"] or 0.0)
        ranks = updated.select("id", "__is_src", "__has_out", "rank")
        result.deltas.append(delta)
        result.iter_seconds.append(time.monotonic() - t0)
        result.iterations = it + 1
        if delta < tol:
            result.converged = True
            break
    result.ranks = ranks.select("id", "rank")
    return result


def pagerank_weighted(
    edges: DataFrame,
    nodes: DataFrame,
    weight_col: str = "weight",
    alpha: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 200,
    n_iter: int | None = None,
) -> PageRankResult:
    """Weighted PageRank over a labelled edge table ``(src, dst, weight)``:
    contributions proportional to edge weight / total out-weight.

    The labelled-graph analogue of :func:`pagerank_edges` (weights are arc
    labels in the reference's algebra, ``labelling/Label.java:72``); weights
    must be positive.
    """
    n = nodes.count()
    w = F.col(weight_col).cast("double")
    # zero-weight arcs carry no mass: drop them, so a node whose out-weights
    # sum to 0 is correctly dangling instead of dividing by zero (ANSI)
    edges = edges.filter(w > 0)
    totals = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum(w).alias("wtot")
    ).persist()
    n_src = totals.count()
    nodes = (
        nodes.select("id")
        .join(totals.select("id", F.lit(1.0).alias("__has_out")), "id", "left")
        .na.fill({"__has_out": 0.0})
        .persist()
    )
    from webgraph_spark.plans.partitioning import partition_for_join

    # big side cached hash-partitioned on the join key (see pagerank_edges)
    ew = partition_for_join(
        edges.select("src", "dst", w.alias("__w")).join(
            totals.withColumnRenamed("id", "src"), "src"
        ),
        "src",
    ).persist()
    ew.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).transform(checkpoint_state)
    non_dangling = n_src / n
    result = PageRankResult(ranks=ranks, iterations=0)
    total = n_iter if n_iter is not None else max_iter
    for it in range(total):
        # same shuffle_hash rationale as pagerank_edges: never rebroadcast
        # or re-exchange the O(m) weighted edge table per iteration
        contrib = (
            ew.join(ranks.hint("shuffle_hash"), ew["src"] == ranks["id"])
            .select(
                F.col("dst"),
                (F.col("rank") * F.col("__w") / F.col("wtot")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = 1.0 - float(non_dangling)
        base = (1.0 - alpha) / n + alpha * dangling / n
        new_rank = (
            F.lit(base) + F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
        )
        obs = Observation()
        updated = (
            ranks.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                "__has_out",
                new_rank.alias("rank"),
                F.abs(new_rank - F.col("rank")).alias("__d"),
            )
            .observe(
                obs,
                F.sum("__d").alias("d"),
                F.sum(F.col("rank") * F.col("__has_out")).alias("nd"),
            )
            .transform(checkpoint_state)
        )
        agg = obs.get
        non_dangling = float(agg["nd"] or 0.0)
        result.iterations = it + 1
        ranks = updated.select("id", "__has_out", "rank")
        if n_iter is None:
            delta = float(agg["d"])
            result.deltas.append(delta)
            if delta < tol:
                result.converged = True
                break
    result.ranks = ranks.select("id", "rank")
    return result


def pagerank_weighted_numpy(
    arcs: list[tuple[int, int, float]], n: int, alpha: float = 0.85,
    n_iter: int = 20,
) -> np.ndarray:
    src = np.array([a for a, _, _ in arcs], dtype=np.int64)
    dst = np.array([b for _, b, _ in arcs], dtype=np.int64)
    wts = np.array([w for _, _, w in arcs], dtype=np.float64)
    wtot = np.zeros(n)
    np.add.at(wtot, src, wts)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] * wts / wtot[src])
        dangling = r[wtot == 0].sum()
        r = (1 - alpha) / n + alpha * (contrib + dangling / n)
    return r


def ppr_numpy(
    arcs: list[tuple[int, int]], n: int, sources: list[int],
    alpha: float = 0.85, tol: float = 1e-9, max_iter: int = 200,
) -> np.ndarray:
    """Driver-side personalized-PageRank oracle."""
    src = np.array([a for a, _ in arcs], dtype=np.int64)
    dst = np.array([b for _, b in arcs], dtype=np.int64)
    deg = np.bincount(src, minlength=n)
    tele = np.zeros(n)
    tele[np.asarray(sources)] = 1.0 / len(sources)
    r = tele.copy()
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / deg[src])
        dangling = r[deg == 0].sum()
        r_new = (1 - alpha) * tele + alpha * (contrib + dangling * tele)
        delta = np.abs(r_new - r).sum()
        r = r_new
        if delta < tol:
            break
    return r


def pagerank_numpy(
    arcs: list[tuple[int, int]], n: int, alpha: float = 0.85, tol: float = 1e-9,
    max_iter: int = 200, n_iter: int | None = None,
) -> np.ndarray:
    """Driver-side dense oracle (test-scale only)."""
    src = np.array([a for a, _ in arcs], dtype=np.int64)
    dst = np.array([b for _, b in arcs], dtype=np.int64)
    deg = np.bincount(src, minlength=n)
    r = np.full(n, 1.0 / n)
    total = n_iter if n_iter is not None else max_iter
    for _ in range(total):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / deg[src])
        dangling = r[deg == 0].sum()
        r_new = (1 - alpha) / n + alpha * (contrib + dangling / n)
        delta = np.abs(r_new - r).sum()
        r = r_new
        if n_iter is None and delta < tol:
            break
    return r
