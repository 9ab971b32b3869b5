"""HyperBall-lite: HyperLogLog ball sizes, neighbourhood function, and
geometric centralities as an iterative DataFrame job.

Reference: ``algo/HyperBall.java:222`` — per-node HLL counters; each
iteration every node takes the register-wise **max** of its successors'
counters merged with its own (``HyperBall.java:913``); convergence when no
register changes (``:1349``). Per-node centralities accumulate from the
per-iteration ball-size increments (``:266-279``): at distance t with
increment Δ_t, harmonic += Δ_t / t, sum_dist += t·Δ_t (closeness = 1/sum_dist,
Lin = reachable² / sum_dist — ``GeometricCentralities.java:184-202`` gives
the exact-BFS analogues used as test oracles).

Spark formulation: state table ``(id, regs binary, est, harmonic,
sum_dist)``; one iteration = edges ⋈ state on dst (gather successors'
counters) unioned with the state itself, ``groupBy(id).applyInPandas`` doing
the numpy register max-merge — vectorized, no per-row Python hashing (node
seeds are hashed once at init by ``xxhash64`` JVM-side). The changed-counter
and NF aggregates ride on the checkpointed result (one extra cheap scan, no
recompute), mirroring how the reference piggybacks ``modified()`` on the
iteration barrier.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _estimate(regs: np.ndarray, m: int) -> np.ndarray:
    """Standard HLL estimate with linear-counting small-range correction.
    ``regs``: (rows, m) uint8."""
    inv = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    est = _alpha(m) * m * m / inv
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lc = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    return np.where(small, lc, est)


@dataclass
class HyperBallResult:
    state: DataFrame  # (id, regs, est, harmonic, sum_dist)
    nf: list[float] = field(default_factory=list)  # approx N(t), t=0..T
    iterations: int = 0
    converged: bool = False
    iter_seconds: list[float] = field(default_factory=list)


_STATE_SCHEMA = (
    "id long, regs binary, est double, harmonic double, sum_dist double, "
    "changed int"
)


def _merge_factory(m: int, t: int):
    """Partition-wise vectorized register merge.

    Input partitions are hash-partitioned and sorted by (id, is_own desc),
    so each node's rows are contiguous with its own state row first; one
    ``np.maximum.reduceat`` merges every group in the partition at once
    (no per-group Python call — the reference's broadword register max,
    ``HyperBall.java:913``, in numpy form).
    """

    def merge(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        if pdf.empty:
            return
        ids = pdf["id"].to_numpy(np.int64)
        regs = np.frombuffer(
            b"".join(pdf["regs"].tolist()), dtype=np.uint8
        ).reshape(len(pdf), m)
        uniq, starts = np.unique(ids, return_index=True)
        # rows arrive sorted by (id, is_own desc): starts index the own rows.
        # A group with NO own row (an edge src absent from `nodes`) would
        # otherwise mint a phantom state row with est_old = 0 — drop it.
        own_first = pdf["is_own"].to_numpy(np.int32)[starts] == 1
        merged = np.maximum.reduceat(regs, starts, axis=0)
        if not own_first.all():
            uniq, starts = uniq[own_first], starts[own_first]
            merged = merged[own_first]
            if uniq.size == 0:
                return
        old = regs[starts]
        changed = (merged != old).any(axis=1).astype(np.int32)
        est_new = _estimate(merged, m)
        est_old = pdf["est"].to_numpy(np.float64)[starts]
        delta = np.maximum(est_new - est_old, 0.0)
        harmonic = pdf["harmonic"].to_numpy(np.float64)[starts] + delta / t
        sum_dist = pdf["sum_dist"].to_numpy(np.float64)[starts] + delta * t
        yield pd.DataFrame(
            {
                "id": uniq,
                "regs": [r.tobytes() for r in merged],
                "est": est_new,
                "harmonic": harmonic,
                "sum_dist": sum_dist,
                "changed": changed,
            }
        )

    return merge


def hyperball(
    edges: DataFrame,
    nodes: DataFrame,
    log2m: int = 6,
    seed: int = 42,
    max_iter: int = 64,
) -> HyperBallResult:
    """Run to the exact register fixpoint (``modified()==0``) or ``max_iter``.

    ``nf[t]`` approximates the number of pairs within distance <= t;
    ``state.est`` is each node's reachable-set size estimate; ``harmonic``
    and ``sum_dist`` give harmonic/closeness/Lin centralities.
    """
    from webgraph_spark.plans.partitioning import partition_for_join

    m = 1 << log2m
    # gather joins on dst every iteration — cache the graph pre-partitioned
    # on dst so only the state table shuffles (see partition_for_join)
    edges = partition_for_join(edges.select("src", "dst"), "dst").persist()
    edges.count()
    spark = edges.sparkSession

    # init: seed register from the node's own hash (JVM-side xxhash64).
    h = F.xxhash64(F.lit(seed), F.col("id"))
    j = F.pmod(h, F.lit(m))
    # rho = number of leading zeros of a second hash + 1, capped
    h2 = F.xxhash64(F.lit(seed + 1), F.col("id"))

    def init_kernel(pdf_iter):
        for pdf in pdf_iter:
            n = len(pdf)
            ids = pdf["id"].to_numpy(np.int64)
            js = pdf["j"].to_numpy(np.int64)
            h2s = pdf["h2"].to_numpy(np.int64).astype(np.uint64)
            # rho: position of first 1-bit from LSB side + 1 (geometric)
            v = h2s.copy()
            mask = v != 0
            # count trailing zeros vectorized
            tz = np.zeros(n, dtype=np.int64)
            vv = v.copy()
            for b in (32, 16, 8, 4, 2, 1):
                low = (vv & ((np.uint64(1) << np.uint64(b)) - np.uint64(1))) == 0
                step = mask & low & (tz + b <= 62)
                tz = np.where(step, tz + b, tz)
                vv = np.where(step, vv >> np.uint64(b), vv)
            rho = np.where(mask, tz + 1, 1).astype(np.uint8)
            regs = np.zeros((n, m), dtype=np.uint8)
            regs[np.arange(n), js] = rho
            est = _estimate(regs, m)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "regs": [r.tobytes() for r in regs],
                    "est": est,
                    "harmonic": np.zeros(n),
                    "sum_dist": np.zeros(n),
                    "changed": np.ones(n, dtype=np.int32),
                }
            )

    state = (
        nodes.select("id", j.alias("j"), h2.alias("h2"))
        .mapInPandas(init_kernel, schema=_STATE_SCHEMA)
        .localCheckpoint(eager=True)
    )
    result = HyperBallResult(state=state)
    nf0 = state.agg(F.sum("est")).collect()[0][0]
    result.nf.append(float(nf0))

    for t in range(1, max_iter + 1):
        t0 = time.monotonic()
        own = state.select(
            "id", "regs", "est", "harmonic", "sum_dist", F.lit(1).alias("is_own")
        )
        # Systolic gather (HyperBall.java:120-135): a successor whose
        # registers did NOT change last iteration contributes nothing new
        # (its registers were already max-merged in), so only changed nodes
        # send messages — the tail iterations touch a shrinking frontier.
        msgs = edges.join(
            state.filter(F.col("changed") == 1).select(
                F.col("id").alias("dst"), "regs"
            ),
            "dst",
        ).select(
            F.col("src").alias("id"),
            "regs",
            F.lit(0.0).alias("est"),
            F.lit(0.0).alias("harmonic"),
            F.lit(0.0).alias("sum_dist"),
            F.lit(0).alias("is_own"),
        )
        merged = (
            own.unionByName(msgs)
            .repartition("id")
            .sortWithinPartitions("id", F.desc("is_own"))
            .mapInPandas(_merge_factory(m, t), schema=_STATE_SCHEMA)
            .localCheckpoint(eager=True)
        )
        agg = merged.agg(
            F.sum("changed").alias("ch"), F.sum("est").alias("nf")
        ).collect()[0]
        state = merged
        result.state = state
        result.iterations = t
        result.iter_seconds.append(time.monotonic() - t0)
        result.nf.append(float(agg["nf"]))
        if int(agg["ch"] or 0) == 0:
            result.converged = True
            # last append duplicates the fixpoint value; drop it
            result.nf.pop()
            break
    return result


def nf_statistics(nf: list[float]) -> dict:
    """Derived statistics of a neighbourhood function
    (``NeighbourhoodFunction.java:155-281``): CDF, PMF, median distance,
    average distance, spid (variance/mean of the distance distribution),
    and harmonic diameter. Driver-side numpy — the NF array is tiny."""
    arr = np.asarray(nf, dtype=np.float64)
    total = arr[-1]
    cdf = arr / total
    pmf = np.diff(arr, prepend=0.0) / total
    dists = np.arange(len(arr))
    mean = float((pmf * dists).sum())
    var = float((pmf * dists**2).sum() - mean**2)
    median = int(np.searchsorted(cdf, 0.5))
    n = arr[0]
    # harmonic diameter: n(n-1) / sum over pairs of 1/d
    inv_sum = float((pmf[1:] * total / dists[1:]).sum()) if len(arr) > 1 else 0.0
    harmonic_diameter = n * (n - 1) / inv_sum if inv_sum else float("inf")
    return {
        "cdf": cdf.tolist(),
        "pmf": pmf.tolist(),
        "median_distance": median,
        "average_distance": mean,
        "spid": var / mean if mean else 0.0,
        "harmonic_diameter": harmonic_diameter,
        "reachable_pairs": float(total),
    }


def combine_nfs(nfs: list[list[float]]) -> list[float]:
    """Pointwise mean of sampled NFs, ragged tails extended with each run's
    last value (``ApproximateNeighbourhoodFunctions.combine``,
    ``ApproximateNeighbourhoodFunctions.java:34``)."""
    t = max(len(nf) for nf in nfs)
    padded = np.stack(
        [np.pad(np.asarray(nf, float), (0, t - len(nf)), mode="edge") for nf in nfs]
    )
    return padded.mean(axis=0).tolist()


def jackknife(nfs: list[list[float]], statistic) -> dict:
    """Leave-one-out jackknife estimate ± standard error of a scalar
    statistic of the combined NF (the reference's jackknife over sampled
    ANFs, ``ApproximateNeighbourhoodFunctions.java:34``; ruby original
    ``ruby/jackknife.rb``)."""
    k = len(nfs)
    full = statistic(combine_nfs(nfs))
    loo = np.array(
        [statistic(combine_nfs(nfs[:i] + nfs[i + 1:])) for i in range(k)]
    )
    bias = (k - 1) * (loo.mean() - full)
    se = float(np.sqrt((k - 1) / k * ((loo - loo.mean()) ** 2).sum()))
    return {"estimate": full - bias, "standard_error": se, "raw": full}


def centralities(result: HyperBallResult) -> DataFrame:
    """(id, reachable, harmonic, closeness, lin) from a finished run
    (``HyperBall.java:266-279`` accumulators)."""
    s = result.state
    return s.select(
        "id",
        F.col("est").alias("reachable"),
        "harmonic",
        F.when(F.col("sum_dist") > 0, 1.0 / F.col("sum_dist"))
        .otherwise(0.0)
        .alias("closeness"),
        F.when(F.col("sum_dist") > 0, F.col("est") * F.col("est") / F.col("sum_dist"))
        .otherwise(1.0)
        .alias("lin"),
    )
