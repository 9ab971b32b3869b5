"""Skew-aware partitioning primitives.

The reference splits iteration work by **cumulative outdegree**, not node
count, because power-law graphs put adjacent huge-degree nodes next to each
other (``algo/EliasFanoCumulativeOutdegreeList.java:25-45``, used by HyperBall
at ``HyperBall.java:307,527``). The Spark translation: compute src-range
boundaries as quantiles of the **edge** table's src column — equal edge mass
per range — and assign block ids by vectorized binary search.

Salting: a two-stage reduce for power-law keys — partial aggregate on
(key, salt), final aggregate on key — bounding any single reducer's input.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SIZE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _size_conf(spark, key: str, default: int) -> int:
    """Parse a Spark byte-size conf value ("128m", "134217728", "1g")."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    if raw.endswith("b"):
        raw = raw[:-1]
    if raw and raw[-1] in _SIZE_SUFFIX:
        return int(float(raw[:-1]) * _SIZE_SUFFIX[raw[-1]])
    return int(raw)


def degree_balanced_cuts(
    edges: DataFrame,
    num_blocks: int,
    col: str = "src",
    relative_error: float = 0.001,
) -> list[int]:
    """Interior cut points c_1..c_{k-1} splitting ``col`` into ``num_blocks``
    ranges of ~equal edge count (the cumulative-outdegree split).

    Every int64 maps to a block: block_id = searchsorted(cuts, v, 'left'),
    i.e. block i covers (cuts[i-1], cuts[i]] — a cut value closes its left
    block, so a heavy-hitter src that swallows several quantiles still gets
    isolated into its own block after cut deduplication.
    """
    if num_blocks <= 1:
        return []
    qs = [i / num_blocks for i in range(1, num_blocks)]
    cuts = edges.stat.approxQuantile(col, qs, relative_error)
    # Deduplicate (heavy hitters can repeat a quantile) but keep monotonicity.
    out: list[int] = []
    for c in cuts:
        ci = int(c)
        if not out or ci > out[-1]:
            out.append(ci)
    return out


def block_id_column(cuts: list[int], col: str = "src") -> Column:
    """Vectorized block assignment: np.searchsorted over broadcast cuts.

    A pandas UDF (Arrow-batched) rather than a CASE chain: O(log k) per value
    in C, no JVM expression blowup for hundreds of blocks.
    """
    cuts_arr = np.asarray(cuts, dtype=np.int64)

    @pandas_udf("long")
    def assign(v: pd.Series) -> pd.Series:
        return pd.Series(
            np.searchsorted(cuts_arr, v.to_numpy(np.int64), side="left")
        )

    return assign(F.col(col))


def partition_for_join(
    df: DataFrame, key: str = "src", num_partitions: int | None = None
) -> DataFrame:
    """Hash-partition + sort on the join key BEFORE persisting, so an
    iterative job's sort-merge joins find their required distribution and
    ordering already satisfied by the cache — the big (graph) side is then
    exchanged ZERO times per iteration; only the small state table moves.

    The partition count must equal ``spark.sql.shuffle.partitions`` or
    EnsureRequirements re-exchanges anyway; default reads it from the
    session. (Same idea as the reference keeping the graph immutable and
    thread-shared while per-iteration state mutates,
    ``ImmutableGraph.java:157-165``.)
    """
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(p, key).sortWithinPartitions(key)


def symmetrize_for_join(
    edges: DataFrame, key: str = "src", num_partitions: int | None = None
) -> DataFrame:
    """Symmetrized edge set, hash-partitioned + sorted on ``key``, in ONE
    shuffle.

    ``partition_for_join(symmetrize(edges))`` costs two exchanges: the
    dedup aggregate shuffles by (src, dst), then the repartition shuffles by
    src. Hash-partitioning by src FIRST satisfies the dedup aggregate's
    clustered-distribution requirement (src ⊆ {src, dst} — equal (src, dst)
    pairs co-locate), so union → repartition(src) → dropDuplicates → sort
    plans with a single exchange and the persisted output keeps
    HashPartitioning(src) for per-iteration join reuse. Used by every
    undirected fixpoint (CC, LPA).
    """
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return (
        sym.repartition(p, key)
        .dropDuplicates(["src", "dst"])
        .sortWithinPartitions(key)
    )


def _estimated_scan_partitions_from_sizes(
    spark, sizes: list[int], whole_file: bool = False
) -> int:
    """Replay Spark's split sizing + packing over known file sizes."""
    if whole_file:
        return len(sizes)
    open_cost = _size_conf(spark, "spark.sql.files.openCostInBytes",
                           4 * 1024 * 1024)
    max_part = _size_conf(spark, "spark.sql.files.maxPartitionBytes",
                          128 * 1024 * 1024)
    try:
        min_pn = int(spark.conf.get("spark.sql.files.minPartitionNum"))
    except Exception:
        try:
            min_pn = int(spark.conf.get("spark.sql.leafNodeDefaultParallelism"))
        except Exception:
            min_pn = spark.sparkContext.defaultParallelism
    padded = sum(sizes) + len(sizes) * open_cost
    max_split = int(min(max_part, max(open_cost, padded / max(1, min_pn))))
    max_split = max(1, max_split)
    pieces: list[int] = []
    for s in sizes:
        off = 0
        while off < s:
            pieces.append(min(max_split, s - off))
            off += max_split
    pieces.sort(reverse=True)
    parts, cur = 0, 0
    for ln in pieces:
        if cur > 0 and cur + ln > max_split:
            parts += 1
            cur = 0
        cur += ln + open_cost
    return parts + (1 if cur > 0 else 0)


def _estimated_scan_partitions(spark, files: list[str]) -> int | None:
    """FileSourceScan partition count, computed driver-side from the file
    listing by replaying Spark's own split sizing + packing
    (``FilePartition.maxSplitBytes`` / ``getFilePartitions``: maxSplit =
    min(maxPartitionBytes, max(openCostInBytes, padded_bytes /
    minPartitionNum)); files cut into maxSplit chunks, chunks sorted desc
    and greedily packed, each chunk padding the accumulator by openCost).
    No physical planning, no RDD conversion, no job. ``None`` when a size
    can't be read (remote URI) — the caller treats that as unknown.

    Whole-file codecs (.gz etc.) scan as exactly one partition per file
    regardless of size, so their estimate is the file count.
    """
    unsplittable = (".gz", ".zst", ".zstd", ".lz4", ".sz", ".deflate")
    if any(u.lower().endswith(unsplittable) for u in files):
        return len(files)
    sizes: list[int] = []
    try:
        for uri in files:
            path = uri[len("file:"):] if uri.startswith("file:") else uri
            sizes.append(os.path.getsize(path))
    except OSError:
        return None
    return _estimated_scan_partitions_from_sizes(spark, sizes)


def _local_leaf_partition_probe(df: DataFrame) -> int | None:
    """Per-leaf partition-count evidence from the OPTIMIZED logical plan
    (a py4j leaf walk — no full physical planning, no ``DataFrame.rdd``
    conversion of the query). ``max`` over leaves:

    - LocalRelation / OneRowRelation / Range → 0 (driver-local, by
      construction small, worth widening);
    - LogicalRDD → its carried partition count (0 when unknown — PySpark
      ``createDataFrame`` output, also driver-created);
    - InMemoryRelation (a ``persist()``ed subtree — ``inputFiles()`` is
      empty for these, which is exactly why this probe must handle them:
      round 4 shipped without it and the bench's persisted documents
      table ran the SimHash signature stage on ONE core, +53% wall) →
      the cached RDD's partition count. ``cachedColumnBuffers`` only
      CONSTRUCTS the RDD lineage for the cached subtree (no job); for a
      bench-style already-materialized cache it is a field read.
    - LogicalRelation (a file scan leaf — appears here when the frame
      MIXES a file side with local/cached leaves, the round-4 gap) → the
      same split-packing estimate as the fast path; when the files can't
      be stat'd (remote URIs) fall back to the relation's catalog
      ``sizeInBytes`` treated as one blob — a lower bound on splits,
      which can only over-widen a genuinely big remote input, never
      under-parallelize a small one (the measured 30 s pathology).

    ``None`` only for leaves this can't reason about (DSv2/external
    relations — treated as already-wide and passed through: those have
    scan-side parallelism knobs of their own, and a blind full-data
    shuffle is the costlier mistake at scale).

    The walk runs on a FRESH query execution (``df.select("*")``): a
    Dataset memoizes its QueryExecution at first access, so a frame
    planned before ``persist()`` would otherwise still show the
    pre-cache plan and miss the InMemoryRelation substitution.
    """
    spark = df.sparkSession
    try:
        jdf = df.select("*")._jdf  # fresh QE → cache substitution applied
        leaves = jdf.queryExecution().optimizedPlan().collectLeaves()
        counts: list[int] = []
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            name = leaf.getClass().getSimpleName()
            if name in ("LocalRelation", "OneRowRelation", "Range"):
                counts.append(0)
            elif name == "LogicalRDD":
                counts.append(max(0, int(leaf.outputPartitioning().numPartitions())))
            elif name == "InMemoryRelation":
                rdd = leaf.cacheBuilder().cachedColumnBuffers()
                counts.append(int(rdd.getNumPartitions()))
            elif name == "LogicalRelation":
                files = list(leaf.relation().location().inputFiles())
                est = _estimated_scan_partitions(spark, files)
                if est is None:
                    size = int(leaf.relation().sizeInBytes())
                    est = _estimated_scan_partitions_from_sizes(spark, [size])
                counts.append(est)
            else:
                return None
        return max(counts) if counts else None
    except Exception:
        return None


def widen_small_input(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition an UNDER-partitioned input up to the session
    shuffle parallelism; wide inputs pass through untouched.

    A small parquet file scans as one split, and everything narrow downstream
    (regex tokenizers, shingle transforms, Arrow-batched pandas UDFs) then
    runs on ONE core — worse, projections feeding an ArrowEvalPython node are
    interpreted, not whole-stage-codegen'd, multiplying the single-thread
    cost. Measured on the sf0.1 documents table (5k docs, one split): the
    MinHash signature stage 30.4 s → 0.8 s after widening. At real scale the
    input already has ≥ parallelism splits and this is a no-op — the guard
    means the 100 TB path never pays the extra full-data shuffle.

    The decision is made WITHOUT ``.rdd`` / physical planning of the full
    query: file-backed frames get a split estimate from the file listing
    (Spark's own packing formula), everything else — persisted frames
    (``inputFiles()`` is EMPTY for those), driver-local frames, and mixed
    plans — a per-leaf optimized-plan probe. File COUNT alone is not
    evidence — Spark packs small files into few splits (openCostInBytes
    padding), so ≥ p tiny files can still scan as ONE split; the estimate
    reproduces that packing. Unstat-able file listings (remote URIs) fall
    through to the leaf probe's catalog-size fallback rather than passing
    silently. Unknown stays unwidened: a frame whose leaves this can't
    size (external/DSv2 relations) already has scan-side parallelism
    knobs of its own, and adding a blind full-data shuffle is the
    costlier mistake at scale.
    """
    if df.isStreaming:  # micro-batch sizing is the stream source's job
        return df
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    est = _estimated_scan_partitions(spark, list(files)) if files else None
    if est is None:
        est = _local_leaf_partition_probe(df)
    if est is not None and est < p:
        return df.repartition(p)
    return df


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    num_salts: int = 16,
    out_col: str | None = None,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage salted sum: groupBy(key, salt) partial -> groupBy(key) final.

    Caps any single reducer's input at ~|rows(key)| / num_salts; use for
    power-law keys (hub vertices) where AQE skew handling does not apply
    (it only splits join partitions, not aggregations).

    The salt hashes ``salt_cols`` (default: ``[key, value]``). The reducer
    cap only holds when the hashed columns are high-cardinality WITHIN a hot
    key: summing a constant (count-by-summing-1s) with the default maps
    every row of the key to ONE salt — pass the row's high-cardinality
    discriminator columns (e.g. the other join key, a row id) as
    ``salt_cols`` in that case.
    """
    out_col = out_col or value
    # salt must be DETERMINISTIC per row content: a retried map task must
    # re-salt identically or partial aggregates double/lose rows
    # (the SPARK-23207 class of bug) — hash the row's own columns, never
    # monotonically_increasing_id/rand.
    cols = salt_cols if salt_cols is not None else [key, value]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(num_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.sum(value).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(out_col))
