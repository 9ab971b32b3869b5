"""Dense node-id minting: arbitrary keys -> contiguous 0..n-1 longs.

The reference remaps arbitrary long ids to a compact space with a big-array
hash map (``ScatteredArcsASCIIGraph.java:149`` ``Id2NodeMap``) in appearance
order. A distributed engine has no stable "appearance order", so we mint ids
in **sort order of the key** — deterministic across runs and cluster sizes —
using the two-pass zipWithIndex pattern:

1. distinct keys, range-partitioned and sorted by key;
2. per-partition counts -> prefix-sum offsets (tiny, collected to driver);
3. a second pass assigns ``offset[pid] + local_position`` via mapInPandas.

No global window (which would serialize on one task at scale), no RDDs.
The keys DataFrame is persisted between the two passes so the range
partitioning is computed exactly once.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mint_dense_ids(
    df: DataFrame, key_cols: Sequence[str], id_col: str = "id"
) -> DataFrame:
    """Return ``(id_col, *key_cols)`` with ``id_col`` dense 0..n-1, ordered by key.

    Deterministic: ids follow the lexicographic order of ``key_cols``.
    """
    keys = (
        df.select(*key_cols)
        .distinct()
        .repartitionByRange(*[F.col(c) for c in key_cols])
        .sortWithinPartitions(*key_cols)
        .persist()
    )
    counts = {
        row["pid"]: row["cnt"]
        for row in keys.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField(id_col, LongType(), False)]
        + [keys.schema[c] for c in key_cols]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, 0)
        for pdf in batches:
            n = len(pdf)
            out = pdf.copy()
            out.insert(0, id_col, range(pos, pos + n))
            pos += n
            yield out

    result = keys.mapInPandas(assign, schema=out_schema)
    return result


def remap_edges(
    raw_edges: DataFrame,
    node_map: DataFrame,
    src_key: Sequence[str],
    dst_key: Sequence[str],
    id_col: str = "id",
) -> DataFrame:
    """Join raw (keyed) arcs against a node map twice -> ``edges(src, dst)``.

    Arcs whose endpoints are absent from the map are dropped (inner joins),
    mirroring the reference's behavior of only materializing mapped nodes.
    Duplicate arcs are eliminated (``Transform.java:1575-1592`` semantics).
    """
    key_cols = [c for c in node_map.columns if c != id_col]
    src_map = node_map.select(
        F.col(id_col).alias("src"), *[F.col(c).alias(f"__s_{c}") for c in key_cols]
    )
    dst_map = node_map.select(
        F.col(id_col).alias("dst"), *[F.col(c).alias(f"__d_{c}") for c in key_cols]
    )
    cond_s = [raw_edges[a] == src_map[f"__s_{b}"] for a, b in zip(src_key, key_cols)]
    cond_d = [raw_edges[a] == dst_map[f"__d_{b}"] for a, b in zip(dst_key, key_cols)]
    return (
        raw_edges.join(src_map, cond_s, "inner")
        .join(dst_map, cond_d, "inner")
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
