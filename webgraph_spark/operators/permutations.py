"""Node permutations / orderings (``Transform.java:2468-2665``).

The reference computes permutations that improve compression locality:
``randomPermutation``, ``lexicographicalPermutation`` (order nodes by their
adjacency row), ``hostByHostGrayCodePermutation`` (group by host, order
within host), fed to ``Transform.map``. Here a permutation is a map table
``(id, new_id)`` applied with :func:`webgraph_spark.operators.transform.map_nodes`;
ranks are minted with the two-pass dense-id pattern (no single-partition
window, scales to any node count).

**Bounded sort keys (default).** Sorting nodes by their FULL successor
array is a scale-killer on hubs: a 10M-successor node materializes an
~80 MB single sort cell and drags it through two shuffles. The default rule
is therefore bounded: the key is ``(first max_prefix successors, degree,
tie_hash, id)`` where ``tie_hash`` is an order-insensitive XOR of per-
successor hashes. Nodes that differ within the prefix sort exactly as the
exact rule; nodes identical on the prefix (necessarily sharing ≥max_prefix
successors) tie-break by (degree, hash, id) — a documented deviation from
exact adjacency order that changes nothing for compression locality.
The plan is hub-safe end-to-end: one shuffle by src feeds a windowed
row_number, only the ≤max_prefix surviving rows are collected into the
prefix array, and degree/tie-hash are plain aggregates — no full-list cell
exists anywhere. Exact mode (``max_prefix=None``) keeps the full-array key
for small graphs.

``hash_fn="portable"`` swaps the tie-hash to the md5-based 60-bit hash an
independent SQL engine can replay bit-for-bit
(:mod:`webgraph_spark.functions.porthash`); xxhash64 stays the throughput
default.

The corpus analogue of URL ordering — ranking by ``(repo, path)`` — is
:func:`permute_by_key`; it delivers the locality benefit the Gray-code
orderings chase (successors of files in one repo mostly point into the same
repo, so gap-encoded successor ids shrink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webgraph_spark.functions.porthash import PORTABLE, portable_hash60
from webgraph_spark.sources.ids import mint_dense_ids

DEFAULT_MAX_PREFIX = 64


def _rank_to_map(keyed: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, __key...) -> (id, new_id) where new_id is the dense rank of the
    key columns (ties impossible: id is always the final key component)."""
    key_cols = [c for c in keyed.columns if c != id_col]
    ranked = mint_dense_ids(keyed, key_cols, id_col="new_id")
    return (
        keyed.join(ranked, key_cols)
        .select(F.col(id_col).alias("id"), "new_id")
    )


def random_permutation(nodes: DataFrame, seed: int = 42) -> DataFrame:
    """Seeded pseudo-random permutation ``(id, new_id)``
    (``Transform.randomPermutation``, ``Transform.java:2643-2665``)."""
    keyed = nodes.select(
        "id", F.xxhash64(F.lit(seed), F.col("id")).alias("__h"), F.col("id").alias("__t")
    )
    return _rank_to_map(keyed)


def _tie_hash(col, hash_fn: str):
    """Per-successor hash whose XOR is the order-insensitive tie-break."""
    if hash_fn == PORTABLE:
        return portable_hash60(col.cast("string"), "#perm")
    return F.xxhash64(col)


def _bounded_succ_agg(
    edges: DataFrame, max_prefix: int, hash_fn: str
) -> DataFrame:
    """``(id, __k, __deg, __th)`` per source: sorted prefix of the first
    ``max_prefix`` successors, out-degree, and the XOR tie-hash over ALL
    successors. One shuffle (by src); the window's row_number gates the
    collect_list so no cell ever exceeds ``max_prefix`` elements."""
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    w = Window.partitionBy("src").orderBy("dst")
    ranked = (
        edges.select("src", "dst")
        .repartition(p, "src")
        .withColumn("__rn", F.row_number().over(w))
    )
    return ranked.groupBy(F.col("src").alias("id")).agg(
        F.array_sort(
            F.collect_list(F.when(F.col("__rn") <= max_prefix, F.col("dst")))
        ).alias("__k"),
        F.count(F.lit(1)).cast("long").alias("__deg"),
        F.coalesce(
            F.bit_xor(_tie_hash(F.col("dst"), hash_fn)), F.lit(0)
        ).alias("__th"),
    )


def _filled_succ_key(
    edges: DataFrame, nodes: DataFrame, max_prefix: int, hash_fn: str
) -> DataFrame:
    succ = _bounded_succ_agg(edges, max_prefix, hash_fn)
    return nodes.join(succ, "id", "left").select(
        "id",
        F.coalesce("__k", F.array().cast("array<long>")).alias("__k"),
        F.coalesce("__deg", F.lit(0)).alias("__deg"),
        F.coalesce("__th", F.lit(0)).alias("__th"),
    )


def _exact_succ_key(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Exact-mode (``max_prefix=None``) key base: every column of ``nodes``
    plus the FULL sorted successor array ``__succs`` (empty for sources
    without out-arcs — sorts first, matching an all-zero adjacency row).
    Shared by the lex / Gray / host-Gray exact branches."""
    succ = edges.groupBy(F.col("src").alias("id")).agg(
        F.array_sort(F.collect_list("dst")).alias("__succs")
    )
    return nodes.join(succ, "id", "left").withColumn(
        "__succs", F.coalesce("__succs", F.array().cast("array<long>"))
    )


def lexicographic_permutation(
    edges: DataFrame,
    nodes: DataFrame,
    max_prefix: int | None = DEFAULT_MAX_PREFIX,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Order nodes by their successor list, lexicographically
    (``Transform.lexicographicalPermutation``, ``Transform.java:2551-2584``).

    Default is the bounded rule (module docstring): key =
    ``(prefix, degree, tie_hash, id)``. ``max_prefix=None`` sorts by the
    exact successor ARRAY (Spark orders array columns element-wise; the
    empty array sorts first, matching an all-zero adjacency row) — opt-in,
    for graphs without huge hubs.
    """
    if max_prefix is None:
        keyed = _exact_succ_key(edges, nodes).select(
            "id", F.col("__succs").alias("__k"), F.col("id").alias("__t")
        )
        return _rank_to_map(keyed)
    keyed = _filled_succ_key(edges, nodes, max_prefix, hash_fn).withColumn(
        "__t", F.col("id")
    )
    return _rank_to_map(keyed)


_GRAY_BIG = 1 << 62


def gray_code_key(succs_col) -> "F.Column":
    """Sortable array key whose ascending order equals Gray-code order of
    adjacency rows (``Transform.grayCodePermutation``,
    ``Transform.java:2468-2545``).

    An adjacency row is the bit vector b with bit j = arc to node j (node 0
    most significant). Gray rank order = binary order of the prefix-XOR
    transform g (g_j = b_0 ⊕ … ⊕ b_j). For a SORTED successor list
    a_0 < a_1 < …, g is the indicator of intervals [a_0, a_1), [a_2, a_3)…,
    and comparing g's lexicographically reduces to comparing the transformed
    list ``t_i = (i even ? -a_i : +a_i)`` with a parity sentinel appended
    (+BIG when the list length is odd — trailing run of 1-bits dominates any
    finite continuation; −BIG when even). Pure column expressions, 8
    bytes/successor, no bitmap materialization.
    """
    body = F.transform(
        succs_col, lambda a, i: F.when(i % 2 == 0, -a).otherwise(a)
    )
    sentinel = F.when(
        F.size(succs_col) % 2 == 1, F.lit(_GRAY_BIG)
    ).otherwise(F.lit(-_GRAY_BIG))
    return F.concat(body, F.array(sentinel))


def _gray_bounded_key(prefix_col, deg_col, max_prefix: int) -> "F.Column":
    """Gray transform of a bounded prefix. When the prefix IS the full list
    (degree ≤ max_prefix) this equals the exact Gray key, sentinel included;
    longer lists omit the sentinel and fall through to the
    (degree, tie_hash, id) tie-break."""
    body = F.transform(
        prefix_col, lambda a, i: F.when(i % 2 == 0, -a).otherwise(a)
    )
    sentinel = F.when(
        deg_col % 2 == 1, F.lit(_GRAY_BIG)
    ).otherwise(F.lit(-_GRAY_BIG))
    return F.when(
        deg_col <= max_prefix, F.concat(body, F.array(sentinel))
    ).otherwise(body)


def gray_code_permutation(
    edges: DataFrame,
    nodes: DataFrame,
    max_prefix: int | None = DEFAULT_MAX_PREFIX,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Order nodes by Gray-code rank of their adjacency row
    (``Transform.grayCodePermutation``, ``Transform.java:2468-2545``);
    ties broken by id. Same two-pass dense-rank machinery as the other
    permutations — no driver-side sort, no bit matrices. Default is the
    bounded rule over the Gray-transformed prefix (module docstring);
    ``max_prefix=None`` opts into the exact full-array key."""
    if max_prefix is None:
        keyed = _exact_succ_key(edges, nodes).select(
            "id",
            gray_code_key(F.col("__succs")).alias("__k"),
            F.col("id").alias("__t"),
        )
        return _rank_to_map(keyed)
    filled = _filled_succ_key(edges, nodes, max_prefix, hash_fn)
    keyed = filled.select(
        "id",
        _gray_bounded_key(F.col("__k"), F.col("__deg"), max_prefix).alias("__k"),
        "__deg",
        "__th",
        F.col("id").alias("__t"),
    )
    return _rank_to_map(keyed)


def host_gray_permutation(
    edges: DataFrame,
    node_attrs: DataFrame,
    host_cols: list[str],
    max_prefix: int | None = DEFAULT_MAX_PREFIX,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Group nodes by host key, Gray-code order within each host
    (``Transform.hostByHostGrayCodePermutation``, ``Transform.java:2587-2641``;
    for a code corpus the 'host' is the repo). ``node_attrs`` is
    ``(id, *host_cols)``. Same bounded default as
    :func:`gray_code_permutation`."""
    if max_prefix is None:
        keyed = _exact_succ_key(edges, node_attrs).select(
            "id",
            *host_cols,
            gray_code_key(F.col("__succs")).alias("__k"),
            F.col("id").alias("__t"),
        )
        return _rank_to_map(keyed)
    filled = _filled_succ_key(edges, node_attrs.select("id"), max_prefix, hash_fn)
    keyed = (
        node_attrs.join(filled, "id")
        .select(
            "id",
            *host_cols,
            _gray_bounded_key(
                F.col("__k"), F.col("__deg"), max_prefix
            ).alias("__k"),
            "__deg",
            "__th",
            F.col("id").alias("__t"),
        )
    )
    return _rank_to_map(keyed)


def permute_by_key(node_attrs: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rank nodes by attribute key (host-by-host analogue,
    ``Transform.hostByHostGrayCodePermutation`` + ``BuildHostMap.java:57``;
    for a code corpus the 'host' is the repo). ``node_attrs`` is
    ``(id, *key_cols)``; ties broken by id."""
    keyed = node_attrs.select("id", *key_cols, F.col("id").alias("__t"))
    return _rank_to_map(keyed)


def degree_permutation(edges: DataFrame, nodes: DataFrame, descending: bool = True) -> DataFrame:
    """Order nodes by (out-degree, id) — the frequency ordering used in
    compression studies (no direct reference method; composes with
    ``Transform.map`` exactly like the Gray/lex orderings)."""
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("__d")
    )
    filled = nodes.join(deg, "id", "left").na.fill({"__d": 0})
    sort_key = (-F.col("__d")) if descending else F.col("__d")
    keyed = filled.select(
        "id", sort_key.alias("__k"), F.col("id").alias("__t")
    )
    return _rank_to_map(keyed)
