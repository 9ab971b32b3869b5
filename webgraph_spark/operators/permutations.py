"""Node permutations / orderings (``Transform.java:2468-2665``).

The reference computes permutations that improve compression locality:
``randomPermutation``, ``lexicographicalPermutation`` (order nodes by their
adjacency row), ``hostByHostGrayCodePermutation`` (group by host, order
within host), fed to ``Transform.map``. Here a permutation is a map table
``(id, new_id)`` applied with :func:`webgraph_spark.operators.transform.map_nodes`;
ranks are minted with the two-pass dense-id pattern (no single-partition
window, scales to any node count).

The corpus analogue of URL ordering — ranking by ``(repo, path)`` — is
:func:`permute_by_key`; it delivers the locality benefit the Gray-code
orderings chase (successors of files in one repo mostly point into the same
repo, so gap-encoded successor ids shrink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webgraph_spark.sources.ids import mint_dense_ids


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


def lexicographic_permutation(
    edges: DataFrame, nodes: DataFrame, max_prefix: int | None = None
) -> DataFrame:
    """Order nodes by their successor list, lexicographically
    (``Transform.lexicographicalPermutation``, ``Transform.java:2551-2584``).

    The sort key is the sorted successor ARRAY (Spark orders array columns
    element-wise lexicographically; the empty array sorts first, matching an
    all-zero adjacency row); ties broken by id. No per-node string key is
    materialized — the array is 8 bytes/successor and feeds range
    partitioning + in-partition sort directly.

    ``max_prefix`` bounds the key for hub nodes at scale: the key becomes
    ``(first max_prefix successors, degree)`` — nodes identical on the
    bounded prefix tie-break by (degree, id) instead of the full list, a
    documented deviation from exact lexicographic order (default None =
    exact).
    """
    succ = edges.groupBy(F.col("src").alias("id")).agg(
        F.array_sort(F.collect_list("dst")).alias("__succs")
    )
    joined = nodes.join(succ, "id", "left").select(
        "id",
        F.coalesce("__succs", F.array().cast("array<long>")).alias("__succs"),
    )
    if max_prefix is not None:
        keyed = joined.select(
            "id",
            F.slice("__succs", 1, max_prefix).alias("__k"),
            F.size("__succs").cast("long").alias("__deg"),
            F.col("id").alias("__t"),
        )
    else:
        keyed = joined.select(
            "id", F.col("__succs").alias("__k"), F.col("id").alias("__t")
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


def gray_code_permutation(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Order nodes by Gray-code rank of their adjacency row
    (``Transform.grayCodePermutation``, ``Transform.java:2468-2545``);
    ties broken by id. Same two-pass dense-rank machinery as the other
    permutations — no driver-side sort, no bit matrices."""
    succ = edges.groupBy(F.col("src").alias("id")).agg(
        F.array_sort(F.collect_list("dst")).alias("__succs")
    )
    keyed = (
        nodes.join(succ, "id", "left")
        .select(
            "id",
            gray_code_key(
                F.coalesce("__succs", F.array().cast("array<long>"))
            ).alias("__k"),
            F.col("id").alias("__t"),
        )
    )
    return _rank_to_map(keyed)


def host_gray_permutation(
    edges: DataFrame, node_attrs: DataFrame, host_cols: list[str]
) -> DataFrame:
    """Group nodes by host key, Gray-code order within each host
    (``Transform.hostByHostGrayCodePermutation``, ``Transform.java:2587-2641``;
    for a code corpus the 'host' is the repo). ``node_attrs`` is
    ``(id, *host_cols)``."""
    succ = edges.groupBy(F.col("src").alias("id")).agg(
        F.array_sort(F.collect_list("dst")).alias("__succs")
    )
    keyed = (
        node_attrs.join(succ, "id", "left")
        .select(
            "id",
            *host_cols,
            gray_code_key(
                F.coalesce("__succs", F.array().cast("array<long>"))
            ).alias("__k"),
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
