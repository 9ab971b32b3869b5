"""Text-format sources, generators, permutations (SURVEY §2.1, §2.5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from webgraph_spark.operators.permutations import (
    degree_permutation,
    gray_code_permutation,
    lexicographic_permutation,
    permute_by_key,
    random_permutation,
)
from webgraph_spark.operators.transform import map_nodes, normalize
from webgraph_spark.sources.generators import (
    bidirectional_cycle,
    complete_binary_intree,
    complete_binary_outtree,
    complete_graph,
    erdos_renyi,
    star,
)
from webgraph_spark.sources.text_formats import (
    read_arc_list,
    read_ascii_graph,
    read_scattered_arcs,
    read_scattered_labelled_arcs,
    write_arc_list,
    write_ascii_graph,
)


def _edge_set(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


# -- text formats ----------------------------------------------------------


def test_arc_list_roundtrip(spark, tmp_path):
    arcs = [(0, 1), (0, 2), (5, 1), (3, 3)]
    edges = normalize(spark.createDataFrame(arcs, "src long, dst long"))
    out = str(tmp_path / "arcs")
    write_arc_list(edges, out)
    back = read_arc_list(spark, out)
    assert _edge_set(back) == set(arcs)


def test_arc_list_shift(spark, tmp_path):
    p = tmp_path / "one_based.tsv"
    p.write_text("1\t2\n2\t3\n")
    back = read_arc_list(spark, str(p), shift=-1)
    assert _edge_set(back) == {(0, 1), (1, 2)}


def test_ascii_graph_roundtrip(spark, tmp_path):
    arcs = [(0, 1), (0, 3), (1, 2), (3, 0)]
    edges = spark.createDataFrame(arcs, "src long, dst long")
    path = str(tmp_path / "g.graph-txt")
    write_ascii_graph(edges, path, num_nodes=5)
    with open(path) as f:
        lines = f.read().splitlines()
    assert lines[0] == "5" and lines[1] == "1 3" and lines[5] == ""
    n, back = read_ascii_graph(spark, path)
    assert n == 5
    assert _edge_set(back) == set(arcs)


def test_scattered_arcs_compacts_arbitrary_ids(spark, tmp_path):
    p = tmp_path / "scattered.tsv"
    # arbitrary order, arbitrary long ids, duplicate arc, loop
    p.write_text("1000000007\t42\n42\t5\n1000000007\t42\n7\t7\n")
    node_map, edges = read_scattered_arcs(spark, str(p))
    keys = sorted(r["key"] for r in node_map.collect())
    assert keys == [5, 7, 42, 1000000007]
    ids = {r["key"]: r["id"] for r in node_map.collect()}
    assert sorted(ids.values()) == [0, 1, 2, 3]  # dense, key-ordered
    es = _edge_set(edges)
    assert es == {
        (ids[1000000007], ids[42]),
        (ids[42], ids[5]),
        (ids[7], ids[7]),
    }
    _, no_loops = read_scattered_arcs(spark, str(p), no_loops=True)
    assert (ids[7], ids[7]) not in _edge_set(no_loops)


def test_scattered_labelled_merge(spark, tmp_path):
    p = tmp_path / "lab.tsv"
    p.write_text("10\t20\t7\n10\t20\t3\n20\t10\t1\n")
    _, labelled = read_scattered_labelled_arcs(spark, str(p), merge_strategy="min")
    rows = {(r["src"], r["dst"]): r["label"] for r in labelled.collect()}
    assert len(rows) == 2 and 3 in rows.values() and 1 in rows.values()


# -- generators ------------------------------------------------------------


def test_complete_graph_and_star(spark):
    k5 = complete_graph(spark, 5)
    assert k5.count() == 20
    s = star(spark, 4)
    assert _edge_set(s) == {(0, 1), (0, 2), (0, 3), (0, 4)}


def test_bidirectional_cycle_and_trees(spark):
    c = bidirectional_cycle(spark, 4)
    assert c.count() == 8
    out_t = complete_binary_outtree(spark, 2)  # 3 internal, 7 nodes total
    assert out_t.count() == 6
    in_t = complete_binary_intree(spark, 2)
    assert _edge_set(in_t) == {(d, s) for s, d in _edge_set(out_t)}


def test_erdos_renyi_deterministic_and_plausible(spark):
    g1 = erdos_renyi(spark, 40, 0.1, seed=7)
    g2 = erdos_renyi(spark, 40, 0.1, seed=7)
    assert _edge_set(g1) == _edge_set(g2)
    m = g1.count()
    assert 80 <= m <= 240  # E[m] = 156, generous band
    assert erdos_renyi(spark, 40, 0.1, seed=8).count() != m or True
    assert g1.filter(F.col("src") == F.col("dst")).count() == 0


# -- permutations ----------------------------------------------------------


def test_random_permutation_is_bijection(spark):
    nodes = spark.range(30).select(F.col("id"))
    perm = random_permutation(nodes, seed=3)
    new_ids = sorted(r["new_id"] for r in perm.collect())
    assert new_ids == list(range(30))


def test_permutation_preserves_structure(spark):
    edges = erdos_renyi(spark, 25, 0.15, seed=5)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    perm = random_permutation(nodes, seed=9)
    mapped = map_nodes(edges, perm)
    assert mapped.count() == edges.count()  # permutation: no collapse
    deg = lambda df: sorted(
        r["c"] for r in df.groupBy("src").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    assert deg(mapped) == deg(edges)  # degree multiset invariant


def test_permute_by_key_orders_by_key(spark):
    attrs = spark.createDataFrame(
        [(0, "repoB"), (1, "repoA"), (2, "repoA"), (3, "repoC")],
        "id long, repo string",
    )
    perm = {r["id"]: r["new_id"] for r in permute_by_key(attrs, ["repo"]).collect()}
    assert perm == {1: 0, 2: 1, 0: 2, 3: 3}


def test_lexicographic_permutation(spark):
    # node 2 has no successors -> rank 0; node 0 -> [1,3]; node 1 -> [2]
    edges = spark.createDataFrame(
        [(0, 1), (0, 3), (1, 2)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,), (3,)], "id long")
    perm = {
        r["id"]: r["new_id"]
        for r in lexicographic_permutation(edges, nodes).collect()
    }
    assert perm[2] == 0 and perm[3] == 1  # empty lists first, tie by id
    assert perm[0] < perm[1]  # "[1,3]" < "[2]" lexicographically


def test_degree_permutation(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,), (3,)], "id long")
    perm = {
        r["id"]: r["new_id"] for r in degree_permutation(edges, nodes).collect()
    }
    assert perm[0] == 0 and perm[1] == 1  # deg 3, deg 1, then deg-0 by id
    assert perm[2] == 2 and perm[3] == 3


def test_scattered_labelled_keep_last_default(spark, tmp_path):
    # keep-last is the fork's default duplicate resolution
    # (ScatteredLabelledArcsASCIIGraph.java:197-294): the LAST line wins,
    # deterministically via the carried line number.
    p = tmp_path / "lab_last.tsv"
    p.write_text("10\t20\t7\n10\t20\t3\n20\t10\t1\n20\t10\t9\n")
    _, labelled = read_scattered_labelled_arcs(spark, str(p))
    rows = {(r["src"], r["dst"]): r["label"] for r in labelled.collect()}
    assert len(rows) == 2
    assert sorted(rows.values()) == [3, 9]  # last occurrence of each arc
    _, first = read_scattered_labelled_arcs(
        spark, str(p), merge_strategy="first"
    )
    rows_f = {(r["src"], r["dst"]): r["label"] for r in first.collect()}
    assert sorted(rows_f.values()) == [1, 7]


def test_bounded_permutation_hub_sort_cell(spark):
    # A 10^6-successor hub must NOT materialize a full-array sort cell:
    # the bounded default caps the key at max_prefix elements (~512 bytes,
    # not ~8 MB) while degree + XOR tie-hash keep the rule total.
    from webgraph_spark.operators.permutations import (
        DEFAULT_MAX_PREFIX,
        _bounded_succ_agg,
    )

    hub = spark.range(1, 1_000_001).select(
        F.lit(0).cast("long").alias("src"), F.col("id").cast("long").alias("dst")
    )
    edges = hub.unionByName(
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    )
    agg = _bounded_succ_agg(edges, DEFAULT_MAX_PREFIX, "xxhash64")
    rows = {r["id"]: r for r in agg.collect()}
    assert rows[0]["__deg"] == 1_000_000
    assert len(rows[0]["__k"]) == DEFAULT_MAX_PREFIX  # bounded cell
    assert rows[0]["__k"] == list(range(1, DEFAULT_MAX_PREFIX + 1))
    assert len(rows[1]["__k"]) == 1

    nodes = edges.select(F.col("src").alias("id")).union(
        edges.select("dst")
    ).distinct()
    perm = lexicographic_permutation(edges, nodes)
    assert perm.count() == nodes.count()  # completes with bounded cells


def test_bounded_equals_exact_when_degrees_small(spark):
    # Whenever every out-degree <= max_prefix the bounded rule degenerates
    # to the exact rule (prefix == full list; deg/hash only break exact
    # array ties, where id decides in both modes).
    from webgraph_spark.sources.generators import erdos_renyi

    edges = erdos_renyi(spark, n=300, p=0.05, seed=7)
    nodes = edges.sparkSession.range(300).select(F.col("id").cast("long"))
    bounded = {
        r["id"]: r["new_id"]
        for r in lexicographic_permutation(edges, nodes).collect()
    }
    exact = {
        r["id"]: r["new_id"]
        for r in lexicographic_permutation(edges, nodes, max_prefix=None).collect()
    }
    assert bounded == exact
    g_bounded = {
        r["id"]: r["new_id"]
        for r in gray_code_permutation(edges, nodes).collect()
    }
    g_exact = {
        r["id"]: r["new_id"]
        for r in gray_code_permutation(edges, nodes, max_prefix=None).collect()
    }
    assert g_bounded == g_exact
