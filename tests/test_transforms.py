"""Graph transforms vs DuckDB differential oracles (SURVEY §2.2-2.3; M2).

Mirrors the reference's equality-oracle discipline: every transform result is
compared as an arc set (``ImmutableGraph.equals`` semantics,
``ImmutableGraph.java:731-749``) against an independent SQL implementation.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from webgraph_spark.graph import LinkGraph
from webgraph_spark.operators import labels as L
from webgraph_spark.operators import transform as T

ARCS = [
    (0, 1), (1, 2), (2, 0), (2, 3), (3, 3), (4, 0), (4, 2), (5, 4), (0, 2),
]


@pytest.fixture(scope="module")
def g(spark):
    return LinkGraph.from_arcs(spark, ARCS)


def arcset(df):
    return {(r["src"], r["dst"]) for r in df.select("src", "dst").collect()}


def duck(sql: str) -> set:
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", ARCS)
    return set(map(tuple, con.execute(sql).fetchall()))


def test_transpose(g):
    assert arcset(T.transpose(g.edges)) == duck("SELECT dst, src FROM e")


def test_symmetrize(g):
    assert arcset(T.symmetrize(g.edges)) == duck(
        "SELECT src, dst FROM e UNION SELECT dst, src FROM e"
    )


def test_simplify(g):
    assert arcset(T.simplify(g.edges)) == duck(
        "SELECT src, dst FROM (SELECT src, dst FROM e UNION SELECT dst, src FROM e) "
        "WHERE src <> dst"
    )


def test_filter_arcs_and_noloops(g):
    assert arcset(T.filter_arcs(g.edges, F.col("src") < 2)) == duck(
        "SELECT src, dst FROM e WHERE src < 2"
    )
    assert arcset(T.no_loops(g.edges)) == duck(
        "SELECT src, dst FROM e WHERE src <> dst"
    )


def test_map_nodes_quotient_and_delete(spark, g):
    # quotient: id -> id % 2 ; delete node 4 (new_id = -1)
    mapping = spark.createDataFrame(
        [(i, -1 if i == 4 else i % 2) for i in range(6)], "id long, new_id long"
    )
    got = arcset(T.map_nodes(g.edges, mapping))
    expect = duck(
        "SELECT DISTINCT src % 2, dst % 2 FROM e WHERE src <> 4 AND dst <> 4"
    )
    assert got == expect


def test_union_compose(spark, g):
    other = LinkGraph.from_arcs(spark, [(0, 5), (1, 2), (5, 5)])
    assert arcset(T.union_graphs(g.edges, other.edges)) == duck(
        "SELECT src, dst FROM e UNION VALUES (0, 5), (1, 2), (5, 5)"
    )
    assert arcset(T.compose(g.edges, g.edges)) == duck(
        "SELECT DISTINCT a.src, b.dst FROM e a JOIN e b ON a.dst = b.src"
    )


def test_line_graph(g):
    got = {
        tuple(r)
        for r in T.line_graph(g.edges)
        .select("a_src", "a_dst", "b_src", "b_dst")
        .collect()
    }
    expect = duck(
        "SELECT a.src, a.dst, b.src, b.dst FROM e a JOIN e b ON a.dst = b.src"
    )
    assert got == expect


def test_subgraph_and_degree_range(spark, g):
    keep = spark.createDataFrame([(0,), (1,), (2,), (3,)], "id long")
    assert arcset(T.subgraph(g.edges, keep)) == duck(
        "SELECT src, dst FROM e WHERE src <= 3 AND dst <= 3"
    )
    got = arcset(T.degree_range_subgraph(g.edges, 1, 3))
    expect = duck(
        """
        WITH nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        deg AS (SELECT n.id, count(e.src) AS d FROM nodes n
                LEFT JOIN e ON e.src = n.id GROUP BY n.id),
        keep AS (SELECT id FROM deg WHERE d >= 1 AND d < 3)
        SELECT src, dst FROM e
        WHERE src IN (SELECT id FROM keep) AND dst IN (SELECT id FROM keep)
        """
    )
    assert got == expect


def test_remove_dangling(g):
    assert arcset(T.remove_dangling(g.edges)) == duck(
        "SELECT src, dst FROM e WHERE dst IN (SELECT src FROM e)"
    )


def test_node_class_filter(spark, g):
    cls = spark.createDataFrame([(i, i % 2) for i in range(6)], "id long, cls long")
    assert arcset(T.node_class_filter(g.edges, cls, True)) == duck(
        "SELECT src, dst FROM e WHERE src % 2 = dst % 2"
    )
    assert arcset(T.node_class_filter(g.edges, cls, False)) == duck(
        "SELECT src, dst FROM e WHERE src % 2 <> dst % 2"
    )


def test_graph_checks_and_stats(spark, g):
    assert not g.is_symmetric()
    assert g.symmetrize().is_symmetric()
    assert g.equals(LinkGraph.from_arcs(spark, ARCS))
    assert not g.equals(g.transpose())
    st = g.stats()
    assert st["nodes"] == 6 and st["arcs"] == 9 and st["loops"] == 1
    assert st["maxoutdegree"] == 2 and st["dangling"] == 0  # every node has out-arc?
    # node 1 -> 2 only; node 3 self-loop; all 6 srcs? srcs = {0,1,2,3,4,5}: no dangling
    degs = {r["id"]: r["deg"] for r in g.out_degrees().collect()}
    assert degs == {0: 2, 1: 1, 2: 2, 3: 1, 4: 2, 5: 1}


def test_labelled_merge_union_semiring(spark):
    le = spark.createDataFrame(
        [(0, 1, 5), (0, 1, 3), (1, 2, 7)], "src long, dst long, label long"
    )
    merged = {
        (r["src"], r["dst"], r["label"])
        for r in L.merge_duplicate_arcs(le, "min").collect()
    }
    assert merged == {(0, 1, 3), (1, 2, 7)}
    other = spark.createDataFrame([(0, 1, 4), (2, 0, 1)], "src long, dst long, label long")
    u = {
        (r["src"], r["dst"], r["label"])
        for r in L.union_labelled(L.merge_duplicate_arcs(le, "min"), other, "min").collect()
    }
    assert u == {(0, 1, 3), (1, 2, 7), (2, 0, 1)}
    # (min, +) compose: path 0->1->2 costs 3 + 7
    comp = L.compose_semiring(
        L.merge_duplicate_arcs(le, "min"), L.merge_duplicate_arcs(le, "min")
    )
    got = {(r["src"], r["dst"], r["label"]) for r in comp.collect()}
    assert got == {(0, 2, 10)}
    assert {
        (r["src"], r["dst"]) for r in L.lower_bound_filter(le, 5).collect()
    } == {(0, 1), (1, 2)}
    assert {
        (r["src"], r["dst"]) for r in L.label_isin_filter(le, [7]).collect()
    } == {(1, 2)}


def test_linkgraph_facade(spark, tmp_path):
    from webgraph_spark import LinkGraph

    g = LinkGraph.from_arcs(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    assert g.triangle_count() == 1
    pr = g.pagerank(tol=0.0, max_iter=3)
    assert abs(sum(r["rank"] for r in pr.ranks.collect()) - 1.0) < 1e-9
    cc = g.connected_components()
    assert {r["comp"] for r in cc.components.collect()} == {0}
    scc = g.strongly_connected_components()
    comps = {r["id"]: r["comp"] for r in scc.components.collect()}
    assert comps[0] == comps[1] == comps[2] == 0 and comps[3] == 3
    meta = g.save(str(tmp_path / "g"))
    back = LinkGraph.load(spark, str(tmp_path / "g"))
    assert back.num_nodes() == meta["nodes"] and g.equals(back)
