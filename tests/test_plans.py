"""Physical-plan assertions — the engine's scale claims, checked in CI.

docs/SCALE.md's invariants ("the graph never moves twice", "partial
aggregation everywhere", "stay JVM-side", "push down and prune") are plan
properties, not wall-clock properties; these tests pin them to the actual
plans Catalyst produces so a regression shows up as a test failure instead
of a silent 100x at scale. Classic (non-Connect) mode only: the JVM
``queryExecution`` handle is how we read the chosen physical operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import edge_df
from tests.oracles import er_arcs


def _plan(df) -> str:
    """Initial physical plan (pre-execution; AQE re-planning only removes
    exchanges at runtime, so asserting on the initial plan is the stricter
    check)."""
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_pushdown_and_column_pruning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = _plan(q)
    # predicate reaches the parquet scan (loose match: the invariant is the
    # pushed EqualTo, not the PushedFilters list's ordering/printout format)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "EqualTo(lang,en)" in pushed[0]
    # the big payload column is pruned from the scan schema
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read_schema
    assert "doc_id" in read_schema and "n_chars" in read_schema


def test_partition_for_join_cached_graph_side_never_reexchanged(spark):
    from webgraph_spark.plans.partitioning import partition_for_join

    edges = edge_df(spark, er_arcs(60, 0.1, 3))
    g = partition_for_join(edges, "src").persist()
    g.count()
    try:
        state = spark.createDataFrame(
            [(i, float(i)) for i in range(60)], "id long, rank double"
        )
        j = g.join(
            state.hint("shuffle_hash"), g["src"] == state["id"]
        )
        plan = _plan(j)
        # exactly ONE exchange EXECUTES for this join — the O(state) side
        # (tagged ENSURE_REQUIREMENTS; the cached side's printout embeds
        # its one-time REPARTITION_BY_NUM build plan, which is not re-run).
        # The persisted graph side streams from cache with its hash layout
        # already satisfying the join requirement — the per-iteration
        # O(state)-bytes claim.
        # loose match: the invariant is "one planner-inserted exchange,
        # keyed on the state id", not the reason-tag printout format
        ensure = [
            ln for ln in plan.splitlines()
            if "Exchange" in ln and "ENSURE_REQUIREMENTS" in ln
        ]
        assert len(ensure) == 1 and "hashpartitioning(id" in ensure[0], plan
        # no exchange between the join and the cached graph-side scan
        graph_side = plan.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in graph_side
        assert "Exchange" not in graph_side
        # the hint held: shuffled hash join, not a broadcast of either side
        assert "ShuffledHashJoin" in plan
        assert "BroadcastHashJoin" not in plan
    finally:
        g.unpersist()


def test_corpus_edge_derivation_is_pure_jvm(spark):
    from webgraph_spark.sources.corpus import corpus_edges, synth_corpus

    corpus = synth_corpus(spark, n_repos=3, files_per_repo=20)
    edges = corpus_edges(corpus)
    plan = _plan(edges)
    # the north rule allows vectorized pandas/Arrow UDFs and forbids
    # per-row Python: no row-wise BatchEvalPython anywhere; the only
    # Python stages are the id-mint's documented two mapInPandas passes
    # (sources/ids.py — Arrow-batched dense-id assignment), one per join
    # key side
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert plan.count("MapInPandas") <= 2


def test_text_features_stay_in_codegen(spark, sf_dir):
    from webgraph_spark.functions.text import fingerprint, langid, with_text_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = fingerprint(langid(with_text_stats(docs)))
    plan = _plan(out)
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # whole-stage codegen span present (starred operators; loose match —
    # the codegen id is numbering, not the invariant)
    import re

    assert re.search(r"\*\(\d+\)", plan)


def test_hot_loop_aggregates_are_map_side_combined(spark):
    # the LPA/CC gather shape: groupBy over join output with an algebraic
    # aggregate must plan as partial + final HashAggregate
    edges = edge_df(spark, er_arcs(40, 0.15, 5))
    votes = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("c"))
    plan = _plan(votes)
    assert "partial_count" in plan
    assert plan.count("HashAggregate") >= 2


def test_broadcast_hint_produces_broadcast_join(spark):
    edges = edge_df(spark, er_arcs(50, 0.1, 7))
    dim = spark.createDataFrame([(i, i % 3) for i in range(50)], "src long, cls int")
    j = edges.join(F.broadcast(dim), "src")
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
