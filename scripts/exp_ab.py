"""Same-session A/B of candidate optimizations for CC/LPA/BFS/triangles.

Box timing noise is huge across sessions (5-20s swings); this script runs
old/new variants alternating in ONE session and prints medians.
Throwaway experiment harness — not part of the engine.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from bench import build_edges
from webgraph_spark.operators.transform import symmetrize, transpose
from webgraph_spark.plans.iterate import checkpoint_state
from webgraph_spark.plans.partitioning import partition_for_join
from webgraph_spark.session import get_spark

spark = get_spark(
    app_name="exp-ab",
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.enabled": "false"},
)
spark.sparkContext.setLogLevel("ERROR")

edges = build_edges(spark, "/root/testdata/sf0.1").persist()
edges.count()
nodes = (
    edges.select(F.col("src").alias("id"))
    .unionAll(edges.select(F.col("dst").alias("id")))
    .distinct()
    .persist()
)
nodes.count()


def sym_old():
    s = partition_for_join(symmetrize(edges), "src").persist()
    c = s.count()
    return s, c


def symmetrize_for_join(e: DataFrame, p: int = 32) -> DataFrame:
    sym = e.unionByName(transpose(e))
    return (
        sym.repartition(p, "src")
        .dropDuplicates(["src", "dst"])
        .sortWithinPartitions("src")
    )


def sym_new():
    s = symmetrize_for_join(edges).persist()
    c = s.count()
    return s, c


# ---- CC variants -------------------------------------------------------

def cc_run(sym_fn):
    sym, _ = sym_fn()
    comps = nodes.select("id").withColumn("comp", F.col("id")).withColumn(
        "__ch", F.lit(1)
    ).transform(checkpoint_state)
    for it in range(100):
        nbr_min = (
            sym.join(comps.filter(F.col("__ch") == 1), sym["src"] == comps["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("__nm"))
        )
        obs = Observation()
        comps = (
            comps.select("id", "comp")
            .join(nbr_min, "id", "left")
            .select(
                "id",
                F.least("comp", "__nm").alias("comp"),
                (F.col("__nm") < F.col("comp")).cast("int").alias("__ch"),
            )
            .observe(obs, F.sum("__ch").alias("c"))
            .transform(checkpoint_state)
        )
        if int(obs.get["c"] or 0) == 0:
            break
    sym.unpersist()
    return it + 1


# ---- LPA variants ------------------------------------------------------

def lpa_run(sym_fn, fast_first: bool):
    sym, _ = sym_fn()
    labels = nodes.select("id").withColumn("label", F.col("id")).transform(
        checkpoint_state
    )
    changed_set = labels.select("id")
    all_changed = True
    for it in range(3):
        if fast_first and all_changed:
            votes_src = sym
        else:
            affected = (
                sym.join(
                    changed_set.withColumnRenamed("id", "src"), "src", "leftsemi"
                )
                .select("dst")
                .distinct()
            )
            votes_src = sym.join(affected, "dst", "leftsemi")
        counts = (
            votes_src.join(labels, F.col("src") == labels["id"])
            .groupBy(F.col("dst"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = counts.groupBy(F.col("dst").alias("id")).agg(
            F.max_by(
                "label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))
            ).alias("new_label")
        )
        obs = Observation()
        updated = (
            labels.join(winner, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label"))
                .cast("int")
                .alias("__ch"),
            )
            .observe(obs, F.sum("__ch").alias("c"))
            .transform(checkpoint_state)
        )
        changed = int(obs.get["c"] or 0)
        labels = updated.select("id", "label")
        changed_set = updated.filter(F.col("__ch") == 1).select("id")
        all_changed = False
        if changed == 0:
            break
    sym.unpersist()
    return labels


# ---- BFS variants ------------------------------------------------------

def bfs_old():
    sources = edges.agg(F.min("src").alias("id"))
    visited = sources.select("id").withColumn("dist", F.lit(0)).localCheckpoint(
        eager=True
    )
    frontier = visited
    for depth in range(1, 65):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(depth))
            .transform(checkpoint_state)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).transform(checkpoint_state)
        frontier = nxt
    return visited.count()


def bfs_new():
    sources = edges.agg(F.min("src").alias("id"))
    frontier = sources.select("id").withColumn("dist", F.lit(0)).transform(
        checkpoint_state
    )
    visited = frontier
    for depth in range(1, 65):
        obs = Observation()
        nxt = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(depth))
            .observe(obs, F.count(F.lit(1)).alias("c"))
            .transform(checkpoint_state)
        )
        if int(obs.get["c"] or 0) == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.count()


# ---- triangle variants -------------------------------------------------

def tri_oriented_old():
    from webgraph_spark.algo.triangles import _oriented

    return _oriented(edges)


def tri_oriented_new():
    sym = edges.unionByName(transpose(edges)).filter(F.col("src") != F.col("dst"))
    simple = sym.repartition(32, "src").dropDuplicates(["src", "dst"])
    und = simple.filter(F.col("src") < F.col("dst"))
    deg = simple.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    du = deg.select(F.col("id").alias("src"), F.col("deg").alias("__ds"))
    dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("__dd"))
    ranked = und.join(du, "src").join(dv, "dst")
    fwd = (F.col("__ds") < F.col("__dd")) | (
        (F.col("__ds") == F.col("__dd")) & (F.col("src") < F.col("dst"))
    )
    return ranked.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def tri_count(oriented_fn):
    o = oriented_fn()
    adj = o.groupBy("src").agg(F.array_sort(F.collect_list("dst")).alias("succ"))
    au = adj.select(F.col("src").alias("u"), F.col("succ").alias("su"))
    av = adj.select(F.col("src").alias("v"), F.col("succ").alias("sv"))
    per_edge = (
        o.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(au, "u")
        .join(av, "v")
        .select(F.size(F.array_intersect("su", "sv")).alias("t"))
    )
    row = per_edge.agg(F.sum("t").alias("total")).collect()[0]
    return int(row["total"] or 0)


VARIANTS = {
    "cc_old": lambda: cc_run(sym_old),
    "cc_new": lambda: cc_run(sym_new),
    "lpa_old": lambda: lpa_run(sym_old, False).count(),
    "lpa_new": lambda: lpa_run(sym_new, True).count(),
    "bfs_old": bfs_old,
    "bfs_new": bfs_new,
    "tri_old": lambda: tri_count(tri_oriented_old),
    "tri_new": lambda: tri_count(tri_oriented_new),
}

REPS = 3
results: dict[str, list[float]] = {k: [] for k in VARIANTS}
outs: dict[str, object] = {}
for rep in range(REPS):
    for name, fn in VARIANTS.items():
        t0 = time.monotonic()
        outs[name] = fn()
        results[name].append(round(time.monotonic() - t0, 3))

print(json.dumps({
    "medians": {k: statistics.median(v) for k, v in results.items()},
    "all": results,
    "outputs": {k: str(v) for k, v in outs.items()},
}))
