"""A/B: slot-form precompute vs per-iteration decode in pagerank_block.

Checks bitwise identity of the converged vectors and reports steady-state
iteration medians at multiplier-16 scale (~28.4M edges). Throwaway harness.
"""

from __future__ import annotations

import json
import statistics
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from bench import build_edges
from webgraph_spark.algo.pagerank_block import pagerank_block
from webgraph_spark.plans.csr import build_csr, verify_accounting
from webgraph_spark.session import get_spark

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = 5

spark = get_spark(
    app_name="exp-slots",
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.enabled": "false"},
)
spark.sparkContext.setLogLevel("ERROR")

edges = build_edges(spark, "/root/testdata/sf0.1", MULT).persist()
m = edges.count()
nodes = (
    edges.select(F.col("src").alias("id"))
    .unionAll(edges.select(F.col("dst").alias("id")))
    .distinct()
    .persist()
)
nodes.count()
tgt_block = max(250_000, m // 64)
csr = build_csr(edges, target_edges_per_block=tgt_block)
assert verify_accounting(csr)["ok"]

out = {"m": m, "mult": MULT}
ranks = {}
for mode in (True, False, True):  # warm, old, new(rep2)
    key = f"slots={mode}"
    r = pagerank_block(spark, csr, nodes, tol=0.0, max_iter=ITERS,
                       precompute_slots=mode)
    steady = statistics.median(r.iter_seconds[1:])
    out.setdefault(key, []).append(
        {"steady_iter_s": round(steady, 3),
         "edges_per_s": round(m / steady, 1),
         "iters": [round(x, 3) for x in r.iter_seconds]}
    )
    ranks[key] = r.ranks

a = ranks["slots=True"].withColumnRenamed("rank", "ra")
b = ranks["slots=False"].withColumnRenamed("rank", "rb")
diff = (
    a.join(b, "id")
    .select(F.max(F.abs(F.col("ra") - F.col("rb"))).alias("md"))
    .collect()[0]["md"]
)
out["max_abs_diff"] = diff
print(json.dumps(out))
