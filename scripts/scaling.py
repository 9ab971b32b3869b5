"""Scaling-efficiency experiment (BASELINE.json north_rule, sandbox proxy).

The rule requires throughput scaling efficiency >= 0.8 going N -> 4N
executors. No cluster exists in this sandbox, so per the driver instruction
we run the SAME PageRank job on the SAME input at two parallelism levels
(local[N] and local[4N]) in separate JVMs and report

    efficiency = (throughput_4N / throughput_N) / 4
               = (iter_sec_N / iter_sec_4N) / 4

``--pin`` (recommended) confines each level's process tree to exactly its
core count. Without it, local[N] only limits concurrent TASK slots; the
JVM's shuffle/Arrow/GC threads and the python worker daemons still schedule
across every core of the box, so the small level silently uses more hardware
than N cores and the measured ratio under-states the engine's true scaling
(measured here: unpinned local[2] ran only 1.9x slower than local[8];
pinned, 3.3x). Pinned local[N] is the faithful single-box analogue of an
N-core executor allocation. Pinning happens LATE — after input build, CSR
layout, slot precompute and two warm-up iterations — because setup speed is
not the measured quantity; only the steady-state iterations run confined.
Pick N so that 4N stays inside the VM's linear region (scripts/hw_probe.py
— this box's CPU quota saturates around 10-13 hardware threads, so
n=2 -> 8 is the honest window; 8 -> 32 measures the VM's quota, not the
engine).

Measurement protocol (single SHARED box — the host visibly steals CPU in
bursts, so delivered compute drifts over tens of minutes):

- reps are INTERLEAVED (lo, hi, lo, hi, ...) so slow host drift hits both
  levels rather than whichever level happened to run later;
- each run reports the MEDIAN steady-state iteration (iterations 4..k,
  skipping python-worker spin-up and JIT warm-up) plus the /proc/stat
  steal fraction on its own cores over the measured window;
- the headline level value is the MIN over reps (standard de-noising for
  shared machines: external interference only ever adds time); per-pair
  efficiencies are also reported so drift is visible.

Caveat recorded in docs/SCALING.md: a single box shares one memory system,
so 4x task slots does not provide 4x DRAM bandwidth the way 4x real
executors would; the per-iteration critical path also carries a fixed
driver/scheduling floor (measured pinned: ~0.8 s at local[2], ~0.55 s at
local[8] on a trivial input) that a real cluster amortizes identically at
every size (it does not grow with N).

Usage: python scripts/scaling.py [--n 2] [--multiplier 64] [--pr-iters 10]
                                 [--reps 3] [--pin]
Writes BENCH_SCALING.json at the repo root and prints the result.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import os, sys, statistics, json, subprocess
sys.path.insert(0, {root!r})
from webgraph_spark.session import get_spark
from bench import build_edges
from webgraph_spark.plans.csr import build_csr
from webgraph_spark.algo.pagerank_block import pagerank_block as pagerank
import pyspark.sql.functions as F
spark = get_spark(master="local[{cpus}]", shuffle_partitions={cpus},
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.driver.memory": "32g"}})
spark.sparkContext.setLogLevel("ERROR")
edges = build_edges(spark, {sf_dir!r}, {multiplier}).persist()
m = edges.count()
nodes = (edges.select(F.col("src").alias("id"))
         .union(edges.select("dst")).distinct().persist())
nodes.count()
# fixed layout across both parallelism levels (same physical job)
csr = build_csr(edges, target_edges_per_block=max(250_000, m // {blocks}))

pin = {pin}
if pin:
    # two unconfined warm-up iterations: materializes the slot-form cache,
    # spins up the python worker daemons and JITs the hot paths, so the
    # confined measurement below starts in steady state
    pagerank(spark, csr, nodes, tol=0.0, max_iter=2)
    # LATE pinning: confine every thread of every process in this tree
    # (driver python, JVM, python worker daemons+workers) to exactly the
    # level's cores. Children forked later (new python workers) inherit
    # the mask from their daemon. Setup ran unconfined on purpose — the
    # measured quantity is the steady-state iteration, not the build.
    def tree(pid):
        pids = [pid]
        task_dir = f"/proc/{{pid}}/task"
        try:
            for t in os.listdir(task_dir):
                with open(f"{{task_dir}}/{{t}}/children") as fh:
                    for c in fh.read().split():
                        pids += tree(int(c))
        except OSError:
            pass
        return pids
    for p in tree(os.getpid()):
        subprocess.run(["taskset", "-apc", "0-{last}", str(p)],
                       capture_output=True)

def cpu_ticks(cores):
    tot = st = 0
    for ln in open("/proc/stat"):
        f = ln.split()
        if f and f[0].startswith("cpu") and f[0][3:].isdigit():
            if int(f[0][3:]) in cores:
                nums = [int(x) for x in f[1:]]
                tot += sum(nums)
                st += nums[7]
    return tot, st

cores = set(range({cpus} if pin else 32))
t0, s0 = cpu_ticks(cores)
res = pagerank(spark, csr, nodes, tol=0.0, max_iter={iters})
t1, s1 = cpu_ticks(cores)
med = statistics.median(res.iter_seconds[3:])
steal = round((s1 - s0) / max(1, t1 - t0), 4)
print("JSON" + json.dumps({{"m": m, "median": med, "steal": steal,
                            "iters": res.iter_seconds}}))
"""


def run_once(cpus: int, multiplier: int, iters: int, sf_dir: str,
             pin: bool = False, blocks: int = 64) -> dict:
    code = _RUNNER.format(
        root=ROOT, cpus=cpus, sf_dir=sf_dir, multiplier=multiplier,
        iters=iters, blocks=blocks, pin=pin, last=cpus - 1,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=ROOT, check=True,
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("JSON")][-1]
    return json.loads(line[4:])


# Fixpoint-suite variant (CC / LPA / BFS): same pinned, interleaved,
# late-confinement protocol as the PageRank runner, applied to the
# shuffle-hash-pinned fixpoint loops. Differences, deliberate:
# - the measured quantity is the WHOLE fixpoint at a fixed round cap (both
#   levels execute the identical deterministic round sequence — CC round
#   costs shrink as the changed-set drains, so a per-round median would
#   compare different work at different k);
# - warm-up = a 2-round run of the same job before pinning (python worker
#   daemons + JIT + the persisted symmetrized edge layout come up
#   unconfined, matching the PageRank runner's late-pin rationale);
# - shuffle_partitions is FIXED at the 4N level's count for BOTH levels —
#   the exact analogue of the PageRank runner's shared CSR block layout.
#   An earlier draft used partitions = cpus per level, which made the two
#   levels run DIFFERENT physical plans: the 2-core level pushed the same
#   shuffle bytes through 2 giant partitions (4x the per-partition hash
#   state, extra spill) while the 8-core level used 8, and the spill
#   asymmetry produced a non-credible superlinear LPA "efficiency" of
#   1.018. With one layout the only variable between levels is task
#   concurrency, which is the quantity the north rule gates.
_FIXPOINT_RUNNER = r"""
import os, sys, time, json, subprocess
sys.path.insert(0, {root!r})
from webgraph_spark.session import get_spark
from bench import build_edges
import pyspark.sql.functions as F
spark = get_spark(master="local[{cpus}]", shuffle_partitions={parts},
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.driver.memory": {mem!r}}})
spark.sparkContext.setLogLevel("ERROR")
edges = build_edges(spark, {sf_dir!r}, {multiplier}).persist()
m = edges.count()
nodes = (edges.select(F.col("src").alias("id"))
         .union(edges.select("dst")).distinct().persist())
nodes.count()
job = {job!r}

csr_shared = None
if job in ("cc_block", "lpa_block"):
    # block kernels: ONE symmetrized CSR for warm-up and timed run — the
    # warm-up populates the pair slot-form cache, so the pinned measurement
    # covers the steady-state rounds, not the layout build (the exact
    # rationale of the PageRank runner's late pinning: setup speed is not
    # the measured quantity)
    from webgraph_spark.plans.csr import build_csr
    from webgraph_spark.plans.partitioning import symmetrize_for_join
    csr_shared = build_csr(symmetrize_for_join(edges, "src"))

def run_job(rounds, warm=False):
    if job == "triangles":
        # one-shot job (not a fixpoint): the "rounds" knob is meaningless,
        # report rounds=1 so edges_per_sec_per_iter = m / wall. The warm-up
        # run uses a truncated edge set — a one-shot job carries no
        # persisted layout into the measured run, so warm-up only needs to
        # spin the python daemons and JIT the same code path, not repeat
        # the full count unconfined.
        from webgraph_spark.algo.triangles import triangle_count_adjacency
        triangle_count_adjacency(edges.limit(100_000) if warm else edges)
        return 1
    if job == "triangles_wagg":
        # map-side-combined wedge aggregation count (see triangles.py
        # triangle_count_wedge_agg) — candidate replacement for the
        # array-shipping adjacency variant at scale
        from webgraph_spark.algo.triangles import triangle_count_wedge_agg
        triangle_count_wedge_agg(edges.limit(100_000) if warm else edges)
        return 1
    if job == "triangles_wedge":
        # wedge-join + closing semi-join formulation of the same count —
        # measured side by side with the adjacency variant so the recorded
        # numbers, not sf0.1 intuition, pick the bench/scale default.
        # triangle_count owns the oriented cache's persist lifecycle, so
        # repeated reps in one JVM don't accumulate cached blocks.
        from webgraph_spark.algo.triangles import triangle_count
        triangle_count(edges.limit(100_000) if warm else edges)
        return 1
    if job == "cc":
        from webgraph_spark.algo.components import hash_min_components
        res = hash_min_components(edges, nodes, max_iter=rounds,
                                  star_fallback_after=None)
        res.components.unpersist()
        return res.iterations
    if job == "lpa":
        from webgraph_spark.algo.labelprop import label_propagation
        res = label_propagation(edges, nodes, max_iter=rounds)
        res.labels.unpersist()
        return res.iterations
    if job == "cc_block":
        from webgraph_spark.algo.components_block import hash_min_components_block
        res = hash_min_components_block(spark, csr_shared, nodes, max_iter=rounds)
        res.components.count()
        return res.iterations
    if job == "lpa_block":
        from webgraph_spark.algo.labelprop_block import label_propagation_block
        res = label_propagation_block(spark, csr_shared, nodes, max_iter=rounds)
        res.labels.count()
        return res.iterations
    if job == "hyperball":
        # the designated scale substitute for every pair-state operator
        # (geometric centralities, NF, top-k pruning all ride on it);
        # register state is O(n * 2^log2m) bytes of BINARY columns, so this
        # also puts the binary-column shuffle path through the pinned
        # protocol. Fixed round cap like the other fixpoints: both levels
        # execute the identical deterministic register-update sequence.
        from webgraph_spark.algo.hyperball import hyperball
        res = hyperball(edges, nodes, log2m=6, max_iter=rounds)
        res.state.unpersist()
        return res.iterations
    if job == "hyperball_log2m4":
        # the round-4 SCALING.md par.7e mitigation, measured: log2m=4 quarters
        # the register bytes/node (16 B vs 64 B) at ~2x the RSD -- the
        # reference's own documented memory-vs-accuracy trade
        # (HyperBall.java:94-101). Same deterministic round sequence as the
        # log2m=6 row; only the payload width changes, so the efficiency
        # delta isolates the byte-traffic term of the DRAM-ceiling theory.
        from webgraph_spark.algo.hyperball import hyperball
        res = hyperball(edges, nodes, log2m=4, max_iter=rounds)
        res.state.unpersist()
        return res.iterations
    if job == "bfs":
        from webgraph_spark.algo.bfs import bfs_distances
        # one source per salted copy (the multiplied graph is {multiplier}
        # disjoint copies): every copy is explored, total frontier work is
        # proportional to the full graph
        base_min = 1
        srcs = spark.range({multiplier}).select(
            (F.lit(base_min) * {multiplier} + F.col("id")).alias("id"))
        out = bfs_distances(edges, srcs, max_depth=rounds)
        out.count()
        return rounds
    raise ValueError(job)

run_job(2, warm=True)  # unconfined warm-up: daemons, JIT, persisted layouts

pin = {pin}
if pin:
    def tree(pid):
        pids = [pid]
        task_dir = f"/proc/{{pid}}/task"
        try:
            for t in os.listdir(task_dir):
                with open(f"{{task_dir}}/{{t}}/children") as fh:
                    for c in fh.read().split():
                        pids += tree(int(c))
        except OSError:
            pass
        return pids
    for p in tree(os.getpid()):
        subprocess.run(["taskset", "-apc", "0-{last}", str(p)],
                       capture_output=True)

def cpu_ticks(cores):
    tot = st = 0
    for ln in open("/proc/stat"):
        f = ln.split()
        if f and f[0].startswith("cpu") and f[0][3:].isdigit():
            if int(f[0][3:]) in cores:
                nums = [int(x) for x in f[1:]]
                tot += sum(nums)
                st += nums[7]
    return tot, st

cores = set(range({cpus} if pin else 32))
t0, s0 = cpu_ticks(cores)
w0 = time.monotonic()
rounds = run_job({iters})
wall = time.monotonic() - w0
t1, s1 = cpu_ticks(cores)
steal = round((s1 - s0) / max(1, t1 - t0), 4)
print("JSON" + json.dumps({{"m": m, "wall": round(wall, 3),
                            "rounds": rounds, "steal": steal}}))
"""


def run_fixpoint_once(job: str, cpus: int, multiplier: int, iters: int,
                      sf_dir: str, pin: bool = False,
                      parts: int | None = None, mem: str = "32g") -> dict:
    code = _FIXPOINT_RUNNER.format(
        root=ROOT, cpus=cpus, sf_dir=sf_dir, multiplier=multiplier,
        iters=iters, pin=pin, last=cpus - 1, job=job,
        parts=parts or cpus, mem=mem,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=ROOT,
    )
    if proc.returncode != 0:
        errpath = f"/tmp/fixpoint_{job}_{cpus}.stderr"
        with open(errpath, "w") as fh:
            fh.write(proc.stderr)
        raise RuntimeError(
            f"fixpoint runner {job}@local[{cpus}] failed "
            f"(exit {proc.returncode}); full stderr at {errpath}; tail:\n"
            + "\n".join(proc.stderr.splitlines()[-40:])
        )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("JSON")][-1]
    return json.loads(line[4:])


def run_fixpoint_suite(jobs: list[str], n: int, multiplier: int, iters: int,
                       reps: int, sf_dir: str, pin: bool,
                       parts: int | None = None, mem: str = "32g") -> None:
    """Measure each fixpoint job at pinned N and 4N cores (interleaved
    reps) and merge the results into BENCH_SCALING.json under
    ``fixpoint_suite`` — evidence that the O(state)-shuffle claim of the
    shuffle-hash-pinned loops holds beyond the sf0.1 stage-launch floor.

    ``parts`` fixes ONE shuffle layout used at both levels (default: the
    4N level's core count). Jobs whose per-partition work is uniform
    (dense block kernels) are fine at 1 task/core, but skew-prone one-shot
    jobs (triangles: wedge work varies per partition) need several tasks
    per core at the hi level or stragglers set the whole wall — pass e.g.
    ``--parts 32`` for 4 tasks/core of load balancing at 4N=8."""
    path = os.path.join(ROOT, "BENCH_SCALING.json")
    with open(path) as f:
        doc = json.load(f)
    suite = doc.setdefault("fixpoint_suite", {})
    parts = parts or n * 4  # one shuffle layout for both levels (see runner comment)
    for job in jobs:
        # trend points at non-default sizes get their own key so a larger
        # re-measurement extends the record instead of replacing the m64 row
        key = job if multiplier == 64 else f"{job}_m{multiplier}"
        lo_runs, hi_runs, pair_eff = [], [], []
        for _ in range(reps):
            lo_runs.append(run_fixpoint_once(job, n, multiplier, iters,
                                             sf_dir, pin, parts, mem))
            hi_runs.append(run_fixpoint_once(job, n * 4, multiplier, iters,
                                             sf_dir, pin, parts, mem))
            pair_eff.append(round(
                (lo_runs[-1]["wall"] / hi_runs[-1]["wall"]) / 4.0, 3))
        lo = min(r["wall"] for r in lo_runs)
        hi = min(r["wall"] for r in hi_runs)
        m = lo_runs[0]["m"]
        rounds = lo_runs[0]["rounds"]
        protocol = (
            "whole fixpoint at a fixed round cap, identical deterministic "
            "round sequence AND one fixed shuffle-partition layout (the 4N "
            "level's count) at both levels; late taskset pinning after a "
            "2-round unconfined warm-up; interleaved reps; min over reps "
            "per level"
        )
        if job.startswith("triangles"):
            variant = {
                "triangles_wedge": "wedge-join + closing semi-join",
                "triangles_wagg": "map-side-combined wedge aggregation",
            }.get(job.split("_m")[0], "degree-oriented array_intersect")
            protocol = (
                f"one-shot exact triangle count ({variant} "
                "variant), whole-job wall at one fixed "
                "shuffle-partition layout (the 4N level's count) at both "
                "levels; late taskset pinning after a truncated-input "
                "warm-up (daemons+JIT only — a one-shot job carries no "
                "persisted layout into the measured run); interleaved "
                "reps; min over reps per level"
            )
        if job.endswith("_block"):
            protocol += (
                "; block kernels measure the steady-state rounds over ONE "
                "pre-built symmetrized CSR whose pair slot-form the "
                "unconfined warm-up cached (the PageRank runner's "
                "late-pinning rationale: layout build speed is not the "
                "measured quantity)"
            )
        suite[key] = {
            "protocol": protocol,
            "shuffle_partitions_both_levels": parts,
            "pinned": pin,
            "input_edges": m,
            "rounds": rounds,
            "n_cpus": n,
            "4n_cpus": n * 4,
            "wall_sec_n": round(lo, 3),
            "wall_sec_4n": round(hi, 3),
            "rep_walls_n": [r["wall"] for r in lo_runs],
            "rep_walls_4n": [r["wall"] for r in hi_runs],
            "steal_frac_n": [r["steal"] for r in lo_runs],
            "steal_frac_4n": [r["steal"] for r in hi_runs],
            "per_pair_efficiency": pair_eff,
            "edges_per_sec_per_iter_n": round(m * rounds / lo, 1),
            "edges_per_sec_per_iter_4n": round(m * rounds / hi, 1),
            "sec_per_iter_n": round(lo / max(1, rounds), 3),
            "sec_per_iter_4n": round(hi / max(1, rounds), 3),
            "scaling_efficiency": round((lo / hi) / 4.0, 3),
        }
        if multiplier < 64:
            # sub-m64 inputs measure the per-round stage-launch floor, not
            # the kernel: their efficiency reads as a failure to anyone
            # scanning the JSON. Tag them so tooling filters them out
            # (docs/SCALING.md trend-point note).
            suite[key]["smoke"] = True
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
        print(json.dumps({key: suite[key]}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--multiplier", type=int, default=64)
    ap.add_argument("--pr-iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--pin", action="store_true",
                    help="confine each level's process tree to exactly its "
                    "core count (JVM helper threads included) — the honest "
                    "N vs 4N executor proxy; see module docstring")
    ap.add_argument("--jobs", default="pagerank",
                    help="comma list: pagerank and/or fixpoint jobs "
                    "(cc,cc_block,lpa,lpa_block,bfs). Fixpoint jobs merge into "
                    "BENCH_SCALING.json under fixpoint_suite.")
    ap.add_argument("--fixpoint-iters", type=int, default=8)
    ap.add_argument("--parts", type=int, default=None,
                    help="fixed shuffle-partition count used at BOTH "
                    "levels of the fixpoint suite (default: 4N). Raise to "
                    "a small multiple of 4N for skew-prone one-shot jobs "
                    "(triangles) so hi-level stragglers can load-balance.")
    ap.add_argument("--driver-mem", default="32g",
                    help="JVM heap for each fixpoint-runner subprocess "
                    "(both levels; raise for multiplier >= 256 so the "
                    "persisted ~1GB-per-64x edge cache and shuffle "
                    "buffers don't force avoidable spill).")
    args = ap.parse_args()

    jobs = [j.strip() for j in args.jobs.split(",") if j.strip()]
    fixpoint_jobs = [j for j in jobs if j in (
        "cc", "cc_block", "lpa", "lpa_block", "bfs", "hyperball",
        "hyperball_log2m4",
        "triangles", "triangles_wedge", "triangles_wagg")]
    if fixpoint_jobs:
        run_fixpoint_suite(fixpoint_jobs, args.n, args.multiplier,
                           args.fixpoint_iters, args.reps, args.sf_dir,
                           args.pin, args.parts, args.driver_mem)
    if "pagerank" not in jobs:
        return

    # one fixed CSR layout for BOTH levels (same physical job, only the
    # parallelism differs); ~1.8M edges/block keeps kernel tasks fine-
    # grained enough to load-balance the 4N level (measured: 14M-edge
    # blocks cost ~0.1 efficiency vs 1.8M-edge blocks on the same input)
    blocks = 64 * max(1, args.multiplier // 64)
    lo_runs: list[dict] = []
    hi_runs: list[dict] = []
    pair_eff: list[float] = []
    for _ in range(args.reps):
        # interleaved: host-delivery drift (CPU steal bursts on this shared
        # VM swing single-core throughput several-fold across tens of
        # minutes) hits both levels of a pair, not just whichever level a
        # sequential design ran last
        lo_runs.append(run_once(args.n, args.multiplier, args.pr_iters,
                                args.sf_dir, args.pin, blocks))
        hi_runs.append(run_once(args.n * 4, args.multiplier, args.pr_iters,
                                args.sf_dir, args.pin, blocks))
        pair_eff.append(round(
            (lo_runs[-1]["median"] / hi_runs[-1]["median"]) / 4.0, 3))
    lo = min(r["median"] for r in lo_runs)
    hi = min(r["median"] for r in hi_runs)
    m = lo_runs[0]["m"]
    eff = (lo / hi) / 4.0
    # hardware context: what the box itself can scale (docs/SCALING.md §6),
    # probed under the same affinity confinement as the measurement
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from hw_probe import probe

    hw = probe(levels=(1, args.n, args.n * 4), pin=args.pin)
    result = {
        "job": "pagerank_csr steady-state iteration "
        "(median of iters 4..k; interleaved lo/hi reps; min over reps per "
        "level)"
        + (" — each level taskset-pinned to its core count" if args.pin
           else ""),
        "pinned": args.pin,
        "input_edges": m,
        "n_cpus": args.n,
        "4n_cpus": args.n * 4,
        "iter_sec_n": round(lo, 3),
        "iter_sec_4n": round(hi, 3),
        "rep_medians_n": [round(r["median"], 3) for r in lo_runs],
        "rep_medians_4n": [round(r["median"], 3) for r in hi_runs],
        "steal_frac_n": [r["steal"] for r in lo_runs],
        "steal_frac_4n": [r["steal"] for r in hi_runs],
        "per_pair_efficiency": pair_eff,
        "edges_per_sec_per_iter_n": round(m / lo, 1),
        "edges_per_sec_per_iter_4n": round(m / hi, 1),
        "scaling_efficiency": round(eff, 3),
        "gate": 0.8,
        "pass": eff >= 0.8,
        "see": "docs/SCALING.md for the full core sweep, serial-floor "
        "decomposition, and single-box caveats",
        "hardware_probe": hw,
        "interpretation": (
            "same job, same input, same CSR layout at N and 4N cores; each "
            "level runs in its own JVM pinned (taskset) to exactly that many "
            "hardware threads, so N cores means N cores for every thread the "
            "engine owns — the closest single-box analogue of N vs 4N "
            "executors; reps interleave the levels and record /proc/stat "
            "steal on their own cores because the shared host's delivered "
            "compute drifts in bursts; read the efficiency against "
            "hardware_probe (what the VM itself scales between the two "
            "levels); engine-side evidence for real clusters stays "
            "structural: no graph re-exchange per iteration, O(state) "
            "shuffle bytes per iteration (.explain-verified; docs/SCALE.md)"
            if args.pin else
            "UNPINNED levels: local[N] caps task slots only — JVM "
            "shuffle/GC/Arrow threads and python daemons spread over all "
            "cores, so the low level borrows hardware beyond its N slots "
            "and the ratio under-measures true scaling; prefer --pin"
        ),
    }
    # preserve any fixpoint_suite entries from earlier runs
    path = os.path.join(ROOT, "BENCH_SCALING.json")
    try:
        with open(path) as f:
            prev = json.load(f)
        if "fixpoint_suite" in prev:
            result["fixpoint_suite"] = prev["fixpoint_suite"]
    except (OSError, ValueError):
        pass
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
