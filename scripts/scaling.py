"""Scaling-efficiency experiment (BASELINE.json north_rule, sandbox proxy).

The rule requires throughput scaling efficiency >= 0.8 going N -> 4N
executors. No cluster exists in this sandbox, so per the driver instruction
we run the SAME PageRank job on the SAME input at two parallelism levels
(local[N] and local[4N]) in separate JVMs and report

    efficiency = (throughput_4N / throughput_N) / 4
               = (iter_sec_N / iter_sec_4N) / 4

Usage: python scripts/scaling.py [--n 8] [--multiplier 4] [--pr-iters 6]
Writes BENCH_SCALING.json at the repo root and prints the result.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, multiplier: int, pr_iters: int, sf_dir: str) -> dict:
    cmd = [
        sys.executable, os.path.join(ROOT, "bench.py"),
        "--cpus", str(cpus), "--multiplier", str(multiplier),
        "--pr-iters", str(pr_iters), "--pagerank-only", "--sf-dir", sf_dir,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=ROOT, check=True
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--multiplier", type=int, default=4)
    ap.add_argument("--pr-iters", type=int, default=6)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    lo = run_level(args.n, args.multiplier, args.pr_iters, args.sf_dir)
    hi = run_level(args.n * 4, args.multiplier, args.pr_iters, args.sf_dir)
    eff = (lo["pagerank_iter_sec_median"] / hi["pagerank_iter_sec_median"]) / 4.0
    result = {
        "job": "pagerank_csr steady-state iteration (median of iters 2..k)",
        "input_edges": lo["n_edges"],
        "n_cpus": args.n,
        "4n_cpus": args.n * 4,
        "iter_sec_n": lo["pagerank_iter_sec_median"],
        "iter_sec_4n": hi["pagerank_iter_sec_median"],
        "edges_per_sec_per_iter_n": lo["pagerank_edges_per_sec_per_iter"],
        "edges_per_sec_per_iter_4n": hi["pagerank_edges_per_sec_per_iter"],
        "scaling_efficiency": round(eff, 3),
        "gate": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
