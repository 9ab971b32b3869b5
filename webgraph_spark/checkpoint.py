"""Checkpoint/resume for iterative jobs, with per-partition lineage + metrics.

north_rule requirement with no reference counterpart (the reference's closest
mechanism is HyperBall's external update lists, ``HyperBall.java:192-195``,
which spill but cannot resume). Design:

- each iteration's state table is written as parquet into a staging dir and
  atomically published via ``os.rename`` (the Iceberg-commit stand-in in this
  sandbox; on a cluster the writer targets an Iceberg table and the commit is
  the snapshot);
- lineage rows ``(run_id, iteration, partition_id, row_count, checksum,
  wall_ms, delta)`` are computed *distributed* (one mapInPandas pass over the
  state) and appended as one small parquet file per iteration — append-only,
  no read-modify-write;
- ``latest_iteration()``/``load_iteration()`` resume from the last published
  state; a killed run restarts from there and must produce byte-identical
  final output (tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

import os
import re
import shutil
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_lineage(df: DataFrame) -> pd.DataFrame:
    """Distributed per-partition accounting: (partition_id, row_count, checksum).

    The checksum is order-insensitive within a partition (sum of row hashes),
    so it is stable under Arrow batch splits.
    """

    def acct(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        rows = 0
        chk = np.uint64(0)
        for pdf in batches:
            rows += len(pdf)
            h = pd.util.hash_pandas_object(pdf, index=False).to_numpy(np.uint64)
            with np.errstate(over="ignore"):
                chk += h.sum(dtype=np.uint64)
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "row_count": [rows],
                "checksum": [int(chk.astype(np.int64))],
            }
        )

    out = df.mapInPandas(
        acct, schema="partition_id int, row_count long, checksum long"
    )
    return out.toPandas()


class CheckpointManager:
    """Parquet-backed iteration checkpoints under ``root`` for one run."""

    def __init__(self, spark: SparkSession, root: str, run_id: str | None = None):
        self.spark = spark
        self.root = root
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(os.path.join(root, "lineage"), exist_ok=True)
        os.makedirs(os.path.join(root, "state"), exist_ok=True)

    # -- write path ---------------------------------------------------------
    def save_iteration(
        self, state: DataFrame, iteration: int, wall_s: float, delta: float
    ) -> None:
        """Publish state + lineage for ``iteration`` atomically."""
        final = os.path.join(self.root, "state", f"iter={iteration:06d}")
        if os.path.exists(final):  # resumed run re-executing a published step
            return
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        state.write.mode("overwrite").parquet(tmp)
        lin = partition_lineage(state)
        lin.insert(0, "run_id", self.run_id)
        lin.insert(1, "iteration", iteration)
        lin["wall_ms"] = wall_s * 1000.0
        lin["delta"] = delta
        lin_path = os.path.join(
            self.root, "lineage", f"iter_{iteration:06d}.parquet"
        )
        lin.to_parquet(lin_path + ".tmp")
        os.rename(tmp, final)  # atomic publish of the state dir
        os.rename(lin_path + ".tmp", lin_path)

    # -- read path ------------------------------------------------------------
    def latest_iteration(self) -> int | None:
        """Greatest PUBLISHED iteration. Only exact ``iter=NNNNNN`` names
        count: a run killed mid-write leaves ``iter=NNNNNN.tmp-<uuid>``
        staging dirs behind, and those must be invisible to resume — the
        atomic-rename contract's read side. (The pre-round-4 filter keyed
        on ``endswith(".tmp")``, which never matches the uuid-suffixed
        staging names, so a partial dir crashed the int parse.)

        ``{6,}``, not ``{6}``: ``f"{iteration:06d}"`` is a MINIMUM width —
        iteration ≥ 1,000,000 publishes a 7-digit name, which an
        exact-width pattern would silently hide from resume. Any
        fully-published width matches; uuid-suffixed staging dirs still
        don't."""
        state_dir = os.path.join(self.root, "state")
        pat = re.compile(r"^iter=(\d{6,})$")
        iters = [
            int(m.group(1))
            for name in os.listdir(state_dir)
            if (m := pat.match(name))
        ]
        return max(iters) if iters else None

    def load_iteration(self, iteration: int) -> DataFrame:
        path = os.path.join(self.root, "state", f"iter={iteration:06d}")
        return self.spark.read.parquet(path)

    def lineage(self) -> pd.DataFrame:
        lin_dir = os.path.join(self.root, "lineage")
        files = sorted(
            os.path.join(lin_dir, f)
            for f in os.listdir(lin_dir)
            if f.endswith(".parquet")
        )
        if not files:
            return pd.DataFrame()
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

    def clear(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
