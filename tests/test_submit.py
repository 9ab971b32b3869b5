"""spark-submit --py-files launch-path smoke test (north_rule launch).

The north rule requires the engine to run "via spark-submit --py-files on a
multi-executor cluster". This test exercises that exact launch path end to
end: package the engine into ``dist/webgraph_spark.zip``, copy the flagship
job script OUT of the repo (so the only way it can import ``webgraph_spark``
is from the zip shipped via ``--py-files``), and run it under the real
``spark-submit`` binary with the master supplied by the submit command — the
same shape as a cluster run, minus the cluster.

Reference launch parity: BVGraph's CLI entry (`BVGraph.java:2680`) is the
reference's equivalent "run the engine as a job" surface.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_smoke(tmp_path):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit binary not available")

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from package_pyfiles import build_zip

    zip_path = build_zip(str(tmp_path / "dist"))
    # Ship the job script from OUTSIDE the repo: its repo-root sys.path hack
    # then points at tmp_path, so `import webgraph_spark` can only resolve
    # against the --py-files zip — a true cluster-launch import test.
    job = tmp_path / "job" / "demo_pipeline.py"
    job.parent.mkdir()
    shutil.copy(os.path.join(ROOT, "scripts", "demo_pipeline.py"), job)
    out = tmp_path / "out"

    env = dict(os.environ)
    # Master comes from the submit command (the cluster shape); the script's
    # get_spark() must not override it.
    env["SPARK_MASTER"] = "from-submit"
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.driver.memory=4g",
            "--py-files",
            zip_path,
            str(job),
            "--files",
            "200",
            "--repos",
            "5",
            "--cpus",
            "4",
            "--pr-iters",
            "5",
            "--out",
            str(out),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    with open(out / "report.json") as f:
        report = json.load(f)
    assert report["sha_violations"] == 0
    assert report["corpus_rows"] == 200
    assert report["graph"]["arcs"] > 0
    assert report["pagerank"]["iterations"] == 5
    assert report["triangles"] >= 0
    # result tables landed as parquet
    for sub in ("ranks", "components", "labels", "edges", "csr"):
        assert any(p.endswith(".parquet") for p in _walk(out / sub)), sub


def _walk(root) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files)
    return out
