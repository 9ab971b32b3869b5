"""Package the engine for ``spark-submit --py-files`` (north_rule launch path).

Builds ``dist/webgraph_spark.zip`` containing the package, and prints the
submit command for a cluster run. The same entry scripts (bench.py, any
job module) run unchanged under local mode and spark-submit because
``webgraph_spark.session.get_spark`` only fills config gaps.

Usage:
    python scripts/package_pyfiles.py
    spark-submit --py-files dist/webgraph_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=<4x cores> \\
        bench.py --sf-dir <data> --cpus <cores>
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, "webgraph_spark.zip")
    pkg = os.path.join(ROOT, "webgraph_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return zip_path


if __name__ == "__main__":
    path = build_zip()
    print(f"built {path}")
    print(
        "submit: spark-submit --py-files "
        f"{path} bench.py --sf-dir $SPARK_GRAFT_SF_DIR --cpus $SPARK_GRAFT_CPUS"
    )
