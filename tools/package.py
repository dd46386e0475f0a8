"""Package the engine for ``spark-submit --py-files`` (north_rule).

Builds ``dist/spikex_spark.zip`` containing the package (sources only) and a
``dist/run_pipeline.py`` driver script. Submit with::

    spark-submit --py-files dist/spikex_spark.zip dist/run_pipeline.py \
        <input_parquet_dir> <output_dir> [threshold]

(Reference analogue: ``cli/package.py`` builds a pip-installable WikiGraph
sdist; here the deployable is the engine itself.)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_SRC = os.path.join(REPO, "tools", "run_pipeline_driver.py")


def build(dist_dir: str | None = None) -> str:
    dist = dist_dir or os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zip_path = os.path.join(dist, "spikex_spark.zip")
    pkg_root = os.path.join(REPO, "spikex_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    with open(DRIVER_SRC) as src_fh:
        driver = src_fh.read()
    with open(os.path.join(dist, "run_pipeline.py"), "w") as fh:
        fh.write(driver)
    return zip_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
