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

DRIVER = '''\
"""spark-submit entry: near-dup ER clustering over a documents parquet."""
import sys

from pyspark.sql import SparkSession

from spikex_spark.pipeline import resolve_documents


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.80
    spark = SparkSession.builder.appName("spikex_spark_pipeline").getOrCreate()
    docs = spark.read.parquet(src)
    resolve_documents(docs, threshold=threshold).write.mode("overwrite").parquet(dst)
    spark.stop()


if __name__ == "__main__":
    main()
'''


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
    with open(os.path.join(dist, "run_pipeline.py"), "w") as fh:
        fh.write(DRIVER)
    return zip_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
