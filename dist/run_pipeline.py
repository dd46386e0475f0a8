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
