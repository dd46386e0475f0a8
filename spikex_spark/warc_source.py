"""``spark.read.format("warc")`` — WARC shards as a first-class Spark 4
Python Data Source, batch AND streaming.

Where :func:`spikex_spark.warc.read_warc_df` composes binaryFile +
``mapInPandas``, this registers the same record splitter through
PySpark 4's Data Source API (``pyspark.sql.datasource``), which buys:

* planning-time file listing with ONE InputPartition per shard — Spark
  schedules shards like any other splittable source (speculation,
  locality hints, retries at shard granularity), and the shard bytes are
  read inside the partition reader instead of being shipped through a
  binaryFile row first;
* ``spark.readStream.format("warc")`` — continuous landing of a crawl
  directory. Offsets are positions in the lexicographically sorted
  shard list, so micro-batch N processes exactly the files
  ``sorted(files)[start:end]``: exactly-once per shard as long as shard
  names arrive in sorted order (Common Crawl segment names do — they
  embed the crawl timestamp).

Usage::

    spark.dataSource.register(WarcDataSource)
    spark.read.format("warc").load("/crawl/segments/")          # batch
    spark.readStream.format("warc").load("/crawl/segments/")    # stream

Rows are plain tuples (correctness-grade; the Arrow-batch fast path of
the same API is a drop-in upgrade if the splitter ever bottlenecks —
today decompression dominates).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

WARC_COLUMNS = ("url", "warc_ts", "html", "http_status", "mime")


def _list_shards(path: str) -> list[str]:
    if os.path.isdir(path):
        pattern = os.path.join(path, "*.warc*")
    else:
        pattern = path                       # explicit file or user glob
    return sorted(p for p in _glob.glob(pattern) if os.path.isfile(p))


def _read_shard(path: str):
    from spikex_spark.warc import parse_warc

    with open(path, "rb") as f:
        payload = f.read()
    for rec in parse_warc(payload):
        yield tuple(rec[c] for c in WARC_COLUMNS)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcBatchReader(DataSourceReader):
    def __init__(self, path: str):
        self.shards = _list_shards(path)

    def partitions(self):
        return [_ShardPartition(p) for p in self.shards]

    def read(self, partition):
        yield from _read_shard(partition.path)


class _WarcStreamReader(DataSourceStreamReader):
    """Micro-batch = the newly appeared suffix of the sorted shard list."""

    def __init__(self, path: str):
        self.path = path

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(_list_shards(self.path))}

    def partitions(self, start: dict, end: dict):
        shards = _list_shards(self.path)
        return [_ShardPartition(p)
                for p in shards[start["index"]:end["index"]]]

    def read(self, partition):
        yield from _read_shard(partition.path)

    def commit(self, end: dict) -> None:
        pass                                 # shards are immutable inputs


class WarcDataSource(DataSource):
    """Registration target: ``spark.dataSource.register(WarcDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return ("url string, warc_ts timestamp, html binary,"
                " http_status int, mime string")

    def reader(self, schema) -> DataSourceReader:
        return _WarcBatchReader(self.options["path"])

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _WarcStreamReader(self.options["path"])
