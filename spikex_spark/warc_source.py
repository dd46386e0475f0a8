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

Batch reads use the API's Arrow fast path (bounded RecordBatches, html
bytes crossing the worker boundary as columnar buffers, not pickled
rows); ``option("arrow", "false")`` drops to the plain-tuple path, and a
test pins both paths row-identical. The stream reader stays on tuples —
micro-batches are small by construction.
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


_ARROW_BATCH_ROWS = 1000


def _read_shard_arrow(path: str):
    """Arrow fast path: yield bounded RecordBatches instead of per-row
    tuples — rows cross the worker boundary as columnar buffers (html
    bytes zero-copy) instead of pickled Python objects."""
    import pyarrow as pa

    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("http_status", pa.int32()),
        ("mime", pa.string()),
    ])

    def flush(rows):
        cols = list(zip(*rows))
        return pa.RecordBatch.from_arrays(
            [pa.array(cols[i], schema.field(i).type) for i in range(5)],
            schema=schema)

    rows = []
    for rec in _read_shard(path):
        rows.append(rec)
        if len(rows) >= _ARROW_BATCH_ROWS:
            yield flush(rows)
            rows = []
    if rows:
        yield flush(rows)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcBatchReader(DataSourceReader):
    def __init__(self, path: str, arrow: bool = True):
        self.shards = _list_shards(path)
        self.arrow = arrow

    def partitions(self):
        return [_ShardPartition(p) for p in self.shards]

    def read(self, partition):
        if self.arrow:
            yield from _read_shard_arrow(partition.path)
        else:
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
        # option("arrow", "false") drops to the tuple path (debug aid)
        arrow = self.options.get("arrow", "true").lower() != "false"
        return _WarcBatchReader(self.options["path"], arrow=arrow)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _WarcStreamReader(self.options["path"])
