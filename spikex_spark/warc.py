"""WARC (ISO 28500) ingest: the on-disk format Common Crawl actually ships.

The engine's flagship input is an Iceberg-style table of Common-Crawl-like
pages ``(url, warc_ts, html, text, lang)`` — this module covers the step
BEFORE that table exists: turning raw ``.warc.gz`` crawl shards into those
columns. ``read_warc_df`` gives ``(url, warc_ts, html, http_status,
mime)``; ``text``/``lang`` come from the downstream stages that already
exist (``extract.extract_normalize`` → ``textstats.lang_id``), so
``read_warc_df → extract → lang_id → write`` is the full landing pipeline.

Reference parity: spikex ingests Wikipedia SQL dumps only
(``wikigraph/dumptools.py:169-281``); WARC is the web-corpus analogue of
that source surface, not a port.

Scale design (100 TB of crawl):

* Common Crawl publishes each crawl as ~64-90k shard files of ~1 GB
  gzipped. ``spark.read.format("binaryFile")`` yields ONE row per shard,
  so parallelism = number of shards — tens of thousands of tasks against
  a 1000-executor cluster, no skew (shards are size-capped by the
  crawler). A shard is NOT splittable below file level: per the CC
  layout every record is its own gzip member, but member offsets are
  only known from the external index, so the in-file split is sequential
  decompression either way.
* Memory: the parser never materializes a decompressed shard. It streams
  the member chain through ``gzip.GzipFile`` record by record
  (Content-Length framed) and yields Arrow batches of
  ``_WARC_BATCH_RECORDS`` rows, so peak memory per task is one batch of
  html bodies (~tens of MB), not the ~5 GB decompressed shard.
* The html column stays ``binary`` (charset unknown until extraction) in
  its own column, so Parquet/Iceberg column pruning keeps every
  non-extraction stage from reading page bodies at all.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from collections.abc import Iterator
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = ("url string, warc_ts timestamp, html binary,"
               " http_status int, mime string")

_WARC_BATCH_RECORDS = 1000
_CRLF2 = b"\r\n\r\n"


# ---------------------------------------------------------------------------
# writer (deterministic fixtures; also the re-shard path of a landing job)
# ---------------------------------------------------------------------------

def encode_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """Encode response records as a WARC/1.0 stream.

    ``records``: dicts with ``url`` (str), ``ts`` (datetime, UTC naive),
    ``html`` (bytes), optional ``status`` (int, default 200) and ``mime``
    (str, default text/html). With ``gzip_members`` each record becomes
    its own gzip member (the Common Crawl shard layout — members
    concatenate into one valid .warc.gz); otherwise the stream is plain.

    Deterministic: record IDs are content-derived UUIDs and gzip mtime is
    pinned to 0, so the same records always produce the same bytes.
    """
    out = bytearray()
    for rec in records:
        status = int(rec.get("status", 200))
        mime = rec.get("mime", "text/html")
        html = bytes(rec["html"])
        http = (f"HTTP/1.1 {status} "
                f"{'OK' if status == 200 else 'X'}\r\n"
                f"Content-Type: {mime}\r\n"
                f"Content-Length: {len(html)}\r\n\r\n").encode("ascii") + html
        rid = hashlib.md5(rec["url"].encode("utf-8")).hexdigest()
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
            f"WARC-Date: {rec['ts'].strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("utf-8")
        raw = head + http + _CRLF2
        out += gzip.compress(raw, mtime=0) if gzip_members else raw
    return bytes(out)


# ---------------------------------------------------------------------------
# record splitter
# ---------------------------------------------------------------------------

def _read_exact(fh, n: int) -> bytes:
    buf = fh.read(n)
    while len(buf) < n:
        more = fh.read(n - len(buf))
        if not more:
            raise ValueError("truncated WARC record payload")
        buf += more
    return buf


def _read_headers(fh) -> "dict | None":
    """Read one WARC header block (up to a blank line); None at EOF."""
    line = fh.readline()
    while line in (b"\r\n", b"\n"):          # inter-record blank lines
        line = fh.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"bad WARC version line: {line[:40]!r}")
    headers: dict = {}
    while True:
        line = fh.readline()
        if line in (b"\r\n", b"\n", b""):
            return headers
        if b":" not in line:
            raise ValueError(f"bad WARC header line: {line[:60]!r}")
        k, v = line.split(b":", 1)
        headers[k.strip().lower().decode("ascii")] = v.strip().decode(
            "utf-8", "replace")


def parse_warc(payload: bytes) -> Iterator[dict]:
    """Yield response records from WARC bytes (gzipped members or plain).

    Each yielded dict has ``url``, ``warc_ts`` (naive UTC datetime),
    ``html`` (HTTP body bytes), ``http_status``, ``mime``. Non-response
    records (warcinfo, request, metadata, ...) are skipped — the framing
    is still validated so a truncated or corrupt shard raises ValueError
    instead of silently dropping the tail.
    """
    raw = io.BytesIO(payload)
    fh = gzip.GzipFile(fileobj=raw) if payload[:2] == b"\x1f\x8b" else raw
    while True:
        try:
            headers = _read_headers(fh)
            if headers is None:
                return
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError(
                    "WARC record missing Content-Length") from None
            block = _read_exact(fh, length)
        except EOFError as e:                 # gzip member cut mid-stream
            raise ValueError(f"truncated WARC gzip member: {e}") from e
        if headers.get("warc-type") != "response":
            continue
        sep = block.find(_CRLF2)
        if sep < 0 or not block.startswith(b"HTTP/"):
            raise ValueError("WARC response payload is not an HTTP message")
        status_line = block[:block.find(b"\r\n")].split(b" ")
        status = int(status_line[1]) if len(status_line) > 1 else 0
        mime = None
        for hline in block[:sep].split(b"\r\n")[1:]:
            k, _, v = hline.partition(b":")
            if k.strip().lower() == b"content-type":
                mime = v.strip().decode("ascii", "replace")
        yield {
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": datetime.strptime(headers["warc-date"],
                                         "%Y-%m-%dT%H:%M:%SZ"),
            "html": block[sep + len(_CRLF2):],
            "http_status": status,
            "mime": mime,
        }


# ---------------------------------------------------------------------------
# distributed scan
# ---------------------------------------------------------------------------

def read_warc_df(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``.warc`` / ``.warc.gz`` shards into ``WARC_SCHEMA`` rows.

    One binaryFile row per shard → one task per shard (the CC shard count
    IS the parallelism; see module docstring); the per-task parser
    streams records and yields bounded Arrow batches.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                rows: list[dict] = []
                for rec in parse_warc(bytes(content)):
                    rows.append(rec)
                    if len(rows) >= _WARC_BATCH_RECORDS:
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows)

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*").load(path)
             .select("content"))
    return files.mapInPandas(run, schema=WARC_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic fixture (contract-query input; no external data)
# ---------------------------------------------------------------------------

def gen_crawl_records(n: int = 24, seed: int = 13) -> list[dict]:
    """Deterministic Common-Crawl-shaped response records: rotating hosts,
    a 404 every 7th row, an empty body, a non-HTML mime, multilingual
    bodies with CRLF pairs inside (framing must rely on Content-Length,
    never on scanning for the record separator)."""
    hosts = ("example.org", "news.example.com", "wiki.example.net")
    bodies = (
        "<html><body><h1>Entity {i}</h1>La société Acme {i} \r\n\r\n"
        "&amp; Co.</body></html>",
        "<html><body>日本語のページ {i} — Ünïcode body</body></html>",
        "<html><body><p>plain page {i}</p></body></html>",
    )
    rows = []
    for i in range(n):
        mime = "application/pdf" if i % 11 == 10 else \
            "text/html; charset=UTF-8"
        html = b"" if i % 9 == 8 else \
            bodies[(i * seed) % 3].format(i=i).encode("utf-8")
        rows.append({
            "url": f"https://{hosts[i % 3]}/page/{seed}/{i}",
            "ts": datetime(2020, 9, 13, 12, i % 60, (i * 7) % 60),
            "html": html,
            "status": 404 if i % 7 == 6 else 200,
            "mime": mime,
        })
    return rows


def ensure_warc_fixture(base_dir: str = "/tmp", n: int = 24,
                        shards: int = 3, seed: int = 13) -> str:
    """Write the deterministic fixture as ``shards`` .warc.gz files (plus
    an interleaved non-response record per shard, proving the skip path)
    and return the directory. Content-addressed dir name + atomic rename
    make concurrent callers converge on identical bytes."""
    import os

    recs = gen_crawl_records(n, seed)
    per = -(-n // shards)
    blobs = []
    for s in range(shards):
        part = recs[s * per:(s + 1) * per]
        info = ("WARC/1.0\r\n"
                "WARC-Type: warcinfo\r\n"
                f"WARC-Date: 2020-09-13T00:00:0{s}Z\r\n"
                "Content-Type: application/warc-fields\r\n"
                "Content-Length: 14\r\n\r\n"
                "robots: polite\r\n\r\n").encode("ascii")
        blobs.append(gzip.compress(info, mtime=0) + encode_warc(part))
    tag = hashlib.md5(b"".join(blobs)).hexdigest()[:12]
    dest = os.path.join(base_dir, f"spikex_warc_fixture_{tag}")
    if os.path.exists(os.path.join(dest, "_DONE")):
        return dest
    tmp = dest + f".tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for s, blob in enumerate(blobs):
        with open(os.path.join(tmp, f"shard-{s:05d}.warc.gz"), "wb") as f:
            f.write(blob)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(tag)
    try:
        os.rename(tmp, dest)
    except OSError:                           # lost the race: ours is equal
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return dest
