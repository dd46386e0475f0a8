"""Dump-line parsing (S1/F1/F4) — INSERT statement state machine."""

from __future__ import annotations

from pyspark.sql import functions as F

from spikex_spark.sources import (
    parse_categorylinks_row,
    parse_page_row,
    parse_redirect_row,
    read_wiki_dump,
    split_insert_values,
)

PAGE_LINE = (
    "INSERT INTO `page` VALUES "
    "(10,0,'Apple_(company)','',0,0),"
    "(11,0,'O\\'Brien','',0,0),"
    "(12,14,'Category:Fruits','',0,0),"
    "(13,2,'User:Bob','',0,0);"
)


def test_split_insert_values_quotes_escapes():
    rows = split_insert_values(PAGE_LINE)
    assert len(rows) == 4
    assert rows[0][2] == "'Apple_(company)'"
    assert rows[1][2] == "'O\\'Brien'"


def test_split_handles_parens_in_strings():
    line = "INSERT INTO t VALUES (1,'a(b),c'),(2,'x');"
    rows = split_insert_values(line)
    assert rows == [("1", "'a(b),c'"), ("2", "'x'")]


def test_non_insert_lines_ignored():
    assert split_insert_values("-- comment") == []
    assert split_insert_values("CREATE TABLE page (...);") == []


def test_parse_page_namespace_filter():
    rows = split_insert_values(PAGE_LINE)
    parsed = [parse_page_row(r) for r in rows]
    kept = [p for p in parsed if p]
    assert kept == [
        (0, 10, "Apple_(company)"),
        (0, 11, "O'Brien"),
        (14, 12, "Category:Fruits"),
    ]  # ns=2 dropped (F1)


def test_parse_redirect_and_categorylinks():
    assert parse_redirect_row(("5", "0", "'Apple'")) == (5, "Apple")
    assert parse_redirect_row(("5", "3", "'X'")) is None
    assert parse_categorylinks_row(("7", "'Fruits'", "'x'", "'page'")) == (
        7, "Fruits", "page")
    assert parse_categorylinks_row(("7", "'F'", "'x'", "'file'")) is None


def test_read_wiki_dump_spark(spark, tmp_path):
    dump = tmp_path / "page.sql"
    dump.write_text("-- header\n" + PAGE_LINE + "\n")
    df = read_wiki_dump(spark, str(dump), "page")
    got = sorted((r["ns"], r["pageid"], r["title"]) for r in df.collect())
    assert got == [(0, 10, "Apple_(company)"), (0, 11, "O'Brien"),
                   (14, 12, "Category:Fruits")]


def test_sql_gz_dump_to_mentions_end_to_end(spark, tmp_path):
    """S1 loop closure (reference create-wikigraph CLI,
    ``wikigraph/dumptools.py``): gzip'd multi-INSERT dumps -> read_wiki_dump
    -> build_wikigraph -> title keys -> mention detection over documents."""
    import gzip

    from spikex_spark.operators import blocking as B
    from spikex_spark.wikigraph import build_wikigraph

    def gz(name: str, *lines: str) -> str:
        p = tmp_path / name
        with gzip.open(p, "wt") as f:
            f.write("-- MySQL dump\n")
            for ln in lines:
                f.write(ln + "\n")
        return str(p)

    # raw dump shape: ns=14 titles come WITHOUT the Category: prefix
    page = gz(
        "page.sql.gz",
        "INSERT INTO `page` VALUES "
        "(10,0,'Apple_(company)','',0,0),"
        "(11,0,'Apple_(fruit)','',0,0),"
        "(12,0,'Apple','',0,0),"           # redirect source
        "(13,0,'Apple_Inc.','',0,0),"      # disambiguation (dropped)
        "(14,0,'Hidden_page','',0,0),"     # hiddencat (dropped)
        "(20,14,'Fruits','',0,0),"
        "(21,2,'User:Bob','',0,0);",       # ns filter
        "INSERT INTO `page` VALUES (15,0,'Apache_Spark','',0,0);",
    )
    props = gz(
        "page_props.sql.gz",
        "INSERT INTO `page_props` VALUES "
        "(13,'disambiguation','',0),(14,'hiddencat','',0);",
    )
    redirect = gz(
        "redirect.sql.gz",
        "INSERT INTO `redirect` VALUES (12,0,'Apple_(company)','','');",
    )
    catlinks = gz(
        "categorylinks.sql.gz",
        "INSERT INTO `categorylinks` VALUES "
        "(10,'Fruits','x','page'),(11,'Fruits','x','page'),"
        "(99,'Fruits','x','page');",       # unknown member dropped
    )

    g = build_wikigraph(
        read_wiki_dump(spark, page, "page"),
        read_wiki_dump(spark, props, "pageprops"),
        read_wiki_dump(spark, redirect, "redirect"),
        read_wiki_dump(spark, catlinks, "categorylinks"),
    )
    titles = {r["title"] for r in g.pages.collect()}
    assert titles == {"Apple_(company)", "Apple_(fruit)", "Apache_Spark",
                      "Category:Fruits"}
    assert g.is_redirect("Apple")
    assert g.get_pageid("Apple") == 10          # resolved through redirect
    edges = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert edges == {(10, 20), (11, 20)}

    # close the loop: graph titles drive mention detection (the reference
    # WikiPageX flow: create-wikigraph -> find_pages)
    docs = spark.createDataFrame(
        [(1, "i love my apple fruit snack"),
         (2, "apache spark beats hand written loops"),
         (3, "nothing to see here")],
        ["doc_id", "text"],
    )
    keys = B.title_keys(g.pages.where(F.col("kind") == "page"))
    got = {(r["id"], r["key"]) for r in
           B.mentions(docs, keys, id_col="doc_id", text_col="text").collect()}
    assert got == {(1, "apple fruit"), (2, "apache spark")}


def test_dist_zip_matches_tree():
    """The committed spark-submit artifact must not silently diverge from
    the reviewed sources: every .py under spikex_spark/ must be present in
    dist/spikex_spark.zip with IDENTICAL bytes (and nothing extra)."""
    import os
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(repo, "dist", "spikex_spark.zip")
    tree = {}
    pkg = os.path.join(repo, "spikex_spark")
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                tree[os.path.relpath(full, repo)] = open(full, "rb").read()
    with zipfile.ZipFile(zpath) as zf:
        zipped = {n: zf.read(n) for n in zf.namelist() if not n.endswith("/")}
    assert set(zipped) == set(tree), (
        set(zipped) ^ set(tree),
        "rebuild with: python tools/package.py",
    )
    stale = [n for n in tree if zipped[n] != tree[n]]
    assert not stale, (stale, "rebuild with: python tools/package.py")


def test_spark_submit_py_files_end_to_end(tmp_path):
    """north_rule: "run via spark-submit --py-files". Actually submit the
    committed artifact — fresh JVM + fresh Python, nothing inherited from
    the test session — against the sf0.001 documents table and verify the
    written clusters with DuckDB (no second Spark session)."""
    import os
    import shutil
    import subprocess

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "clusters")
    r = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--py-files", os.path.join(repo, "dist", "spikex_spark.zip"),
         os.path.join(repo, "dist", "run_pipeline.py"),
         "/root/testdata/sf0.001/documents.parquet", out],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    import duckdb

    rows, clusters = duckdb.sql(
        f"select count(*), count(distinct cluster_id) "
        f"from read_parquet('{out}/*.parquet')").fetchone()
    assert rows > 0 and 0 < clusters <= rows


def test_resolve_dump_version():
    from spikex_spark.sources import resolve_dump_version

    idx = ('<html><a href="../">..</a> <a href="20210401/">20210401/</a> '
           '<a href="20210520/">20210520/</a> <a href="latest/">latest/</a>')
    assert resolve_dump_version(idx) == "20210520"
    assert resolve_dump_version(idx, "20210401") == "20210401"
    import pytest as _pt
    with _pt.raises(ValueError):
        resolve_dump_version(idx, "19990101")
    with _pt.raises(ValueError):
        resolve_dump_version("<html>no versions</html>")


def test_fetch_dump_cache_and_resume(tmp_path):
    from spikex_spark.sources import fetch_dump

    src = tmp_path / "page.sql"
    payload = b"INSERT INTO page VALUES (1,0,'A','',0,0);\n" * 500
    src.write_bytes(payload)
    url = src.as_uri()
    cache = str(tmp_path / "cache")

    got = fetch_dump(url, cache)
    assert open(got, "rb").read() == payload

    # idempotent: a completed cache short-circuits — even an unreachable
    # URL succeeds because nothing is fetched
    again = fetch_dump("file:///nonexistent/page.sql", cache)
    assert again == got and open(again, "rb").read() == payload

    # interrupted download: stale .part + missing complete-marker refetches
    # (file:// grants no Range, so the fallback full-refetch path runs)
    import os
    os.remove(got)
    os.remove(got + ".meta.json")
    (tmp_path / "cache" / "page.sql.part").write_bytes(payload[:100])
    got2 = fetch_dump(url, cache)
    assert open(got2, "rb").read() == payload


def test_fetch_dump_http_range_resume(tmp_path):
    """The 206 resume path: a stale .part resumes with a Range request and
    only the tail is transferred (localhost server, no external network)."""
    import http.server
    import threading

    from spikex_spark.sources import fetch_dump

    payload = bytes(range(256)) * 200  # 51200 bytes
    served_ranges = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            rng = self.headers.get("Range")
            if rng:
                start = int(rng.split("=")[1].rstrip("-").split("-")[0])
                served_ranges.append(start)
                body = payload[start:]
                self.send_response(206)
                self.send_header(
                    "Content-Range",
                    f"bytes {start}-{len(payload)-1}/{len(payload)}")
            else:
                body = payload
                self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/dump.sql.gz"
        cache = str(tmp_path / "cache")
        (tmp_path / "cache").mkdir()
        # plant a half-finished .part — fetch must resume, not refetch
        (tmp_path / "cache" / "dump.sql.gz.part").write_bytes(payload[:30000])
        got = fetch_dump(url, cache)
        assert open(got, "rb").read() == payload
        assert served_ranges == [30000]
    finally:
        srv.shutdown()


def test_fetch_dump_416_and_truncation(tmp_path):
    """(a) A .part already holding the full file triggers HTTP 416 on
    resume — fetch must fall back to a refetch, not crash. (b) A server
    that closes early (body shorter than Content-Length) must FAIL and
    keep the .part rather than caching a truncated dump as complete."""
    import http.server
    import threading

    import pytest as _pt

    from spikex_spark.sources import fetch_dump

    payload = b"x" * 10000
    truncate = {"on": False}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            rng = self.headers.get("Range")
            if rng:
                start = int(rng.split("=")[1].rstrip("-").split("-")[0])
                if start >= len(payload):
                    self.send_response(416)
                    self.end_headers()
                    return
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            body = payload[:4000] if truncate["on"] else payload
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/d.sql.gz"
        cache = tmp_path / "c1"
        cache.mkdir()
        (cache / "d.sql.gz.part").write_bytes(payload)     # full-size .part
        got = fetch_dump(url, str(cache))
        assert open(got, "rb").read() == payload           # 416 -> refetch

        truncate["on"] = True
        cache2 = tmp_path / "c2"
        with _pt.raises(OSError, match="incomplete"):
            fetch_dump(url, str(cache2))
        assert (cache2 / "d.sql.gz.part").exists()         # kept for resume
        assert not (cache2 / "d.sql.gz").exists()
    finally:
        srv.shutdown()


def test_fetch_dump_no_content_length_revalidates(tmp_path):
    """A server that omits Content-Length (chunked/EOF-delimited body) gives
    no way to tell a complete body from a mid-stream connection cut, so the
    completion marker must NOT be written: the fetch succeeds, but the next
    call revalidates by refetching instead of trusting a possibly-truncated
    cached file forever (a cut body's meta would record the truncated length
    and always "verify" against itself)."""
    import http.server
    import threading

    from spikex_spark.sources import fetch_dump

    payload = b"y" * 8192
    hits = {"n": 0}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits["n"] += 1
            self.send_response(200)
            self.end_headers()          # no Content-Length header
            self.wfile.write(payload)   # EOF-delimited body

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/nl.sql.gz"
        cache = tmp_path / "c"
        cache.mkdir()
        got = fetch_dump(url, str(cache))
        assert open(got, "rb").read() == payload
        assert not (cache / "nl.sql.gz.meta.json").exists()
        # second call must hit the server again (no short-circuit)
        fetch_dump(url, str(cache))
        assert hits["n"] == 2
    finally:
        srv.shutdown()


def test_gen_dump_parts_end_to_end(spark, tmp_path):
    """Synthetic multi-part .sql.gz dumps (the scaling-leg source) parse
    into a coherent WikiGraph: visible pages = entities minus hiddencat
    minus nothing else, categories present, redirects resolve."""
    from spikex_spark import synth
    from spikex_spark.sources import read_wiki_dump
    from spikex_spark.wikigraph import build_wikigraph

    d = synth.gen_dump_parts(n_titles=500, parts=3, rows_per_line=40,
                             base_dir=str(tmp_path))
    d2 = synth.gen_dump_parts(n_titles=500, parts=3, rows_per_line=40,
                              base_dir=str(tmp_path))
    assert d == d2   # cached, not regenerated

    g = build_wikigraph(
        read_wiki_dump(spark, d + "/page-*.sql.gz", "page"),
        read_wiki_dump(spark, d + "/pageprops-*.sql.gz", "pageprops"),
        read_wiki_dump(spark, d + "/redirect-*.sql.gz", "redirect"),
        read_wiki_dump(spark, d + "/categorylinks-*.sql.gz", "categorylinks"))
    kinds = {r["kind"]: r["count"]
             for r in g.pages.groupBy("kind").count().collect()}
    # 500 entities - 4 hiddencat (pageids 100+j*101, j*101 < 500), plus ONE
    # orphan redirect source: redirect j=0 targets entity 0, which is
    # hiddencat — the unresolvable redirect drops and its source page
    # stays a visible page
    assert kinds["page"] == 500 - 4 + 1
    assert kinds["category"] == 7
    n_red = 500 // 20
    assert g.redirects.count() == n_red - 1
    # redirect 3 targets entity 33 (3*11 % 500)
    assert g.get_pageid("Entity_0000003_redirect") == 133
    edges = g.edges.count()
    # one link per j*17 < 500 except hiddencat members dropped by semi-join
    assert edges > 0


# --- WARC ingest (Common-Crawl shard format) --------------------------------

def test_warc_roundtrip_split_and_framing():
    """encode→parse round-trip in both layouts (per-record gzip members /
    plain), Content-Length framing with CRLF pairs INSIDE bodies, empty
    bodies, non-response record skipping, deterministic bytes, truncation
    errors."""
    import gzip

    from spikex_spark.warc import encode_warc, gen_crawl_records, parse_warc

    recs = gen_crawl_records(12)
    for gz in (True, False):
        blob = encode_warc(recs, gzip_members=gz)
        back = list(parse_warc(blob))
        assert [r["url"] for r in back] == [r["url"] for r in recs]
        for a, b in zip(recs, back):
            assert b["html"] == a["html"]
            assert b["warc_ts"] == a["ts"]
            assert b["http_status"] == a["status"]
            assert b["mime"] == a["mime"]

    assert encode_warc(recs) == encode_warc(recs)      # byte-deterministic

    # interleaved non-response records are skipped, not surfaced
    info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            "WARC-Date: 2020-09-13T00:00:00Z\r\n"
            "Content-Type: application/warc-fields\r\n"
            "Content-Length: 14\r\n\r\nrobots: polite\r\n\r\n").encode()
    blob = gzip.compress(info, mtime=0) + encode_warc(recs[:3])
    assert len(list(parse_warc(blob))) == 3

    # a shard cut mid-member is an error, not a silent short read
    import pytest
    whole = encode_warc(recs)
    with pytest.raises(ValueError):
        list(parse_warc(whole[: len(whole) // 2]))


def test_warc_spark_scan_to_landing_columns(spark, tmp_path):
    """read_warc_df over multi-shard input: one task per shard, rows match
    the pure-python splitter, and the landing chain (html → text via the
    byte-identical extractor path) runs on the result."""
    from spikex_spark.warc import (encode_warc, gen_crawl_records,
                                   parse_warc, read_warc_df)

    recs = gen_crawl_records(20, seed=5)
    for s in range(4):
        (tmp_path / f"part-{s}.warc.gz").write_bytes(
            encode_warc(recs[s * 5:(s + 1) * 5]))
    df = read_warc_df(spark, str(tmp_path))
    assert df.rdd.getNumPartitions() >= 1
    got = {r["url"]: r for r in df.collect()}
    expect = [r for s in range(4)
              for r in parse_warc(encode_warc(recs[s * 5:(s + 1) * 5]))]
    assert len(got) == 20
    for e in expect:
        g = got[e["url"]]
        assert bytes(g["html"]) == e["html"]
        assert g["warc_ts"] == e["warc_ts"]
        assert g["http_status"] == e["http_status"]

    # landing chain: binary html → decoded text column (the input_hint
    # table shape) without touching any other stage
    landed = df.select(
        "url", "warc_ts",
        F.decode(F.col("html"), "UTF-8").alias("text")).collect()
    assert any("société" in r["text"] for r in landed)


def test_warc_python_datasource_batch(spark, tmp_path):
    """spark.read.format('warc'): one InputPartition per shard, rows equal
    the direct splitter output."""
    from spikex_spark.warc import encode_warc, gen_crawl_records, parse_warc
    from spikex_spark.warc_source import WarcDataSource

    spark.dataSource.register(WarcDataSource)
    recs = gen_crawl_records(12, seed=3)
    for s in range(3):
        (tmp_path / f"seg-{s}.warc.gz").write_bytes(
            encode_warc(recs[s * 4:(s + 1) * 4]))
    df = spark.read.format("warc").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 3      # shard = partition
    got = {r["url"]: bytes(r["html"]) for r in df.collect()}
    expect = {r["url"]: r["html"] for r in parse_warc(encode_warc(recs))}
    assert got == expect
    # the Arrow fast path (default) and the tuple path agree row-for-row
    tup = (spark.read.format("warc").option("arrow", "false")
           .load(str(tmp_path)))
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple,
                                                          tup.collect()))


def test_warc_python_datasource_streaming(spark, tmp_path):
    """spark.readStream.format('warc'): micro-batches advance through the
    sorted shard list; a second availableNow run over the same checkpoint
    picks up ONLY newly landed shards (exactly-once per shard)."""
    import time

    from spikex_spark.warc import encode_warc, gen_crawl_records
    from spikex_spark.warc_source import WarcDataSource

    spark.dataSource.register(WarcDataSource)
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    recs = gen_crawl_records(18, seed=9)
    for s in range(2):
        (crawl / f"seg-{s}.warc.gz").write_bytes(
            encode_warc(recs[s * 6:(s + 1) * 6]))

    def drain():
        q = (spark.readStream.format("warc").load(str(crawl))
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert not q.isActive, "stream did not drain in time"

    drain()
    assert spark.read.parquet(out).count() == 12
    # a new shard lands; only it is processed on the next drain
    (crawl / f"seg-2.warc.gz").write_bytes(encode_warc(recs[12:18]))
    drain()
    landed = spark.read.parquet(out)
    assert landed.count() == 18                    # no reprocessing
    assert landed.select("url").distinct().count() == 18


def test_run_pipeline_driver_subcommands(spark, tmp_path):
    """The dist driver's compose functions run end-to-end on sf0.001 —
    the same code spark-submit executes, imported directly."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "run_pipeline", "/root/repo/dist/run_pipeline.py")
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)
    src = "/root/testdata/sf0.001/documents.parquet"

    out = str(tmp_path / "dedup")
    rp.run_dedup(spark, src, out)
    d = spark.read.parquet(out)
    assert set(d.columns) == {"doc_id", "keep_exact", "keep_near"}
    rows = d.collect()
    assert rows and all(r["keep_exact"] or not r["keep_near"]
                        for r in rows)  # near-keep implies exact-keep

    out2 = str(tmp_path / "curate")
    rp.run_curate(spark, src, out2, block_tokens=64)
    c = spark.read.parquet(out2)
    assert {"id", "n_tokens", "start_token", "block_id",
            "block_offset"} <= set(c.columns)
    assert c.count() > 0

    out3 = str(tmp_path / "stats")
    rp.run_stats(spark, src, out3)
    s = spark.read.parquet(out3)
    assert {"id", "quality", "lang_guess", "passed"} <= set(s.columns)
    assert s.count() == spark.read.parquet(src).count()


def test_run_pipeline_arg_validation(monkeypatch):
    """ADVICE r4: extra positionals to no-arg subcommands must be a
    usage error (not a TypeError crash), bad coercions a usage error,
    and curate's defaults must equal the engine's shared curation
    constants."""
    import importlib.util
    import inspect

    import pytest as _pytest
    spec = importlib.util.spec_from_file_location(
        "run_pipeline_argcheck", "/root/repo/dist/run_pipeline.py")
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)

    import sys as _sys
    for argv in (["run_pipeline.py", "dedup", "a", "b", "3"],
                 ["run_pipeline.py", "stats", "a", "b", "x"],
                 ["run_pipeline.py", "er", "a", "b", "0.8", "extra"],
                 ["run_pipeline.py", "er", "a", "b", "notafloat"],
                 ["run_pipeline.py", "curate", "a"]):
        monkeypatch.setattr(_sys, "argv", argv)
        with _pytest.raises(SystemExit) as ei:
            rp.main()
        assert ei.value.code == 2, argv

    # the deployable's curate defaults resolve to the shared constants
    from spikex_spark.pipeline import (CURATION_BLOCK, CURATION_LANG,
                                       CURATION_MIN_QUALITY,
                                       CURATION_MIN_TOKENS)
    sig = inspect.signature(rp.run_curate)
    assert all(sig.parameters[p].default is None
               for p in ("block_tokens", "min_quality", "min_tokens",
                         "lang"))
    src = inspect.getsource(rp.run_curate)
    assert "CURATION_MIN_QUALITY" in src and "CURATION_MIN_TOKENS" in src
    assert "CURATION_BLOCK" in src and "CURATION_LANG" in src
    assert (CURATION_MIN_QUALITY, CURATION_MIN_TOKENS,
            CURATION_LANG, CURATION_BLOCK) == (0.6, 20, "en", 256)
