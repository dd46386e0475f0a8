"""Measurement-only scale-up generator (guide §1 — measure at representative scale).

The driver escalated round-5 measurement to an sf1.0 directory it generated
itself (BENCH_r05.json: n_docs=50000, "sf": "/root/testdata/sf1.0"); that
directory is not present in this sandbox. /root/testdata is read-only and
must not be modified, so this tool writes a STATISTICALLY EQUIVALENT analog
(distributions fit from sf0.1 / sf0.01: row-count ratios, uniform value
ranges, vocab, doc-length U(10,100), lang mix, planted exact-dup rate) to a
separate directory, default /root/benchdata/sf1.0x. It exists so per-query
optimization can be measured at the driver's scale; it is NEVER an oracle
input and bench.py only uses it when $SPARK_GRAFT_SF_DIR points at it.

Usage: python tools/gen_bench_sf.py [scale] [outdir]
  scale: multiplier vs sf0.1 (default 10 -> sf1.0-equivalent)
"""

from __future__ import annotations

import os
import sys

import duckdb

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
EVENT_TYPES = ["view", "click", "error", "signup", "purchase"]
SEGMENTS = ["FURNITURE", "AUTOMOBILE", "BUILDING", "MACHINERY", "HOUSEHOLD"]


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/benchdata/sf1.0x"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SELECT setseed(0.42)")
    vocab = "[" + ",".join(f"'{w}'" for w in VOCAB) + "]"
    n_docs = int(5000 * scale)
    n_cust = int(15000 * scale)
    n_orders = int(150000 * scale)
    n_line = int(600000 * scale)
    n_events = int(100000 * scale)
    n_users = int(1500 * scale)
    n_part = int(20000 * scale)
    n_supp = int(1000 * scale)
    n_emb = int(2000 * (4 ** (scale / 10)))  # 500@0.01, 2000@0.1 -> 8000@1.0

    # deterministic per-cell pseudo-randoms via hash(): reruns are identical
    con.execute(f"""
      COPY (
        WITH base AS (
          SELECT i AS doc_id,
                 10 + hash(i * 7919 + 1) % 91 AS n_words,
                 CASE WHEN hash(i * 104729 + 2) % 625 = 0
                      THEN i - 1 - CAST(hash(i * 15485863 + 3) % 40 AS BIGINT)
                      ELSE i END AS src_doc
          FROM range({n_docs}) t(i)
        ), texts AS (
          SELECT doc_id,
                 array_to_string(list_transform(range(1, CAST(
                     10 + hash(greatest(src_doc, 0) * 7919 + 1) % 91 AS INT) + 1),
                   j -> ({vocab})[1 + CAST(hash(greatest(src_doc, 0) * 2654435761
                                              + j * 40503) % 31 AS INT)]),
                   ' ') AS text
          FROM base
        )
        SELECT doc_id, text,
               (['en','en','en','zh','es','fr','de','en','zh','es','fr','de',
                 'en','en','de','fr','es','zh','en','en'])[
                   1 + CAST(hash(doc_id * 31 + 5) % 20 AS INT)] AS lang,
               'src' || CAST(hash(doc_id * 37 + 6) % 20 AS VARCHAR) AS source,
               length(text) AS n_chars
        FROM texts ORDER BY doc_id
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
      COPY (
        SELECT i AS vec_id,
               list_transform(range(64), j ->
                   CAST((CAST(hash(i * 8191 + j * 127 + 11) % 2000001 AS DOUBLE)
                        / 1000000.0 - 1.0) AS FLOAT)) AS embedding,
               CAST(hash(i * 53 + 12) % 10 AS INT) AS label
        FROM range({n_emb}) t(i) ORDER BY vec_id
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
      COPY (
        SELECT i AS event_id,
               TIMESTAMP '2024-01-01 00:00:00'
                 + INTERVAL (CAST(i * (30.0 * 86400000 / {n_events}) AS BIGINT)
                             + hash(i * 13 + 21) % 20000) MILLISECOND AS ts,
               CAST(hash(i * 17 + 22) % {n_users} AS BIGINT) AS user_id,
               (['view','click','error','signup','purchase'])[
                   1 + CAST(hash(i * 19 + 23) % 5 AS INT)] AS event_type,
               ROUND(CAST(hash(i * 23 + 24) % 56000 AS DOUBLE) / 100.0, 2) AS value,
               '{{"k": ' || CAST(hash(i * 29 + 25) % 100 AS VARCHAR) || '}}' AS props
        FROM range({n_events}) t(i) ORDER BY event_id
      ) TO '{out}/events.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
      COPY (
        SELECT i AS c_custkey,
               'Customer#' || lpad(CAST(i AS VARCHAR), 9, '0') AS c_name,
               CAST(hash(i * 41 + 31) % 25 AS INT) AS c_nationkey,
               ROUND(CAST(hash(i * 43 + 32) % 1000000 AS DOUBLE) / 100.0, 2) AS c_acctbal,
               (['FURNITURE','AUTOMOBILE','BUILDING','MACHINERY','HOUSEHOLD'])[
                   1 + CAST(hash(i * 47 + 33) % 5 AS INT)] AS c_mktsegment
        FROM range({n_cust}) t(i) ORDER BY c_custkey
      ) TO '{out}/customer.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
      COPY (
        SELECT i AS o_orderkey,
               CAST(hash(i * 59 + 41) % {n_cust} AS BIGINT) AS o_custkey,
               (['O','F','P'])[1 + CAST(hash(i * 61 + 42) % 3 AS INT)] AS o_orderstatus,
               ROUND(1000.0 + CAST(hash(i * 67 + 43) % 49900000 AS DOUBLE) / 100.0, 2)
                   AS o_totalprice,
               TIMESTAMP '1995-01-01'
                 + INTERVAL (CAST(hash(i * 71 + 44) % 2404 AS INT)) DAY AS o_orderdate,
               (['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'])[
                   1 + CAST(hash(i * 73 + 45) % 5 AS INT)] AS o_orderpriority
        FROM range({n_orders}) t(i) ORDER BY o_orderkey
      ) TO '{out}/orders.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
      COPY (
        SELECT CAST(hash(i * 79 + 51) % {n_orders} AS BIGINT) AS l_orderkey,
               CAST(hash(i * 83 + 52) % {n_part} AS BIGINT) AS l_partkey,
               CAST(hash(i * 89 + 53) % {n_supp} AS BIGINT) AS l_suppkey,
               1 + CAST(hash(i * 97 + 54) % 7 AS INT) AS l_linenumber,
               CAST(1 + hash(i * 101 + 55) % 50 AS DOUBLE) AS l_quantity,
               ROUND(CAST(hash(i * 103 + 56) % 10000000 AS DOUBLE) / 100.0, 2)
                   AS l_extendedprice,
               ROUND(CAST(hash(i * 107 + 57) % 11 AS DOUBLE) / 100.0, 2) AS l_discount,
               ROUND(CAST(hash(i * 109 + 58) % 9 AS DOUBLE) / 100.0, 2) AS l_tax,
               (['N','R','A'])[1 + CAST(hash(i * 113 + 59) % 3 AS INT)] AS l_returnflag,
               (['O','F'])[1 + CAST(hash(i * 127 + 60) % 2 AS INT)] AS l_linestatus,
               TIMESTAMP '1995-01-01'
                 + INTERVAL (CAST(hash(i * 131 + 61) % 2500 AS INT)) DAY AS l_shipdate
        FROM range({n_line}) t(i)
      ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
      COPY (
        SELECT i AS p_partkey,
               (['large','small','shiny','dull','red','green'])[
                   1 + CAST(hash(i * 137 + 71) % 6 AS INT)] || ' ' ||
               (['ring','box','case','drum','pipe'])[
                   1 + CAST(hash(i * 139 + 72) % 5 AS INT)] AS p_name,
               'Brand#' || CAST(hash(i * 149 + 73) % 10 AS VARCHAR) AS p_brand,
               (['LARGE','SMALL','MEDIUM','ECONOMY','PROMO'])[
                   1 + CAST(hash(i * 151 + 74) % 5 AS INT)] AS p_type,
               1 + CAST(hash(i * 157 + 75) % 50 AS INT) AS p_size,
               ROUND(900.0 + CAST(hash(i * 163 + 76) % 10000 AS DOUBLE) / 10.0, 2)
                   AS p_retailprice
        FROM range({n_part}) t(i) ORDER BY p_partkey
      ) TO '{out}/part.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
      COPY (
        SELECT i AS s_suppkey,
               'Supplier#' || lpad(CAST(i AS VARCHAR), 9, '0') AS s_name,
               CAST(hash(i * 167 + 81) % 25 AS INT) AS s_nationkey,
               ROUND(CAST(hash(i * 173 + 82) % 1000000 AS DOUBLE) / 100.0, 2) AS s_acctbal
        FROM range({n_supp}) t(i) ORDER BY s_suppkey
      ) TO '{out}/supplier.parquet' (FORMAT PARQUET)""")

    con.execute(f"""
      COPY (SELECT i AS n_nationkey, 'NATION_' || CAST(i AS VARCHAR) AS n_name,
                   CAST(i % 5 AS INT) AS n_regionkey
            FROM range(25) t(i)) TO '{out}/nation.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT i AS r_regionkey,
                   (['AFRICA','AMERICA','ASIA','EUROPE','MIDDLE EAST'])[
                       CAST(i AS INT) + 1] AS r_name
            FROM range(5) t(i)) TO '{out}/region.parquet' (FORMAT PARQUET)""")
    print(f"wrote {out}: docs={n_docs} orders={n_orders} lineitem={n_line} "
          f"events={n_events} customers={n_cust}")


if __name__ == "__main__":
    main()
