"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship ER query (near-dup clustering) on sf0.001.
``queries()``     — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()``  — DuckDB-runnable ANSI SQL mirror for each query.

The Spark and SQL sides share exact conventions (md5-based MinHash, DuckDB-
calibrated Jaro-Winkler, explicit ASCII whitespace classes) so value-hashes
match bit-for-bit; floats are rounded before comparison.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect) mirroring spikex_spark conventions
# ---------------------------------------------------------------------------

# word-strip normalization (blocking._norm_tokens): split on [_ ]+, strip
# non-alnum per token, drop empties, join with ' '
_SQL_NORM_WS = (
    "array_to_string(list_filter(list_transform("
    "regexp_split_to_array(lower({col}), '[_ ]+'),"
    " t -> regexp_replace(t, '[^a-z0-9]+', '', 'g')), t -> t <> ''), ' ')"
)
# scoring normalization (scoring._norm): non-alnum runs -> single space, trim
_SQL_NORM_SCORE = "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"
# token set for jaccard (textutils.tokenize)
_SQL_TOKENS = (
    "list_distinct(list_filter(regexp_split_to_array(lower({col}),"
    " '[^a-z0-9]+'), t -> t <> ''))"
)

_SQL_SHINGLES = f"""
WITH n AS (
  SELECT doc_id, {_SQL_NORM_WS.format(col='text')} AS norm FROM documents
),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN length(norm) < 5 THEN [norm]
         ELSE list_distinct(list_transform(range(1, length(norm) - 3),
                                           i -> substr(norm, i, 5)))
    END) AS shingle
  FROM n
)
SELECT doc_id, shingle FROM sh WHERE shingle <> ''
"""

_N_HASHES = 16
_BANDS = 4
_RPB = _N_HASHES // _BANDS

_SQL_MINHASH = (
    "WITH shingles AS (" + _SQL_SHINGLES + ")\nSELECT doc_id, "
    + ", ".join(
        f"min(md5('{s}:' || shingle)) AS mh{s}" for s in range(_N_HASHES)
    )
    + " FROM shingles GROUP BY doc_id"
)

_SQL_BUCKETS = (
    "WITH mh AS (" + _SQL_MINHASH + ")\n"
    + "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(
            f"'{s}=' || mh{s}" for s in range(b * _RPB, (b + 1) * _RPB)
        )
        + ") AS bucket FROM mh"
        for b in range(_BANDS)
    )
)

_SQL_CAND_PAIRS = f"""
WITH buckets AS ({_SQL_BUCKETS})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""

_SQL_SCORED = f"""
WITH pairs AS ({_SQL_CAND_PAIRS}),
t AS (SELECT doc_id, text FROM documents)
SELECT p.id_a, p.id_b,
  jaro_winkler_similarity(
      left({_SQL_NORM_SCORE.format(col='ta.text')}, 64),
      left({_SQL_NORM_SCORE.format(col='tb.text')}, 64)) AS jw,
  (CASE
    WHEN len({_SQL_TOKENS.format(col='ta.text')}) = 0
         AND len({_SQL_TOKENS.format(col='tb.text')}) = 0 THEN 1.0
    ELSE len(list_intersect({_SQL_TOKENS.format(col='ta.text')},
                            {_SQL_TOKENS.format(col='tb.text')}))::double
         / (len({_SQL_TOKENS.format(col='ta.text')})
            + len({_SQL_TOKENS.format(col='tb.text')})
            - len(list_intersect({_SQL_TOKENS.format(col='ta.text')},
                                 {_SQL_TOKENS.format(col='tb.text')})))
  END) AS jacc
FROM pairs p
JOIN t ta ON ta.doc_id = p.id_a
JOIN t tb ON tb.doc_id = p.id_b
"""

_SQL_ER_PAIRS = f"""
WITH s AS ({_SQL_SCORED})
SELECT id_a, id_b, round(0.5 * jw + 0.5 * jacc, 4) AS score
FROM s
"""

_SQL_ER_CLUSTERS = f"""
WITH RECURSIVE s AS ({_SQL_SCORED}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM s
  WHERE round(0.5 * jw + 0.5 * jacc, 6) >= 0.80  -- raw components, one round
),
ids AS (SELECT DISTINCT doc_id FROM documents),
reach AS (
  SELECT doc_id AS node, doc_id AS root FROM ids
  UNION
  SELECT CASE WHEN e.src = r.node THEN e.dst ELSE e.src END, r.root
  FROM reach r JOIN edges e ON e.src = r.node OR e.dst = r.node
)
SELECT node AS doc_id, min(root) AS cluster_id
FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# Spark query implementations
# ---------------------------------------------------------------------------

def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _q_er_doc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spikex_spark.pipeline import resolve_documents
    docs = _read(spark, sf_dir, "documents")
    return resolve_documents(docs, threshold=0.80)


def _q_er_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spikex_spark.pipeline import doc_scored_pairs
    docs = _read(spark, sf_dir, "documents")
    return doc_scored_pairs(docs, score_digits=4).select("id_a", "id_b", "score")


def _q_extract_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spikex_spark.extract import extract_native
    docs = _read(spark, sf_dir, "documents")
    return extract_native(docs, "text", "extracted").select("doc_id", "extracted")


def _q_blocking_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spikex_spark.operators.blocking import _norm_tokens
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.array_join(_norm_tokens(F.col("text")), " ").alias("block_key")
    )


def _q_minhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spikex_spark.operators import blocking as B
    docs = _read(spark, sf_dir, "documents")
    sig = B.minhash_signatures(B.shingle_df(docs, "doc_id", "text", k=5), 16)
    return B.lsh_buckets(sig, bands=4, rows_per_band=4).select(
        F.col("id").alias("doc_id"), "band", "bucket"
    )


def _q_shingle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spikex_spark.operators import blocking as B
    docs = _read(spark, sf_dir, "documents")
    return (
        B.shingle_df(docs, "doc_id", "text", k=5)
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.count("*").alias("n_shingles"))
    )


def _q_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2 (semi-join): customers that have at least one order
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def _q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J3 (anti-join dedup): customers with no orders
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def _q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O5 (top-k per key): top-3 orders by totalprice per customer
    from pyspark.sql import Window
    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
    )


def _q_running_max_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O2-style (running max over window): per user, running max of value
    from pyspark.sql import Window
    ev = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id", "event_id",
        F.round(F.max("value").over(w), 6).alias("running_max"),
    )


def _q_group_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2/A5-style hash agg with partial (map-side) aggregation
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _q_group_collect_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1 (group values by key, collect sorted list) on nation/region
    nation = _read(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "er_doc_clusters": _q_er_doc_clusters,
        "er_doc_pairs": _q_er_doc_pairs,
        "extract_normalize": _q_extract_normalize,
        "blocking_keys": _q_blocking_keys,
        "minhash_buckets": _q_minhash_buckets,
        "shingle_count": _q_shingle_count,
        "semi_join_orders": _q_semi_join_orders,
        "anti_join_customers": _q_anti_join_customers,
        "topk_orders": _q_topk_orders,
        "running_max_events": _q_running_max_events,
        "group_agg_events": _q_group_agg_events,
        "group_collect_titles": _q_group_collect_titles,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "er_doc_clusters": _SQL_ER_CLUSTERS,
        "er_doc_pairs": _SQL_ER_PAIRS,
        "extract_normalize": (
            "SELECT doc_id, regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]', '_', 'g')"
            " AS extracted FROM documents"
        ),
        "blocking_keys": (
            "SELECT doc_id, " + _SQL_NORM_WS.format(col="text")
            + " AS block_key FROM documents"
        ),
        "minhash_buckets": _SQL_BUCKETS,
        "shingle_count": (
            "WITH sh AS (" + _SQL_SHINGLES + ") "
            "SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id"
        ),
        "semi_join_orders": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
        ),
        "anti_join_customers": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
        ),
        "topk_orders": (
            "SELECT o_custkey, o_orderkey, rk FROM ("
            " SELECT o_custkey, o_orderkey, row_number() OVER ("
            "  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey"
            " ) AS rk FROM orders) WHERE rk <= 3"
        ),
        "running_max_events": (
            "SELECT user_id, event_id, round(max(value) OVER ("
            " PARTITION BY user_id ORDER BY ts, event_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)"
            " AS running_max FROM events"
        ),
        "group_agg_events": (
            "SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value,"
            " count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type"
        ),
        "group_collect_titles": (
            "SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',')"
            " AS names FROM nation GROUP BY n_regionkey"
        ),
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-dup entity clusters over sf0.001 documents."""
    return _q_er_doc_clusters(spark, SF_DEFAULT)
