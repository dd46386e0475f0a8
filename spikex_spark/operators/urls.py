"""URL canonicalization + URL-level dedup for web-corpus pipelines.

The cheapest dedup signal in a crawl is the URL itself — but raw crawl
URLs differ in case, default ports, fragments, tracking parameters, and
query-parameter order while naming the same page. ``canonical_url``
normalizes those axes with pure Catalyst expressions (whole-stage
codegen, no Python), and ``url_dedup`` keeps one row per canonical form.

Normalization (conservative — nothing lossy like percent-decoding or
path collapsing):

* trim; drop the ``#fragment``
* lowercase scheme and authority (path/query case is significant)
* strip a leading ``www.`` from the host
* strip default ports (``http://…:80``, ``https://…:443``)
* empty path → ``/``
* drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``), sort the
  rest byte-wise, drop an empty ``?``
* strings without a ``scheme://authority`` prefix pass through untouched
  (opaque identifiers are not guessed at)

Scale: canonicalization is a narrow map (no shuffle); ``url_dedup`` is
one shuffle on the canonical key — the same shape as exact text dedup,
with map-side combine. ASCII byte order is assumed for the parameter
sort (crawl URLs are ASCII after the usual percent-encoding); the
DuckDB oracle (``url_canonical`` in __spark_entry__) re-implements every
step independently with RE2/list functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def canonical_url(col: Column) -> Column:
    u = F.regexp_replace(F.trim(col), "#.*$", "")
    raw_auth = F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = u.substr(F.length(raw_auth) + F.lit(1), F.lit(1 << 30))
    auth = F.lower(raw_auth)
    auth = F.regexp_replace(auth, "^(https?://)www\\.", "$1")
    auth = F.regexp_replace(auth, "^(http://[^/?#]*):80$", "$1")
    auth = F.regexp_replace(auth, "^(https://[^/?#]*):443$", "$1")
    path0 = F.regexp_extract(rest, "^([^?]*)", 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    qs = F.when(F.instr(rest, "?") > 0,
                rest.substr(F.instr(rest, "?") + F.lit(1), F.lit(1 << 30))
                ).otherwise(F.lit(""))
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.startswith("utm_")
        & ~p.startswith("gclid=") & ~p.startswith("fbclid="))
    qs2 = F.array_join(F.array_sort(params), "&")
    built = F.concat(
        auth, path,
        F.when(qs2 != "", F.concat(F.lit("?"), qs2)).otherwise(F.lit("")))
    return F.when(raw_auth == "", u).otherwise(built)


def canonicalize_urls(df: DataFrame, url_col: str,
                      out_col: str = "canonical_url") -> DataFrame:
    """Append ``out_col`` with the canonical form of ``url_col``."""
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_dedup(df: DataFrame, url_col: str, id_col: str,
              keep_col: "str | None" = None) -> DataFrame:
    """Dedup on the canonical URL (smallest ``id_col`` wins, deterministic).

    With ``keep_col`` the full frame comes back carrying a boolean flag
    instead of being filtered — the auditable form a corpus pipeline
    writes so dropped rows stay explainable.
    """
    canon = canonicalize_urls(df, url_col)
    w = Window.partitionBy("canonical_url").orderBy(F.col(id_col))
    flagged = canon.withColumn("_rn", F.row_number().over(w))
    if keep_col is not None:
        return flagged.withColumn(keep_col, F.col("_rn") == 1).drop("_rn")
    return flagged.where(F.col("_rn") == 1).drop("_rn")


def url_path_templates(df: DataFrame, url_col: str) -> DataFrame:
    """(template, n_urls, example_url): templated URL skeletons — the
    crawl-ops view that exposes infinite URL spaces (calendars, session
    ids, paginated facets) before they eat the frontier. Derivation,
    applied in THIS order in both engines (digits are hex chars, so hex
    collapses first):

    1. strip the fragment (``#…``)
    2. mask query values: ``=value`` → ``={v}`` (keys survive — the
       key SET is the template; values are the infinite part)
    3. collapse ≥8-char lowercase-hex runs → ``{h}`` (session/content
       hashes)
    4. collapse digit runs → ``{d}`` (ids, dates, page numbers)

    Pure Catalyst string ops, one groupBy; example = min(url) for a
    deterministic representative.
    """
    t = F.regexp_replace(F.col(url_col), "#.*$", "")
    t = F.regexp_replace(t, "=[^&#]*", "={v}")
    t = F.regexp_replace(t, "[0-9a-f]{8,}", "{h}")
    t = F.regexp_replace(t, "[0-9]+", "{d}")
    return (df.select(t.alias("template"), F.col(url_col).alias("u"))
            .groupBy("template")
            .agg(F.count("*").cast("long").alias("n_urls"),
                 F.min("u").alias("example_url")))
