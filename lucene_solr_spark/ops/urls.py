"""URL canonicalization + URL-level dedup for web-crawl corpora.

Reference semantics: crawl pipelines dedup page captures by canonical
URL before any content-level dedup (the reference's corpus tooling
keys its doc store by url — benchmark/byTask content sources feed one
doc per source url, benchmark/.../feeds/DocMaker.java). The
normalization rules below are the widely published crawl conventions
(RFC 3986 §6 syntax-based normalization plus tracking-param removal):

  - scheme and host lowercased
  - default ports dropped (:80 for http, :443 for https)
  - fragment dropped
  - tracking query params dropped (utm_*, gclid, fbclid, msclkid)
  - remaining query params sorted (order-insensitive equality)
  - trailing slash on a non-root path dropped

Scale design: everything is built-in expressions — parse_url +
split/filter/array_sort/array_join — so canonicalization is
whole-stage-codegen'd per row with NO Python and NO shuffle;
`dedup_by_canonical_url` then costs exactly one hash exchange on the
canonical key (the same shape as exact content dedup, ops/dedup.py).
First capture wins (min warc_ts, url as tiebreak), the crawl
convention for re-fetches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAMS = ("utm_", "gclid", "fbclid", "msclkid")


def _clean_query(url: Column) -> Column:
    """Sorted, tracking-free query string ('' if none survives)."""
    q = F.try_parse_url(url, F.lit("QUERY"))
    parts = F.split(q, "&")
    kept = F.filter(
        parts,
        lambda p: (
            (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("gclid=")
            & ~p.startswith("fbclid=")
            & ~p.startswith("msclkid=")
        ),
    )
    return F.when(
        q.isNull() | (F.size(kept) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&")))


def canonical_url(url: Column) -> Column:
    """Canonical form of `url` (pure built-in expressions, codegen'd)."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    # HOST excludes the port; extract the port from AUTHORITY
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    authority = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    # strip trailing slash on non-root paths
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    built = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        _clean_query(url),
    )
    # A scheme-less or unparseable URL makes parse_url return NULL and
    # the concat above NULL out — which would collapse EVERY malformed
    # capture into one NULL dedup group (keeping a single survivor).
    # Malformed URLs canonicalize to themselves instead: they dedup
    # only on exact equality, never against each other.
    return F.coalesce(built, url)


def dedup_by_canonical_url(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """One row per canonical URL: the earliest capture wins.

    Returns (canonical_url, url, <ts_col>, n_captures) — `url` is the
    winning raw capture. One exchange on canonical_url; the argmin is
    a struct-min (no window/sort), so partial aggregation applies
    map-side before the shuffle.
    """
    canon = pages.withColumn("canonical_url", canonical_url(F.col(url_col)))
    pick = F.min(F.struct(F.col(ts_col), F.col(url_col))).alias("w")
    return (
        canon.groupBy("canonical_url")
        .agg(pick, F.count(F.lit(1)).cast("long").alias("n_captures"))
        .select(
            "canonical_url",
            F.col(f"w.{url_col}").alias("url"),
            F.col(f"w.{ts_col}").alias(ts_col),
            "n_captures",
        )
    )
