"""URL canonicalization + URL-level dedup (ops/urls.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lucene_solr_spark.ops.urls import canonical_url, dedup_by_canonical_url

CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM:80/a/b/?utm_source=x&z=1&a=2#frag", "http://example.com/a/b?a=2&z=1"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("http://example.com:8080/p?fbclid=abc", "http://example.com:8080/p"),
    ("https://Sub.Example.com/path/", "https://sub.example.com/path"),
    ("https://example.com/p?b=2&a=1", "https://example.com/p?a=1&b=2"),
    ("https://example.com/p?gclid=1&msclkid=2&utm_campaign=c", "https://example.com/p"),
    ("https://example.com/?", "https://example.com/"),
    ("http://example.com/p?a=1&a=0", "http://example.com/p?a=0&a=1"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r["c"] for r in df.withColumn("c", canonical_url(F.col("url"))).collect()]
    assert got == [w for _, w in CASES]


def test_canonical_url_is_idempotent(spark):
    df = spark.createDataFrame([(w,) for _, w in CASES], ["url"])
    got = [r["c"] for r in df.withColumn("c", canonical_url(F.col("url"))).collect()]
    assert got == [w for _, w in CASES]


def test_dedup_by_canonical_url_first_capture_wins(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("https://example.com/p?b=2&a=1", t0 + dt.timedelta(hours=2)),
        ("https://Example.com/p/?a=1&b=2&utm_source=x", t0),  # earliest
        ("HTTPS://EXAMPLE.COM:443/p?a=1&b=2", t0 + dt.timedelta(hours=1)),
        ("https://example.com/q", t0),
    ]
    pages = spark.createDataFrame(rows, ["url", "warc_ts"])
    out = {
        r["canonical_url"]: r
        for r in dedup_by_canonical_url(pages).collect()
    }
    assert len(out) == 2
    p = out["https://example.com/p?a=1&b=2"]
    assert p["n_captures"] == 3
    assert p["warc_ts"] == t0
    assert p["url"] == "https://Example.com/p/?a=1&b=2&utm_source=x"
    assert out["https://example.com/q"]["n_captures"] == 1


def test_dedup_on_pages_fixture(spark):
    """Fixture urls are unique per row — dedup must be a no-op, and the
    plan must be one exchange on the canonical key."""
    from lucene_solr_spark.fixtures.pages import generate_pages

    pages = generate_pages(spark, 2000)
    out = dedup_by_canonical_url(pages)
    assert out.count() == 2000
    assert out.agg(F.max("n_captures")).collect()[0][0] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_malformed_urls_never_collapse_together(spark):
    """Scheme-less/unparseable URLs canonicalize to THEMSELVES (the
    parse_url NULL fallback) — without it every malformed capture
    would land in one NULL group and dedup to a single survivor."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("example.com/p", t0),
        ("not a url at all", t0),
        ("://broken", t0),
        ("https://ok.example.com/q", t0),
    ]
    pages = spark.createDataFrame(rows, ["url", "warc_ts"])
    out = dedup_by_canonical_url(pages).collect()
    assert len(out) == 4  # nothing collapsed
    canon = {r["url"]: r["canonical_url"] for r in out}
    assert canon["example.com/p"] == "example.com/p"
    assert canon["not a url at all"] == "not a url at all"
    assert canon["https://ok.example.com/q"] == "https://ok.example.com/q"
