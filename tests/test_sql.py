"""Parallel SQL handler (search/sql.py vs SQLHandler.java semantics)."""

from __future__ import annotations

import struct

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


@pytest.fixture(scope="module")
def tables(docs):
    return {"documents": docs}


def _run(sql, tables, **kw):
    from lucene_solr_spark.search.sql import sql_stream

    return sql_stream(sql, tables, **kw)


# ---------------------------------------------------------------------------
# parse + error surface (messages verbatim from SQLHandler.java)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "sql,msg",
    [
        ("SELECT lang FROM documents GROUP BY lang",
         "atleast one aggregate function"),
        ("SELECT count(*) FROM documents",
         "Aggregate functions only supported with group by"),
        ("SELECT * FROM documents", "not supported for column selection"),
        ("SELECT doc_id FROM documents",
         "order by is required for unlimited select"),
        ("SELECT median(n_chars) FROM documents GROUP BY lang",
         "Invalid function: median"),
        ("SELECT score, doc_id FROM documents ORDER BY score desc",
         "score is not a valid field for unlimited"),
    ],
)
def test_error_surface(sql, msg, tables):
    from lucene_solr_spark.search.sql import SQLParseError

    with pytest.raises(SQLParseError, match=msg):
        _run(sql, tables)


def test_where_inequality_raises(tables):
    from lucene_solr_spark.search.sql import SQLParseError

    with pytest.raises(SQLParseError, match="unsupported WHERE comparison"):
        _run(
            "SELECT doc_id FROM documents WHERE n_chars > 100 "
            "ORDER BY doc_id asc LIMIT 5",
            tables,
        ).collect()


# ---------------------------------------------------------------------------
# select path
# ---------------------------------------------------------------------------


def test_select_where_and_not_range(tables, docs):
    rows = _run(
        "SELECT doc_id, n_chars FROM documents WHERE "
        "(text = 'table' AND NOT text = 'dup') AND n_chars = '[100 TO 400]' "
        "ORDER BY n_chars desc, doc_id asc LIMIT 10",
        tables,
    ).collect()
    assert 0 < len(rows) <= 10
    assert all(100 <= r.n_chars <= 400 for r in rows)
    # reference: same predicate assembled by hand
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.jvm import standard_tokens_col

    t = docs.withColumn("_t", standard_tokens_col(F.col("text")))
    want = (
        t.filter(
            F.array_contains("_t", "table")
            & ~F.array_contains("_t", "dup")
            & F.col("n_chars").between(100, 400)
        )
        .select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(10)
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in want]


def test_select_phrase_where_matches_percolator(tables, docs):
    from lucene_solr_spark.search.percolate import percolate
    from lucene_solr_spark.search.query import PhraseQuery

    got = {
        r.doc_id
        for r in _run(
            "SELECT doc_id FROM documents WHERE text = 'table scan' "
            "ORDER BY doc_id asc",
            tables,
        ).collect()
    }
    want = {
        r.doc_id
        for r in percolate(
            docs, {"q": PhraseQuery(("table", "scan"))}
        ).collect()
    }
    assert got == want and got


def test_select_exclusive_range_and_or(tables, docs):
    rows = _run(
        "SELECT doc_id, lang FROM documents WHERE "
        "(lang = 'fr' OR lang = 'de') AND n_chars = '{100 TO 200}' "
        "ORDER BY doc_id asc",
        tables,
    ).collect()
    from pyspark.sql import functions as F

    want = (
        docs.filter(
            F.col("lang").isin("fr", "de")
            & (F.col("n_chars") > 100)
            & (F.col("n_chars") < 200)
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in want]


def test_non_text_predicates_push_down(tables):
    """The WHERE fq analog must reach the parquet scan: equality and
    range conjuncts on plain columns show up as PushedFilters."""
    plan = _run(
        "SELECT doc_id FROM documents WHERE lang = 'en' AND "
        "n_chars = '[100 TO *]' ORDER BY doc_id asc LIMIT 5",
        tables,
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "EqualTo(lang,en)" in pushed
    assert "GreaterThanOrEqual(n_chars,100)" in pushed


# ---------------------------------------------------------------------------
# group-by path
# ---------------------------------------------------------------------------


def test_group_by_metrics_and_having(tables, docs):
    rows = _run(
        "SELECT lang, count(*), sum(n_chars), min(n_chars), max(n_chars) "
        "FROM documents WHERE text = 'scan' GROUP BY lang "
        "HAVING count(*) > 2 AND sum(n_chars) >= 1000 "
        "ORDER BY sum(n_chars) desc LIMIT 3",
        tables,
    )
    assert rows.columns == [
        "lang", "count(*)", "sum(n_chars)", "min(n_chars)", "max(n_chars)"
    ]
    got = rows.collect()
    assert got
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.jvm import standard_tokens_col

    want = (
        docs.withColumn("_t", standard_tokens_col(F.col("text")))
        .filter(F.array_contains("_t", "scan"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("n_chars").alias("s"),
            F.min("n_chars").alias("mn"),
            F.max("n_chars").alias("mx"),
        )
        .filter((F.col("c") > 2) & (F.col("s") >= 1000))
        .orderBy(F.col("s").desc())
        .limit(3)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_group_by_having_or(tables):
    rows = _run(
        "SELECT lang, count(*) FROM documents GROUP BY lang "
        "HAVING count(*) < 5 OR count(*) >= 5 ORDER BY lang asc",
        tables,
    ).collect()
    all_rows = _run(
        "SELECT lang, count(*) FROM documents GROUP BY lang "
        "ORDER BY lang asc",
        tables,
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in all_rows]


def test_group_by_limit_without_order_by_is_dropped(tables, docs):
    """SQLHandler.java:218-232 wraps LimitStream only inside the
    sorts != null branch — LIMIT without ORDER BY is silently ignored."""
    n_langs = docs.select("lang").distinct().count()
    assert n_langs > 2
    rows = _run(
        "SELECT lang, count(*) FROM documents GROUP BY lang LIMIT 2",
        tables,
    ).collect()
    assert len(rows) == n_langs
    # and the output keeps the bucket sort
    assert [r.lang for r in rows] == sorted(r.lang for r in rows)


def test_group_by_rank_default_limit_100(tables, docs):
    """ORDER BY on a metric with no LIMIT ranks only the top 100
    (RankStream default, SQLHandler.java:219)."""
    assert docs.count() > 100
    rows = _run(
        "SELECT doc_id, count(*) FROM documents GROUP BY doc_id "
        "ORDER BY count(*) desc",
        tables,
    ).collect()
    assert len(rows) == 100


def test_group_by_sorts_equal_no_default_limit(tables, docs):
    """ORDER BY matching the buckets keeps the bucket sort and applies
    NO default limit (sortsEqual branch)."""
    n = docs.count()
    rows = _run(
        "SELECT doc_id, count(*) FROM documents GROUP BY doc_id "
        "ORDER BY doc_id asc",
        tables,
    ).collect()
    assert len(rows) == n
    rows2 = _run(
        "SELECT doc_id, count(*) FROM documents GROUP BY doc_id "
        "ORDER BY doc_id desc LIMIT 7",
        tables,
    ).collect()
    assert [r.doc_id for r in rows2] == sorted(
        (r.doc_id for r in rows), reverse=True
    )[:7]


def test_group_by_avg_metric(tables, docs):
    rows = _run(
        "SELECT lang, avg(n_chars), count(*) FROM documents "
        "GROUP BY lang ORDER BY lang asc",
        tables,
    ).collect()
    from pyspark.sql import functions as F

    want = {
        r.lang: (r.s, r.c)
        for r in docs.groupBy("lang")
        .agg(F.sum("n_chars").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in rows:
        s, c = want[r.lang]
        assert r["avg(n_chars)"] == pytest.approx(s / c, rel=1e-12)
        assert r["count(*)"] == c


# ---------------------------------------------------------------------------
# engine-backed score path
# ---------------------------------------------------------------------------


def test_sql_search_matches_engine(spark, docs_index):
    from lucene_solr_spark.search.parser import parse_query
    from lucene_solr_spark.search.searcher import IndexSearcher
    from lucene_solr_spark.search.sql import sql_search

    out, _ = docs_index
    s = IndexSearcher(spark, out)
    got = sql_search(
        s, "SELECT doc_id, score FROM ix WHERE text = 'table' LIMIT 5"
    ).collect()
    want = s.search(parse_query("(table)"), k=5).collect()
    assert [(r.doc_id, struct.pack("<f", r.score)) for r in got] == [
        (r.doc_id, struct.pack("<f", r.score)) for r in want
    ]


def test_sql_search_boolean_where(spark, docs_index):
    from lucene_solr_spark.search.parser import parse_query
    from lucene_solr_spark.search.searcher import IndexSearcher
    from lucene_solr_spark.search.sql import sql_search

    out, _ = docs_index
    s = IndexSearcher(spark, out)
    got = sql_search(
        s,
        "SELECT doc_id, score FROM ix WHERE "
        "(text = 'table' AND text = 'scan') AND NOT text = 'dup' LIMIT 5",
    ).collect()
    want = s.search(
        parse_query("(((table) AND (scan)) AND -(dup))"), k=5
    ).collect()
    assert [(r.doc_id, struct.pack("<f", r.score)) for r in got] == [
        (r.doc_id, struct.pack("<f", r.score)) for r in want
    ]
