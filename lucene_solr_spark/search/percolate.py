"""Percolator: match a document STREAM against a registered query set.

Reversed search — the classic use of the reference's MemoryIndex
(`lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java:191`: "a simple non-persistent in-memory index ...
e.g. as used in filtering/routing/classification of document streams"
— one in-memory index per document, every saved query run against it).

Spark-first inversion: instead of building a per-document index, each
registered query COMPILES to a boolean Column expression over the
document's analyzed token array, and the whole query set becomes ONE
projection evaluated per row:

- **map-only** — no join, no shuffle, no state. The operator is a pure
  per-row expression tree inside whole-stage codegen, so it runs
  unchanged on a Structured Streaming DataFrame (stateless
  transformation: no watermark, no aggregation) and scales linearly
  with the doc stream at any cluster size — the right 100 TB shape for
  routing/alerting.
- Query compilation mirrors the engine's semantics: analysis =
  the standard chain (`standard_tokens_pos_col` — positions keep
  stop-gap holes, FilteringTokenFilter semantics), TermQuery =
  membership, BooleanAnd = conjunction, BooleanOr = >= msm matches
  (MinShouldMatchSumScorer's matching criterion), PhraseQuery =
  consecutive adjusted positions (ExactPhraseScorer.java:27), so a doc
  matches a percolated query iff `IndexSearcher.search` over an index
  of that one doc would return it.
- For query sets in the thousands+, the expression tree per row stops
  being the right shape — switch to the inverted formulation (explode
  doc terms, join a (query_id, term) table, group by doc+query with
  per-kind match criteria). That variant shuffles on doc_id and is
  deliberately NOT the default; this module targets the
  saved-search/alerting cardinality (tens to hundreds of queries,
  constant-folded like the reference's compiled query cache).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.search.query import (
    BooleanAnd,
    BooleanOr,
    PhraseQuery,
    Query,
    TermQuery,
)


def _contains(terms: Column, t: str) -> Column:
    return F.array_contains(terms, t)


def _compile(q: Query, tp: Column, terms: Column) -> Column:
    """Compile one registered query to a boolean Column over the
    analyzed token-position array `tp` (array<struct<term,pos>>) and
    its projected term array `terms`."""
    if isinstance(q, TermQuery):
        if q.field is not None:
            raise ValueError("percolate: only default-field queries")
        return _contains(terms, q.term)
    if isinstance(q, BooleanAnd):
        pred = _contains(terms, q.must[0])
        for t in q.must[1:]:
            pred = pred & _contains(terms, t)
        return pred
    if isinstance(q, BooleanOr):
        n = None
        for t in q.should:
            c = _contains(terms, t).cast("int")
            n = c if n is None else n + c
        return n >= F.lit(int(q.min_should_match))
    if isinstance(q, PhraseQuery):
        if getattr(q, "slop", 0):
            raise ValueError("percolate: exact phrases only (slop=0)")
        seq = list(q.phrase)

        def at_offset(t, j, s):
            return lambda e: (e["term"] == t) & (e["pos"] == s["pos"] + j)

        def anchor(s):
            pred = s["term"] == seq[0]
            for j, t in enumerate(seq[1:], start=1):
                pred = pred & F.exists(tp, at_offset(t, j, s))
            return pred

        return F.exists(tp, anchor)
    raise ValueError(f"percolate: unsupported query type {type(q).__name__}")


def percolate(
    docs: DataFrame,
    queries: dict[str, Query],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Return (id_col, query_id) rows — one per (document, matching
    registered query). Works identically on batch and streaming
    DataFrames (stateless projection + explode)."""
    # deferred: analysis.jvm builds its stopword literal array at
    # import, which needs an active SparkContext
    from lucene_solr_spark.analysis.jvm import standard_tokens_pos_col

    tp = standard_tokens_pos_col(F.col(text_col))
    d = docs.withColumn("_tp", tp).withColumn(
        "_terms", F.transform(F.col("_tp"), lambda s: s["term"])
    )
    hits = F.array(
        *[
            F.when(
                _compile(q, F.col("_tp"), F.col("_terms")), F.lit(qid)
            )
            for qid, q in queries.items()
        ]
    )
    return (
        d.withColumn(
            "query_id", F.explode(F.filter(hits, lambda x: x.isNotNull()))
        )
        .select(id_col, "query_id")
    )
