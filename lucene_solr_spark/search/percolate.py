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
  being the right shape — `percolate_inverted` is the scale
  formulation (explode doc terms, broadcast-join the (query_id, term)
  registry, one (doc, query) hash aggregation against per-kind match
  criteria). `percolate` stays the default for the saved-search/
  alerting cardinality (tens to hundreds of queries, constant-folded
  like the reference's compiled query cache) and is the only path for
  positional (phrase) queries.
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


def percolate_inverted(
    docs: DataFrame,
    queries: dict[str, Query],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The scale formulation for LARGE registries (1000s+ of saved
    queries), where a constant-folded expression tree per row stops
    being reasonable: invert the registry into a (query_id, term)
    table and MATCH BY JOIN.

    Shape: docs project to exploded DISTINCT (doc, term) pairs; inner
    join the **broadcast** registry term table (the registry is always
    tiny next to the corpus — broadcasting it keeps the join
    shuffle-free on the doc side); one (doc_id, query_id) hash
    aggregation counts matched terms; a broadcast join against the
    per-query criterion (AND: all n terms; OR: >= msm; term: 1)
    filters to matches. ONE shuffle total (the count), partitioned by
    (doc, query) — no skew pivot, scales linearly in corpus size.

    Term/AND/OR(msm) only — positional queries (phrases) stay on the
    compiled-expression path of `percolate()`, which is exact and
    map-only. Parity between the two formulations is pytest-pinned."""
    from lucene_solr_spark.analysis.jvm import standard_tokens_col

    spark = docs.sparkSession
    term_rows, crit_rows = [], []
    for qid, q in queries.items():
        if isinstance(q, TermQuery):
            if q.field is not None:
                raise ValueError("percolate: only default-field queries")
            ts, need = [q.term], 1
        elif isinstance(q, BooleanAnd):
            ts = list(dict.fromkeys(q.must))
            need = len(ts)
        elif isinstance(q, BooleanOr):
            ts = list(dict.fromkeys(q.should))
            need = int(q.min_should_match)
        else:
            raise ValueError(
                f"percolate_inverted: positional/unsupported query "
                f"{type(q).__name__} — use percolate()"
            )
        term_rows += [(qid, t) for t in ts]
        crit_rows.append((qid, need))
    qt = spark.createDataFrame(term_rows, "query_id string, term string")
    crit = spark.createDataFrame(crit_rows, "query_id string, need int")
    d = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(standard_tokens_col(F.col(text_col)))
        ).alias("term"),
    )
    return (
        d.join(F.broadcast(qt), "term")
        .groupBy(id_col, "query_id")
        .agg(F.count("*").alias("_m"))
        .join(F.broadcast(crit), "query_id")
        .filter(F.col("_m") >= F.col("need"))
        .select(id_col, "query_id")
    )
