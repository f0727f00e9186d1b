"""EarlyTerminatingCollector analog (solr/.../search/
EarlyTerminatingCollector.java:33-78): per-shard docID-order collection
budget — collection stops after `max_docs_per_shard` live matches, only
collected docs are scored.

Checks:
- with a budget >= every shard's match count the collected set is the
  FULL match set and top-k is bitwise the normal engine's;
- with a small budget the collected set is exactly the docID-order
  prefix of each shard's match set, and every collected doc's score is
  bitwise the full engine's score for that doc;
- the (n_collected, n_scanned) counters follow
  EarlyTerminatingCollectorException.java:29-57;
- minShouldMatch restricts what consumes budget (the delegate only
  sees docs matching >= msm clauses).
"""

import numpy as np
import pytest

from lucene_solr_spark.search.query import BooleanAnd, BooleanOr, TermQuery
from lucene_solr_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, docs_index):
    out, _ = docs_index
    return IndexSearcher(spark, out)


def _hits(df):
    return [(r.doc_id, np.float32(r.score).tobytes()) for r in df.collect()]


QUERIES = [
    TermQuery("table"),
    BooleanAnd(("scan", "table")),
    BooleanOr(("customer", "spark", "vector")),
]


@pytest.mark.parametrize("q", QUERIES, ids=["term", "and", "or"])
def test_big_budget_matches_full_search(searcher, q):
    full = _hits(searcher.search(q, k=10))
    et = _hits(searcher.search_early_terminated(q, k=10,
                                                max_docs_per_shard=10**6))
    assert et == full


@pytest.mark.parametrize("q", QUERIES, ids=["term", "and", "or"])
def test_small_budget_is_docid_prefix_with_exact_scores(searcher, q):
    budget = 7
    # full collected frame (huge budget) = the reference match set,
    # with the engine's own shard assignment and exact scores
    ref = searcher.early_terminated_frame(q, 10**6).toPandas()
    cut = searcher.early_terminated_frame(q, budget).toPandas()
    assert len(cut) > 0
    full_scores = dict(zip(ref.doc_id, ref.score))
    for shard, grp in cut.groupby("shard"):
        want = np.sort(
            ref.loc[ref.shard == shard, "doc_id"].to_numpy()
        )[:budget]
        got = np.sort(grp.doc_id.to_numpy())
        assert np.array_equal(got, want), (shard, got, want)
        assert (grp.n_collected == len(want)).all()
        # scores bitwise the full engine's
        for d, s in zip(grp.doc_id, grp.score):
            assert np.float32(s).tobytes() == np.float32(
                full_scores[d]
            ).tobytes(), (shard, d)


def test_counters(searcher):
    q = TermQuery("table")
    budget = 5
    ref = searcher.early_terminated_frame(q, 10**6).toPandas()
    cut = searcher.early_terminated_frame(q, budget).toPandas()
    for shard, grp in cut.groupby("shard"):
        n_match = int((ref.shard == shard).sum())
        nc = int(grp.n_collected.iloc[0])
        ns = int(grp.n_scanned.iloc[0])
        assert nc == min(budget, n_match)
        if n_match > budget:
            # stopped mid-shard: scan position = last collected
            # local docID + 1 (exception's docID bookkeeping)
            assert ns >= nc
        else:
            # shard exhausted: n_scanned = shard maxDoc
            assert ns >= n_match


def test_msm_restricts_budget_consumption(searcher):
    q = BooleanOr(("customer", "spark", "vector"), min_should_match=2)
    full = _hits(searcher.search(q, k=10))
    et = _hits(searcher.search_early_terminated(q, k=10,
                                                max_docs_per_shard=10**6))
    assert et == full
    # small budget: collected docs all match >= 2 clauses
    cut = searcher.early_terminated_frame(q, 3).toPandas()
    ref = searcher.early_terminated_frame(q, 10**6).toPandas()
    assert set(cut.doc_id).issubset(set(ref.doc_id))


def test_budget_validation(searcher):
    with pytest.raises(ValueError):
        searcher.early_terminated_frame(TermQuery("table"), 0)
