"""SpellCheckCollator analog (search/spellcheck.py) — correction
ranking and verified collation."""

from __future__ import annotations

import pytest

from lucene_solr_spark.search.query import BooleanAnd
from lucene_solr_spark.search.searcher import IndexSearcher
from lucene_solr_spark.search.spellcheck import collate, suggestions


@pytest.fixture(scope="module")
def searcher(spark, docs_index):
    out, _ = docs_index
    return IndexSearcher(spark, out)


def test_suggestions_rank_dist_then_df(searcher):
    rows = suggestions(searcher._term_stats, ["tabel"], k=5).collect()
    assert rows, "dictionary has corrections within dist 2"
    # ranking invariant: (dist asc, df desc, term asc)
    keys = [(r.dist, -r.df, r.term) for r in rows]
    assert keys == sorted(keys)
    assert rows[0].term == "table"
    assert all(r.dist <= 2 for r in rows)


def test_suggestions_exact_word_is_own_best(searcher):
    rows = suggestions(searcher._term_stats, ["table"], k=1).collect()
    assert rows[0].term == "table" and rows[0].dist == 0


def test_collate_verified_hits(searcher, spark):
    row = collate(searcher, ["tabel", "scen"]).collect()[0]
    assert row.collated_query == "table scan"
    expect = searcher.search(BooleanAnd(("table", "scan")), k=None).count()
    assert row.n_hits == expect > 0


def test_collate_uncorrectable_word_passes_through(searcher):
    row = collate(searcher, ["zzzzzzzzzz", "table"]).collect()[0]
    assert row.collated_query.split()[0] == "zzzzzzzzzz"
    assert row.n_hits == 0
