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


def test_word_breaks_splits_runtogether(searcher):
    from lucene_solr_spark.search.spellcheck import word_breaks

    rows = word_breaks(searcher._term_stats, "tablescan", k=5).collect()
    assert [(r.left, r.right) for r in rows] == [("table", "scan")]
    assert rows[0].split_pos == 5
    assert rows[0].left_df > 0 and rows[0].right_df > 0


def test_word_breaks_in_dictionary_word_suppressed(searcher):
    """SUGGEST_WHEN_NOT_IN_INDEX (WordBreakSpellChecker.java:112-114):
    a word already in the index yields nothing — unless suggest_always."""
    from lucene_solr_spark.search.spellcheck import word_breaks

    assert word_breaks(searcher._term_stats, "table", k=5).count() == 0
    # no split of 'table' has both halves in this dictionary either way
    assert (
        word_breaks(searcher._term_stats, "table", k=5, suggest_always=True)
        .count() == 0
    )


def test_word_breaks_ranking_max_freq_desc(searcher):
    """Multi-split word: ranked by max(component df) desc
    (NUM_CHANGES_THEN_MAX_FREQUENCY, WordBreakSpellChecker.java:103)."""
    from lucene_solr_spark.search.spellcheck import word_breaks

    rows = word_breaks(searcher._term_stats, "fastslow", k=5).collect()
    assert [(r.left, r.right) for r in rows] == [("fast", "slow")]


def test_word_combinations_adjacent_pairs(searcher):
    from lucene_solr_spark.search.spellcheck import word_combinations

    rows = word_combinations(
        searcher._term_stats, ["win", "dow", "vec", "tor"], k=5
    ).collect()
    assert {r.combined for r in rows} == {"window", "vector"}
    keys = [(-r.combined_df, r.pair_pos) for r in rows]
    assert keys == sorted(keys)
    # non-adjacent fragments never combine
    assert all(r.pair_pos in (0, 2) for r in rows)


def test_word_combinations_not_in_index_mode(searcher):
    """A pair whose components are BOTH dictionary words is not a
    combination candidate (WordBreakSpellChecker.java:223-224) unless
    suggest_always."""
    from lucene_solr_spark.search.spellcheck import word_combinations

    # 'table'+'scan' -> 'tablescan' is not a dictionary term: no rows
    assert (
        word_combinations(searcher._term_stats, ["table", "scan"], k=5)
        .count() == 0
    )
    # 'win'+'dow' -> 'window' IS a term and components are absent: kept
    rows = word_combinations(searcher._term_stats, ["win", "dow"], k=5)
    assert rows.count() == 1


def test_freetext_suggest_bigram_and_backoff(spark):
    from lucene_solr_spark.search.suggest import freetext_suggest

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "the dog sat"),
            (4, "zebra alone"),
        ],
        "doc_id long, text string",
    )
    got = {r.word: r.score for r in freetext_suggest(docs, "the", k=10).collect()}
    # bigram followers of "the": cat x2, dog x1 (ctx total = 3)
    assert got["cat"] == round(2 / 3, 6)
    assert got["dog"] == round(1 / 3, 6)
    # never follows "the" -> stupid backoff to alpha * unigram MLE
    total = 11.0  # tokens across the corpus
    assert got["zebra"] == round(0.4 * (1 / total), 6)
    assert got["sat"] == round(0.4 * (2 / total), 6)
    # ranking: bigram paths dominate, ties break word-asc
    order = [r.word for r in freetext_suggest(docs, "the", k=4).collect()]
    assert order[:2] == ["cat", "dog"]


def test_freetext_suggest_unseen_context_backs_off_everything(spark):
    from lucene_solr_spark.search.suggest import freetext_suggest

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = freetext_suggest(docs, "zzz", k=10).collect()
    # no bigram starts with zzz -> every candidate scored by backoff
    assert {r.word for r in rows} == {"a", "b", "c"}
    assert rows[0].word == "b"  # highest unigram count wins
    assert all(r.score <= 0.4 for r in rows)
