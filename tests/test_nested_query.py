"""Nested BooleanQuery / boosts / QueryParser / sloppy phrase tests.

Equivalence contract: every flat query class must produce bitwise-
identical results when re-expressed as a nested BooleanQuery tree, and
parsed query strings must equal their programmatic counterparts
(QueryParserBase.java:114-118 semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.search.parser import parse_query
from lucene_solr_spark.search.query import (
    BooleanAnd,
    BooleanMustShould,
    BooleanNot,
    BooleanOr,
    BooleanQuery,
    BoostQuery,
    Clause,
    ConstantScoreQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)
from lucene_solr_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, docs_index):
    out, _ = docs_index
    return IndexSearcher(spark, out)


def hits(df):
    return [(r.doc_id, r.score) for r in df.collect()]


# ---------------------------------------------------------------------
# parser structure
# ---------------------------------------------------------------------


def test_parse_default_or():
    q = parse_query("table scan")
    assert q == BooleanQuery(
        (Clause("SHOULD", TermQuery("table")), Clause("SHOULD", TermQuery("scan")))
    )


def test_parse_and_retro_promotes():
    q = parse_query("table AND scan")
    assert q == BooleanQuery(
        (Clause("MUST", TermQuery("table")), Clause("MUST", TermQuery("scan")))
    )


def test_parse_mods_and_group():
    q = parse_query("+vector (table scan) -dup")
    assert q == BooleanQuery(
        (
            Clause("MUST", TermQuery("vector")),
            Clause(
                "SHOULD",
                BooleanQuery(
                    (
                        Clause("SHOULD", TermQuery("table")),
                        Clause("SHOULD", TermQuery("scan")),
                    )
                ),
            ),
            Clause("MUST_NOT", TermQuery("dup")),
        )
    )


def test_parse_single_clause_inlines():
    assert parse_query("table") == TermQuery("table")
    assert parse_query("(table)") == TermQuery("table")


def test_parse_stopword_drops():
    assert parse_query("the") is None
    # stopword clause vanishes, the rest survives
    assert parse_query("the table") == TermQuery("table")


def test_parse_analysis_lowercases():
    assert parse_query("Table") == TermQuery("table")


def test_parse_special_terms():
    assert parse_query("tabl~1") == FuzzyQuery("tabl", max_edits=1)
    assert parse_query("tabl~") == FuzzyQuery("tabl", max_edits=2)
    assert parse_query("sc*") == PrefixQuery("sc")
    assert parse_query("v?lue") == WildcardQuery("v?lue")
    assert parse_query('"table scan"') == PhraseQuery(("table", "scan"))
    assert parse_query('"table scan"~2') == PhraseQuery(("table", "scan"), slop=2)


def test_complex_phrase_parser():
    """ComplexPhraseQueryParser.java:309 — wildcard words inside a
    quoted phrase lift positionally via SpanMultiTermQueryWrapper into
    an ordered SpanNearQuery with the phrase slop; wildcard-free
    phrases fall back to classic PhraseQuery."""
    from lucene_solr_spark.search.parser import complex_phrase_query
    from lucene_solr_spark.search.query import (
        SpanMultiTermQueryWrapper,
        SpanNearQuery,
        SpanTermQuery,
    )

    q = complex_phrase_query('"ta* scan"~1')
    assert q == SpanNearQuery(
        (
            SpanMultiTermQueryWrapper(PrefixQuery("ta", max_expansions=50)),
            SpanTermQuery("scan"),
        ),
        1,
        True,
    )
    assert complex_phrase_query('"v?lue scan"').clauses[0] == (
        SpanMultiTermQueryWrapper(WildcardQuery("v?lue", max_expansions=50))
    )
    # no wildcard -> classic phrase path, identical to the base parser
    assert complex_phrase_query('"table scan"~2') == PhraseQuery(
        ("table", "scan"), slop=2
    )
    # field scope threads into both the wrapper's MTQ and the terms
    fq = complex_phrase_query('source:"sr* src1"')
    assert fq.clauses[0].query.field == "source"
    assert fq.clauses[1].field == "source"
    # in_order=False -> unordered near (setInOrder, :69-78)
    uq = complex_phrase_query('"ta* scan"', in_order=False)
    assert uq.in_order is False
    # boost wraps the span near
    bq = complex_phrase_query('"ta* scan"^2')
    assert isinstance(bq, BoostQuery) and bq.boost == 2.0


def test_parse_range_syntax():
    """QueryParser.jj Range production: '[' ']' inclusive, '{' '}'
    exclusive, '*' open bound, optional field prefix and boost;
    bounds lowercased, not analyzed."""
    from lucene_solr_spark.search.query import TermRangeQuery

    assert parse_query("[sc TO so]") == TermRangeQuery("sc", "so")
    assert parse_query("{sc TO so}") == TermRangeQuery(
        "sc", "so", include_lower=False, include_upper=False
    )
    assert parse_query("[A TO B]") == TermRangeQuery("a", "b")
    assert parse_query("[sc TO *]") == TermRangeQuery("sc", None)
    assert parse_query("[* TO so]") == TermRangeQuery(None, "so")
    assert parse_query("source:[src1 TO src3]") == TermRangeQuery(
        "src1", "src3", field="source"
    )
    assert parse_query("[sc TO so]^2") == BoostQuery(
        TermRangeQuery("sc", "so"), 2.0
    )
    q = parse_query("value AND [sc TO so]")
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == ["MUST", "MUST"]
    assert q.clauses[1].query == TermRangeQuery("sc", "so")


def test_parse_fielded_multiterm():
    """Fielded wildcard/prefix/fuzzy clauses (previously rejected by
    the parser subset) compile to field-scoped queries."""
    assert parse_query("source:src*") == PrefixQuery("src", field="source")
    assert parse_query("source:v?lue") == WildcardQuery(
        "v?lue", field="source"
    )
    assert parse_query("source:tabl~1") == FuzzyQuery(
        "tabl", max_edits=1, field="source"
    )


def test_parse_field_scoped_group_and_phrase():
    """QueryParser.jj Clause: `field:(...)` scopes the group's default
    field; `field:"phrase"` scopes a phrase; an explicit `f:term`
    inside a scoped group overrides the scope."""
    q = parse_query("source:(src1 src3)")
    assert isinstance(q, BooleanQuery)
    assert all(c.query.field == "source" for c in q.clauses)
    q2 = parse_query('text:"table scan"~2')
    assert q2 == PhraseQuery(("table", "scan"), slop=2, field="text")
    assert parse_query('source:"src3"') == TermQuery("src3", field="source")
    q3 = parse_query("source:(src1 f:x)")
    assert [c.query.field for c in q3.clauses] == ["source", "f"]
    q4 = parse_query("a:(b c)^2")
    assert isinstance(q4, BoostQuery) and q4.boost == 2.0
    # unscoped groups keep the default field
    q5 = parse_query("(table scan)")
    assert all(c.query.field is None for c in q5.clauses)


def test_parse_boosts():
    assert parse_query("table^2") == BoostQuery(TermQuery("table"), 2.0)
    q = parse_query("(table scan)^3 vector")
    assert isinstance(q, BooleanQuery)
    assert isinstance(q.clauses[0].query, BoostQuery)
    assert q.clauses[0].query.boost == 3.0


def test_parse_hyphenated_word_is_one_clause():
    """'-'/'+' are term characters mid-word (QueryParser.jj _TERM_CHAR);
    regression: 'state-of-the-art' must not compile to -art."""
    q = parse_query("state-of-the-art")
    # analyzer splits the hyphenated word; all clauses are SHOULD
    assert isinstance(q, BooleanQuery)
    assert all(c.occur == "SHOULD" for c in q.clauses)
    assert {c.query.term for c in q.clauses} == {"state", "art"}  # of/the stopped
    # leading '-' is still the NOT operator
    q2 = parse_query("table -scan")
    assert q2.clauses[1].occur == "MUST_NOT"


def test_parse_float_fuzzy_similarity():
    """Legacy '~0.8' float syntax maps via FuzzyQuery.floatToEdits
    (min((1-sim)*len, 2)) instead of mis-lexing into a bogus clause."""
    assert parse_query("tabl~0.5") == FuzzyQuery("tabl", max_edits=2)
    assert parse_query("tabl~0.9") == FuzzyQuery("tabl", max_edits=0)


def test_parse_not_keyword():
    q = parse_query("table NOT scan")
    assert q == BooleanQuery(
        (Clause("SHOULD", TermQuery("table")), Clause("MUST_NOT", TermQuery("scan")))
    )


# ---------------------------------------------------------------------
# engine equivalences (bitwise)
# ---------------------------------------------------------------------


def test_tree_equals_flat_and(searcher):
    flat = hits(searcher.search(BooleanAnd(("scan", "table")), k=30))
    tree = hits(
        searcher.search(
            BooleanQuery(
                (Clause("MUST", TermQuery("scan")), Clause("MUST", TermQuery("table")))
            ),
            k=30,
        )
    )
    assert flat == tree and len(flat) > 0


def test_tree_equals_flat_or(searcher):
    flat = hits(searcher.search(BooleanOr(("customer", "spark", "vector")), k=30))
    tree = hits(
        searcher.search(
            BooleanQuery(
                tuple(
                    Clause("SHOULD", TermQuery(t))
                    for t in ("customer", "spark", "vector")
                )
            ),
            k=30,
        )
    )
    assert flat == tree and len(flat) > 0


def test_tree_equals_flat_reqopt_and_not(searcher):
    flat = hits(searcher.search(BooleanMustShould(("vector",), ("table", "scan")), k=30))
    tree = hits(
        searcher.search(
            BooleanQuery(
                (
                    Clause("MUST", TermQuery("vector")),
                    Clause("SHOULD", TermQuery("table")),
                    Clause("SHOULD", TermQuery("scan")),
                )
            ),
            k=30,
        )
    )
    assert flat == tree and len(flat) > 0

    flat_not = hits(searcher.search(BooleanNot(("table",), ("scan",)), k=30))
    tree_not = hits(
        searcher.search(
            BooleanQuery(
                (
                    Clause("MUST", TermQuery("table")),
                    Clause("MUST_NOT", TermQuery("scan")),
                )
            ),
            k=30,
        )
    )
    assert flat_not == tree_not and len(flat_not) > 0


def test_boost_scales_term_scores(searcher):
    base = hits(searcher.search(TermQuery("table"), k=30))
    boosted = hits(searcher.search(BoostQuery(TermQuery("table"), 2.0), k=30))
    assert [d for d, _ in base] == [d for d, _ in boosted]
    for (_, s0), (_, s2) in zip(base, boosted):
        # weight = f32(idf)*f32(2) — exact doubling in float32
        assert np.float32(s2) == np.float32(np.float32(2.0) * np.float32(s0))


def test_boost_identity_is_noop(searcher):
    assert hits(searcher.search(BoostQuery(TermQuery("table"), 1.0), k=20)) == hits(
        searcher.search(TermQuery("table"), k=20)
    )


def test_nested_group_query(searcher):
    """(+vector +(table OR scan)) — conjunction with a nested
    disjunction, inexpressible in the flat model."""
    q = BooleanQuery(
        (
            Clause("MUST", TermQuery("vector")),
            Clause(
                "MUST",
                BooleanQuery(
                    (
                        Clause("SHOULD", TermQuery("table")),
                        Clause("SHOULD", TermQuery("scan")),
                    )
                ),
            ),
        )
    )
    got = hits(searcher.search(q, k=None))
    assert len(got) > 0
    # membership check vs flat primitives
    vec = {d for d, _ in hits(searcher.search(TermQuery("vector"), k=None))}
    tor = {d for d, _ in hits(searcher.search(BooleanOr(("table", "scan")), k=None))}
    assert {d for d, _ in got} == vec & tor
    # score = f32(f64(score_vector + f32(or_sum)))
    or_scores = dict(hits(searcher.search(BooleanOr(("table", "scan")), k=None)))
    v_scores = dict(hits(searcher.search(TermQuery("vector"), k=None)))
    for d, s in got:
        want = np.float32(np.float64(v_scores[d]) + np.float64(or_scores[d]))
        assert np.float32(s) == want, d


def test_parsed_equals_programmatic(searcher):
    q1 = parse_query("+vector (table scan) -dup")
    q2 = BooleanQuery(
        (
            Clause("MUST", TermQuery("vector")),
            Clause(
                "SHOULD",
                BooleanQuery(
                    (
                        Clause("SHOULD", TermQuery("table")),
                        Clause("SHOULD", TermQuery("scan")),
                    )
                ),
            ),
            Clause("MUST_NOT", TermQuery("dup")),
        )
    )
    assert hits(searcher.search(q1, k=30)) == hits(searcher.search(q2, k=30))


def test_constant_score_wrapper(searcher):
    inner = BooleanAnd(("scan", "table"))
    docs = {d for d, _ in hits(searcher.search(inner, k=None))}
    got = hits(searcher.search(ConstantScoreQuery(inner, boost=1.5), k=None))
    assert {d for d, _ in got} == docs
    assert all(s == np.float32(1.5) for _, s in got)


def test_filter_clause_matches_without_scoring(searcher):
    scored = hits(
        searcher.search(
            BooleanQuery(
                (
                    Clause("MUST", TermQuery("vector")),
                    Clause("FILTER", TermQuery("table")),
                )
            ),
            k=None,
        )
    )
    both = {
        d for d, _ in hits(searcher.search(BooleanAnd(("table", "vector")), k=None))
    }
    vec = dict(hits(searcher.search(TermQuery("vector"), k=None)))
    assert {d for d, _ in scored} == both
    for d, s in scored:  # FILTER contributes matching, not score
        assert np.float32(s) == np.float32(vec[d]), d


# ---------------------------------------------------------------------
# sloppy phrase
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_index(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    rows = [
        (0, "alpha beta gamma"),           # exact "alpha gamma"? no; a _ g slop1
        (1, "alpha gamma beta"),           # exact "alpha gamma"
        (2, "gamma alpha"),                # reversed only
        (3, "alpha x y gamma"),            # gap 2
        (4, "alpha gamma alpha gamma"),    # exact twice
    ]
    out = str(tmp_path_factory.mktemp("tiny") / "ix")
    src = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(
        spark, src, out,
        IndexConfig(n_shards=1, segs_per_shard=1, id_col="doc_id",
                    text_col="text", sharding="range_int",
                    index_positions=True),
    )
    return IndexSearcher(spark, out)


def test_sloppy_phrase_windows(tiny_index):
    def docs(slop):
        return {
            r.doc_id
            for r in tiny_index.search(
                PhraseQuery(("alpha", "gamma"), slop=slop), k=None
            ).collect()
        }

    assert docs(0) == {1, 4}
    assert docs(1) == {0, 1, 4}
    # UNORDERED matching (SloppyPhraseScorer semantics): doc 2
    # "gamma alpha" is a transposition — adjusted spread 2 — so it
    # matches at slop >= 2, exactly like the reference
    assert docs(2) == {0, 1, 2, 3, 4}
    assert 2 in docs(5)


def test_sloppy_zero_equals_exact(tiny_index):
    exact = hits(tiny_index.search(PhraseQuery(("alpha", "gamma")), k=30))
    slop0 = hits(tiny_index.search(PhraseQuery(("alpha", "gamma"), slop=0), k=30))
    assert exact == slop0 and len(exact) > 0


def test_sloppy_freq_counts(tiny_index):
    """doc 4 = 'alpha gamma alpha gamma': slop=2 minimal windows are
    the two exact occurrences -> freq 2; doc 1 freq 1. Richer freq
    must not lower the score."""
    out = {
        r.doc_id: r.score
        for r in tiny_index.search(
            PhraseQuery(("alpha", "gamma"), slop=2), k=None
        ).collect()
    }
    assert out[4] > out[1]


def test_sloppy_slop_factor_weighting(tiny_index):
    """Each window contributes the reference slop factor
    1/(1+matchLength) (SloppyPhraseScorer.sloppyFreq, BM25Similarity
    computeSlopFactor). doc 4 'alpha gamma alpha gamma' at slop=2:
    adjusted streams A={0,2}, B={0,2} -> minimal windows [0,0] and
    [2,2], freq f32(1 + 1); doc 2 'gamma alpha' (transposed): A={1},
    B={-1} -> one window ml=2, freq f32(1/3). Closed-form BM25 over
    those float freqs must match bitwise."""
    from lucene_solr_spark.functions import bm25
    from lucene_solr_spark.functions.smallfloat import encode_norm

    s = tiny_index
    out = {
        r.doc_id: np.float32(r.score)
        for r in s.search(PhraseQuery(("alpha", "gamma"), slop=2), k=None).collect()
    }
    # corpus: alpha and gamma each appear in docs 0..4 -> df=5 each;
    # max_doc=5; avgdl=16/5
    idf_sum = np.float32(
        np.float32(0.0) + bm25.idf(5, s.max_doc) + bm25.idf(5, s.max_doc)
    )
    cache = bm25.norm_cache(s.avgdl)
    nb4 = encode_norm(np.array([4], np.int64))  # doc 4 has 4 tokens
    freq4 = np.array(
        [np.float32(np.float64(1.0) + np.float64(1.0))], np.float32
    )
    assert out[4] == np.float32(bm25.score_term(freq4, nb4, idf_sum, cache)[0])
    nb2 = encode_norm(np.array([2], np.int64))  # doc 2 has 2 tokens
    freq2 = np.array([np.float32(np.float64(1.0) / 3.0)], np.float32)
    assert out[2] == np.float32(bm25.score_term(freq2, nb2, idf_sum, cache)[0])


def test_explain_phrase_bitwise(tiny_index):
    """explain of a PhraseQuery (exact and sloppy): root score bitwise
    equals the search score; the phrase node carries per-term idfs."""
    for slop in (0, 2):
        q = PhraseQuery(("alpha", "gamma"), slop=slop)
        for r in tiny_index.search(q, k=3).collect():
            ex = tiny_index.explain(q, r.doc_id)
            assert ex["match"] is True
            assert np.float32(ex["score"]) == np.float32(r.score)
            node = ex["details"][0]
            assert node["kind"] == "phrase" and node["slop"] == slop
            assert set(node["idfs"]) == {"alpha", "gamma"}
    # doc 2 ("gamma alpha") matches sloppy but not exact
    ex0 = tiny_index.explain(PhraseQuery(("alpha", "gamma")), 2)
    assert ex0["match"] is False and ex0["score"] == 0.0
    ex2 = tiny_index.explain(PhraseQuery(("alpha", "gamma"), slop=2), 2)
    assert ex2["match"] is True and ex2["score"] > 0.0


def test_sloppy_bulk_matches_scalar_sweep():
    """_sloppy_freqs_bulk (the vectorized all-docs kernel) must equal
    the scalar _sloppy_freq sweep doc-by-doc on randomized inputs —
    the slow-vs-fast scorer dueling discipline
    (ThreadedIndexingAndSearchingTestCase analog). Equality is at
    float32 — the precision the freq feeds BM25 at — because reduceat
    (pairwise f64 summation) and the scalar left-fold can differ in
    the last f64 ulp over identical window sets."""
    import numpy as np

    from lucene_solr_spark.search.searcher import (
        _sloppy_freq,
        _sloppy_freqs_bulk,
    )

    rng = np.random.RandomState(7)
    M = np.int64(1) << np.int64(32)
    for trial in range(30):
        k = int(rng.randint(2, 5))
        n_docs = int(rng.randint(1, 8))
        slop = int(rng.randint(0, 5))
        per_doc: dict[int, list[list[int]]] = {}
        keysets = []
        for i in range(k):
            keys = []
            for d in range(n_docs):
                npos = int(rng.randint(0, 6))
                pos = np.unique(rng.randint(1, 25, npos)).tolist()
                per_doc.setdefault(d, [[] for _ in range(k)])[i] = pos
                keys.extend(np.int64(d) * M + np.int64(p) for p in pos)
            keysets.append(np.array(sorted(keys), np.int64))
        bd, bf = _sloppy_freqs_bulk(keysets, slop, M)
        bulk = dict(zip(bd.tolist(), bf.tolist()))
        for d, lists in per_doc.items():
            expect = (
                _sloppy_freq(lists, slop)
                if all(len(x) for x in lists)
                else 0.0
            )
            got = bulk.get(d, 0.0)
            assert np.float32(got) == np.float32(expect), (
                trial, d, lists, slop, got, expect,
            )


def test_explain_multiphrase_bitwise(tiny_index):
    """explain of a MultiPhraseQuery: root score bitwise equals the
    search score (position alternatives explained as one leaf)."""
    from lucene_solr_spark.search.query import MultiPhraseQuery

    q = MultiPhraseQuery((("alpha", "gamma"), ("beta", "gamma")))
    hits = tiny_index.search(q, k=5).collect()
    assert hits
    for r in hits:
        ex = tiny_index.explain(q, r.doc_id)
        assert ex["match"] is True
        assert np.float32(ex["score"]) == np.float32(r.score)
        assert ex["details"][0]["kind"] == "multi_phrase"


def test_sloppy_freq_sweep_kernel():
    """_sloppy_freq directly: minimal-window enumeration matches
    hand-computed cases (incl. the tie and crossing shapes from
    SloppyPhraseScorer's pq semantics)."""
    from lucene_solr_spark.search.searcher import _sloppy_freq

    # two exact occurrences -> two zero-length windows
    assert _sloppy_freq([[0, 2], [0, 2]], 2) == 2.0
    # staircase: [0,5] and [5,10] both length 5
    assert _sloppy_freq([[0, 10], [5]], 5) == pytest.approx(2.0 / 6.0)
    # [0,5] not minimal (1 in between): only [1,5]
    assert _sloppy_freq([[0, 1], [5]], 5) == pytest.approx(1.0 / 5.0)
    # tie case: windows [5,5] and [6,6] only (not the crossed [5,6])
    assert _sloppy_freq([[5, 6], [5, 6]], 2) == 2.0
    # out-of-slop windows contribute nothing
    assert _sloppy_freq([[0], [9]], 2) == 0.0
    # three slots: smallest window ending at each completion
    assert _sloppy_freq([[3], [5], [0, 5]], 5) == pytest.approx(
        1.0 / 6.0 + 1.0 / 3.0
    )
