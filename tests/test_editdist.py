"""Transposition-aware fuzzy expansion (FuzzyQuery.java:59 default).

Pins functions/editdist.transposition_distance to the DP the reference
tests its Levenshtein automata against
(TestLevenshteinAutomata.java:333 getTDistance) and the end-to-end
hit-set fix: 'tabel'~1 matches 'table' (classic Levenshtein misses it).
"""

import duckdb
import pytest

from lucene_solr_spark.functions.editdist import transposition_distance


def test_basic_distances():
    assert transposition_distance("", "") == 0
    assert transposition_distance("abc", "") == 3
    assert transposition_distance("", "abc") == 3
    assert transposition_distance("kitten", "sitting") == 3
    # adjacent swap = one edit (the whole point)
    assert transposition_distance("tabel", "table") == 1
    assert transposition_distance("from", "form") == 1
    assert transposition_distance("abcd", "abcd") == 0


def test_restricted_semantics_vs_unrestricted():
    """The reference DP is the RESTRICTED variant: a transposed pair
    cannot be edited again, so ca->abc is 3 (unrestricted Damerau: 2,
    as DuckDB computes). Pinned so the documented oracle caveat in
    _fuzzy_sql stays true."""
    assert transposition_distance("ca", "abc") == 3
    assert duckdb.sql("select damerau_levenshtein('ca','abc')").fetchone()[0] == 2


def test_symmetric_and_bounded_by_classic():
    import itertools
    words = ["table", "tabel", "tble", "batle", "scan", "cans", "acsn",
             "merge", "mereg", "stream", "straem", "a", "", "aa", "ab"]
    for a, b in itertools.product(words, repeat=2):
        d = transposition_distance(a, b)
        assert d == transposition_distance(b, a)
        lev = duckdb.sql(f"select levenshtein('{a}','{b}')").fetchone()[0]
        dam = duckdb.sql(
            f"select damerau_levenshtein('{a}','{b}')").fetchone()[0]
        # restricted sits between unrestricted Damerau and classic
        assert dam <= d <= lev


def test_restricted_matches_duckdb_on_vocab():
    """Oracle-parity guard: over the benchmark corpus vocabulary and
    the fixture fuzzy query terms, the restricted DP and DuckDB's
    unrestricted damerau_levenshtein agree, so _fuzzy_sql's
    damerau_levenshtein predicate is an exact oracle for the engine's
    expansion on these fixtures."""
    import os
    sf = os.environ.get("SPARK_GRAFT_SF_TEST", "/root/testdata/sf0.001")
    path = os.path.join(sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    vocab = [r[0] for r in duckdb.sql(
        "select distinct term from (select unnest(string_split(text,' ')) "
        f"term from read_parquet('{path}')) where term <> ''").fetchall()]
    assert vocab
    for q in ("tabl", "tabel"):
        for t in vocab:
            dam = duckdb.sql(
                f"select damerau_levenshtein('{q}','{t}')").fetchone()[0]
            assert transposition_distance(q, t) == dam


def test_expand_fuzzy_transpositions(spark):
    """End-to-end: the searcher's dictionary expansion accepts the
    transposed term with the default and rejects it with
    transpositions=False."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import FuzzyQuery
    from lucene_solr_spark.search.searcher import IndexSearcher
    import tempfile

    rows = [(i, t) for i, t in enumerate(
        ["the table is set", "tble stub", "a form letter",
         "from here", "scan the batch"])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tempfile.mkdtemp(prefix="lss_fuzzy_t_")
    build_index(spark, df, out, IndexConfig(
        n_shards=2, segs_per_shard=1, analyzer="whitespace",
        id_col="doc_id", text_col="text"))
    s = IndexSearcher(spark, out)

    terms = s._expand_fuzzy(FuzzyQuery("tabel", max_edits=1))
    assert "table" in terms        # transposition = 1 edit
    terms_classic = s._expand_fuzzy(
        FuzzyQuery("tabel", max_edits=1, transpositions=False))
    assert "table" not in terms_classic
    # both accept 'tble' at 2 edits (delete 'a' + swap 'el')
    assert "tble" in s._expand_fuzzy(FuzzyQuery("tabel", max_edits=2))

    terms2 = s._expand_fuzzy(FuzzyQuery("from", max_edits=1))
    assert "form" in terms2
    assert "form" not in s._expand_fuzzy(
        FuzzyQuery("from", max_edits=1, transpositions=False))


def test_fuzzy_validation():
    """FuzzyQuery.java:86-92 constructor checks."""
    from lucene_solr_spark.search.query import FuzzyQuery

    with pytest.raises(ValueError, match="maxEdits"):
        FuzzyQuery("x", max_edits=3)
    with pytest.raises(ValueError, match="maxEdits"):
        FuzzyQuery("x", max_edits=-1)
    with pytest.raises(ValueError, match="prefixLength"):
        FuzzyQuery("x", prefix_length=-1)


def test_fuzzy_prefix_length(spark):
    """prefixLength: the first P chars must match exactly; edits apply
    to the suffix only (FuzzyTermsEnum.java:82-96). 'tble'~1 with
    prefix_length=1 keeps 'table' (suffix 'ble'->'able' = 1 insert)
    but drops 'able' (wrong first char); prefix_length longer than the
    term clamps (realPrefixLength)."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.query import FuzzyQuery
    from lucene_solr_spark.search.searcher import IndexSearcher
    import tempfile

    rows = [(0, "the table is able"), (1, "tble stub"), (2, "a fable here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tempfile.mkdtemp(prefix="lss_fuzzy_p_")
    build_index(spark, df, out, IndexConfig(
        n_shards=2, segs_per_shard=1, analyzer="whitespace",
        id_col="doc_id", text_col="text"))
    s = IndexSearcher(spark, out)

    no_prefix = s._expand_fuzzy(FuzzyQuery("tble", max_edits=1))
    assert "able" in no_prefix and "table" in no_prefix
    with_prefix = s._expand_fuzzy(
        FuzzyQuery("tble", max_edits=1, prefix_length=1))
    assert "table" in with_prefix and "tble" in with_prefix
    assert "able" not in with_prefix and "fable" not in with_prefix
    # prefix longer than the term: exact-prefix = whole term, edits on
    # the empty suffix -> only suffix-length <= max_edits survivors
    clamped = s._expand_fuzzy(
        FuzzyQuery("tble", max_edits=1, prefix_length=99))
    assert clamped == ["tble"]
