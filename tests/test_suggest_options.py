"""AnalyzingSuggester option parity (search/suggest.analyzing_suggest;
reference AnalyzingSuggester.java:145,150,240-241 exactFirst /
preserveSep, AnalyzingInfixSuggester.java:341 contexts)."""

import pytest


@pytest.fixture()
def sug(spark):
    rows = [
        ("foo bar", 50, ["en"]),
        ("foo baz", 40, ["de"]),
        ("foo", 10, ["en", "de"]),
        ("food truck", 90, ["en"]),
        ("bar", 70, ["fr"]),
    ]
    return spark.createDataFrame(
        rows, "suggestion string, weight long, contexts array<string>"
    )


def _got(df):
    return [(r.suggestion, r.weight) for r in df.collect()]


def test_exact_first_outranks_weight(sug):
    from lucene_solr_spark.search.suggest import analyzing_suggest

    got = _got(analyzing_suggest(sug, "foo", exact_first=True))
    # 'foo' (weight 10) first despite 'food truck' (90); then weight desc
    assert got == [("foo", 10), ("food truck", 90), ("foo bar", 50),
                   ("foo baz", 40)]
    got2 = _got(analyzing_suggest(sug, "foo", exact_first=False))
    assert got2 == [("food truck", 90), ("foo bar", 50), ("foo baz", 40),
                    ("foo", 10)]


def test_preserve_sep(sug):
    from lucene_solr_spark.search.suggest import analyzing_suggest

    # with separators preserved, 'foob' does NOT complete to 'foo bar'
    got = _got(analyzing_suggest(sug, "foob", preserve_sep=True))
    assert got == []
    # without separators, 'foob' matches 'foo bar' / 'foo baz' (fused
    # forms 'foobar'/'foobaz') — AnalyzingSuggester PRESERVE_SEP off
    got2 = _got(analyzing_suggest(sug, "foob", preserve_sep=False))
    assert got2 == [("foo bar", 50), ("foo baz", 40)]
    # multi-token prefix crosses the separator when fused
    got3 = _got(analyzing_suggest(sug, "fo ob", preserve_sep=False))
    assert got3 == [("foo bar", 50), ("foo baz", 40)]


def test_contexts_filter(sug):
    from lucene_solr_spark.search.suggest import analyzing_suggest

    got = _got(analyzing_suggest(sug, "foo", contexts=["de"]))
    assert got == [("foo", 10), ("foo baz", 40)]
    got2 = _got(analyzing_suggest(sug, "foo", contexts=["en", "de"]))
    assert len(got2) == 4
    # no contexts column -> filter skipped silently
    nosctx = sug.drop("contexts")
    got3 = _got(analyzing_suggest(nosctx, "foo", contexts=["de"]))
    assert len(got3) == 4


def test_empty_prefix_and_k(sug):
    from lucene_solr_spark.search.suggest import analyzing_suggest

    assert _got(analyzing_suggest(sug, "   ")) == []
    assert _got(analyzing_suggest(sug, "foo", k=2, exact_first=True)) == [
        ("foo", 10), ("food truck", 90)
    ]


def test_case_insensitive_analysis(sug):
    from lucene_solr_spark.search.suggest import analyzing_suggest

    got = _got(analyzing_suggest(sug, "FOO B"))
    assert got == [("foo bar", 50), ("foo baz", 40)]
