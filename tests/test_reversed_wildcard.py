"""Leading-wildcard acceleration via the reversed term dictionary —
the ReversedWildcardFilterFactory analog (solr/core/src/java/org/
apache/solr/analysis/ReversedWildcardFilterFactory.java: shouldReverse
reverses patterns that lead with * or ?, so the reversed field turns
them into indexed prefix seeks).

Here the "reversed field" is a second vocabulary-sized parquet file
(term_stats_rev, sorted by rterm = reverse(term)) written alongside
term_stats by build/compact/publish; _mtq_scan rewrites an eligible
WildcardQuery into a pushed-down `rterm startswith` + rlike over it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.query import TermQuery, WildcardQuery
from lucene_solr_spark.search.searcher import IndexSearcher, _mtq_cond


@pytest.fixture(scope="module")
def searcher(spark, docs_index):
    out, _ = docs_index
    return IndexSearcher(spark, out)


def _fwd_expand(searcher, q, pre=""):
    rows = (
        searcher._term_stats.where(_mtq_cond(q, pre)).select("term").collect()
    )
    return sorted(r.term for r in rows)


def test_expansion_parity_suffix(searcher):
    q = WildcardQuery("*er")
    frame, _ = searcher._mtq_scan(q)
    assert frame is not searcher._term_stats  # took the reversed dict
    assert searcher._expand_mtq(q) == _fwd_expand(searcher, q)


def test_expansion_parity_mixed_wildcards(searcher):
    # inner wildcards survive the reversal as a post-scan rlike
    for pat in ("*t?r", "?ilter", "*a*e"):
        q = WildcardQuery(pat)
        assert searcher._expand_mtq(q) == _fwd_expand(searcher, q), pat


def test_trailing_wildcard_stays_forward(searcher):
    # `foo*` has an empty reversed literal prefix (and doesn't lead
    # with a wildcard) — the forward dictionary handles it
    frame, _ = searcher._mtq_scan(WildcardQuery("fil*"))
    assert frame is searcher._term_stats
    # `*foo*` leads with a wildcard but reverses to `*oof*` (no
    # literal prefix) — also forward
    frame, _ = searcher._mtq_scan(WildcardQuery("*ilte*"))
    assert frame is searcher._term_stats


def test_pushed_prefix_filter(searcher):
    """The reversed-dictionary scan pushes StringStartsWith(rterm,...)
    into the parquet source (min/max row-group pruning) — the whole
    point of the reversed file."""
    frame, cond = searcher._mtq_scan(WildcardQuery("*er"))
    plan = frame.where(cond)._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith(rterm,re)" in plan
    assert "term_stats_rev" in plan


def test_constant_score_results_match_like(searcher, spark):
    got = {
        r.doc_id
        for r in searcher.search(WildcardQuery("*er"), k=None).collect()
    }
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    want = {
        r.doc_id
        for r in docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("t")
        )
        .where(F.col("t").endswith("er"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert got == want and got


def test_fielded_leading_wildcard(spark, tmp_path):
    """Fielded pattern: the internal key reversal puts the reversed
    token first, so the prefix seek still engages; results match the
    forward expansion."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    df = spark.createDataFrame(
        [
            (0, "alpha table", "en"),
            (1, "beta filter", "de"),
            (2, "gamma order", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "idx")
    build_index(
        spark,
        df,
        out,
        IndexConfig(
            n_shards=1,
            segs_per_shard=1,
            analyzer="standard",
            id_col="doc_id",
            text_col="text",
            sharding="range_int",
            extra_fields=("lang",),
        ),
    )
    s = IndexSearcher(spark, out)
    q = WildcardQuery("*er", field="lang")
    frame, _ = s._mtq_scan(q, s._mtq_prefix(q))
    assert frame is not s._term_stats
    assert s._expand_mtq(q) == _fwd_expand(s, q, s._mtq_prefix(q))


def test_rev_dict_fallback_without_file(spark, docs_index, tmp_path):
    """Old indexes (no term_stats_rev on disk) derive the reversed
    dictionary from term_stats — same expansions, no pruning."""
    import shutil

    out, _ = docs_index
    legacy = str(tmp_path / "legacy")
    shutil.copytree(out, legacy)
    shutil.rmtree(f"{legacy}/term_stats_rev")
    s = IndexSearcher(spark, legacy)
    q = WildcardQuery("*er")
    assert s._expand_mtq(q) == _fwd_expand(s, q)
