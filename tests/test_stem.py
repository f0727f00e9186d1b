"""English stemmers: Porter (PorterStemmer.java:115-488) and minimal
(EnglishMinimalStemmer.java:28-45) — python/SQL parity, analyzer-chain
behavior, and the arrow dictionary-stemming seam end-to-end."""

import duckdb
import pandas as pd
import pytest

from lucene_solr_spark.analysis.stem import (
    _cv,
    cv_sql,
    minimal_stem_en,
    minimal_stem_sql,
    porter_sql_ctes,
    porter_stem,
)
from tests.conftest import SF_SMALL

# Classic Porter vectors, from the algorithm paper's example column —
# the reference ships the UPDATED Porter (logi->log, bli->ble,
# the Bug-1/Bug-2 guards), which these pin.
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control",
    "roll": "roll", "tables": "tabl", "queries": "queri",
}

# adversarial words: y-runs, short words, bare suffixes
EDGE_WORDS = [
    "", "a", "ax", "by", "sky", "say", "oed", "ied", "ies", "sses",
    "s", "ss", "is", "yyyy", "syzygy", "ying", "toy", "yyyyyyyy",
    "dying", "lying", "agreement", "ion", "sion", "tion", "motion",
    "vision", "ohms", "aas", "abyss",
]


def test_porter_golden_vectors():
    bad = {
        w: (porter_stem(w), e)
        for w, e in PORTER_VECTORS.items()
        if porter_stem(w) != e
    }
    assert not bad


def test_porter_short_words_unchanged():
    # PorterStemmer.java:484 — k <= k0+1 returns the word untouched
    for w in ("", "a", "is", "by", "ax"):
        assert porter_stem(w) == w


def test_minimal_stemmer_reference_quirks():
    # EnglishMinimalStemmer.java:28-45, including its quirks:
    # 'gas'->'ga' (default branch), 'dies'->'dy' (ies->y)
    cases = {
        "tables": "table", "bus": "bus", "pass": "pass",
        "cities": "city", "dies": "dy", "gas": "ga", "goes": "goes",
        "ties": "ty", "aies": "aies", "eies": "eies", "as": "as",
        "types": "type", "is": "is",
    }
    bad = {
        w: (minimal_stem_en(w), e)
        for w, e in cases.items()
        if minimal_stem_en(w) != e
    }
    assert not bad


def _vocab():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT DISTINCT lower(t) FROM (SELECT unnest(string_split(text"
        f", ' ')) AS t FROM read_parquet('{SF_SMALL}/documents.parquet')"
        ") q WHERE t <> ''"
    ).fetchall()
    con.close()
    words = {r[0] for r in rows}
    words |= set(PORTER_VECTORS)
    words |= {w for w in EDGE_WORDS if w}
    return sorted(words)


def test_porter_sql_matches_python_on_vocab():
    words = _vocab()
    con = duckdb.connect()
    con.execute("CREATE TABLE dterm(term VARCHAR)")
    con.executemany("INSERT INTO dterm VALUES (?)", [(w,) for w in words])
    sql = "WITH " + porter_sql_ctes("dterm") + " SELECT term, stem FROM porter_out"
    got = dict(con.execute(sql).fetchall())
    con.close()
    bad = {w: (got.get(w), porter_stem(w)) for w in words if got.get(w) != porter_stem(w)}
    assert not bad


def test_minimal_sql_matches_python_on_vocab():
    words = _vocab()
    con = duckdb.connect()
    con.execute("CREATE TABLE dterm(term VARCHAR)")
    con.executemany("INSERT INTO dterm VALUES (?)", [(w,) for w in words])
    got = dict(
        con.execute(
            f"SELECT term, {minimal_stem_sql('term')} FROM dterm"
        ).fetchall()
    )
    con.close()
    bad = {
        w: (got.get(w), minimal_stem_en(w))
        for w in words
        if got.get(w) != minimal_stem_en(w)
    }
    assert not bad


def test_cv_sql_settles_y_runs():
    # the bounded-alternation passes must resolve every y for runs up
    # to ~2*_CV_PASSES; parity with the exact recursive map
    words = [w for w in EDGE_WORDS if w] + ["yyyyyyyy", "ayyyyyyyb", "yaya"]
    con = duckdb.connect()
    for w in words:
        got = con.execute(f"SELECT {cv_sql(repr(w))}").fetchone()[0]
        assert got == _cv(w), (w, got, _cv(w))
        assert "y" not in got
    con.close()


# ----------------------------------------------------------------------
# analyzer chains
# ----------------------------------------------------------------------


def test_english_analyzer_chain_pandas():
    from lucene_solr_spark.analysis.analyzers import ANALYZERS, ANALYZERS_POS

    toks = ANALYZERS["english"](pd.Series(
        ["The manager's queries were failing", "Tables table TABLED"]
    ))
    # possessive stripped, stops dropped, porter-stemmed
    assert toks.iloc[0] == ["manag", "queri", "were", "fail"]
    assert toks.iloc[1] == ["tabl", "tabl", "tabl"]
    # positions advance over dropped stopwords
    tp = ANALYZERS_POS["english"](pd.Series(["the quick fox's dens"]))
    assert tp.iloc[0] == [("quick", 1), ("fox", 2), ("den", 3)]


def test_english_minimal_analyzer_chain_pandas():
    from lucene_solr_spark.analysis.analyzers import ANALYZERS

    toks = ANALYZERS["english_minimal"](pd.Series(["running tables pass"]))
    assert toks.iloc[0] == ["running", "table", "pass"]


@pytest.fixture(scope="module")
def english_index(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("enidx") / "docs_en")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    build_index(
        spark, src, out,
        IndexConfig(n_shards=2, segs_per_shard=2, analyzer="english",
                    id_col="doc_id", text_col="text", sharding="range_int",
                    index_positions=True),
    )
    return out


def test_english_index_postings_are_stemmed(spark, english_index):
    from lucene_solr_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, english_index)
    terms = {
        r["term"]
        for r in s._term_stats.select("term").distinct().collect()
    }
    # every indexed term is its own porter stem (idempotence of the
    # dictionary-stemming seam: stem(index) == index)
    not_fixed = {t for t in terms if porter_stem(t) != t}
    assert not_fixed == set()


def test_english_index_merges_variants(spark, english_index):
    """Docs containing 'table'/'tables' all land under the 'tabl'
    posting; the stemmed term query finds the union, and doc_len
    equals the standard chain's (stemming drops nothing)."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.search.searcher import IndexSearcher

    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    expect = {
        r["doc_id"]
        for r in src.filter(
            F.col("text").rlike(r"(?i)\btables?\b")
        ).select("doc_id").collect()
    }
    s = IndexSearcher(spark, english_index)
    got = {r["doc_id"] for r in s.search(TermQuery("tabl"), k=None).collect()}
    assert got == expect
    assert "tabl" not in (None,)  # keep flake quiet about unused import
