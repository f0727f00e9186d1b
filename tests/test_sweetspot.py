"""SweetSpotSimilarity (functions/sweetspot.py,
IndexSearcher.search_sweetspot; reference lucene/misc/.../
SweetSpotSimilarity.java). Unit pins on the two override functions,
a degenerate-factors == search_classic bitwise pin, and a brute-force
f32 recomputation of the full chain."""

import numpy as np
import pytest

from lucene_solr_spark.functions import sweetspot, tfidf
from lucene_solr_spark.functions.smallfloat import (
    byte315_to_float,
    encode_norm,
    float_to_byte315,
)

DOCS = [
    (0, "table scan fast merge sort"),
    (1, "scan table scan table scan"),
    (2, "merge join sort merge batch"),
    (3, "table big big big scan dup table table"),
    (4, "sort sort sort table"),
    (5, "table"),
]

LN = dict(lo=2, hi=6, steep=0.5)
TF = dict(base=1.5, tmin=2.0)


def test_compute_length_norm_plateau():
    # SweetSpotSimilarityTest.testSweetSpotComputeNorm: 1.0 across the
    # plateau, symmetric sqrt falloff outside
    cln = sweetspot.compute_length_norm(np.arange(1, 11), 3, 5, 0.5)
    assert all(cln[i] == np.float32(1.0) for i in (2, 3, 4))  # 3..5
    assert cln[1] == cln[5]  # len 2 == len 6 (one off each edge)
    assert cln[0] == cln[6]  # len 1 == len 7
    assert list(cln[4:]) == sorted(cln[4:], reverse=True)


def test_compute_length_norm_degenerates_to_classic():
    # lo=hi=1, steep=0.5 -> 1/sqrt(x) (DefaultSimilarity.lengthNorm)
    lens = np.arange(1, 200)
    cln = sweetspot.compute_length_norm(lens, 1, 1, 0.5)
    exp = (1.0 / np.sqrt(lens.astype(np.float64))).astype(np.float32)
    assert np.array_equal(cln, exp)


def test_baseline_tf_degenerates_to_sqrt():
    f = np.array([0.0, 1.0, 2.0, 5.0, 100.0], np.float32)
    got = sweetspot.baseline_tf(f, 0.0, 0.0)
    exp = np.sqrt(f.astype(np.float64)).astype(np.float32)
    assert np.array_equal(got, exp)


def test_baseline_tf_floor_and_shift():
    # freq <= min -> base; above: sqrt(freq + base^2 - min)
    got = sweetspot.baseline_tf(
        np.array([0.0, 1.0, 2.0, 3.0], np.float32), 1.5, 2.0
    )
    assert got[0] == np.float32(0.0)
    assert got[1] == np.float32(1.5) and got[2] == np.float32(1.5)
    exp3 = np.float32(
        np.sqrt(np.float64(np.float32(np.float32(3.0 + np.float32(2.25))
                                      - np.float32(2.0))))
    )
    assert got[3] == exp3


def test_sweet_norm_table_degenerate_is_identity():
    # degenerate factors: cln(qlen) == 1/sqrt(qlen); re-encoding the
    # decode of byte b must give back b's decoded value for every byte
    # produced by encode_norm (the engine's own norm alphabet)
    table = sweetspot.sweet_norm_decode_table(1, 1, 0.5)
    lens = np.arange(1, 5000)
    bs = encode_norm(lens)
    assert np.array_equal(table[bs], sweetspot.DECODE[bs])


@pytest.fixture(scope="module")
def ss_index(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    out = str(tmp_path_factory.mktemp("ssix") / "ix")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, out, IndexConfig(n_shards=2, segs_per_shard=1))
    return IndexSearcher(spark, out)


def _brute(clause_terms, kind):
    """Full DefaultSimilarity chain with the SweetSpot overrides:
    idf/queryNorm/coord from functions/tfidf.py, tf + norm swapped."""
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    dfv = {
        t: sum(1 for ts in toks.values() if t in ts)
        for t in set(clause_terms)
    }
    idfs = [tfidf.idf(dfv.get(t, 0), n) for t in clause_terms]
    values = tfidf.term_values(idfs)
    vmap = dict(zip(clause_terms, values))
    table = sweetspot.sweet_norm_decode_table(
        LN["lo"], LN["hi"], LN["steep"]
    )
    out = {}
    for d, ts in toks.items():
        nb = encode_norm(np.array([len(ts)]))
        acc = np.float64(0.0)
        nmatch = 0
        for t in clause_terms:
            tf = ts.count(t)
            if tf == 0:
                continue
            nmatch += 1
            s = sweetspot.score_term_sweet(
                np.array([tf], np.float32), nb, vmap[t], table,
                TF["base"], TF["tmin"],
            )
            acc += np.float64(s[0])
        if kind == "and" and nmatch < len(clause_terms):
            continue
        if nmatch == 0:
            continue
        total = np.float32(acc)
        if kind == "or":
            coord = np.float32(np.float32(nmatch)
                               / np.float32(len(clause_terms)))
            total = np.float32(total * coord)
        out[d] = total
    return out


def _search(ix, q, k=10):
    return {
        r.doc_id: np.float32(r.score)
        for r in ix.search_sweetspot(
            q, k=k, ln_min=LN["lo"], ln_max=LN["hi"],
            steepness=LN["steep"], tf_base=TF["base"], tf_min=TF["tmin"],
        ).collect()
    }


def test_sweetspot_term_bitwise(ss_index):
    from lucene_solr_spark.search.query import TermQuery

    assert _search(ss_index, TermQuery("table")) == _brute(["table"], "term")


def test_sweetspot_or_coord_bitwise(ss_index):
    from lucene_solr_spark.search.query import BooleanOr

    got = _search(ss_index, BooleanOr(("merge", "sort")))
    assert got == _brute(["merge", "sort"], "or")


def test_sweetspot_and_bitwise(ss_index):
    from lucene_solr_spark.search.query import BooleanAnd

    got = _search(ss_index, BooleanAnd(("table", "scan")))
    assert got == _brute(["table", "scan"], "and")


def test_sweetspot_defaults_equal_classic(ss_index):
    from lucene_solr_spark.search.query import BooleanOr

    q = BooleanOr(("table", "scan"))
    classic = {
        r.doc_id: np.float32(r.score)
        for r in ss_index.search_classic(q, k=10).collect()
    }
    sweet = {
        r.doc_id: np.float32(r.score)
        for r in ss_index.search_sweetspot(q, k=10).collect()
    }
    assert sweet == classic


def test_tf_floor_changes_short_vs_long_doc_order(ss_index):
    # doc 5 is a one-token doc ("table"): under classic its 1/sqrt(1)
    # norm dominates; under the plateau (lo=2) it is penalized while
    # docs of length 2..6 are not — the operator changes rankings, not
    # just values
    from lucene_solr_spark.search.query import TermQuery

    got = _search(ss_index, TermQuery("table"))
    table = sweetspot.sweet_norm_decode_table(2, 6, 0.5)
    nb5 = encode_norm(np.array([1]))[0]
    nb0 = encode_norm(np.array([5]))[0]
    assert table[nb5] < table[nb0]
    assert got[5] < got[0]


def test_explain_sweetspot_recomposes_bitwise(ss_index):
    from lucene_solr_spark.search.query import BooleanOr

    q = BooleanOr(("table", "scan"))
    hits = ss_index.search_sweetspot(
        q, k=10, ln_min=LN["lo"], ln_max=LN["hi"], steepness=LN["steep"],
        tf_base=TF["base"], tf_min=TF["tmin"],
    ).collect()
    assert hits
    for r in hits[:3]:
        ex = ss_index.explain_sweetspot(
            q, r.doc_id, ln_min=LN["lo"], ln_max=LN["hi"],
            steepness=LN["steep"], tf_base=TF["base"], tf_min=TF["tmin"],
        )
        assert ex["match"] is True
        assert np.float32(ex["score"]) == np.float32(r.score)
        assert ex["similarity"] == "sweetspot"
