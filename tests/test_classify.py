"""SimpleNaiveBayesClassifier analog (ops/classify.py) — reference
math (log prior + add-1-smoothed doc-freq likelihood, den =
avgUniqueTermsPerDoc * classDocs + docsWithClass) pinned against a
hand NumPy evaluation on a small labeled corpus."""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.ops.classify import naive_bayes_scores


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [
        (0, "spark table scan merge", "en"),
        (1, "table scan fast scan", "en"),
        (2, "vector merge batch", "en"),
        (3, "tabla rapida vector", "es"),
        (4, "vector vector lento", "es"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def hand_scores(rows, toks):
    import collections

    pairs = set()
    for did, text, lang in rows:
        for t in set(text.split()):
            pairs.add((lang, did, t))
    n_all = len(rows)
    n_c = collections.Counter(lang for _, _, lang in rows)
    sum_df = len(pairs)
    n_docs_tok = len({d for _, d, _ in pairs})
    avg_unique = sum_df / n_docs_tok
    df = collections.Counter((lang, t) for lang, _, t in pairs)
    out = {}
    for c in n_c:
        den = avg_unique * n_c[c] + n_all
        ll = sum(math.log((df.get((c, t), 0) + 1) / den) for t in toks)
        out[c] = math.log(n_c[c]) - math.log(n_all) + ll
    return out


def test_matches_hand_math(labeled):
    rows = [(r.doc_id, r.text, r.lang) for r in labeled.collect()]
    toks = ["table", "scan", "scan"]  # repeated token counts twice
    want = hand_scores(rows, toks)
    got = {
        r.cls: r.score
        for r in naive_bayes_scores(labeled, "table scan scan").collect()
    }
    assert set(got) == set(want)
    for c in want:
        assert got[c] == pytest.approx(want[c], rel=1e-12)
    # the English corpus must win on English vocabulary
    top = naive_bayes_scores(labeled, "table scan scan").first()
    assert top.cls == "en"


def test_unseen_tokens_still_smooth(labeled):
    # a token absent everywhere contributes log(1/den) per class — the
    # ranking then rests on priors and den
    out = naive_bayes_scores(labeled, "zzzz").collect()
    assert len(out) == 2
    assert all(r.score < 0 for r in out)


def test_empty_input_raises(labeled):
    with pytest.raises(ValueError):
        naive_bayes_scores(labeled, "the")  # all-stopword input
