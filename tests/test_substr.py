"""ExactSubstr duplicate-span removal (ops/substr.py) — planted-span
behavioral tests (Lee et al. 2022 keep-first-occurrence semantics)."""

from __future__ import annotations

import pytest

SPAN = "s1 s2 s3 s4 s5 s6"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, f"a0 a1 a2 a3 {SPAN} a4 a5 a6 a7"),
        (1, f"b0 b1 b2 {SPAN} b3 b4 b5"),
        (2, f"a0 a1 a2 a3 {SPAN} a4 a5 a6 a7"),  # exact copy of doc 0
        (3, "c0 c1 s1 s2 s3 s4 c2 c3 c4 c5 c6 s1 s2 s3 s4 c7 c8"),
        (4, "u0 u1 u2 u3 u4 u5 u6 u7 u8"),  # all-unique
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stats(corpus, w=4):
    from lucene_solr_spark.ops.substr import dup_span_stats

    return {
        r.doc_id: r for r in dup_span_stats(corpus, w=w, k=100).collect()
    }


def test_first_occurrence_kept_later_removed(corpus):
    st = _stats(corpus)
    # doc 0 holds the corpus-first occurrence of every shared window
    assert st[0].dup_tokens == 0 and st[0].n_spans == 0
    # doc 1's copy of the 6-token span is fully covered, one merged span
    assert st[1].dup_tokens == 6 and st[1].n_spans == 1


def test_exact_copy_fully_covered(corpus):
    st = _stats(corpus)
    assert st[2].dup_tokens == st[2].n_tokens == 14
    assert st[2].n_spans == 1 and st[2].dup_frac == 1.0


def test_two_islands_do_not_merge(corpus):
    # doc 3 repeats the 4-token prefix of SPAN twice, far apart
    st = _stats(corpus)
    assert st[3].n_spans == 2 and st[3].dup_tokens == 8
    assert st[4].dup_tokens == 0


def test_remove_rebuilds_clean_text(corpus):
    from lucene_solr_spark.ops.substr import remove_dup_spans

    out = {r.doc_id: r for r in remove_dup_spans(corpus, w=4).collect()}
    assert set(out) == {1, 2, 3}  # only changed docs
    assert out[1].clean_text == "b0 b1 b2 b3 b4 b5"
    assert out[1].removed_tokens == 6
    assert out[2].clean_text == "" and out[2].removed_tokens == 14
    assert out[3].clean_text == "c0 c1 c2 c3 c4 c5 c6 c7 c8"


def test_within_doc_repeat_keeps_first(spark):
    """A doc that repeats its own span: the first occurrence survives,
    the second is removed — within one document, same policy."""
    from lucene_solr_spark.ops.substr import remove_dup_spans

    df = spark.createDataFrame(
        [(7, "x1 x2 x3 x4 y1 y2 x1 x2 x3 x4")],
        "doc_id long, text string",
    )
    row = remove_dup_spans(df, w=4).collect()[0]
    assert row.clean_text == "x1 x2 x3 x4 y1 y2"
    assert row.removed_tokens == 4
