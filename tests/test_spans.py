"""Spans family (search/spans.py; reference search/spans/*.java).

Unit layer: iterator semantics pinned to the reference's documented
behavior (NearSpansOrdered javadoc example, SpanNotQuery accept window,
SpanFirstQuery range, unordered atMatch) plus randomized parity of the
stateful iterators against closed-form characterizations. End-to-end
layer: span searches over a positions index, including the
spanNear(slop=0, ordered) == PhraseQuery bitwise-score identity."""

import numpy as np
import pytest

from lucene_solr_spark.search.spans import (
    NMP,
    FirstSpans,
    NearOrderedSpans,
    NearUnorderedSpans,
    NotSpans,
    OrSpans,
    TermSpans,
    doc_freq_spans,
)


def drain(sp):
    out = []
    while sp.next() != NMP:
        out.append((sp.start, sp.end, sp.width))
    return out


def test_ordered_javadoc_example():
    # NearSpansOrdered.java:33-41: "t1 t2 t1 t3 t2 t3" slop 1 matches
    # twice: "t1 t2 .. t3" and "t1 .. t2 t3"
    t1 = TermSpans(np.array([0, 2]))
    t2 = TermSpans(np.array([1, 4]))
    t3 = TermSpans(np.array([3, 5]))
    got = drain(NearOrderedSpans([t1, t2, t3], 1))
    assert got == [(0, 4, 1), (2, 6, 1)]


def test_ordered_rejects_reversed():
    got = drain(
        NearOrderedSpans([TermSpans(np.array([1])), TermSpans(np.array([0]))], 5)
    )
    assert got == []


def test_unordered_matches_reversed():
    got = drain(
        NearUnorderedSpans(
            [TermSpans(np.array([1])), TermSpans(np.array([0]))], 2
        )
    )
    # atMatch: maxEnd(2) - minStart(0) - totalLen(2) = 0 <= 2;
    # width = maxStart - minStart = 1
    assert got == [(0, 2, 1)]


def test_unordered_slop_boundary():
    a, b = TermSpans(np.array([0])), TermSpans(np.array([4]))
    assert drain(NearUnorderedSpans([a, b], 3)) == [(0, 5, 4)]
    a, b = TermSpans(np.array([0])), TermSpans(np.array([4]))
    assert drain(NearUnorderedSpans([a, b], 2)) == []


def test_or_merges_by_position():
    got = drain(
        OrSpans([TermSpans(np.array([0, 5])), TermSpans(np.array([2]))])
    )
    assert [s for s, _, _ in got] == [0, 2, 5]


def test_not_window():
    # SpanNotQuery accept: reject when an exclude span overlaps
    # [start - pre, end + post)
    inc = TermSpans(np.array([4, 8]))
    exc = TermSpans(np.array([5]))
    got = drain(NotSpans(inc, exc, 1, 1))
    assert [s for s, _, _ in got] == [8]  # 4's window [3,5] hits 5
    inc = TermSpans(np.array([3, 8]))
    exc = TermSpans(np.array([5]))
    got = drain(NotSpans(inc, exc, 1, 1))
    assert [s for s, _, _ in got] == [3, 8]
    # no exclusion stream at all accepts everything
    got = drain(NotSpans(TermSpans(np.array([1, 2])), None))
    assert [s for s, _, _ in got] == [1, 2]


def test_first_range():
    got = drain(FirstSpans(TermSpans(np.array([2, 4, 9])), 5))
    assert [s for s, _, _ in got] == [2, 4]
    assert drain(FirstSpans(TermSpans(np.array([5])), 5)) == []


def _freq_ordered_2term(apos, bpos, slop):
    """Closed form of the 2-clause ordered iteration: each a pairs with
    the minimal b > a (sub-span state persists but is always the
    minimal successor for unit spans); gap = b - a - 1."""
    acc = 0.0
    b = np.asarray(bpos)
    for a in apos:
        nxt = b[b > a]
        if len(nxt) == 0:
            break  # subSpans[1] exhausted -> whole doc iteration stops
        if nxt[0] - a - 1 <= slop:
            acc += 1.0 / (nxt[0] - a)
    return acc


def _freq_unordered_2term(apos, bpos, slop):
    """Closed form of the 2-clause unordered min-heap walk: the visited
    states are exactly (a, min b > a) and (b, min a > b); match when
    |gap| - 1 <= slop, factor 1/(1 + |gap|)."""
    acc = 0.0
    a_arr, b_arr = np.asarray(apos), np.asarray(bpos)
    for x, other in ((a_arr, b_arr), (b_arr, a_arr)):
        for p in x:
            nxt = other[other > p]
            if len(nxt) and nxt[0] - p - 1 <= slop:
                acc += 1.0 / (1.0 + (nxt[0] - p))
    return acc


@pytest.mark.parametrize("seed", range(20))
def test_random_parity_with_closed_forms(seed):
    rng = np.random.default_rng(seed)
    n_a, n_b = rng.integers(1, 8, 2)
    apos = np.unique(rng.integers(0, 30, n_a))
    bpos = np.unique(rng.integers(0, 30, n_b))
    bpos = bpos[~np.isin(bpos, apos)]  # distinct positions (real docs)
    if len(bpos) == 0:
        return
    slop = int(rng.integers(0, 6))
    posmap = {
        "a": (np.zeros(len(apos), np.int64), apos.astype(np.int64)),
        "b": (np.zeros(len(bpos), np.int64), bpos.astype(np.int64)),
    }
    node = {
        "op": "near",
        "clauses": [{"op": "term", "term": "a"}, {"op": "term", "term": "b"}],
        "slop": slop,
        "in_order": True,
    }
    assert doc_freq_spans(node, posmap, 0) == pytest.approx(
        _freq_ordered_2term(apos, bpos, slop)
    )
    node["in_order"] = False
    assert doc_freq_spans(node, posmap, 0) == pytest.approx(
        _freq_unordered_2term(apos, bpos, slop)
    )


def test_nested_or_inside_near():
    # spanNear([spanOr(a, b), c], 0, ordered): either alternative
    # directly before c
    posmap = {
        "a": (np.zeros(1, np.int64), np.array([0], np.int64)),
        "b": (np.zeros(1, np.int64), np.array([4], np.int64)),
        "c": (np.zeros(2, np.int64), np.array([1, 5], np.int64)),
    }
    node = {
        "op": "near",
        "clauses": [
            {"op": "or", "clauses": [{"op": "term", "term": "a"},
                                     {"op": "term", "term": "b"}]},
            {"op": "term", "term": "c"},
        ],
        "slop": 0,
        "in_order": True,
    }
    assert doc_freq_spans(node, posmap, 0) == pytest.approx(2.0)


@pytest.fixture(scope="module")
def span_index(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index
    from lucene_solr_spark.search.searcher import IndexSearcher

    out = str(tmp_path_factory.mktemp("spanix") / "ix")
    docs = spark.createDataFrame(
        [
            (0, "table scan fast merge sort"),
            (1, "scan table scan table scan"),
            (2, "merge join sort merge batch"),
            (3, "table big big big scan dup"),
            (4, "sort sort sort table"),
        ],
        "doc_id long, text string",
    )
    build_index(
        spark, docs, out,
        IndexConfig(n_shards=2, segs_per_shard=1, index_positions=True),
    )
    return IndexSearcher(spark, out)


def test_e2e_span_near_equals_phrase_at_slop0(span_index, spark):
    from lucene_solr_spark.search.query import (
        PhraseQuery,
        SpanNearQuery,
        SpanTermQuery,
    )

    ph = span_index.search(PhraseQuery(("table", "scan")), k=10).collect()
    sp = span_index.search(
        SpanNearQuery(
            (SpanTermQuery("table"), SpanTermQuery("scan")), 0, True
        ),
        k=10,
    ).collect()
    assert [(r.doc_id, r.score) for r in ph] == [
        (r.doc_id, r.score) for r in sp
    ]
    assert len(sp) > 0


def test_e2e_span_kinds(span_index):
    from lucene_solr_spark.search.query import (
        SpanFirstQuery,
        SpanNearQuery,
        SpanNotQuery,
        SpanOrQuery,
        SpanTermQuery,
    )

    un = span_index.search(
        SpanNearQuery(
            (SpanTermQuery("scan"), SpanTermQuery("merge")), 3, False
        ),
        k=10,
    ).collect()
    # doc0: scan@1, merge@3 (gap 1 <= 3); doc2 has no scan
    assert [r.doc_id for r in un] == [0]

    orq = span_index.search(
        SpanOrQuery((SpanTermQuery("join"), SpanTermQuery("batch"))), k=10
    ).collect()
    assert [r.doc_id for r in orq] == [2]

    first = span_index.search(
        SpanFirstQuery(SpanTermQuery("sort"), 2), k=10
    ).collect()
    # sort within first 2 positions: doc4 (pos 0 and 1... pos1 end=2<=2)
    assert [r.doc_id for r in first] == [4]

    notq = span_index.search(
        SpanNotQuery(SpanTermQuery("scan"), SpanTermQuery("table"), 1, 1),
        k=10,
    ).collect()
    # doc0: scan@1, table@0 adjacent -> rejected; doc1: every scan
    # adjacent to a table -> rejected; doc3: scan@4, big@3 table@0 ->
    # window [3,5] has no table -> accepted
    assert [r.doc_id for r in notq] == [3]

    # absent exclude term leaves the include side intact
    noex = span_index.search(
        SpanNotQuery(SpanTermQuery("join"), SpanTermQuery("zzz")), k=10
    ).collect()
    assert [r.doc_id for r in noex] == [2]

    # absent term inside a near kills the whole conjunction
    dead = span_index.search(
        SpanNearQuery((SpanTermQuery("zzz"), SpanTermQuery("scan")), 9, False),
        k=10,
    ).collect()
    assert dead == []


def test_explain_spans_bitwise(span_index):
    from lucene_solr_spark.search.query import SpanNearQuery, SpanTermQuery

    q = SpanNearQuery((SpanTermQuery("table"), SpanTermQuery("scan")), 3,
                      True)
    hits = span_index.search(q, k=10).collect()
    assert hits
    for r in hits:
        ex = span_index.explain(q, int(r.doc_id))
        assert ex["match"] is True
        assert ex["score"] == r.score  # bitwise f32 recomposition
    miss = span_index.explain(q, 2)  # doc2 has neither table nor scan
    assert miss["match"] is False and miss["score"] == 0.0


class FakeSpans:
    """Duck-typed spans stream from a literal (start, end) list, for
    unit-testing the composing iterators."""

    def __init__(self, pairs):
        self._pairs = list(pairs)
        self._i = 0
        self.start = self.end = -1
        self.width = 0

    def next(self):
        if self._i >= len(self._pairs):
            self.start = self.end = NMP
            return NMP
        self.start, self.end = self._pairs[self._i]
        self.width = self.end - self.start - 1
        self._i += 1
        return self.start


def test_containing_unit():
    from lucene_solr_spark.search.spans import ContainingSpans

    # big (0,4) contains little (2,3); big (6,9) has no little inside
    got = drain(ContainingSpans(FakeSpans([(0, 4), (6, 9)]),
                                FakeSpans([(2, 3), (10, 11)])))
    assert [(s, e) for s, e, _ in got] == [(0, 4)]
    # little extends past big's end -> no containment
    got = drain(ContainingSpans(FakeSpans([(0, 3)]), FakeSpans([(1, 5)])))
    assert got == []


def test_within_unit():
    from lucene_solr_spark.search.spans import WithinSpans

    # little (1,2) lies inside big (0,4); little (5,6) does not
    got = drain(WithinSpans(FakeSpans([(0, 4)]),
                            FakeSpans([(1, 2), (5, 6)])))
    assert [(s, e) for s, e, _ in got] == [(1, 2)]
    # big starts after little -> rejected
    got = drain(WithinSpans(FakeSpans([(2, 6)]), FakeSpans([(1, 3)])))
    assert got == []


def test_e2e_containing_within(span_index):
    from lucene_solr_spark.search.query import (
        SpanContainingQuery,
        SpanNearQuery,
        SpanTermQuery,
        SpanWithinQuery,
    )

    near = SpanNearQuery((SpanTermQuery("table"), SpanTermQuery("scan")),
                         3, True)
    # doc3 "table big big big scan dup": near spans (0,5) containing
    # big@1; doc0's (0,2) near span has no "big" inside (term absent)
    cont = span_index.search(
        SpanContainingQuery(near, SpanTermQuery("big")), k=10
    ).collect()
    assert [r.doc_id for r in cont] == [3]

    within = span_index.search(
        SpanWithinQuery(near, SpanTermQuery("big")), k=10
    ).collect()
    assert [r.doc_id for r in within] == [3]

    # dup@5 ends past the near span's end 5 -> not contained
    none = span_index.search(
        SpanContainingQuery(near, SpanTermQuery("dup")), k=10
    ).collect()
    assert none == []


def test_e2e_span_mtq_wrapper(span_index):
    from lucene_solr_spark.search.query import (
        PrefixQuery,
        SpanMultiTermQueryWrapper,
        SpanNearQuery,
        SpanTermQuery,
    )

    q = SpanNearQuery(
        (SpanMultiTermQueryWrapper(PrefixQuery("ta")),
         SpanTermQuery("scan")),
        0, True,
    )
    hits = span_index.search(q, k=10).collect()
    # "table scan" adjacency: doc0 once, doc1 twice (higher freq)
    assert {r.doc_id for r in hits} == {0, 1}

    empty = span_index.search(
        SpanNearQuery(
            (SpanMultiTermQueryWrapper(PrefixQuery("zz")),
             SpanTermQuery("scan")),
            0, True,
        ),
        k=10,
    ).collect()
    assert empty == []


@pytest.mark.parametrize("seed", range(12))
def test_random_containment_parity(seed):
    """Containing/within over near([a,b], slop, ordered) + term c:
    the greedy iterators must equal the closed-form existence
    predicates (valid: ordered 2-term near spans have strictly
    increasing starts and nondecreasing ends)."""
    rng = np.random.default_rng(seed + 1000)
    pool = rng.permutation(40)
    na, nb, nc = rng.integers(1, 7, 3)
    apos = np.sort(pool[:na]).astype(np.int64)
    bpos = np.sort(pool[na:na + nb]).astype(np.int64)
    cpos = np.sort(pool[na + nb:na + nb + nc]).astype(np.int64)
    slop = int(rng.integers(0, 8))
    posmap = {
        "a": (np.zeros(len(apos), np.int64), apos),
        "b": (np.zeros(len(bpos), np.int64), bpos),
        "c": (np.zeros(len(cpos), np.int64), cpos),
    }
    near = {
        "op": "near",
        "clauses": [{"op": "term", "term": "a"}, {"op": "term", "term": "b"}],
        "slop": slop, "in_order": True,
    }
    # closed-form big spans: (s=a, e=y+1) for minimal y > a, gap <= slop
    bigs = []
    for a in apos:
        nxt = bpos[bpos > a]
        if len(nxt) == 0:
            break
        if nxt[0] - a - 1 <= slop:
            bigs.append((int(a), int(nxt[0])))
    exp_cont = sum(
        1.0 / (y - s)
        for s, y in bigs
        if np.any((cpos >= s) & (cpos <= y))
    )
    exp_with = float(sum(
        1 for p in cpos if any(s <= p <= y for s, y in bigs)
    ))
    cont = {"op": "containing", "big": near,
            "little": {"op": "term", "term": "c"}}
    within = {"op": "within", "big": near,
              "little": {"op": "term", "term": "c"}}
    assert doc_freq_spans(cont, posmap, 0) == pytest.approx(exp_cont)
    assert doc_freq_spans(within, posmap, 0) == pytest.approx(exp_with)
