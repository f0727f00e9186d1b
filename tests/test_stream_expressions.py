"""Streaming-expression decorators (streaming/expressions.py) —
UniqueStream / RankStream / MergeStream / ReducerStream read()-loop
semantics on small synthetic streams."""

from __future__ import annotations

import pytest

from lucene_solr_spark.streaming.expressions import (
    merge_stream,
    rank_stream,
    reducer_stream,
    search_stream,
    unique_stream,
)


@pytest.fixture(scope="module")
def stream(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 30),
            ("a", 2, 30),
            ("a", 3, 10),
            ("b", 4, 50),
            ("b", 5, 40),
            ("c", 6, 20),
        ],
        "k string, id long, v long",
    )


def test_search_stream_sorted(stream):
    rows = search_stream(stream, "v desc, id asc").collect()
    assert [r.id for r in rows] == [4, 5, 1, 2, 6, 3]


def test_unique_keeps_sort_first_per_key(stream):
    # UniqueStream.java:129-153: first tuple of each equal-key run
    rows = unique_stream(
        search_stream(stream, "k asc, v desc, id asc"),
        "k",
        "k asc, v desc, id asc",
    ).collect()
    assert [(r.k, r.id) for r in rows] == [("a", 1), ("b", 4), ("c", 6)]


def test_rank_stream_bounded_topn(stream):
    rows = rank_stream(stream, 2, "v desc, id asc").collect()
    assert [r.id for r in rows] == [4, 5]


def test_merge_stream_union_in_order(stream):
    a = stream.where("k = 'a'")
    b = stream.where("k != 'a'")
    rows = merge_stream(a, b, "v desc, id asc").collect()
    assert [r.id for r in rows] == [4, 5, 1, 2, 6, 3]


def test_reducer_group_head_and_tuples(stream):
    # ReducerStream.java read(): head fields = first tuple's, tuples =
    # the whole group's maps in stream order
    rows = {
        r.k: r
        for r in reducer_stream(stream, "k", "k asc, id asc").collect()
    }
    assert rows["a"].id == 1 and rows["a"].v == 30
    assert [t.id for t in rows["a"].tuples] == [1, 2, 3]
    assert [t.v for t in rows["a"].tuples] == [30, 30, 10]
    assert rows["b"].id == 4
    assert len(rows["c"].tuples) == 1


def test_bad_sort_spec(stream):
    with pytest.raises(ValueError):
        search_stream(stream, "v sideways")


def test_reducer_desc_stream_sort(stream):
    # desc directions sort the group tuples via the comparator form
    r = reducer_stream(stream, "k", "k asc, v desc, id asc").collect()
    by = {row.k: row for row in r}
    assert [t.id for t in by["a"].tuples] == [1, 2, 3]  # v desc: 30,30,10
    assert by["a"].v == 30 and by["a"].id == 1  # head = sort-first tuple
    assert [t.id for t in by["b"].tuples] == [4, 5]  # 50, 40
