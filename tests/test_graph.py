"""Graph traversal ops — gatherNodes hop semantics and BFS minimal
levels (solrj/io/graph/GatherNodesStream.java, ShortestPathStream.java
analogs; lucene_solr_spark/ops/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_solr_spark.ops.graph import (
    bfs_levels,
    gather_nodes,
    gather_nodes_count,
)


def _edges(spark, pairs, cols=("src", "dst")):
    return spark.createDataFrame(pairs, list(cols))


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["node"])


def test_gather_nodes_unique_hop(spark):
    # a->x twice must gather x ONCE; b unreached from seed {a}
    e = _edges(spark, [("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")])
    got = sorted(
        r.node for r in gather_nodes(e, _nodes(spark, ["a"]), "src", "dst").collect()
    )
    assert got == ["x", "y"]


def test_gather_nodes_count_distinct_via(spark):
    # z reached via a AND b -> n_via 2; duplicate a->z edges count once
    e = _edges(
        spark,
        [("a", "z"), ("a", "z"), ("b", "z"), ("b", "w"), ("c", "q")],
    )
    got = {
        r.node: r.n_via
        for r in gather_nodes_count(
            e, _nodes(spark, ["a", "b"]), "src", "dst"
        ).collect()
    }
    assert got == {"z": 2, "w": 1}


def test_gather_nodes_count_exclude(spark):
    e = _edges(spark, [("a", "z"), ("a", "a")])  # self-loop back to seed
    got = {
        r.node: r.n_via
        for r in gather_nodes_count(
            e, _nodes(spark, ["a"]), "src", "dst", exclude=_nodes(spark, ["a"])
        ).collect()
    }
    assert got == {"z": 1}


def test_bfs_levels_minimal_distance(spark):
    # diamond a->b->d and a->c->d plus long way d->e; level(d) must be
    # the MINIMUM (2), not 3 via any other expansion; visited pruning
    # keeps a at level 0 despite the back-edge b->a
    e = _edges(
        spark,
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("b", "a")],
    )
    got = {
        r.node: r.level
        for r in bfs_levels(e, _nodes(spark, ["a"]), max_hops=3).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_bfs_levels_max_hops_bound(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {
        r.node: r.level
        for r in bfs_levels(e, _nodes(spark, ["a"]), max_hops=2).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}  # d beyond the bound


def test_bfs_levels_multi_seed(spark):
    # two seeds: nodes take distance to the NEAREST seed
    e = _edges(spark, [("a", "b"), ("b", "c"), ("z", "c")])
    got = {
        r.node: r.level
        for r in bfs_levels(e, _nodes(spark, ["a", "z"]), max_hops=3).collect()
    }
    assert got == {"a": 0, "z": 0, "b": 1, "c": 1}
