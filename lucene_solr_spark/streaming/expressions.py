"""Solr streaming-expression decorators — the TupleStream combinator
set (solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/).

Solr's streaming expressions are a dataflow algebra over sorted tuple
streams: a source (`search(...)` = CloudSolrStream's shard-merged
sorted scan) wrapped by decorators (`unique`, `top`/rank, `merge`,
`reduce`, `rollup`, `parallel`). Each decorator here is the
DataFrame-native equivalent of one TupleStream's read() loop — the
per-tuple iterator state machines become declarative window / union /
group operators, so Catalyst plans them and every one of them scales
as an ordinary shuffle (or none at all) instead of a single-node tuple
pump. `parallel(...)`'s worker partitioning IS Spark's execution model
(ParallelStream.java:51-60 hash-partitions on partitionKeys and merges
workers by comparator — exactly repartition + sort-merge), so it needs
no wrapper.

Sort specs use Solr's expression syntax: "field asc" / "field desc",
comma-separated, e.g. ``"lang asc, doc_id desc"``
(StreamExpressionParser's sort parameter format).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sort_exprs(sort: str) -> list[Column]:
    """Parse Solr's "f1 asc, f2 desc" sort parameter into order-by
    expressions (io/comp/FieldComparator semantics: missing direction
    defaults asc)."""
    out: list[Column] = []
    for part in sort.split(","):
        bits = part.strip().split()
        if not bits:
            continue
        col, direction = bits[0], (bits[1].lower() if len(bits) > 1 else "asc")
        if direction not in ("asc", "desc"):
            raise ValueError(f"bad sort direction {direction!r}")
        out.append(F.asc(col) if direction == "asc" else F.desc(col))
    if not out:
        raise ValueError("empty sort spec")
    return out


def search_stream(df: DataFrame, sort: str) -> DataFrame:
    """`search(collection, sort=...)` source — CloudSolrStream's
    sorted scan, merged across shards by the sort comparator
    (CloudSolrStream.java: per-shard sorted cursors + tree merge).
    Spark's orderBy is that same shard-merge, planned as a range
    exchange."""
    return df.orderBy(*_sort_exprs(sort))


def merge_stream(left: DataFrame, right: DataFrame, sort: str) -> DataFrame:
    """`merge(a, b, on=...)` — merge-union of two streams sorted on
    the same comparator (MergeStream.java: two cursors, emit the
    lesser head). Union + one range exchange; the reference's
    two-cursor walk is the degenerate 2-partition case."""
    return left.unionByName(right).orderBy(*_sort_exprs(sort))


def unique_stream(df: DataFrame, over: str, sort: str) -> DataFrame:
    """`unique(stream, over=...)` — on a sorted stream, keep the FIRST
    tuple of each equal-`over` run (UniqueStream.java:129-153: emit,
    then skip while eq.test(current, next)). Declaratively: the
    sort-order-first row per `over` key — a key-partitioned
    row_number window, so dedup state is per-key-local at any scale
    (the reference needs the stream globally sorted by `over`; the
    window needs only a hash exchange on it)."""
    over_cols = [c.strip() for c in over.split(",") if c.strip()]
    w = Window.partitionBy(*over_cols).orderBy(*_sort_exprs(sort))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(*_sort_exprs(sort))
    )


def rank_stream(df: DataFrame, n: int, sort: str) -> DataFrame:
    """`top(n, stream, sort=...)` — bounded top-N by the comparator
    (RankStream.java read(): a size-capped priority queue drained in
    order). orderBy+limit = per-partition heaps + TakeOrderedAndProject
    merge: the same algorithm, one per partition."""
    return df.orderBy(*_sort_exprs(sort)).limit(int(n))


def reducer_stream(
    df: DataFrame, by: str, sort: str, group_col: str = "tuples"
) -> DataFrame:
    """`reduce(stream, by=...)` — group the sorted stream on equal
    `by` keys; the emitted group-head tuple carries the FIRST tuple's
    fields plus ALL the group's tuples (ReducerStream.java read():
    maps accumulated per equal-comparator run, pushed onto the head).

    The group's tuples land in `group_col` as an array of structs in
    stream-sort order (the order the reference accumulated them); the
    scalar group-head fields are the sort-first tuple's. One hash
    exchange on the `by` keys — group state is partition-local."""
    by_cols = [c.strip() for c in by.split(",") if c.strip()]
    others = [c for c in df.columns if c not in by_cols]
    # struct leads with the sort columns; desc directions sort via
    # array_sort's comparator form (the FieldComparator chain)
    spec: list[tuple[str, bool]] = []
    for part in sort.split(","):
        bits = part.strip().split()
        if bits and bits[0] not in by_cols:
            spec.append(
                (bits[0], len(bits) > 1 and bits[1].lower() == "desc")
            )
    sort_cols = [c for c, _ in spec]
    lead = sort_cols + [c for c in others if c not in sort_cols]

    def comparator(left, right):
        # nested when-chain: compare field by field, flipping the
        # sign for desc (io/comp/MultipleFieldComparator semantics)
        out = F.lit(0)
        for col, desc in reversed(spec):
            lo, hi = (1, -1) if desc else (-1, 1)
            out = (
                F.when(left[col] < right[col], F.lit(lo))
                .when(left[col] > right[col], F.lit(hi))
                .otherwise(out)
            )
        return out

    items = F.collect_list(F.struct(*[F.col(c) for c in lead]))
    sorted_items = (
        F.array_sort(items, comparator)
        if any(d for _, d in spec)
        else F.array_sort(items)
    )
    grouped = df.groupBy(*by_cols).agg(sorted_items.alias(group_col))
    head = [
        F.col(f"{group_col}")[0][c].alias(c) for c in lead
    ]
    return grouped.select(*by_cols, *head, group_col)
