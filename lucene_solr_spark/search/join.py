"""Query-time join with score modes — Lucene's JoinUtil.createJoin
analog (lucene/join/src/java/org/apache/lucene/search/join/
JoinUtil.java:36-120, ScoreMode.java: None/Avg/Max/Total).

Lucene runs `fromQuery` on the from side, collects each matching doc's
join-field value with its score aggregated per value (TermsCollector /
score-aware TermsWithScoreCollector), then matches to-side docs whose
join field holds a collected value, scoring them with the aggregate.

Spark mapping (declarative, no UDFs): the from-side hit frame joins the
stored-field table once to attach join values, ONE hash-aggregate
produces the per-value score aggregate (map-side partial), and the
small aggregate frame broadcast-joins into the to side. At the 100 TB
design point the broadcast holds one row per DISTINCT join value
matched by the query — the same bound as Lucene's collected-terms
BytesRefHash, and orders below the corpus. Skew-safe: the to-side join
is a broadcast hash join, so hot join values cost no shuffle.

Score modes follow ScoreMode.java:
- "none"  -> constant 1.0 per joined doc (membership only)
- "max"   -> max from-side score per value (order-independent, exact)
- "total" -> sum of from-side scores per value
- "avg"   -> total / count

float caveat: "total"/"avg" sum float32 scores in shuffle order; the
aggregate is computed in float64 and is deterministic for a fixed
partitioning but not bit-portable across engines — oracle entries
round those columns (the same trade ToParentBlockJoin's sum entry
documents). "max"/"none" are bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_util(
    from_hits: DataFrame,
    from_docs: DataFrame,
    from_field: str,
    to_docs: DataFrame,
    to_field: str,
    score_mode: str = "max",
) -> DataFrame:
    """(doc_id, score) of to-side docs joined from a from-side hit set.

    from_hits: (doc_id, score) — a searcher result (k=None for the full
    match set, as JoinUtil scores every from match).
    from_docs / to_docs: stored-field tables holding the join fields.
    """
    if score_mode not in ("none", "max", "total", "avg"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    vals = from_hits.join(
        from_docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(from_field).alias("_jv"),
        ),
        "doc_id",
    )
    if score_mode == "none":
        agg = vals.select("_jv").distinct().withColumn("_jscore", F.lit(1.0))
    else:
        g = vals.groupBy("_jv")
        if score_mode == "max":
            agg = g.agg(F.max(F.col("score").cast("double")).alias("_jscore"))
        elif score_mode == "total":
            agg = g.agg(F.sum(F.col("score").cast("double")).alias("_jscore"))
        else:  # avg
            agg = g.agg(F.avg(F.col("score").cast("double")).alias("_jscore"))
    return (
        to_docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(to_field).alias("_jv"),
        )
        .join(F.broadcast(agg), "_jv")
        .select("doc_id", F.col("_jscore").alias("score"))
    )


def to_parent_block_join(
    child_hits: DataFrame,
    docs: DataFrame,
    parent_field: str,
    score_mode: str = "max",
) -> DataFrame:
    """ToParentBlockJoinQuery analog (join/src/java/org/apache/lucene/
    search/join/ToParentBlockJoinQuery.java:82-140): child hits
    aggregate up to their parent block, scored per ScoreMode.

    Parent blocks are keyed by `parent_field` (the Spark mapping of
    Lucene's contiguous doc-block + parent bit-set: a grouping key on
    the child rows). Returns (parent_key, score, n_children) — one
    hash-aggregate with map-side combine; n_children = matching
    children, for parent-level filtering (the parentsFilter seam).

    Float caveat mirrors join_util: "total"/"avg" sum f32 scores in
    double in shuffle order (deterministic per run, not bit-portable —
    round at the surface); "max"/"none" are bitwise."""
    if score_mode not in ("none", "max", "total", "avg"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    vals = child_hits.join(
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(parent_field).alias("parent_key"),
        ),
        "doc_id",
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_children")]
    s = F.col("score").cast("double")
    if score_mode == "none":
        aggs.append(F.first(F.lit(1.0)).alias("score"))
    elif score_mode == "max":
        aggs.append(F.max(s).alias("score"))
    elif score_mode == "total":
        aggs.append(F.sum(s).alias("score"))
    else:
        aggs.append(F.avg(s).alias("score"))
    return vals.groupBy("parent_key").agg(*aggs).select(
        "parent_key", "score", "n_children"
    )


def to_child_block_join(
    parent_hits: DataFrame, docs: DataFrame, parent_field: str
) -> DataFrame:
    """ToChildBlockJoinQuery analog (join/src/java/org/apache/lucene/
    search/join/ToChildBlockJoinQuery.java:63-150): every CHILD of a
    matching parent matches, scored with its parent's score (the
    reference propagates parentScorer.score() to each child doc of the
    parent's block).

    parent_hits: (parent_key, score) — e.g. the output of
    to_parent_block_join (optionally parent-filtered). The join is a
    broadcast hash join on the matched-parent frame — one row per
    MATCHED parent (the same bound as Lucene's parent bit-set walk),
    orders below the child corpus, so no shuffle of the child table."""
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(parent_field).alias("parent_key"),
        )
        .join(
            F.broadcast(parent_hits.select("parent_key", "score")),
            "parent_key",
        )
        .select("doc_id", "score")
    )
