"""Graph traversal over edge tables — the batch analog of Solr's
streaming-expression graph sources.

Reference semantics:
- gatherNodes (solr/solrj/src/java/org/apache/solr/client/solrj/io/
  graph/GatherNodesStream.java:60-120): one breadth-first hop — from a
  set of seed nodes, walk `from -> to` over an edge collection and
  emit the UNIQUE gathered nodes (optionally with aggregations over
  the traversed edges).
- shortestPath (solr/solrj/.../io/graph/ShortestPathStream.java:
  49-90): iterative BFS, one join per level, visited-set pruning.

Spark mapping (declarative, no UDFs, no driver state):
- one hop = hash semi-join of the edge table against the (small)
  frontier + distinct — the frontier frame stays orders below the
  edge table, so Spark broadcasts it and each hop is ONE pass over
  edges with no edge-table shuffle;
- BFS levels = the hop iterated with a visited-set anti-join,
  union + min-level aggregate per round. Rounds are bounded by
  `max_hops` (shortestPath's maxDepth knob) — web-graph frontiers
  explode in a handful of hops, so the loop count is a small constant,
  not a data-dependent convergence wait.

At the 100 TB design point the edge table is the big side and is only
ever scanned, never collected; frontiers/visited sets are node-id
frames that broadcast while small and degrade to shuffle joins when
not — the same shape Solr distributes via its /export-backed streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gather_nodes(
    edges: DataFrame, seeds: DataFrame, walk_from: str, walk_to: str
) -> DataFrame:
    """One gatherNodes hop: unique `walk_to` values of edges whose
    `walk_from` value is in `seeds` (a one-column node frame named
    `node`). Returns a one-column frame named `node`."""
    fr = seeds.select(F.col("node").alias(walk_from)).distinct()
    return (
        edges.join(fr, walk_from)
        .select(F.col(walk_to).alias("node"))
        .distinct()
    )


def gather_nodes_count(
    edges: DataFrame,
    seeds: DataFrame,
    walk_from: str,
    walk_to: str,
    exclude: DataFrame | None = None,
) -> DataFrame:
    """gatherNodes with the `count(*)`-style edge aggregation
    (GatherNodesStream metrics param): per gathered node, the number
    of DISTINCT from-side nodes it was reached through. `exclude`
    drops nodes already visited (the scatter="leaves" shape)."""
    fr = seeds.select(F.col("node").alias(walk_from)).distinct()
    hop = edges.join(fr, walk_from).select(
        F.col(walk_to).alias("node"), F.col(walk_from).alias("_via")
    )
    if exclude is not None:
        hop = hop.join(
            exclude.select(F.col("node")).distinct(), "node", "left_anti"
        )
    return hop.groupBy("node").agg(
        F.count_distinct("_via").cast("long").alias("n_via")
    )


def bfs_levels(
    edges: DataFrame, seeds: DataFrame, max_hops: int
) -> DataFrame:
    """Breadth-first levels from `seeds` over a DIRECTED edge frame
    (columns src, dst): (node, level) with level = minimal hop count
    <= max_hops (shortestPath's visited-pruned level walk,
    ShortestPathStream.java:49-90 — each level joins the frontier to
    the edge table once and drops already-visited nodes).

    Undirected graphs pass edges unioned with their reverse. Levels
    are exact minimal distances: a node enters the result at the
    FIRST level that reaches it and the anti-join keeps later, longer
    paths out.
    """
    frontier = seeds.select(F.col("node")).distinct()
    visited = frontier.withColumn("level", F.lit(0).cast("int"))
    for lvl in range(1, max_hops + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        # localCheckpoint would truncate lineage for deep walks; hop
        # counts here are small constants (Solr's maxDepth default 6)
        nxt = nxt.withColumn("level", F.lit(lvl).cast("int"))
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    return visited
