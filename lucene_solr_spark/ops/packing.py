"""Training-shard packing: assign documents to fixed token-budget shards.

The curation step that turns a curated corpus into training shards: walk
the documents in a deterministic order (doc_id asc) and cut a new shard
every time the running token count crosses the budget. Semantically this
is ``floor(exclusive_prefix_sum(n_tokens) / budget)`` — one SQL window —
but the naive Spark form (``Window.orderBy`` with no partitionBy) funnels
the whole corpus through ONE task, the canonical single-partition-window
anti-pattern. At 100 TB that task never finishes.

This module implements the distributed prefix sum instead:

1. bucket docs into P contiguous doc_id ranges (pure arithmetic on the
   id — no shuffle, no sampled range partitioner, deterministic across
   runs and parallelism levels);
2. ONE tiny aggregation computes per-bucket token totals (P rows);
   the exclusive running offset over those P rows is a P-element
   cumsum — broadcast back (P ≈ thousands even at 10^12 docs);
3. ONE window per bucket (``partitionBy(bucket).orderBy(doc_id)``,
   P-way parallel) adds the local exclusive prefix to the bucket
   offset; ``shard_id = floor(global_prefix / budget)``.

Two shuffles total, both P-way parallel; driver state is P longs. The
oracle (ops/oracles.py::pack_shards_sql) uses the single-window SQL form,
so the driver check proves the distributed decomposition exact.

Token accounting matches ops.textstats.token_count_cols's "bpe" count
(``[a-z0-9]+`` runs) so shard sizes line up with the curation
dashboards built on the same counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Buckets for the distributed prefix sum. Must be >= the job's useful
# parallelism; each bucket holds ~n_docs/P rows during the window stage.
N_BUCKETS = 64


def doc_token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) with the BPE-ish ``[a-z0-9]+`` counter."""
    return docs.select(
        "doc_id",
        F.expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))")
        .cast("long")
        .alias("n_tokens"),
    )


def pack_shards(
    docs: DataFrame, budget: int = 2048, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Assign each document to a training shard of ~`budget` tokens.

    Returns (doc_id, n_tokens, shard_id): shard_id is
    floor(exclusive-prefix-sum(n_tokens) over doc_id order / budget) —
    a document whose prefix crosses the boundary starts the next shard;
    single documents larger than the budget get a shard of their own
    (never split — a training shard boundary may not cut a document).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = doc_token_counts(docs)

    # Contiguous id-range buckets via pure arithmetic: deterministic,
    # shuffle-free, and (unlike spark_partition_id over a sampled range
    # partitioner) stable across runs and parallelism levels. Web-scale
    # ids from monotonically_increasing_id or a crawl sequence are
    # near-uniform over their range; pathological id skew would surface
    # in the bucket-totals frame (P rows — cheap to inspect).
    lo, hi = toks.agg(F.min("doc_id"), F.max("doc_id")).first()
    if lo is None:
        return toks.withColumn("shard_id", F.lit(0).cast("long"))
    width = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    bucket = ((F.col("doc_id") - F.lit(int(lo))) / F.lit(width)).cast("long")
    toks = toks.withColumn("_bucket", bucket)

    # Stage 1: per-bucket totals -> P-row exclusive running offsets.
    totals = (
        toks.groupBy("_bucket").agg(F.sum("n_tokens").alias("_t")).collect()
    )
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["_bucket"]):
        offsets[int(row["_bucket"])] = acc
        acc += int(row["_t"])
    off_df = F.broadcast(
        toks.sparkSession.createDataFrame(
            [(b, o) for b, o in offsets.items()], "_bucket long, _off long"
        )
    )

    # Stage 2: bucket-local exclusive prefix (P-way parallel window).
    w = (
        Window.partitionBy("_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        toks.join(off_df, "_bucket")
        .withColumn(
            "shard_id",
            F.floor((local + F.col("_off")) / F.lit(budget)).cast("long"),
        )
        .select("doc_id", "n_tokens", "shard_id")
    )


def shard_stats(docs: DataFrame, budget: int = 2048) -> DataFrame:
    """Per-shard packing summary: (shard_id, n_docs, sum_tokens)."""
    return (
        pack_shards(docs, budget)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .orderBy("shard_id")
    )
