"""Index sorting: docID order == sort-field order (Lucene 6's
SortingMergePolicy / Sorter, lucene/misc/.../index/sorter/
SortingMergePolicy.java — later core IndexWriterConfig.setIndexSort).

Lucene reassigns docIDs so segment order follows a SortField; an early-
terminating TopFieldCollector can then stop after k hits per segment
because every later doc sorts after the ones already collected.

Spark mapping: we get the same invariant for free from two existing
mechanisms instead of a merge-time permutation —

  1. the composite key  skey = sort_value * 2^bits + doc_id  is an
     ORDER-PRESERVING embedding of (sort_value, doc_id): integer-sorts
     exactly like the sort field with docID tiebreak;
  2. `range_int` sharding buckets ascending key ranges into ascending
     segments, and the segment builder sorts rows by key inside each
     segment (arrow_builder.py:95) with docBases concatenated in
     segment order — so per-shard INTERNAL docID order == skey order.

`sorted_topk` then runs the deterministic EarlyTerminatingCollector
(searcher.early_terminated_frame) with budget k: the per-shard
docID-order prefix of matches IS the k smallest sort values of that
shard's matches, and the global top-k is exact with per-shard work
capped at k instead of the full match set — the sorted-index early
termination trade, made a pure function of (query, k, sharding).

Constraints (documented, validated): integer sort field, non-negative;
original ids must fit `bits` (2^20 ≈ 1M docs default — raise for
larger corpora; at 10^12 docs use bits=40, sort values < 2^23).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexConfig, build_index

DEFAULT_BITS = 20


def sorted_key_col(sort_col: str, id_col: str, bits: int = DEFAULT_BITS):
    """Order-preserving composite key (sort_value, id) -> int64."""
    return (
        F.col(sort_col).cast("long") * F.lit(1 << bits)
        + F.col(id_col).cast("long")
    ).alias("skey")


def build_sorted_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    sort_col: str,
    config: IndexConfig | None = None,
    bits: int = DEFAULT_BITS,
) -> dict:
    """Build an index whose docID order follows (sort_col asc, id asc).

    The returned manifest is a normal index manifest; `IndexSearcher`
    opens it unchanged (keys are the composite skey — decode with
    key % 2^bits / key // 2^bits, or use `sorted_topk`).
    """
    cfg = config or IndexConfig()
    if cfg.sharding != "range_int":
        raise ValueError("index sorting requires sharding='range_int'")
    id_col, text_col = cfg.id_col, cfg.text_col
    bad = docs.where(
        (F.col(sort_col) < 0)
        | F.col(sort_col).isNull()
        | (F.col(id_col) >= F.lit(1 << bits))
        | (F.col(id_col) < 0)
    ).limit(1)
    if bad.count():
        raise ValueError(
            f"sort field must be a non-negative integer and ids must fit "
            f"{bits} bits — raise `bits` for larger corpora"
        )
    keyed = docs.select(
        sorted_key_col(sort_col, id_col, bits),
        F.col(text_col).alias(text_col),
        *[F.col(x) for x in cfg.extra_fields],
    )
    sorted_cfg = IndexConfig(
        **{
            **cfg.__dict__,
            "id_col": "skey",
            "sharding": "range_int",
        }
    )
    return build_index(spark, keyed, out_dir, sorted_cfg)


def sorted_topk(
    searcher,
    query,
    k: int,
    bits: int = DEFAULT_BITS,
    sort_name: str = "sort_value",
    id_name: str = "doc_id",
) -> DataFrame:
    """Exact top-k of the MATCH SET by (sort asc, id asc), collecting at
    most k matches per shard (the sorted-index early termination).

    Returns (id_name, sort_name) rows, k of them (fewer if the match
    set is smaller)."""
    raw = searcher.early_terminated_frame(query, max_docs_per_shard=k)
    keys = searcher.doc_map().select("doc_id", "key")
    return (
        raw.select("doc_id")
        .join(keys, "doc_id")
        .orderBy("key")
        .limit(k)
        .select(
            F.col("key").bitwiseAND(F.lit((1 << bits) - 1)).alias(id_name),
            F.shiftright(F.col("key"), bits).alias(sort_name),
        )
    )
