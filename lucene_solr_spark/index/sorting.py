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

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import IndexConfig, build_index

DEFAULT_BITS = 20
_META = "_sort_meta.json"


def sorted_key_col(
    sort_col: str,
    id_col: str,
    bits: int = DEFAULT_BITS,
    descending: bool = False,
    max_v: int = 0,
):
    """Order-preserving composite key (sort_value, id) -> int64.

    Descending (Lucene's SortField reverse) embeds (max_v - v) so the
    ascending key order IS the descending value order; id stays asc as
    the tiebreak, Lucene's docID tiebreak."""
    v = F.col(sort_col).cast("long")
    if descending:
        v = F.lit(int(max_v)) - v
    return (v * F.lit(1 << bits) + F.col(id_col).cast("long")).alias("skey")


def build_sorted_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    sort_col: str,
    config: IndexConfig | None = None,
    bits: int = DEFAULT_BITS,
    descending: bool = False,
) -> dict:
    """Build an index whose docID order follows (sort_col asc|desc,
    id asc).

    The returned manifest is a normal index manifest; `IndexSearcher`
    opens it unchanged (keys are the composite skey). A `_sort_meta`
    sidecar records (sort_col, bits, descending, max_v) so
    `sorted_topk` decodes without the caller restating them — the
    index-sort entry in Lucene's SegmentInfo diagnostics.
    """
    cfg = config or IndexConfig()
    if cfg.sharding != "range_int":
        raise ValueError("index sorting requires sharding='range_int'")
    id_col, text_col = cfg.id_col, cfg.text_col
    bad_n, max_v = docs.select(
        F.count(
            F.when(
                (F.col(sort_col) < 0)
                | F.col(sort_col).isNull()
                | (F.col(id_col) >= F.lit(1 << bits))
                | (F.col(id_col) < 0),
                1,
            )
        ),
        F.max(F.col(sort_col).cast("long")),
    ).first()
    if bad_n:
        raise ValueError(
            f"sort field must be a non-negative integer and ids must fit "
            f"{bits} bits — raise `bits` for larger corpora"
        )
    keyed = docs.select(
        sorted_key_col(sort_col, id_col, bits, descending, max_v or 0),
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
    manifest = build_index(spark, keyed, out_dir, sorted_cfg)
    with open(os.path.join(out_dir, _META), "w") as fh:
        json.dump(
            {
                "sort_col": sort_col,
                "bits": bits,
                "descending": bool(descending),
                "max_v": int(max_v or 0),
            },
            fh,
        )
    return manifest


def sort_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as fh:
        return json.load(fh)


def sorted_topk(
    searcher,
    query,
    k: int,
    sort_name: str = "sort_value",
    id_name: str = "doc_id",
    after: tuple[int, int] | None = None,
    before_count: int = 0,
) -> DataFrame:
    """Exact top-k of the MATCH SET in the index's sort order
    (asc or desc per the build-time sidecar), collecting at most
    k matches per shard past the cursor (sorted-index early
    termination + searchAfter keyset paging).

    `after` = the LAST row of the previous page as (id, sort_value) —
    the same order the rows come back in, so `after=rows[-1]` pages
    (strictly-after semantics, Lucene's searchAfter on a sorted
    index); pass `before_count` = total rows already consumed so the
    per-shard collection budget extends to before_count + k — the
    collector's docID-order prefix is cursor-blind, so without the
    extended budget a shard whose first k matches all precede the
    cursor would contribute nothing to page N (deep paging costs grow
    linearly, exactly Lucene's paged early-termination trade).
    Returns (id_name, sort_name) rows.
    """
    meta = sort_meta(searcher.index_dir)
    bits, desc, max_v = meta["bits"], meta["descending"], meta["max_v"]
    budget = k + (before_count if after is not None else 0)
    raw = searcher.early_terminated_frame(query, max_docs_per_shard=budget)
    keys = searcher.doc_map().select("doc_id", "key")
    joined = raw.select("doc_id").join(keys, "doc_id")
    if after is not None:
        i, v = after
        enc = (max_v - int(v) if desc else int(v)) * (1 << bits) + int(i)
        joined = joined.where(F.col("key") > F.lit(enc))
    sort_v = F.shiftright(F.col("key"), bits)
    if desc:
        sort_v = F.lit(max_v) - sort_v
    return (
        joined.orderBy("key")
        .limit(k)
        .select(
            F.col("key").bitwiseAND(F.lit((1 << bits) - 1)).alias(id_name),
            sort_v.alias(sort_name),
        )
    )
