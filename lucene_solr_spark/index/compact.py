"""Index compaction: absorb NRT delta generations + apply deletes.

Reference semantics: a merge rewrites segments without their deleted
docs — docIDs compact via the deletion-aware DocMap + docBase
concatenation (index/SegmentMerger.java:74-130, MergeState.java:63-142),
and collection statistics (docFreq, sumTotalTermFreq, maxDoc) stop
counting the removed docs. After compaction the index is a single
generation again and tombstones are cleared.

Spark shape — FULLY DISTRIBUTED (no O(max_doc) driver state):
- alive set       = doc_map ⋈(anti) tombstone-resolved deletes
- per-shard stats = one groupBy (the ONLY driver materialization is
  N_shards rows: count / min docID / Σdoc_len per shard)
- new docIDs      = shard_new_base + rank-among-alive-within-shard;
  shards' doc runs are contiguous and monotone in docID, so the rank
  is computable inside each shard's task (Lucene's DocMap: new id =
  old id − deleted-below, MergeState.java:63-142)
- postings        = postings ⋈(cogroup on shard) alive doc_map rows:
  decode, drop dead, remap via searchsorted on the shard's alive ids,
  re-encode blocks — one applyInPandas pass per shard
- norms / doc_map = one applyInPandas per shard over the alive rows
  (norm bytes ride the doc_map, no blob join needed)
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import NORMS_SCHEMA, POSTINGS_SCHEMA
from lucene_solr_spark.index.codec import (
    decode_position_lists,
    decode_posting_list,
    encode_position_lists,
    encode_posting_lists,
)


def compact(
    spark: SparkSession, index_dir: str, out_dir: str, keep=None
) -> dict:
    """Compact base + deltas + tombstones of `index_dir` into a fresh
    single-generation index at `out_dir`. Returns the new manifest.

    `keep` (optional pyspark Column over doc_map rows) restricts the
    surviving docs — the index-split primitive (see split_index)."""
    from lucene_solr_spark.search.searcher import IndexSearcher
    from lucene_solr_spark.session import ensure_on_workers

    ensure_on_workers(spark)
    s = IndexSearcher.open(spark, index_dir)
    if len(s.manifest.get("fields", ["text"])) > 1:
        raise NotImplementedError(
            "compact() currently supports single-field indexes (extra-"
            "field norms do not ride the doc_map; rebuild instead)"
        )
    default_field = s._default_field
    codec = s.manifest["config"].get("codec", "vbyte")
    doc_map = s.doc_map()
    doc_offsets = dict(s._doc_offsets)  # shard -> generation docID offset

    alive = doc_map
    if s._has_tombstones():
        alive = doc_map.join(
            s.deleted_df().select("doc_id"), "doc_id", "left_anti"
        )
    if keep is not None:
        alive = alive.where(keep)
    alive = alive.persist()

    # ---- per-shard stats: the only driver-side state (N_shards rows)
    stats = (
        alive.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("mn"),
            F.sum("doc_len").alias("dl"),
        )
        .collect()
    )
    stats.sort(key=lambda r: r.mn)  # docID order == shard run order
    shard_renum: dict[int, int] = {}
    new_base: dict[int, int] = {}
    acc = 0
    for new_s, r in enumerate(stats):
        shard_renum[int(r.shard)] = new_s
        new_base[int(r.shard)] = acc
        acc += int(r.n)
    new_max_doc = acc
    sttf = sum(int(r.dl) for r in stats)
    bmap = spark.sparkContext.broadcast(
        {"renum": shard_renum, "base": new_base}
    )

    os.makedirs(out_dir, exist_ok=True)
    key_t = "string" if s.manifest.get("key_kind") == "s" else "long"

    # ---- norms + doc_map per shard ----
    def build_norms(pdf: pd.DataFrame) -> pd.DataFrame:
        m = bmap.value
        pdf = pdf.sort_values("doc_id")
        old = int(pdf["shard"].iloc[0])
        return pd.DataFrame(
            {
                "shard": [m["renum"][old]],
                "field": [default_field],
                "base": [m["base"][old]],
                "n_docs": [len(pdf)],
                "norms": [pdf["norm"].to_numpy(np.uint8).tobytes()],
            }
        )

    def build_dm(pdf: pd.DataFrame) -> pd.DataFrame:
        m = bmap.value
        pdf = pdf.sort_values("doc_id")
        old = int(pdf["shard"].iloc[0])
        ns, nb = m["renum"][old], m["base"][old]
        return pd.DataFrame(
            {
                "doc_id": nb + np.arange(len(pdf), dtype=np.int64),
                "key": pdf["key"].to_numpy(),
                "shard": np.full(len(pdf), ns, np.int32),
                "g": np.full(len(pdf), ns, np.int64),
                "doc_len": pdf["doc_len"].to_numpy(np.int64),
                "norm": pdf["norm"].to_numpy(np.int32),
            }
        )

    alive.groupBy("shard").applyInPandas(build_norms, NORMS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "norms"))
    alive.groupBy("shard").applyInPandas(
        build_dm,
        f"doc_id long, key {key_t}, shard int, g long, doc_len long, norm int",
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "doc_map"))

    # ---- postings rewrite: cogroup(postings, alive doc_map) per shard
    def rewrite(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = {f.name: [] for f in POSTINGS_SCHEMA.fields}
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(out)
        m = bmap.value
        old = int(left["shard"].iloc[0])
        ns, nb = m["renum"][old], m["base"][old]
        right = right.sort_values("doc_id")
        alive_glob = right["doc_id"].to_numpy(np.int64)
        alive_norm = right["norm"].to_numpy(np.uint8)
        gen_off = doc_offsets.get(old, 0)
        for row in left.sort_values(["term", "part"]).itertuples(index=False):
            d, t = decode_posting_list(
                bytes(row.doc_enc), bytes(row.tf_enc), int(row.df),
                codec=codec,
            )
            # decoded ids are generation-local; lift to global first
            d_glob = d + gen_off
            pos = np.searchsorted(alive_glob, d_glob)
            pos_c = np.minimum(pos, max(len(alive_glob) - 1, 0))
            keep = alive_glob[pos_c] == d_glob
            if not keep.any():
                continue
            # new id = shard base + rank among the shard's alive docs
            new_d = nb + pos_c[keep].astype(np.int64)
            new_t = t[keep]
            enc = encode_posting_lists(
                np.array([len(new_d)], np.int64),
                new_d,
                new_t,
                alive_norm[pos_c[keep]],
                codec=codec,
            )
            out["shard"].append(ns)
            out["term"].append(row.term)
            out["part"].append(int(row.part))
            out["df"].append(int(len(new_d)))
            out["cf"].append(int(new_t.sum()))
            out["doc_enc"].append(enc["doc_enc"][0])
            out["tf_enc"].append(enc["tf_enc"][0])
            for kcol in ("block_last", "block_doc_off", "block_tf_off",
                         "block_max_tf", "block_max_norm"):
                out[kcol].append(enc[kcol][0])
            # positions survive: per-doc runs are doc-local, so keep the
            # alive docs' runs and re-encode (no rebase needed)
            if row.pos_enc is not None:
                pos_abs = decode_position_lists(bytes(row.pos_enc), t)
                keep_rep = np.repeat(keep, t)
                out["pos_enc"].append(
                    encode_position_lists(
                        pos_abs[keep_rep], new_t,
                        np.array([int(new_t.sum())]),
                    )[0]
                )
            else:
                out["pos_enc"].append(None)
        return pd.DataFrame(out)

    new_post = (
        s._postings.groupBy("shard")
        .cogroup(alive.groupBy("shard"))
        .applyInPandas(rewrite, POSTINGS_SCHEMA)
    )
    (
        new_post.repartition(max(len(stats), 1), "shard")
        .sortWithinPartitions("shard", "term", "part")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "postings"))
    )

    pf = spark.read.parquet(os.path.join(out_dir, "postings"))
    term_stats = pf.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    )
    term_stats.coalesce(4).sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "term_stats"))
    alive.unpersist()

    bases = {str(shard_renum[int(r.shard)]): new_base[int(r.shard)]
             for r in stats}
    manifest = {
        "version": 1,
        "config": s.manifest["config"],
        "key_kind": s.manifest.get("key_kind", "l"),
        "max_doc": int(new_max_doc),
        "sum_total_term_freq": int(sttf),
        "field_stats": {default_field: int(sttf)},
        "fields": [default_field],
        "n_input_rows": int(new_max_doc),
        "seg_bases": bases,
        "shard_bases": bases,
        "compacted_from": index_dir,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def split_index(
    spark: SparkSession, index_dir: str, out_dirs: list[str]
) -> list[dict]:
    """Split one index into len(out_dirs) disjoint indexes by hash
    range of the uniqueKey (solr/.../update/SolrIndexSplitter.java
    semantics: murmur-hash-range routing; here pmod(xxhash64(key))).
    Each split is a fully independent index with its own recomputed
    collection statistics — exactly what SolrIndexSplitter produces.
    Deletes/deltas of the source are absorbed in the same pass."""
    n = len(out_dirs)
    manifests = []
    for i, od in enumerate(out_dirs):
        manifests.append(
            compact(
                spark, index_dir, od,
                keep=F.pmod(F.xxhash64(F.col("key")), F.lit(n)) == i,
            )
        )
    return manifests
