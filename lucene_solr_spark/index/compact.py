"""Index compaction: absorb NRT delta generations + apply deletes.

Reference semantics: a merge rewrites segments without their deleted
docs — docIDs compact via the deletion-aware DocMap + docBase
concatenation (index/SegmentMerger.java:74-130, MergeState.java:63-142),
and collection statistics (docFreq, sumTotalTermFreq, maxDoc) stop
counting the removed docs. After compaction the index is a single
generation again and tombstones are cleared.

Spark shape: ONE applyInPandas pass per (global) shard — decode every
posting row, drop dead docs, remap to new dense ids, re-encode blocks
— plus a rewritten doc_map/norms and recomputed term stats. DocID
contract: alive docs keep their relative order (generation order, key
order within segments), so the compacted order equals the original
scan order minus deletions — exactly Lucene's DocMap."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import NORMS_SCHEMA, POSTINGS_SCHEMA
from lucene_solr_spark.index.codec import (
    decode_position_lists,
    decode_posting_list,
    encode_position_lists,
    encode_posting_lists,
)


def compact(spark: SparkSession, index_dir: str, out_dir: str) -> dict:
    """Compact base + deltas + tombstones of `index_dir` into a fresh
    single-generation index at `out_dir`. Returns the new manifest."""
    from lucene_solr_spark.search.searcher import IndexSearcher
    from lucene_solr_spark.session import ensure_on_workers

    ensure_on_workers(spark)
    s = IndexSearcher.open(spark, index_dir)
    doc_map = s.doc_map()
    deleted = s.deleted_doc_ids()
    doc_offsets = dict(s._doc_offsets)  # shard -> generation docID offset

    # ---- alive docs in global order -> new dense ids ----
    alive = doc_map
    if len(deleted):
        del_df = spark.createDataFrame(
            [(int(d),) for d in deleted], "doc_id long"
        )
        alive = doc_map.join(F.broadcast(del_df), "doc_id", "left_anti")
    alive_rows = alive.select("doc_id", "shard").orderBy("doc_id").collect()
    old_ids = np.array([r.doc_id for r in alive_rows], np.int64)
    old_shards = np.array([r.shard for r in alive_rows], np.int32)
    new_max_doc = len(old_ids)
    # new id = rank among alive (order preserved)
    # shards keep their doc runs contiguous (docIDs are monotone in
    # shard), so new shard bases are run starts
    shard_order = []
    shard_base = {}
    for i, sh in enumerate(old_shards):
        if not shard_order or shard_order[-1] != sh:
            shard_order.append(int(sh))
            shard_base[int(sh)] = i
    # renumber shards 0..n-1 in docID order
    shard_renum = {old: new for new, old in enumerate(shard_order)}
    remap_b = spark.sparkContext.broadcast(
        {"old_ids": old_ids, "shard_renum": shard_renum, "shard_base": shard_base}
    )

    os.makedirs(out_dir, exist_ok=True)

    # ---- postings rewrite (per shard group) ----
    def rewrite(pdf: pd.DataFrame) -> pd.DataFrame:
        rm = remap_b.value
        old_ids_ = rm["old_ids"]
        out = {f.name: [] for f in POSTINGS_SCHEMA.fields}
        for _, row in pdf.sort_values(["term", "part"]).iterrows():
            d, t = decode_posting_list(
                bytes(row["doc_enc"]), bytes(row["tf_enc"]), int(row["df"])
            )
            # decoded ids are generation-local; lift to global first
            gen_off = doc_offsets.get(int(row["shard"]), 0)
            d_glob = d + gen_off
            pos = np.searchsorted(old_ids_, d_glob)
            pos_c = np.minimum(pos, len(old_ids_) - 1)
            keep = old_ids_[pos_c] == d_glob
            if not keep.any():
                continue
            new_d = pos_c[keep].astype(np.int64)  # rank among alive == new id
            new_t = t[keep]
            dfs = np.array([len(new_d)], np.int64)
            # norm bytes index by the OLD generation-local id
            norms = np.frombuffer(row["norms"], np.uint8)
            base = int(row["base"])
            enc = encode_posting_lists(dfs, new_d, new_t, norms[d[keep] - base])
            out["shard"].append(rm["shard_renum"][int(row["shard"])])
            out["term"].append(row["term"])
            out["part"].append(int(row["part"]))
            out["df"].append(int(len(new_d)))
            out["cf"].append(int(new_t.sum()))
            out["doc_enc"].append(enc["doc_enc"][0])
            out["tf_enc"].append(enc["tf_enc"][0])
            for kcol in ("block_last", "block_doc_off", "block_tf_off",
                         "block_max_tf", "block_max_norm"):
                out[kcol].append(enc[kcol][0])
            # positions survive: per-doc runs are doc-local, so keep the
            # alive docs' runs and re-encode (no rebase needed)
            if row["pos_enc"] is not None:
                pos_abs = decode_position_lists(bytes(row["pos_enc"]), t)
                keep_rep = np.repeat(keep, t)
                out["pos_enc"].append(
                    encode_position_lists(
                        pos_abs[keep_rep], new_t, np.array([int(new_t.sum())])
                    )[0]
                )
            else:
                out["pos_enc"].append(None)
        return pd.DataFrame(out)

    # ship new norms alongside: build new norms blobs first
    dm_alive = alive.orderBy("doc_id").collect()
    norms_by_shard: dict[int, list] = {}
    for i, r in enumerate(dm_alive):
        norms_by_shard.setdefault(shard_renum[int(r.shard)], []).append(
            (i, r.key, int(r.doc_len), int(r.norm))
        )
    # new norms table + doc_map
    norm_rows = []
    dm_rows = []
    for ns, entries in sorted(norms_by_shard.items()):
        base = entries[0][0]
        blob = bytes(bytearray(e[3] for e in entries))
        norm_rows.append((ns, base, len(entries), blob))
        for i, key, dl, nb in entries:
            dm_rows.append((i, key, ns, ns, dl, nb))
    spark.createDataFrame(norm_rows, NORMS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "norms"))
    key_t = "string" if s.manifest.get("key_kind") == "s" else "long"
    spark.createDataFrame(
        dm_rows, f"doc_id long, key {key_t}, shard int, g long, doc_len long, norm int"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "doc_map"))

    # postings need norm context for block-max: join per old shard
    joined = s._postings.join(F.broadcast(s._norms), "shard")
    new_post = joined.groupBy("shard").applyInPandas(rewrite, POSTINGS_SCHEMA)
    (
        new_post.repartition(max(len(shard_order), 1), "shard")
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

    sttf = sum(e[2] for es in norms_by_shard.values() for e in es)
    manifest = {
        "version": 1,
        "config": s.manifest["config"],
        "key_kind": s.manifest.get("key_kind", "l"),
        "max_doc": int(new_max_doc),
        "sum_total_term_freq": int(sttf),
        "n_input_rows": int(new_max_doc),
        "seg_bases": {str(shard_renum[sh]): shard_base[sh] for sh in shard_order},
        "shard_bases": {str(shard_renum[sh]): shard_base[sh] for sh in shard_order},
        "compacted_from": index_dir,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest
