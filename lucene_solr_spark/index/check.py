"""Offline index invariant verification (CheckIndex analog) —
DISTRIBUTED: the reference streams every structure segment by segment
(index/CheckIndex.java:696-705,1087,1624-1667); this implementation
cogroups each shard's postings with its doc_map slice and runs the
same invariants inside applyInPandas, so the checker scales with the
index it checks (no whole-index toPandas / driver materialization —
only the tiny violations frame and per-shard counters return).

Invariants (FIXTURES.md §7):

- decoded doc ids strictly increasing per (shard, term, part run order)
- df == number of decoded postings; cf == sum of tfs >= df
- block_last matches the decoded last doc of each block; strictly increasing
- block_max_tf/max_norm are true maxima of their blocks
- norms bytes in [0, 255]; every posting doc exists in doc_map
- doc_map ids are dense [0, max_doc) and consistent with seg bases
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.index.codec import decode_posting_list

_OUT_SCHEMA = (
    "shard int, term string, invariant string, detail string, "
    "n_terms long, n_postings long"
)


def check_shard(
    post: pd.DataFrame,
    doc_map: pd.DataFrame,
    codec: str,
    sample_terms: int | None = None,
) -> pd.DataFrame:
    """Run the per-shard invariants over one shard's posting rows and
    doc_map slice; returns violation rows plus one '__metrics__' row.
    Pure pandas/numpy — runs inside applyInPandas per shard, unit-
    testable directly with corrupted frames."""
    shard = int(post["shard"].iloc[0]) if len(post) else (
        int(doc_map["shard"].iloc[0]) if len(doc_map) else -1
    )
    viols: list[tuple] = []

    def bad(term: str, inv: str, detail: str) -> None:
        viols.append((shard, term, inv, detail, 0, 0))

    norm_ok = doc_map["norm"].between(0, 255)
    if not norm_ok.all():
        bad("", "norm_range", f"{int((~norm_ok).sum())} norms outside [0,255]")
    valid = np.sort(doc_map["doc_id"].to_numpy(np.int64))
    nm = doc_map.set_index("doc_id")["norm"]

    if sample_terms is not None and len(post) > sample_terms:
        post = post.sample(sample_terms, random_state=0)
    n_postings = 0
    n_terms = 0
    for row in post.itertuples(index=False):
        term = row.term
        try:
            docs, tfs = decode_posting_list(
                bytes(row.doc_enc), bytes(row.tf_enc), int(row.df),
                codec=codec,
            )
        except Exception as e:  # codec rejects df/bytes inconsistency
            bad(term, "df", f"decode failed: {e}")
            continue
        if not (np.diff(docs) > 0).all():
            bad(term, "docs_sorted", "doc ids not strictly increasing")
        if len(docs) != row.df:
            bad(term, "df", f"df={row.df} decoded={len(docs)}")
        if tfs.sum() != row.cf:
            bad(term, "cf", f"cf={row.cf} sum_tf={int(tfs.sum())}")
        if not (tfs >= 1).all():
            bad(term, "tf_min", "tf < 1")
        bl = np.asarray(row.block_last, np.int64)
        offs = np.asarray(row.block_doc_off, np.int64)
        if len(docs) and (len(bl) == 0 or len(offs) == 0):
            # postings without skip metadata: block-max pruning would
            # silently mis-skip — this must be LOUD, not green
            bad(term, "block_missing", "postings present but no block meta")
            continue
        if not (np.diff(bl) > 0).all():
            bad(term, "block_last_sorted", "block_last not increasing")
        if len(bl) and len(docs) and bl[-1] != docs[-1]:
            bad(term, "block_last_tail", f"{bl[-1]} != {docs[-1]}")
        if len(offs) and (offs[0] != 0 or not (np.diff(offs) > 0).all()):
            bad(term, "block_offsets", "offsets not 0-based increasing")
        bmt = np.asarray(row.block_max_tf, np.int64)
        bmn = np.asarray(row.block_max_norm, np.int64)
        blk_of = np.searchsorted(bl, docs)
        check_norms = "\x1d" not in term
        norms_of = (
            nm.reindex(docs).to_numpy(np.float64) if check_norms else None
        )
        for b in range(len(bl)):
            sel = blk_of == b
            if not sel.any():
                bad(term, "block_empty", f"block {b} has no postings")
                continue
            if docs[sel][-1] != bl[b]:
                bad(term, "block_last", f"block {b} last mismatch")
            if tfs[sel].max() != bmt[b]:
                bad(term, "block_max_tf", f"block {b}")
            if check_norms:
                known = norms_of[sel]
                known = known[~np.isnan(known)]
                # docs missing from doc_map are flagged by doc_exists
                if len(known) == 0 or known.max() != float(bmn[b]):
                    bad(term, "block_max_norm", f"block {b}")
        if len(valid) == 0:
            exists = np.zeros(len(docs), bool)
        else:
            ins = np.searchsorted(valid, docs)
            exists = (ins < len(valid)) & (
                valid[np.minimum(ins, len(valid) - 1)] == docs
            )
        if not exists.all():
            bad(term, "doc_exists", f"{int((~exists).sum())} postings w/o doc")
        n_postings += len(docs)
        n_terms += 1

    viols.append((shard, "", "__metrics__", "", n_terms, n_postings))
    return pd.DataFrame(
        viols,
        columns=["shard", "term", "invariant", "detail", "n_terms", "n_postings"],
    )


def check_index(
    spark: SparkSession, index_dir: str, sample_terms: int | None = None
) -> dict:
    """Run invariants DISTRIBUTED (per-shard applyInPandas cogroup of
    postings × doc_map); raises AssertionError listing violations,
    returns metrics. `sample_terms` caps the posting rows checked PER
    SHARD (deterministic sample). Only violations + counters cross to
    the driver."""
    import json
    import os

    with open(os.path.join(index_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    codec = manifest.get("config", {}).get("codec", "vbyte")
    post = spark.read.parquet(os.path.join(index_dir, "postings"))
    doc_map = spark.read.parquet(os.path.join(index_dir, "doc_map"))

    # global doc_map density: one aggregate, no row collection
    max_doc = manifest["max_doc"]
    agg = doc_map.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("doc_id")).alias("nd"),
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
    ).first()
    assert agg.n == max_doc, "doc_map count != max_doc"
    assert (
        agg.nd == max_doc and agg.mn == 0 and agg.mx == max_doc - 1
    ), "doc ids not dense [0, max_doc)"

    cap = sample_terms

    def run(post_pdf: pd.DataFrame, dm_pdf: pd.DataFrame) -> pd.DataFrame:
        return check_shard(post_pdf, dm_pdf, codec, cap)

    rows = (
        post.groupBy("shard")
        .cogroup(doc_map.groupBy("shard"))
        .applyInPandas(run, _OUT_SCHEMA)
        .collect()
    )
    viols = [r for r in rows if r.invariant != "__metrics__"]
    if viols:
        head = "; ".join(
            f"shard {r.shard} term {r.term!r} {r.invariant}: {r.detail}"
            for r in viols[:10]
        )
        raise AssertionError(
            f"check_index: {len(viols)} violation(s): {head}"
        )
    return {
        "max_doc": max_doc,
        "terms_checked": sum(r.n_terms for r in rows),
        "postings_checked": sum(r.n_postings for r in rows),
    }
