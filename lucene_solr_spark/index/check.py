"""Offline index invariant verification (CheckIndex analog).

Reference: index/CheckIndex.java:696-705,1087,1624-1667 walks every
structure asserting internal consistency. Our invariants (FIXTURES.md §7):

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

from lucene_solr_spark.index.codec import decode_posting_list


def check_index(spark: SparkSession, index_dir: str, sample_terms: int | None = None) -> dict:
    """Run invariants; raises AssertionError on violation, returns metrics.

    Driver-side tool intended for test scales (collects postings); at
    production scale run the same asserts inside mapInPandas.
    """
    import json
    import os

    with open(os.path.join(index_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    codec = manifest.get("config", {}).get("codec", "vbyte")
    post = spark.read.parquet(os.path.join(index_dir, "postings")).toPandas()
    doc_map = spark.read.parquet(os.path.join(index_dir, "doc_map")).toPandas()

    max_doc = manifest["max_doc"]
    ids = np.sort(doc_map["doc_id"].to_numpy())
    assert len(ids) == max_doc, "doc_map count != max_doc"
    assert (ids == np.arange(max_doc)).all(), "doc ids not dense [0, max_doc)"
    assert doc_map["norm"].between(0, 255).all()
    valid_docs = set(doc_map["doc_id"].tolist())

    n_postings = 0
    terms_seen = 0
    if sample_terms is not None and len(post) > sample_terms:
        post = post.sample(sample_terms, random_state=0)
    for _, row in post.iterrows():
        docs, tfs = decode_posting_list(
            bytes(row["doc_enc"]), bytes(row["tf_enc"]), int(row["df"]),
            codec=codec,
        )
        term = row["term"]
        assert (np.diff(docs) > 0).all(), f"docs not strictly increasing: {term}"
        assert len(docs) == row["df"], f"df mismatch: {term}"
        assert tfs.sum() == row["cf"], f"cf mismatch: {term}"
        assert (tfs >= 1).all(), f"tf < 1: {term}"
        bl = np.asarray(row["block_last"], np.int64)
        assert (np.diff(bl) > 0).all(), f"block_last not increasing: {term}"
        assert bl[-1] == docs[-1], f"block_last tail mismatch: {term}"
        # verify block boundaries and block maxima
        offs = np.asarray(row["block_doc_off"], np.int64)
        assert offs[0] == 0 and (np.diff(offs) > 0).all()
        bmt = np.asarray(row["block_max_tf"], np.int64)
        bmn = np.asarray(row["block_max_norm"], np.int64)
        # reconstruct block membership from block_last
        blk_of = np.searchsorted(bl, docs)
        for b in range(len(bl)):
            sel = blk_of == b
            assert docs[sel][-1] == bl[b]
            assert tfs[sel].max() == bmt[b], f"block_max_tf wrong: {term}"
        if "\x1d" not in term:  # extra-field norms don't ride doc_map
            nm = doc_map.set_index("doc_id")["norm"]
            norms_of = nm.reindex(docs).to_numpy()
            for b in range(len(bl)):
                sel = blk_of == b
                assert norms_of[sel].max() == bmn[b], f"block_max_norm wrong: {term}"
        assert set(docs.tolist()) <= valid_docs
        n_postings += len(docs)
        terms_seen += 1

    return {
        "max_doc": max_doc,
        "terms_checked": terms_seen,
        "postings_checked": n_postings,
    }
