"""Distributed CheckIndex (index/check.py): invariant checks run
per-shard inside applyInPandas — no whole-index driver
materialization — and every invariant fails LOUDLY on a corrupted
frame (CheckIndex.java:696-705 semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.index.check import check_index, check_shard


@pytest.fixture(scope="module")
def tiny(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    rows = [
        (i, " ".join(["alpha", "beta", "gamma", f"w{i % 7}"] * (1 + i % 3)))
        for i in range(40)
    ]
    out = str(tmp_path_factory.mktemp("chk") / "ix")
    src = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(
        spark, src, out,
        IndexConfig(n_shards=2, segs_per_shard=2, id_col="doc_id",
                    text_col="text", sharding="range_int"),
    )
    import os

    post = spark.read.parquet(os.path.join(out, "postings")).toPandas()
    dm = spark.read.parquet(os.path.join(out, "doc_map")).toPandas()
    return out, post, dm


def test_check_index_green_and_distributed(spark, tiny):
    out, post, _dm = tiny
    res = check_index(spark, out)
    assert res["terms_checked"] == len(post)
    assert res["postings_checked"] == int(post["df"].sum())


def _one_shard(post, dm):
    sh = int(post["shard"].iloc[0])
    return (
        post[post["shard"] == sh].copy().reset_index(drop=True),
        dm[dm["shard"] == sh].copy().reset_index(drop=True),
    )


def _viols(post, dm, codec="vbyte"):
    out = check_shard(post, dm, codec)
    return set(out[out["invariant"] != "__metrics__"]["invariant"])


def test_check_shard_clean(tiny):
    _o, post, dm = tiny
    p, d = _one_shard(post, dm)
    assert _viols(p, d) == set()


def test_check_shard_catches_each_invariant(tiny):
    _o, post, dm = tiny
    p0, d0 = _one_shard(post, dm)

    # df mismatch
    p = p0.copy()
    p.loc[0, "df"] = int(p.loc[0, "df"]) + 1
    assert "df" in _viols(p, d0)

    # cf mismatch
    p = p0.copy()
    p.loc[0, "cf"] = int(p.loc[0, "cf"]) + 5
    assert "cf" in _viols(p, d0)

    # block_last tail corruption
    p = p0.copy()
    bl = list(p.loc[0, "block_last"])
    bl[-1] = bl[-1] + 1
    p.at[0, "block_last"] = bl
    v = _viols(p, d0)
    assert "block_last_tail" in v or "block_last" in v

    # block_max_tf corruption
    p = p0.copy()
    bmt = list(p.loc[0, "block_max_tf"])
    bmt[0] = bmt[0] + 9
    p.at[0, "block_max_tf"] = bmt
    assert "block_max_tf" in _viols(p, d0)

    # block_max_norm corruption
    p = p0.copy()
    bmn = list(p.loc[0, "block_max_norm"])
    bmn[0] = (bmn[0] + 1) % 256
    p.at[0, "block_max_norm"] = bmn
    assert "block_max_norm" in _viols(p, d0)

    # missing skip metadata must be loud, not green
    p = p0.copy()
    p.at[0, "block_last"] = []
    p.at[0, "block_doc_off"] = []
    assert "block_missing" in _viols(p, d0)

    # norm range violation
    d = d0.copy()
    d.loc[0, "norm"] = 999
    assert "norm_range" in _viols(p0, d)

    # empty doc_map slice: every posting is a doc_exists violation,
    # reported (not an IndexError crash inside the executor)
    d_empty = d0.iloc[0:0].copy()
    v = _viols(p0, d_empty)
    assert "doc_exists" in v

    # posting doc missing from doc_map
    d = d0.copy()
    decoded_first = None
    from lucene_solr_spark.index.codec import decode_posting_list

    r = p0.iloc[0]
    decoded_first = decode_posting_list(
        bytes(r["doc_enc"]), bytes(r["tf_enc"]), int(r["df"])
    )[0][0]
    d = d[d["doc_id"] != decoded_first].reset_index(drop=True)
    assert "doc_exists" in _viols(p0, d)


def test_check_index_raises_on_corrupt(spark, tiny, tmp_path):
    """End-to-end: a corrupted postings file makes check_index raise."""
    import os
    import shutil

    out, _post, _dm = tiny
    bad = str(tmp_path / "badix")
    shutil.copytree(out, bad)
    import pandas as pd

    pdir = os.path.join(bad, "postings")
    post = spark.read.parquet(pdir).toPandas()
    post.loc[0, "cf"] = int(post.loc[0, "cf"]) + 1
    shutil.rmtree(pdir)
    spark.createDataFrame(post).write.parquet(pdir)
    with pytest.raises(AssertionError, match="cf"):
        check_index(spark, bad)
