"""Corpus-mixing ops — temperature weights, hash-threshold resampling,
deterministic training order (lucene_solr_spark/ops/mixing.py)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.ops.mixing import (
    mixture_weights,
    resample_stats,
    training_order_head,
)


def _docs(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_mixture_weights_sqrt_smoothing(spark):
    d = _docs(spark, {"big": 100, "small": 4})
    got = {r.source: r for r in mixture_weights(d).collect()}
    st = math.sqrt(100) + math.sqrt(4)
    assert got["big"].weight == round(10 / st, 6)
    assert got["small"].weight == round(2 / st, 6)
    # temperature upweights the small source: epochs > 1
    assert got["small"].epochs > 1.0 > got["big"].epochs


def test_mixture_weights_alpha1_is_corpus_share(spark):
    d = _docs(spark, {"a": 30, "b": 10})
    got = {r.source: r.weight for r in mixture_weights(d, alpha=1.0).collect()}
    assert got == {"a": 0.75, "b": 0.25}


def test_mixture_weights_rejects_nonportable_alpha(spark):
    with pytest.raises(ValueError, match="alpha"):
        mixture_weights(_docs(spark, {"a": 1}), alpha=0.7)


def test_resample_rate_capped_at_one(spark):
    # tiny source whose temperature share exceeds its size: rate == 1.0
    # and every doc selected
    d = _docs(spark, {"big": 400, "tiny": 1})
    got = {r.source: r for r in resample_stats(d, overall_rate=0.5).collect()}
    assert got["tiny"].rate == 1.0
    assert got["tiny"].n_selected == 1
    assert 0.0 < got["big"].rate < 1.0
    assert got["big"].n_selected <= got["big"].n_docs


def test_resample_deterministic(spark):
    d = _docs(spark, {"a": 50, "b": 20})
    a = resample_stats(d).collect()
    b = resample_stats(d.repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_training_order_reproducible_and_seeded(spark):
    d = _docs(spark, {"a": 60})
    o1 = [r.doc_id for r in training_order_head(d, k=10).collect()]
    o2 = [r.doc_id for r in training_order_head(d.repartition(5), k=10).collect()]
    assert o1 == o2  # partitioning-independent
    assert o1 != sorted(o1)  # actually shuffled
    o3 = [r.doc_id for r in training_order_head(d, k=10, seed="ep1").collect()]
    assert o1 != o3  # a new epoch seed permutes differently
    ranks = [r.rank for r in training_order_head(d, k=10).collect()]
    assert ranks == list(range(1, 11))


def test_training_order_plan_is_take_ordered(spark):
    # the head must compile to TakeOrderedAndProject — no global sort
    d = _docs(spark, {"a": 30})
    plan = training_order_head(d, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# -------------------------------------------------------------- DSIR


def test_dsir_upweights_target_like_docs(spark):
    """Docs sharing the target corpus's vocabulary must outrank docs
    made of off-target vocabulary (Xie et al. 2023 selection order)."""
    from lucene_solr_spark.ops.mixing import dsir_weights_topk

    rows = (
        # target corpus: 'wiki'-flavored vocabulary
        [(i, "alpha beta gamma delta epsilon zeta", "src0") for i in range(6)]
        # raw pool: junk vocabulary
        + [(10 + i, "junk spam noise clutter filler blob", "src1") for i in range(6)]
        # candidates in the pool: one target-like, one junk-like
        + [(100, "alpha beta gamma delta", "src1"),
           (101, "junk spam noise clutter", "src1")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r.avg_logratio for r in dsir_weights_topk(df, k=100).collect()}
    assert out[100] > 0 > out[101]
    assert out[100] > out[101]


def test_dsir_feature_count_is_unigrams_plus_bigrams(spark):
    from lucene_solr_spark.ops.mixing import dsir_weights_topk

    df = spark.createDataFrame(
        [(0, "a b c", "src0"), (1, "d e", "src1")],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r.n_feats for r in dsir_weights_topk(df, k=10).collect()}
    assert out[0] == 5  # 3 unigrams + 2 bigrams
    assert out[1] == 3  # 2 unigrams + 1 bigram


def test_ccnet_buckets_sizes_and_ordering(spark):
    from lucene_solr_spark.ops.mixing import ccnet_buckets

    # 20 docs with clearly separable bigram regularity: repeated
    # template docs score high, unique-word docs score low
    rows = []
    for i in range(10):
        rows.append((i, "alpha beta gamma delta alpha beta"))
    for i in range(10, 20):
        rows.append((i, f"w{i}a w{i}b w{i}c w{i}d"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.bucket: r for r in ccnet_buckets(df).collect()}
    assert set(out) == {"head", "middle", "tail"}
    # fractions 0.3/0.3/0.4 of 20 docs
    assert out["head"].n_docs == 6
    assert out["middle"].n_docs == 6
    assert out["tail"].n_docs == 8
    # bucket boundaries respect the score ordering
    assert out["head"].min_logprob >= out["middle"].max_logprob
    assert out["middle"].min_logprob >= out["tail"].max_logprob


def test_global_rank_matches_window(spark):
    from pyspark.sql import Window

    from lucene_solr_spark.ops.mixing import _global_rank_desc

    import random

    rng = random.Random(7)
    rows = [(i, round(rng.uniform(-9, -1), 6)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, mean_logprob double")
    got = {
        r.doc_id: r._rank
        for r in _global_rank_desc(df, "mean_logprob").collect()
    }
    w = Window.orderBy(F.desc("mean_logprob"), F.asc("doc_id"))
    want = {
        r.doc_id: r.rn - 1
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_ccnet_empty_and_tiny(spark):
    from lucene_solr_spark.ops.mixing import ccnet_buckets

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "c d c d")], "doc_id long, text string"
    )
    out = {r.bucket: r.n_docs for r in ccnet_buckets(df).collect()}
    # n=2: floor(0.6)=0 head, floor(1.2)=1 -> 1 middle, 1 tail
    assert out.get("middle", 0) == 1 and out.get("tail", 0) == 1
