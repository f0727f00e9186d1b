"""Training-shard packing (ops/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_solr_spark.ops.packing import doc_token_counts, pack_shards, shard_stats

from .conftest import SF_MID


def _mk_docs(spark, toks):
    """docs with exactly `toks[i]` bpe tokens for doc_id=i."""
    rows = [(i, " ".join(["tok"] * n)) for i, n in enumerate(toks)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sequential_semantics(spark):
    # budget 10, exclusive prefix: cut whenever running total crosses 10
    docs = _mk_docs(spark, [4, 4, 4, 4, 4])  # prefixes 0,4,8,12,16
    got = {
        r.doc_id: r.shard_id for r in pack_shards(docs, budget=10).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}


def test_oversized_doc_gets_own_shards(spark):
    # a 25-token doc against budget 10: doc 1 starts at prefix 5 ->
    # shard 0; doc 2 starts at prefix 30 -> shard 3 (never split)
    docs = _mk_docs(spark, [5, 25, 3])
    got = {
        r.doc_id: r.shard_id for r in pack_shards(docs, budget=10).collect()
    }
    assert got == {0: 0, 1: 0, 2: 3}


def test_matches_single_window_oracle(spark):
    """Distributed two-stage prefix sum == naive global window."""
    docs = spark.read.parquet(f"{SF_MID}/documents.parquet")
    from pyspark.sql import Window

    toks = doc_token_counts(docs)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = toks.withColumn(
        "shard_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(2048)
        ).cast("long"),
    ).select("doc_id", "n_tokens", "shard_id")
    got = pack_shards(docs, budget=2048)
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_bucket_count_invariance(spark):
    """Same shards regardless of prefix-sum bucket granularity."""
    docs = spark.read.parquet(f"{SF_MID}/documents.parquet")
    a = pack_shards(docs, budget=1000, n_buckets=3).orderBy("doc_id").collect()
    b = pack_shards(docs, budget=1000, n_buckets=64).orderBy("doc_id").collect()
    assert a == b


def test_no_single_partition_global_window(spark):
    """The scale guarantee: the plan's window is partitioned by the
    prefix-sum bucket, never a global (empty-partition-spec) window."""
    docs = spark.read.parquet(f"{SF_MID}/documents.parquet")
    plan = pack_shards(docs, budget=2048)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # a global window prints "Window [...], [doc_id ASC ...]" with no
    # partition spec; ours must carry the _bucket partition key
    for line in plan.splitlines():
        if "Window [" in line:
            assert "_bucket" in line, line


def test_stats_sum_to_corpus(spark):
    docs = spark.read.parquet(f"{SF_MID}/documents.parquet")
    st = shard_stats(docs, budget=2048)
    tot = st.agg(F.sum("n_docs"), F.sum("sum_tokens")).first()
    base = doc_token_counts(docs).agg(
        F.count(F.lit(1)), F.sum("n_tokens")
    ).first()
    assert (tot[0], tot[1]) == (base[0], base[1])
    # every full shard's size is within one document of the budget
    rows = st.collect()
    for r in rows[:-1]:
        assert r.sum_tokens >= 2048 - 512  # budget minus max doc size


def test_empty_input(spark):
    docs = _mk_docs(spark, []).where(F.lit(False))
    assert pack_shards(docs, budget=10).count() == 0
