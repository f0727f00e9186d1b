"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — first-class components alongside the index/search
engine. See the submodule docstrings for scale design notes."""

from __future__ import annotations

import time


def bench_ops(spark, sf_dir: str) -> dict[str, float]:
    """Timed headline ops for bench.py (seconds per op)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.ops import dedup, pii, similarity, textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    dedup.minhash_lsh_pairs(docs).collect()
    out["op_minhash_lsh"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dedup.simhash_docs(docs).count()
    out["op_simhash"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    similarity.cosine_topk(emb, 0, 10).collect()
    out["op_ann_brute"] = time.perf_counter() - t0

    # materialized IVF: one-time cell-table build, then the
    # partition-pruned probed-cell query (the serving shape)
    import shutil
    import tempfile

    ivf_dir = tempfile.mkdtemp(prefix="lss_bench_ivf_")
    try:
        t0 = time.perf_counter()
        similarity.build_ivf_index(emb, ivf_dir)
        out["op_ann_ivf_build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        similarity.ivf_topk(emb, 0, 10, index_path=ivf_dir).collect()
        out["op_ann_ivf_query"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)

    t0 = time.perf_counter()
    textstats.token_counts_by_lang(docs).collect()
    out["op_token_counts"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    textstats.repetition_topk(docs).collect()
    out["op_repetition"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ev = docs.where(F.col("doc_id") % 97 == 0)
    textstats.contamination_flags(docs, ev, n=4, k=25).collect()
    out["op_decontaminate"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    textstats.line_dedup_topk(docs).collect()
    out["op_line_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dedup.text_profile_signature(docs).count()
    out["op_text_profile"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    textstats.unigram_logprob_topk(docs).collect()
    out["op_unigram_logprob"] = time.perf_counter() - t0

    from lucene_solr_spark.streaming.analytics import sessionize

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    t0 = time.perf_counter()
    sessionize(events, gap_minutes=60).count()
    out["op_sessionize"] = time.perf_counter() - t0

    # percolation: 60 registered queries compiled into ONE map-only
    # projection over the corpus (routing/alerting shape)
    from lucene_solr_spark.search.percolate import percolate
    from lucene_solr_spark.search.query import BooleanAnd, BooleanOr, TermQuery

    pv = ["table", "scan", "spark", "window", "vector", "customer", "key",
          "order", "sort", "merge", "batch", "stream", "hash", "join",
          "filter", "group", "agg", "row", "column", "value"]
    pqs: dict = {}
    for i, t in enumerate(pv):
        pqs[f"pt{i}"] = TermQuery(t)
        pqs[f"pa{i}"] = BooleanAnd((t, pv[(i + 1) % len(pv)]))
        pqs[f"po{i}"] = BooleanOr(
            (t, pv[(i + 3) % len(pv)], pv[(i + 7) % len(pv)]),
            min_should_match=2,
        )
    t0 = time.perf_counter()
    percolate(docs, pqs).count()
    out["op_percolate60"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    pii.redact_pii(docs).agg(
        F.sum("n_emails"), F.sum(F.length("text_redacted"))
    ).collect()
    out["op_pii_redact"] = time.perf_counter() - t0

    # curation funnel: full 5-stage keep/drop pipeline as ONE plan
    # (tokens -> lang -> repetition -> line-dup -> length), survival
    # counts collected (5 rows)
    from lucene_solr_spark.ops import curation, packing

    t0 = time.perf_counter()
    curation.curation_funnel(docs).collect()
    out["op_curation_funnel"] = time.perf_counter() - t0

    # training-shard packing: distributed prefix-sum over doc order,
    # per-shard token accounting out
    t0 = time.perf_counter()
    packing.shard_stats(docs).count()
    out["op_pack_shards"] = time.perf_counter() - t0

    # dataset split: map-side hash-bucket assignment + card accounting
    t0 = time.perf_counter()
    curation.dataset_split_stats(docs).collect()
    out["op_dataset_split"] = time.perf_counter() - t0

    # SemDeDup: cluster-bucketed within-cluster cosine dedup
    t0 = time.perf_counter()
    dedup.semdedup_keep(emb).count()
    out["op_semdedup"] = time.perf_counter() - t0

    # bigram-LM quality score (perplexity-filter analog)
    t0 = time.perf_counter()
    textstats.bigram_logprob_topk(docs).collect()
    out["op_bigram_logprob"] = time.perf_counter() - t0

    from lucene_solr_spark.ops import classify, mixing

    t0 = time.perf_counter()
    mixing.ccnet_buckets(docs).collect()
    out["op_ccnet_buckets"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    classify.naive_bayes_scores(docs, "table scan vector merge").collect()
    out["op_naive_bayes"] = time.perf_counter() - t0

    return out
