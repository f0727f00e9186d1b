"""Corpus mixing — the source-weighting / resampling / training-order
stage of a large-scale pretraining data pipeline.

Three public-knowledge building blocks:

- temperature-scaled source weights: sample probability proportional
  to n_i^alpha, the exponential smoothing used to rebalance
  heterogeneous sources in multilingual/multi-domain pretraining
  (published in the mBERT/XLM-R line of work; alpha in (0,1) upweights
  small sources). The default alpha = 0.5 is computed with SQRT —
  IEEE-correctly-rounded in every engine, so the weights are
  bit-reproducible across Spark and an external SQL oracle (pow() for
  general alpha is NOT correctly rounded and is gated behind an
  explicit opt-in).
- hash-threshold Bernoulli selection: keep doc iff
  h32(doc_id) < floor(rate * 2^32). This is the 100 TB sampler — a
  pure map-side predicate pushed into the scan, no shuffle, no RNG
  state, reproducible forever from the doc_id alone (same property
  the dataset_split op builds on, ops/curation.py).
- deterministic training order: sort key h32(seed || ':' || doc_id).
  Changing `seed` gives a fresh epoch permutation; the same seed
  reproduces the exact order. At scale the order is materialized by
  writing files range-partitioned + sorted on the key — no global
  window. The head-k form used by the contract entry is a
  TakeOrderedAndProject (per-partition top-k, then merge of k-row
  heads), so no single-partition global sort appears in the plan
  either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.ops.hashing import h32

TWO32 = 1 << 32


def mixture_weights(
    docs: DataFrame, group_col: str = "source", alpha: float = 0.5
) -> DataFrame:
    """Per-source temperature-scaled sampling weights.

    Returns (source, n_docs, weight, epochs) where
    weight_i = n_i^alpha / sum_j n_j^alpha (rounded 6dp) and
    epochs_i = weight_i_raw * N / n_i — the expected number of times a
    doc of source i is seen when drawing N samples under the weights
    (>1 means the source is upsampled). Only alpha = 0.5 (sqrt) and
    alpha = 1.0 (identity; weights degenerate to corpus shares) are
    accepted: both are correctly-rounded IEEE ops, so the output is
    engine-portable. General pow() is refused rather than silently
    non-reproducible.
    """
    if alpha not in (0.5, 1.0):
        raise ValueError(
            "alpha must be 0.5 (sqrt) or 1.0 (identity) for "
            f"bit-reproducible weights, got {alpha}"
        )
    n = F.col("n_docs").cast("double")
    smoothed = F.sqrt(n) if alpha == 0.5 else n
    per = docs.groupBy(F.col(group_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    per = per.withColumn("_s", smoothed)
    tot = per.agg(
        F.sum("_s").alias("_st"), F.sum("n_docs").alias("_nt")
    )
    w = F.col("_s") / F.col("_st")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(w, 6).alias("weight"),
            F.round(
                w * F.col("_nt").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("epochs"),
        )
        .orderBy("source")
    )


def hash_bernoulli_keep(id_col: F.Column, rate_col: F.Column) -> F.Column:
    """Boolean keep predicate: h32(id) < floor(rate * 2^32). Pure
    map-side expression — pushes into the scan, no RNG, no shuffle."""
    thr = F.floor(rate_col.cast("double") * F.lit(float(TWO32))).cast("long")
    return h32(id_col.cast("string")) < thr


def resample_stats(
    docs: DataFrame,
    group_col: str = "source",
    overall_rate: float = 0.3,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-rebalanced downsampling accounting: per-source
    selection rate r_i = overall_rate * N * weight_i / n_i (capped at
    1.0 — a small source whose temperature share exceeds its size
    keeps everything; true upsampling is a repeat at read time, not a
    filter), selection by the hash threshold. Returns
    (source, n_docs, rate, n_selected) — the table that audits what
    the mixing stage actually kept.

    Plan shape: one tiny per-source aggregate broadcast back onto the
    corpus scan; the keep test is a pushed predicate. ONE pass."""
    wts = mixture_weights(docs, group_col, alpha)
    tot = wts.agg(F.sum("n_docs").alias("_nt"))
    rates = (
        wts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(
                F.least(
                    F.lit(float(overall_rate))
                    * F.col("_nt").cast("double")
                    * F.col("weight")
                    / F.col("n_docs").cast("double"),
                    F.lit(1.0),
                ),
                6,
            ).alias("rate"),
        )
    )
    keep = hash_bernoulli_keep(F.col("doc_id"), F.col("rate"))
    return (
        docs.select("doc_id", F.col(group_col).alias("source"))
        .join(F.broadcast(rates), "source")
        .select("source", "n_docs", "rate", keep.cast("long").alias("_k"))
        .groupBy("source", "n_docs", "rate")
        .agg(F.sum("_k").cast("long").alias("n_selected"))
        .orderBy("source")
    )


def training_order_key(id_col: F.Column, seed: str) -> F.Column:
    """The epoch-`seed` shuffle sort key for a document id."""
    return h32(F.concat(F.lit(seed + ":"), id_col.cast("string")))


def training_order_head(
    docs: DataFrame, k: int = 20, seed: str = "ep0"
) -> DataFrame:
    """First k docs of the epoch-`seed` deterministic shuffle order:
    (rank, doc_id, shuffle_key), rank 1-based. orderBy+limit compiles
    to TakeOrderedAndProject; the rank window runs over the k
    survivors only (never the corpus)."""
    key = training_order_key(F.col("doc_id"), seed)
    head = (
        docs.select("doc_id", key.alias("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
        .limit(k)
    )
    w = Window.orderBy("shuffle_key", "doc_id")
    return head.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "shuffle_key",
    )


# ----------------------------------------------------------------------
# DSIR — data selection with importance resampling
# ----------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed-feature space; the paper uses 10k — a knob


def _dsir_features(docs: DataFrame, b: int = DSIR_BUCKETS) -> DataFrame:
    """(doc_id, bkt): hashed unigram + bigram features of every doc
    (Xie et al., "Data Selection for Language Models via Importance
    Resampling", NeurIPS 2023 — DSIR hashes n-grams into a fixed
    bucket space and fits bag-of-buckets models). One codegen'd
    explode; multiplicity kept (the model is a count distribution)."""
    arr = F.array_remove(F.split(F.trim(F.col("text")), " +"), "")
    n = F.size(arr)
    pairs = F.arrays_zip(
        F.slice(arr, 1, n - 1).alias("w1"), F.slice(arr, 2, n - 1).alias("w2")
    )
    bigrams = F.transform(pairs, lambda p: F.concat_ws(" ", p["w1"], p["w2"]))
    feats = F.concat(arr, F.when(n >= 2, bigrams).otherwise(F.array()))
    return docs.select("doc_id", F.explode(feats).alias("g")).select(
        "doc_id", (h32(F.col("g")) % b).alias("bkt")
    )


def dsir_bucket_logratios(
    docs: DataFrame,
    target_col: F.Column,
    b: int = DSIR_BUCKETS,
    alpha: float = 0.5,
) -> DataFrame:
    """(bkt, logratio): add-alpha-smoothed log(p_target / p_source)
    per hashed feature bucket. Target = docs where `target_col` is
    true (the small high-quality corpus); source = the WHOLE corpus
    (the raw pool being filtered). Two b-row aggregates — b is a
    constant (256 here, 10k in the paper), so the ratio table always
    broadcasts regardless of corpus size."""
    feats = _dsir_features(docs, b).join(
        docs.select("doc_id", target_col.alias("_t")), "doc_id"
    )
    per = feats.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("long").alias("src_c"),
        F.sum(F.col("_t").cast("long")).cast("long").alias("tgt_c"),
    )
    tot = per.agg(
        F.sum("src_c").alias("_st"), F.sum("tgt_c").alias("_tt")
    )
    lr = F.log(
        (F.col("tgt_c") + F.lit(alpha))
        / (F.col("_tt") + F.lit(alpha * b)).cast("double")
    ) - F.log(
        (F.col("src_c") + F.lit(alpha))
        / (F.col("_st") + F.lit(alpha * b)).cast("double")
    )
    return per.crossJoin(F.broadcast(tot)).select("bkt", lr.alias("logratio"))


def dsir_weights_topk(
    docs: DataFrame,
    target_source: str = "src0",
    b: int = DSIR_BUCKETS,
    alpha: float = 0.5,
    k: int = 20,
) -> DataFrame:
    """Per-doc DSIR importance weight = mean feature log-likelihood
    ratio log(p_target(f)/p_source(f)); the resampling stage keeps
    docs with the highest weights (here: top-k ranked table, weight
    desc then doc_id — the audit view of the selection).

    Plan: ONE feature pass (shared by both models via a conditional
    aggregate), bucket ratio table broadcast back onto the feature
    stream, ONE doc-keyed rollup. Round-6 on the mean (double
    summation order varies ~1 ulp between engines, same discipline as
    bigram_logprob_topk). Target membership here is a source-column
    predicate — any boolean column works (e.g. a quality-classifier
    output)."""
    lrs = dsir_bucket_logratios(
        docs, (F.col("source") == target_source), b, alpha
    )
    feats = _dsir_features(docs, b)
    return (
        feats.join(F.broadcast(lrs), "bkt")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("logratio").alias("_s"),
        )
        .select(
            "doc_id",
            "n_feats",
            F.round(F.col("_s") / F.col("n_feats").cast("double"), 6).alias(
                "avg_logratio"
            ),
        )
        .orderBy(F.desc("avg_logratio"), "doc_id")
        .limit(k)
    )


# ---------------------------------------------------------------------
# CCNet-style perplexity buckets
# ---------------------------------------------------------------------

CCNET_FRACTIONS = (0.3, 0.3)  # head / middle; tail = remainder
_RANK_BUCKETS = 64


def _global_rank_desc(
    per_doc: DataFrame, score_col: str, n_buckets: int = _RANK_BUCKETS
) -> DataFrame:
    """0-based global rank over (score DESC, doc_id ASC) WITHOUT a
    single-partition window — the packing module's distributed
    prefix-sum (ops/packing.py) applied to rank-by-count:

    1. P contiguous VALUE-range buckets by pure arithmetic on the
       score (desc: bucket 0 holds the largest scores);
    2. one P-row count aggregate -> exclusive running offsets,
       broadcast back;
    3. bucket-local row_number (P-way parallel) + offset = exact
       global rank.

    Scores must be pre-rounded so ranking ties are identical across
    engines; doc_id breaks the remaining ties."""
    lo, hi = per_doc.agg(F.min(score_col), F.max(score_col)).first()
    if lo is None:
        return per_doc.withColumn("_rank", F.lit(0).cast("long"))
    span = float(hi) - float(lo)
    width = (span / n_buckets) or 1.0
    bucket = F.least(
        F.floor((F.lit(float(hi)) - F.col(score_col)) / F.lit(width)),
        F.lit(n_buckets - 1),
    ).cast("long")
    ranked = per_doc.withColumn("_bucket", bucket)
    totals = ranked.groupBy("_bucket").count().collect()
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["_bucket"]):
        offsets.append((int(row["_bucket"]), acc))
        acc += int(row["count"])
    off_df = F.broadcast(
        per_doc.sparkSession.createDataFrame(
            offsets, "_bucket long, _off long"
        )
    )
    w = Window.partitionBy("_bucket").orderBy(
        F.desc(score_col), F.asc("doc_id")
    )
    return (
        ranked.join(off_df, "_bucket")
        .withColumn(
            "_rank", (F.row_number().over(w) - 1 + F.col("_off")).cast("long")
        )
        .drop("_bucket", "_off")
    )


def ccnet_buckets(
    docs: DataFrame, fractions: tuple[float, float] = CCNET_FRACTIONS
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): order documents by language-model score and split into
    head / middle / tail at fixed corpus fractions — head (lowest
    perplexity = HIGHEST mean log-prob) is the cleanest slice,
    tail is usually dropped.

    The LM is the corpus's own bigram MLE (ops/textstats.
    bigram_logprob semantics, round-6 per-doc mean so cross-engine
    ranking ties are exact); docs with < 1 bigram are excluded like
    the textstats op. Returns ONE row per bucket:
    (bucket, n_docs, min_logprob, max_logprob, avg_logprob round-6),
    bucket in ('head', 'middle', 'tail').

    Plan: the bigram stats (two map-side-combined aggregates, the
    counts co-partitioned with the bigram stream), then the
    distributed-prefix-sum rank (_global_rank_desc — two tiny P-row
    crossings, NO single-partition window), then one 3-key aggregate.
    """
    from pyspark import StorageLevel

    from lucene_solr_spark.ops.textstats import bigram_logprob_per_doc

    # the bigram frame costs two corpus aggregates + joins; the rank
    # needs three passes over it (count, min/max, window) — persist so
    # the LM is computed once, not three times
    per_doc = (
        bigram_logprob_per_doc(docs)
        .select("doc_id", "mean_logprob")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = per_doc.count()
    n_head = int(n * fractions[0])
    n_mid = int(n * (fractions[0] + fractions[1]))
    ranked = _global_rank_desc(per_doc, "mean_logprob")
    labeled = ranked.withColumn(
        "bucket",
        F.when(F.col("_rank") < n_head, "head")
        .when(F.col("_rank") < n_mid, "middle")
        .otherwise("tail"),
    )
    return (
        labeled.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("mean_logprob").alias("min_logprob"),
            F.max("mean_logprob").alias("max_logprob"),
            F.round(F.avg("mean_logprob"), 6).alias("avg_logprob"),
        )
        .orderBy("bucket")
    )
