"""End-to-end training-data curation funnel.

Composes the corpus-curation stages this package implements
individually (exact dedup, Gopher-style length + repetition rules,
marker-word language ID, CCNet-style line-level dup filtering) into
ONE declarative pipeline over the documents table, and reports the
survival funnel — the per-stage docs_in / docs_kept / docs_dropped
accounting a curation run publishes (C4 §2.2 / Gopher table A1 /
RefinedWeb figure 2 all report exactly this table for their
pipelines).

Reference seam: Solr's update-request processor CHAIN
(solr/core/src/java/org/apache/solr/update/processor/
UpdateRequestProcessorChain.java:40-74) — an ordered document
pipeline where each processor may drop a document before indexing;
the funnel is that chain re-expressed as staged keep-flags so the
whole pipeline is ONE Catalyst plan instead of N passes.

Every decision rule is integer/rational arithmetic (cross-multiplied
percent thresholds, no float ratios), so the oracle comparison is
exact. Plan shape for 100 TB:

- per-doc signals (token counts, distinct counts, marker-word
  language argmax, md5 content hash) are pure codegen expressions in
  one corpus scan;
- the exact-dedup flag is a row_number window over the 32-bit content
  hash — ONE hash-keyed exchange (the same shuffle the standalone
  exact_dedup_stats pays);
- the line-dup stage explodes fixed-width chunks of the stage-4
  SURVIVORS only, counts chunk hashes corpus-wide (partial map-side
  aggregation), and joins the counts back co-partitioned on the
  chunk hash, then one doc_id-keyed aggregate — the line_dedup_topk
  plan restricted to survivors;
- the funnel itself is a single global aggregate of the keep-flag
  sums exploded into 5 stage rows: a 5-row result, nothing
  corpus-sized is broadcast, collected, or recomputed per stage
  (naively counting each stage separately would rescan the corpus
  5 times).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.ops.dedup import ws_tokens
from lucene_solr_spark.ops.hashing import h32
from lucene_solr_spark.ops.textstats import lang_id_pred

STAGES = ("exact_dedup", "length", "lang_id", "repetition", "line_dup")


def curation_flags(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    keep_langs: tuple[str, ...] = ("en",),
    rep_pct: int = 20,
    dupline_pct: int = 50,
    width: int = 10,
) -> DataFrame:
    """Per-doc staged keep-flags keep1..keep5 (see curation_funnel for
    the stage definitions). One plan; returned frame carries doc_id +
    the five boolean columns.

    Stages (each applies to the previous stage's survivors):

    1. exact_dedup — keep the smallest doc_id per 32-bit content hash
       (md5-derived, oracle-portable).
    2. length      — keep docs with min_tokens <= n_tokens <=
       max_tokens (whitespace tokens; the Gopher word-count rule).
    3. lang_id     — keep docs whose PREDICTED language (marker-word
       argmax, CJK override) is in keep_langs.
    4. repetition  — drop docs whose duplicate-token fraction exceeds
       rep_pct % (integer cross-multiply: dup_tokens * 100 >
       n_tokens * rep_pct).
    5. line_dup    — over the remaining corpus, drop docs whose
       duplicated fixed-width chunk fraction reaches dupline_pct %
       (chunk counts computed on SURVIVORS — the corpus the stage
       actually sees, like a real staged pipeline).
    """
    toks = F.filter(ws_tokens(F.col("text")), lambda t: t != F.lit(""))
    base = (
        docs.select("doc_id", "text", toks.alias("toks"))
        .withColumn("n", F.size("toks").cast("long"))
        .withColumn("ndist", F.size(F.array_distinct("toks")).cast("long"))
        .withColumn("h", h32(F.col("text")))
        .withColumn("pred", lang_id_pred(F.col("text")))
    )
    rank = F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
    flagged = (
        base.withColumn("keep1", rank == 1)
        .withColumn(
            "keep2",
            F.col("keep1")
            & (F.col("n") >= min_tokens)
            & (F.col("n") <= max_tokens),
        )
        .withColumn(
            "keep3",
            F.col("keep2")
            & F.col("pred").isin(*[F.lit(lang) for lang in keep_langs]),
        )
        .withColumn(
            "keep4",
            F.col("keep3")
            & ((F.col("n") - F.col("ndist")) * 100 <= F.col("n") * rep_pct),
        )
    )
    # stage 5: fixed-width chunk counts over the stage-4 survivors only
    chunks = F.transform(
        F.expr(f"sequence(0, ((n + {width - 1}) div {width}) - 1)"),
        lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i * width + 1, width)),
    )
    lines = (
        flagged.where("keep4")
        .select("doc_id", F.explode(chunks).alias("chunk"))
        .withColumn("lh", h32(F.col("chunk")))
        .drop("chunk")
    )
    cnt = lines.groupBy("lh").agg(F.count(F.lit(1)).alias("cnt"))
    dl = (
        lines.join(cnt, "lh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum((F.col("cnt") >= 2).cast("long")).alias("dup_lines"),
        )
    )
    return flagged.join(dl, "doc_id", "left").withColumn(
        "keep5",
        F.col("keep4")
        & F.coalesce(
            F.col("dup_lines") * 100 < F.col("n_lines") * dupline_pct,
            F.lit(False),
        ),
    )


def curation_decisions(docs: DataFrame, **kw) -> DataFrame:
    """Per-doc verdicts: (doc_id, drop_stage) where drop_stage is the
    FIRST stage that dropped the doc, or 'kept' if it survived all
    five. Same single plan as the funnel (the funnel is the aggregate
    of exactly these rows); row-level ground truth for audits and for
    materializing the curated corpus (`WHERE drop_stage = 'kept'`)."""
    flags = curation_flags(docs, **kw)
    verdict = F.lit("kept")
    for i in range(5, 0, -1):
        verdict = F.when(~F.col(f"keep{i}"), F.lit(STAGES[i - 1])).otherwise(
            verdict
        )
    return flags.select(
        "doc_id", verdict.alias("drop_stage")
    ).orderBy("doc_id")


SPLIT_MOD = 100
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 98),
    ("val", 1),
    ("test", 1),
)


def dataset_split(
    docs: DataFrame,
    weights: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = portable
    32-bit hash of the doc_id string mod SPLIT_MOD, mapped to splits
    by cumulative weight ranges (weights must sum to SPLIT_MOD).

    Pure map-side column — NO shuffle, no sampling state, no seed to
    version: at 100 TB the split is a projection pushed into the scan,
    reproducible forever from the doc_id alone (the property TFDS/HF
    deterministic splits get from hashing example keys). Returns the
    input with a `split` column appended.
    """
    total = sum(w for _, w in weights)
    if total != SPLIT_MOD:
        raise ValueError(f"split weights must sum to {SPLIT_MOD}, got {total}")
    bucket = h32(F.col("doc_id").cast("string")) % SPLIT_MOD
    expr = F.lit(weights[-1][0])
    hi = 0
    bounds = []
    for name, w in weights[:-1]:
        hi += w
        bounds.append((name, hi))
    for name, b in reversed(bounds):
        expr = F.when(bucket < b, F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def dataset_split_stats(
    docs: DataFrame,
    weights: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
) -> DataFrame:
    """Per (split, lang) doc and whitespace-token accounting — the
    table a dataset card publishes. One hash-agg over the map-side
    split assignment."""
    toks = F.filter(ws_tokens(F.col("text")), lambda t: t != F.lit(""))
    return (
        dataset_split(docs, weights)
        .select("split", "lang", F.size(toks).cast("long").alias("n"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("ws_tokens"),
        )
        .orderBy("split", "lang")
    )


def curation_funnel(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    keep_langs: tuple[str, ...] = ("en",),
    rep_pct: int = 20,
    dupline_pct: int = 50,
    width: int = 10,
) -> DataFrame:
    """Run the 5-stage curation pipeline; return the survival funnel:
    5 rows (stage_idx, stage, docs_in, docs_kept, docs_dropped),
    stage_idx ascending. Stage semantics in curation_flags."""
    flags = curation_flags(
        docs, min_tokens, max_tokens, keep_langs, rep_pct, dupline_pct, width
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        *[
            F.sum(F.col(f"keep{i}").cast("long")).alias(f"n{i}")
            for i in range(1, 6)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("int").alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col(f"n{i}").alias("docs_in"),
                F.col(f"n{i + 1}").alias("docs_kept"),
                (F.col(f"n{i}") - F.col(f"n{i + 1}")).alias("docs_dropped"),
            )
            for i, name in enumerate(STAGES)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("s"))
        .select("s.*")
        .orderBy("stage_idx")
    )
