"""ExactSubstr-style duplicate-SPAN removal (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022,
arXiv:2107.06499 — the EXACTSUBSTR dedup): instead of dropping whole
near-duplicate documents, find token spans that occur verbatim more
than once ANYWHERE in the corpus and remove every occurrence except
the first, keeping the rest of each document.

The paper builds a corpus-wide suffix array; the Spark-native analog
is fixed-width rolling windows (the paper's minimum match length — 50
BPE tokens there, `w` whitespace tokens here) hashed and counted
corpus-wide:

1. every doc emits its `w`-token windows with positions
   (zipped-shifted-slices, whole-stage codegen — no Python),
2. ONE window-keyed shuffle ranks occurrences globally
   (row_number over (hash) ordered by (doc_id, pos)): occurrence
   rank >= 2 == "this span also appears earlier in the corpus" —
   the keep-first-occurrence policy of exact dedup, applied to spans,
3. per doc, overlapping duplicate windows merge into maximal spans
   (gaps-and-islands over ONE doc-keyed window),
4. output either per-doc span stats or the rebuilt cleaned text.

Scale shape (100 TB): the only corpus-wide exchange is keyed by the
32-bit window hash — skew is bounded by the most-duplicated span
(which is exactly the boilerplate being removed; a salted two-level
count would bound it further and is a drop-in). Everything after the
candidate restriction is doc-keyed. Matching on h32 hashes means a
2^-32 collision can mark a non-duplicated window — the standard
fingerprint trade (document-level MinHash accepts the same); both
engines hash identically so the oracle reproduces the exact output.

Reference analog: none in Lucene (this is a training-data op); the
windowing reuses the winnowing kernel's positional k-gram plan
(ops/dedup.winnow_fingerprints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.ops.dedup import ws_tokens
from lucene_solr_spark.ops.hashing import h32


def _window_hashes(docs: DataFrame, w: int) -> DataFrame:
    """(doc_id, pos, h): h32 of every w-token window (0-based pos)."""
    arr = ws_tokens(F.col("text"))
    cnt = F.size(arr) - (w - 1)
    zipped = F.arrays_zip(
        *[F.slice(arr, j + 1, cnt).alias(f"w{j}") for j in range(w)]
    )
    gram = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(w)])
    )
    return (
        docs.where(F.size(arr) >= w)
        .select("doc_id", F.posexplode(gram).alias("pos", "g"))
        .select("doc_id", "pos", h32(F.col("g")).alias("h"))
    )


def _dup_spans(docs: DataFrame, w: int) -> DataFrame:
    """(doc_id, start, end): maximal merged spans (token positions,
    inclusive) covered by duplicate windows — occurrences ranked
    corpus-wide per window hash; rank 1 (first occurrence by
    (doc_id, pos)) is KEPT, every later occurrence is a dup window."""
    g = _window_hashes(docs, w)
    occ = g.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("h").orderBy("doc_id", "pos")),
    )
    dup = occ.where(F.col("rn") >= 2).select("doc_id", "pos")
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (w - 1)).over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dup.withColumn(
        "ni",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("ni").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("start"),
        (F.max("pos") + (w - 1)).alias("end"),
    )


def dup_span_stats(docs: DataFrame, w: int = 8, k: int = 20) -> DataFrame:
    """Per-doc duplicate-span accounting, top-k most-duplicated docs:
    (doc_id, n_tokens, dup_tokens, n_spans, dup_frac), ordered by
    dup_tokens desc then doc_id — the table an ExactSubstr pass
    publishes before deciding removal thresholds."""
    spans = _dup_spans(docs, w)
    stats = spans.groupBy("doc_id").agg(
        F.sum(F.col("end") - F.col("start") + 1).cast("long").alias("dup_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
    )
    arr = ws_tokens(F.col("text"))
    nt = docs.select(
        "doc_id",
        F.size(F.filter(arr, lambda x: x != "")).cast("long").alias("n_tokens"),
    )
    return (
        nt.join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("dup_frac"),
        )
        .orderBy(F.desc("dup_tokens"), "doc_id")
        .limit(k)
    )


def remove_dup_spans(docs: DataFrame, w: int = 8) -> DataFrame:
    """The rebuild step: every doc that contains >= 1 duplicate span
    gets its covered tokens REMOVED (later occurrences only — the
    corpus-wide first occurrence survives) and the remaining tokens
    re-joined in original order. Returns (doc_id, clean_text,
    removed_tokens) for changed docs only, doc_id asc.

    Plan: spans explode to covered positions (bounded: span length x
    occurrences actually duplicated), anti-join against the positional
    token stream, ONE doc-keyed rebuild aggregate (sort_array over
    (pos, tok) structs — same rebuild kernel as the C4 boilerplate
    remover, ops/textstats.clean_boilerplate)."""
    spans = _dup_spans(docs, w)
    covered = spans.select(
        "doc_id", F.explode(F.sequence("start", "end")).alias("pos")
    ).distinct()
    arr = ws_tokens(F.col("text"))
    toks = docs.select("doc_id", F.posexplode(arr).alias("pos", "tok"))
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    removed = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("removed_tokens")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text")
    )
    return (
        removed.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "removed_tokens",
        )
        .orderBy("doc_id")
    )
