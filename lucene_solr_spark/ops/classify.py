"""Index-backed classifiers (lucene/classification module).

SimpleNaiveBayesClassifier.java computes, for an input document d and
each class c found in the class field:

    score(c) = log(docCount(c)) - log(docsWithClass)          (:269-271)
             + sum over tokens w of d (with repeats, :220-240) of
                 log( (hits(w,c) + 1) / den(c) )

    hits(w,c) = # docs of class c containing w  (doc freq of the
                text:w AND class:c conjunction, :253-266)
    den(c)    = avgUniqueTermsPerDoc * docCount(c) + docsWithClass
                (getTextTermFreqForClass: sumDocFreq/docCount scaled
                by the class's doc count, + the add-1 vocabulary mass)

The kNN sibling (KNearestNeighborClassifier) lives in
ops/similarity.knn_label_vote.

Spark shape: ONE distinct-(doc, term) aggregation restricted to the
input document's tokens (a pushed-down `term IN (...)` over the
token stream), one tiny per-class totals aggregate, then a
class x token cross of two small frames on the driver-free path —
zero-df tokens still contribute log(1/den) via the left join, exactly
like the reference's +1 smoothing over a miss."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def naive_bayes_scores(
    docs: DataFrame,
    input_text: str,
    class_col: str = "lang",
    text_col: str = "text",
    analyzer: str = "standard",
) -> DataFrame:
    """Per-class log scores for `input_text` — (class, score) sorted
    score desc. Raw (unnormalized) log posterior, the quantity the
    reference ranks by before normClassificationResults."""
    from lucene_solr_spark.analysis.analyzers import ANALYZERS

    toks = list(ANALYZERS[analyzer](pd.Series([input_text]))[0])
    if not toks:
        raise ValueError("input_text analyzed to no tokens")
    spark = docs.sparkSession
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    qtok = spark.createDataFrame(
        [(t, n) for t, n in sorted(counts.items())], "term string, cnt long"
    )

    pairs = _token_pairs(docs, class_col, text_col, analyzer)

    # per-class doc counts + the global average unique terms per doc
    cls_docs = docs.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).alias("n_c")
    )
    totals = pairs.agg(
        F.count(F.lit(1)).alias("sum_df"),
        F.countDistinct("doc_id").alias("n_docs_tok"),
    )
    n_all = docs.count()

    # doc freq of each input token per class (pushed-down term IN)
    df_ct = (
        pairs.join(F.broadcast(qtok.select("term")), "term")
        .groupBy("cls", "term")
        .agg(F.count(F.lit(1)).alias("hits"))
    )

    grid = cls_docs.crossJoin(F.broadcast(qtok)).join(
        df_ct, ["cls", "term"], "left"
    )
    grid = grid.crossJoin(F.broadcast(totals)).withColumn(
        "den",
        (F.col("sum_df") / F.col("n_docs_tok")) * F.col("n_c")
        + F.lit(float(n_all)),
    )
    scored = grid.groupBy("cls", "n_c").agg(
        F.sum(
            F.col("cnt")
            * F.log((F.coalesce(F.col("hits"), F.lit(0)) + 1.0) / F.col("den"))
        ).alias("ll")
    )
    return (
        scored.select(
            F.col("cls"),
            (
                F.log(F.col("n_c").cast("double"))
                - F.log(F.lit(float(n_all)))
                + F.col("ll")
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "cls")
    )


def _token_pairs(
    docs: DataFrame, class_col: str, text_col: str, analyzer: str
) -> DataFrame:
    """Distinct (class, doc_id, term) pairs under the analyzer chain —
    the MultiFields doc-freq view the reference queries per (w, c)."""
    from lucene_solr_spark.analysis.jvm import standard_tokens_col

    if analyzer != "standard":
        raise ValueError("naive_bayes_scores supports the standard chain")
    return docs.select(
        F.col(class_col).alias("cls"),
        "doc_id",
        F.explode(
            F.array_distinct(standard_tokens_col(F.col(text_col)))
        ).alias("term"),
    )
