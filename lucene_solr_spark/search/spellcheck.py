"""Spellcheck collation — Solr's SpellCheckCollator analog
(solr/core/src/java/org/apache/solr/spelling/SpellCheckCollator.java:
49-120): correct each misspelled query word from the term dictionary,
assemble the collated query, and verify it by re-running — the
collation a client shows as "did you mean".

Distributed shape: the word list is a literal handful; it broadcasts
into ONE scan of the term dictionary (the .tim analog frame — already
orders smaller than the corpus), a per-word rank window picks the best
correction over the few dist<=max_dist survivors. The corrected words
(O(#query words) strings) come back to the driver to build the verify
query — the same re-query Solr's collator issues
(SpellCheckCollator.java:111: collations are checked by running them).

Correction ranking mirrors DirectSpellChecker's comparator
(lucene/suggest/.../DirectSpellChecker.java:40-70 internalLevenshtein
+ freq ordering): edit distance asc, docFreq desc, term asc; words
already IN the dictionary collate to themselves (dist 0 sorts first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def suggestions(
    term_stats: DataFrame, words: list[str], max_dist: int = 2, k: int = 5
) -> DataFrame:
    """Per query word, the top-k corrections from the term dictionary:
    (pos, input, term, dist, df) ranked dist asc, df desc, term asc.
    One dictionary scan for ALL words (the word frame broadcasts)."""
    spark = term_stats.sparkSession
    wdf = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["pos", "input"]
    )
    j = term_stats.select("term", "df").crossJoin(F.broadcast(wdf))
    j = j.withColumn("dist", F.levenshtein(F.col("term"), F.col("input")))
    j = j.where(F.col("dist") <= max_dist)
    w = Window.partitionBy("pos").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("pos").cast("long").alias("pos"),
            "input",
            "term",
            F.col("dist").cast("long").alias("dist"),
            F.col("df").cast("long").alias("df"),
        )
    )


def collate(searcher, words: list[str], max_dist: int = 2) -> DataFrame:
    """Best collation for a multi-word query: each word replaced by its
    top correction, the collated query verified by an AND re-query.
    Returns ONE row (collated_query, n_hits). Words with no correction
    within max_dist pass through unchanged (and typically zero the
    verified hit count, as in Solr when a collation finds nothing)."""
    best = {
        r.pos: r.term
        for r in suggestions(searcher._term_stats, words, max_dist, k=1)
        .collect()
    }
    corrected = [best.get(i, w) for i, w in enumerate(words)]
    from lucene_solr_spark.search.query import BooleanAnd

    n_hits = searcher.search(BooleanAnd(tuple(corrected)), k=None).count()
    spark = searcher._term_stats.sparkSession
    return spark.createDataFrame(
        [(" ".join(corrected), int(n_hits))], ["collated_query", "n_hits"]
    ).select(
        "collated_query", F.col("n_hits").cast("long").alias("n_hits")
    )
