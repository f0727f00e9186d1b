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


def word_breaks(
    term_stats: DataFrame,
    word: str,
    min_break_len: int = 1,
    min_freq: int = 1,
    k: int = 5,
    suggest_always: bool = False,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks analog (lucene/suggest/
    .../spell/WordBreakSpellChecker.java:94-133, 262-310, maxChanges=1):
    break one unrecognized word into two dictionary words — every split
    position i in [minBreakWordLength, len-minBreakWordLength] whose
    halves BOTH have df >= minSuggestionFrequency is a suggestion.

    Ranking follows NUM_CHANGES_THEN_MAX_FREQUENCY (:103-108; one
    change here, so max(component df) desc), split position asc as the
    deterministic tie-break the reference's PQ leaves unspecified.
    SUGGEST_WHEN_NOT_IN_INDEX (:112-114): a word already in the
    dictionary yields no suggestions unless `suggest_always`.

    Distributed shape: the split candidates are O(len(word)) literal
    rows — they broadcast into two joins against the term dictionary
    (a frame orders smaller than the corpus); nothing scales with
    corpus size but the pushed-down dictionary lookups."""
    spark = term_stats.sparkSession
    n = len(word)
    lo = max(1, int(min_break_len))
    cands = [
        (i, word[:i], word[i:]) for i in range(lo, n - lo + 1)
    ]
    stats = term_stats.select("term", "df")
    if not suggest_always:
        if stats.where(F.col("term") == word).limit(1).count() > 0:
            cands = []
    if not cands:
        return spark.createDataFrame([], "split_pos long, left string, "
                                         "right string, left_df long, "
                                         "right_df long")
    cdf = spark.createDataFrame(cands, ["split_pos", "left", "right"])
    j = (
        F.broadcast(cdf)
        .join(stats.withColumnRenamed("term", "left")
                   .withColumnRenamed("df", "left_df"), "left")
        .join(stats.withColumnRenamed("term", "right")
                   .withColumnRenamed("df", "right_df"), "right")
        .where((F.col("left_df") >= min_freq)
               & (F.col("right_df") >= min_freq))
    )
    return (
        j.select(
            F.col("split_pos").cast("long").alias("split_pos"),
            "left", "right",
            F.col("left_df").cast("long").alias("left_df"),
            F.col("right_df").cast("long").alias("right_df"),
        )
        .orderBy(F.desc(F.greatest("left_df", "right_df")),
                 F.asc("split_pos"))
        .limit(k)
    )


def word_combinations(
    term_stats: DataFrame,
    words: list[str],
    min_freq: int = 1,
    max_combine_len: int = 20,
    k: int = 5,
    suggest_always: bool = False,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations analog
    (WordBreakSpellChecker.java:162-258, maxChanges=1): combine
    ADJACENT query terms into one dictionary word — pair (i, i+1)
    suggests concat(w_i, w_{i+1}) when the combined term's df >=
    minSuggestionFrequency, the combined length <= maxCombineWordLength
    (:205-210), and (SUGGEST_WHEN_NOT_IN_INDEX, :223-224) at least one
    component is absent from the index (min component df == 0).

    Ranked by combined df desc (one combination each; the reference
    orders by numCombinations then freq), pair index asc. Same
    broadcast-candidates/dictionary-lookup shape as `word_breaks`."""
    spark = term_stats.sparkSession
    cands = [
        (i, words[i], words[i + 1], words[i] + words[i + 1])
        for i in range(len(words) - 1)
        if len(words[i] + words[i + 1]) <= max_combine_len
    ]
    schema = ("pair_pos long, left string, right string, combined string, "
              "combined_df long")
    if not cands:
        return spark.createDataFrame([], schema)
    cdf = spark.createDataFrame(
        cands, ["pair_pos", "left", "right", "combined"]
    )
    stats = term_stats.select("term", "df")
    j = F.broadcast(cdf).join(
        stats.withColumnRenamed("term", "combined")
             .withColumnRenamed("df", "combined_df"),
        "combined",
    ).where(F.col("combined_df") >= min_freq)
    if not suggest_always:
        j = (
            j.join(stats.withColumnRenamed("term", "left")
                        .withColumnRenamed("df", "left_df"),
                   "left", "left")
            .join(stats.withColumnRenamed("term", "right")
                       .withColumnRenamed("df", "right_df"),
                  "right", "left")
            .where(
                F.least(
                    F.coalesce(F.col("left_df"), F.lit(0)),
                    F.coalesce(F.col("right_df"), F.lit(0)),
                ) == 0
            )
        )
    return (
        j.select(
            F.col("pair_pos").cast("long").alias("pair_pos"),
            "left", "right", "combined",
            F.col("combined_df").cast("long").alias("combined_df"),
        )
        .orderBy(F.desc("combined_df"), F.asc("pair_pos"))
        .limit(k)
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
