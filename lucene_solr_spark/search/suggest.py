"""FreeTextSuggester analog: corpus n-gram language-model suggestions.

Lucene's FreeTextSuggester (lucene/suggest/src/java/org/apache/lucene/
search/suggest/analyzing/FreeTextSuggester.java:90-140) builds an
n-gram FST over the corpus token stream and ranks next-word candidates
with "stupid backoff" smoothing: the candidate's probability under the
longest matching context, discounted by ALPHA (= 0.4,
FreeTextSuggester.java:105) per backed-off gram order.

Spark mapping (bigram model, fully declarative — no UDFs, no driver
state):

- unigram counts  = ONE hash-aggregate over the exploded token stream
- bigram counts   = ONE hash-aggregate over zipped shifted slices of
  the per-doc token array (the same arrays_zip construction as
  ops.dedup.shingles — stays in whole-stage codegen)
- candidate scores: count(ctx, w) / count(ctx, *) when the bigram
  exists, else ALPHA * (count(w) / total_tokens) — the two scalar
  denominators are 1-row aggregate frames cross-joined into the plan
  (broadcast by construction), and the per-context follower frame is
  broadcast (one row per distinct follower of ONE context word —
  bounded by vocabulary, orders below the corpus).

At 100 TB both count frames are map-side-combined single shuffles
keyed by word (Zipf skew collapses into the combiner, the same reason
word-count scales); the final ranking is vocabulary-sized, collected
via TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALPHA = 0.4  # FreeTextSuggester.java:105 backoff discount


def _tokens(text: Column) -> Column:
    return F.array_remove(F.split(F.trim(text), " +"), "")


def freetext_suggest(
    docs: DataFrame, context: str, k: int = 8, alpha: float = ALPHA
) -> DataFrame:
    """Top-k next-word suggestions after `context` (word, score).

    score = P(w | context) from bigram counts when (context, w) occurs,
    else alpha * P(w) from unigram counts (stupid backoff). Every
    division is pinned to the op order `num / denom` and
    `alpha * (num / denom)` so the DuckDB oracle
    (freetext_suggest_sql) reproduces the doubles bit-for-bit; the
    surface rounds at 6. Ties: word asc."""
    arr = _tokens(F.col("text"))
    uni = (
        docs.select(F.explode(arr).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    total = uni.agg(F.sum("wc").cast("double").alias("total"))
    n = F.size(arr)
    pairs = F.arrays_zip(
        F.slice(arr, 1, n - 1).alias("w1"), F.slice(arr, 2, n - 1).alias("w2")
    )
    big = (
        docs.where(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    cb = (
        big.where(F.col("w1") == context)
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("bc"))
    )
    ctotal = cb.agg(F.sum("bc").cast("double").alias("ctotal"))
    score = F.when(
        F.col("bc").isNotNull(), F.col("bc").cast("double") / F.col("ctotal")
    ).otherwise(
        F.lit(float(alpha)) * (F.col("wc").cast("double") / F.col("total"))
    )
    return (
        uni.join(F.broadcast(cb), uni["w"] == cb["w2"], "left")
        .crossJoin(total)
        .crossJoin(ctotal)
        .select(F.col("w").alias("word"), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), "word")
        .limit(k)
    )


def freetext_suggest_sql(
    context: str, k: int = 8, alpha: float = ALPHA, table: str = "documents"
) -> str:
    """`freetext_suggest` as DuckDB SQL (same op order) for the oracle."""
    return f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks
  FROM {table}
),
tok AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
  FROM t
),
uni AS (SELECT w, count(*) AS wc FROM tok GROUP BY w),
tot AS (SELECT CAST(sum(wc) AS DOUBLE) AS total FROM uni),
cb AS (
  SELECT b.w AS w2, count(*) AS bc
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.w = '{context}' GROUP BY b.w
),
ct AS (SELECT CAST(sum(bc) AS DOUBLE) AS ctotal FROM cb)
SELECT uni.w AS word,
  round(CASE WHEN cb.bc IS NOT NULL
             THEN CAST(cb.bc AS DOUBLE) / ct.ctotal
             ELSE {float(alpha)!r} * (CAST(uni.wc AS DOUBLE) / tot.total)
        END, 6) AS score
FROM uni LEFT JOIN cb ON uni.w = cb.w2, tot, ct
ORDER BY score DESC, word LIMIT {k}"""


# ---------------------------------------------------------------------
# AnalyzingSuggester option parity (round-4 verdict #10):
# exactFirst / preserveSep (AnalyzingSuggester.java:145,150,240-241 —
# EXACT_FIRST returns the exact analyzed match first regardless of
# weight; PRESERVE_SEP keeps the token separator in the analyzed form
# so 'foobar' does NOT prefix-match 'foo bar') and context filtering
# (AnalyzingInfixSuggester.java:341 add(text, contexts, weight) +
# lookup-with-contexts: a suggestion survives if it carries ANY of the
# requested context labels).
# ---------------------------------------------------------------------


def _analyzed(col: Column, preserve_sep: bool) -> Column:
    """The suggester's analyzed form: lowercase tokens joined by ONE
    separator (preserve_sep) or concatenated with separators removed —
    the FST-input analog (null-byte-joined vs fused token bytes,
    AnalyzingSuggester.java:123-126,294)."""
    toks = F.transform(_tokens(col), lambda t: F.lower(t))
    return (
        F.array_join(toks, " ") if preserve_sep else F.array_join(toks, "")
    )


def analyzing_suggest(
    suggestions: DataFrame,
    prefix: str,
    k: int = 10,
    exact_first: bool = True,
    preserve_sep: bool = True,
    contexts: list[str] | None = None,
    key_col: str = "suggestion",
    weight_col: str = "weight",
    contexts_col: str = "contexts",
) -> DataFrame:
    """Prefix completion over a (suggestion, weight[, contexts])
    dictionary frame with the reference's option semantics:

    - candidates: analyzed(suggestion) startswith analyzed(prefix)
      (both sides honor preserve_sep, so preserve_sep=False lets
      'foob' complete to 'foo bar');
    - exact_first: rows whose analyzed form EQUALS the analyzed prefix
      rank first regardless of weight (AnalyzingSuggester.java:697);
    - contexts: keep suggestions whose contexts array intersects the
      requested labels (skipped when the frame has no contexts column);
    - rank: weight desc, suggestion asc; empty prefix returns no rows
      (AnalyzingSuggester class javadoc).

    Scale: one pushed-down startswith predicate over the dictionary
    frame (suggestion dictionaries are vocabulary-sized), then
    TakeOrderedAndProject — no shuffle before the top-k."""
    if not prefix.strip():
        return suggestions.sparkSession.createDataFrame(
            [], f"{key_col} string, {weight_col} long"
        )
    from pyspark.sql import Row  # noqa: F401  (doc aid)

    qa = _analyzed(F.lit(prefix), preserve_sep)
    sa = _analyzed(F.col(key_col), preserve_sep)
    out = suggestions.withColumn("_sa", sa).where(
        F.col("_sa").startswith(qa)
    )
    if contexts is not None and contexts_col in suggestions.columns:
        want = F.array(*[F.lit(c) for c in contexts])
        out = out.where(F.arrays_overlap(F.col(contexts_col), want))
    exact = (
        F.when(F.col("_sa") == qa, F.lit(0)).otherwise(F.lit(1))
        if exact_first else F.lit(1)
    )
    return (
        out.select(
            key_col,
            F.col(weight_col).cast("long").alias(weight_col),
            exact.alias("_ex"),
        )
        .orderBy(F.asc("_ex"), F.desc(weight_col), F.asc(key_col))
        .limit(k)
        .select(key_col, weight_col)
    )
