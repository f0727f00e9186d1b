"""JVM-side (whole-stage-codegen) analyzer expressions.

Same observable semantics as the vectorized pandas analyzers
(analysis/analyzers.py — StandardAnalyzer subset: UAX#29-ish token
regex, lowercase, 255-char cap, 33 English stopwords, stop/overlong
tokens advance positions without being emitted), but evaluated entirely
inside Tungsten: `lower` + `regexp_extract_all` + array `transform` /
`filter` lambdas. No Python is involved in the invert hot path — the
analyzer output ships to the Arrow segment builder as list columns.

Equivalence with the pandas analyzers is pinned by tests
(tests/test_arrow_builder.py): the Java regex uses the embedded (?U)
flag so \\W is Unicode-aware like Python's re.UNICODE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzers import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
)

# Java regex equivalent of analyzers._TOKEN_RE ((?U) = UNICODE_CHARACTER_CLASS)
TOKEN_RE_JAVA = "(?U)[^\\W_]+(?:['’][^\\W_]+)*"

_STOP_ARR = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])


def standard_tokens_col(text: Column) -> Column:
    """array<string> of emitted (post-stop, lowercase) terms."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE_JAVA), F.lit(0))
    return F.filter(
        toks,
        lambda t: (F.length(t) <= MAX_TOKEN_LENGTH) & ~F.array_contains(_STOP_ARR, t),
    )


def standard_tokens_pos_col(text: Column) -> Column:
    """array<struct<term:string,pos:int>> with Lucene position
    semantics: position advances for every raw token, including the
    dropped ones (FilteringTokenFilter.java:49-62)."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE_JAVA), F.lit(0))
    pairs = F.transform(
        toks, lambda t, i: F.struct(t.alias("term"), i.cast("int").alias("pos"))
    )
    return F.filter(
        pairs,
        lambda s: (F.length(s["term"]) <= MAX_TOKEN_LENGTH)
        & ~F.array_contains(_STOP_ARR, s["term"]),
    )


def _lstrip_ws(text: Column) -> Column:
    """Strip ALL leading whitespace (F.trim strips only spaces, so a
    leading tab/newline would survive and yield an empty first split
    element, shifting every token position by one vs the pandas
    engine)."""
    return F.regexp_replace(text, "^\\s+", "")


def whitespace_tokens_col(text: Column) -> Column:
    """WhitespaceAnalyzer analog (no case folding, no stopwords).

    Leading whitespace stripped first: a leading-whitespace split would
    otherwise yield an empty first element, shifting every position by
    one relative to the pandas engine (which drops empties before
    enumerating)."""
    return F.filter(F.split(_lstrip_ws(text), "\\s+"), lambda t: t != F.lit(""))


def whitespace_tokens_pos_col(text: Column) -> Column:
    toks = F.split(_lstrip_ws(text), "\\s+")
    pairs = F.transform(
        toks, lambda t, i: F.struct(t.alias("term"), i.cast("int").alias("pos"))
    )
    return F.filter(pairs, lambda s: s["term"] != F.lit(""))


JVM_ANALYZERS = {
    "standard": standard_tokens_col,
    "whitespace": whitespace_tokens_col,
}
JVM_ANALYZERS_POS = {
    "standard": standard_tokens_pos_col,
    "whitespace": whitespace_tokens_pos_col,
}
