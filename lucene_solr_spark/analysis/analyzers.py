"""Vectorized analysis chain (StandardAnalyzer subset).

Reference chain (analysis/common/.../standard/StandardAnalyzer.java:83-97):
StandardTokenizer -> StandardFilter(no-op) -> LowerCaseFilter -> StopFilter.

Semantics reproduced:
- UAX#29 word-break subset for web text: ALPHANUM/NUM runs, apostrophe
  joining (O'Neil's stays one token) — StandardTokenizerImpl.jflex grammar;
  hyphens split tokens. (Full JFlex DFA is 818 generated LoC; we implement
  the English/Latin subset and pin fixture vectors, SURVEY.md §7.2.)
- Tokens longer than maxTokenLength=255 are DROPPED but still advance the
  position counter (StandardTokenizer.java:155-177, default 255 at
  StandardAnalyzer.java:39).
- Lowercase per codepoint (core/LowerCaseFilter.java:44-50; we use
  str.lower() and document the Unicode delta).
- 33 English stopwords removed (core/StopAnalyzer.java:42-50); removed
  tokens add their position increment to the next kept token
  (util/FilteringTokenFilter.java:49-62).
- Document length for norms = number of EMITTED tokens (stopwords never
  emitted, so not counted; DefaultIndexingChain.java:637,
  BM25Similarity.java:140-143).

All entry points are pandas-Series vectorized (pandas str ops / C regex),
for use inside Arrow-batched pandas UDFs — never row-at-a-time Spark UDFs.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# The 33 English stopwords of StopAnalyzer.ENGLISH_STOP_WORDS_SET
# (analysis/common/.../core/StopAnalyzer.java:42-50).
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:39

# ALPHANUM/NUM runs with apostrophe joining; underscore excluded (UAX#29
# treats '_' as ExtendNumLet join which we approximate by splitting).
_TOKEN_RE = re.compile(r"[^\W_]+(?:['’][^\W_]+)*", re.UNICODE)


def tokenize_standard(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] of emitted (post-stop) lowercase terms."""
    tokens = texts.fillna("").str.findall(_TOKEN_RE)
    return tokens.map(_finish_standard)


def _finish_standard(toks: list[str]) -> list[str]:
    # length filter (drop >255, still counts a position — positions only
    # matter for phrase queries, post-MVP), lowercase, stop filter
    return [
        lt
        for t in toks
        if len(t) <= MAX_TOKEN_LENGTH and (lt := t.lower()) not in ENGLISH_STOP_WORDS
    ]


def tokenize_standard_with_positions(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[(term, pos)]] with Lucene position semantics.

    Positions: posIncr 1 per token; dropped (overlong) and stopped tokens
    contribute their increment to the next kept token
    (StandardTokenizer.java:155-177, FilteringTokenFilter.java:49-62).
    """
    tokens = texts.fillna("").str.findall(_TOKEN_RE)

    def finish(toks: list[str]) -> list[tuple[str, int]]:
        out = []
        pos = -1
        for t in toks:
            pos += 1  # every raw token advances position
            if len(t) > MAX_TOKEN_LENGTH:
                continue
            lt = t.lower()
            if lt in ENGLISH_STOP_WORDS:
                continue
            out.append((lt, pos))
        return out

    return tokens.map(finish)


def tokenize_whitespace(texts: pd.Series) -> pd.Series:
    """WhitespaceAnalyzer analog (core/WhitespaceTokenizer): split on
    whitespace, no case folding, no stopwords."""
    return texts.fillna("").str.split().map(lambda t: t if t else [])


def tokenize_whitespace_with_positions(texts: pd.Series) -> pd.Series:
    """Whitespace analog with positions (every token emitted; posIncr 1)."""
    return texts.fillna("").str.split().map(
        lambda toks: [(t, i) for i, t in enumerate(toks or [])]
    )


ANALYZERS = {
    "standard": tokenize_standard,
    "whitespace": tokenize_whitespace,
}

ANALYZERS_POS = {
    "standard": tokenize_standard_with_positions,
    "whitespace": tokenize_whitespace_with_positions,
}


def doc_lengths(token_lists: pd.Series) -> np.ndarray:
    """Norm field length = emitted token count (DefaultIndexingChain.java:637)."""
    return token_lists.str.len().to_numpy(dtype=np.int64)
