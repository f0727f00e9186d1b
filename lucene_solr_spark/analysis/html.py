"""Pinned HTML -> text extraction (HTMLStripCharFilter analog).

Reference: analysis/common/.../charfilter/HTMLStripCharFilter.java — the
charfilter that turns markup into analyzable text ahead of tokenization.

This function is VERSIONED and FROZEN (EXTRACTOR_VERSION): the north
rule requires byte-identical extracted text per url across runs and
cluster sizes, so any change must bump the version and regenerate the
golden hashes (tests/fixtures/extraction_golden.jsonl).

Pipeline (v1), defined on utf-8 bytes:
1. decode utf-8 (errors='replace' — deterministic U+FFFD substitution)
2. drop <script>/<style> elements including content (case-insensitive)
3. drop HTML comments
4. replace every remaining tag with a single space
5. decode the pinned entity set (&amp; &lt; &gt; &quot; &#39; &apos;
   &nbsp; — a frozen subset, NOT the full HTML5 table, so behavior
   cannot drift with the stdlib)
6. collapse all whitespace runs to single spaces, strip ends

Both the scalar and the pandas-vectorized form are provided; they are
by-construction identical (the vectorized form applies the same regex
chain via pandas C string ops) and tests assert agreement.
"""

from __future__ import annotations

import re

import pandas as pd

EXTRACTOR_VERSION = 1

_SCRIPT_STYLE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_COMMENT = re.compile(r"(?s)<!--.*?-->")
_TAG = re.compile(r"(?s)<[^>]*>")
_WS = re.compile(r"\s+")

# frozen entity subset (order matters: &amp; last so it can't create
# new entities that then get decoded)
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text(html: bytes) -> str:
    """Pure pinned extractor: html bytes -> canonical text string."""
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE.sub(" ", s)
    s = _COMMENT.sub(" ", s)
    s = _TAG.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS.sub(" ", s).strip()


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized form for Arrow-batched pandas UDFs (same pipeline via
    pandas C string kernels)."""
    s = html.map(lambda b: (b or b"").decode("utf-8", errors="replace"))
    s = s.str.replace(_SCRIPT_STYLE, " ", regex=True)
    s = s.str.replace(_COMMENT, " ", regex=True)
    s = s.str.replace(_TAG, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_WS, " ", regex=True).str.strip()


def extract_text_col(html_col):
    """DataFrame column transform: binary html -> extracted text, as an
    Arrow-vectorized pandas UDF (no per-row Python at the Spark level)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return extract_text_series(s)

    return _extract(html_col)
