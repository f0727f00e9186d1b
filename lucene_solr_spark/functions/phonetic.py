"""Soundex phonetic coding — the lucene/analysis/phonetic module's
PhoneticFilter(Soundex) analog (PhoneticFilter.java wraps a
commons-codec encoder; Soundex US_ENGLISH mapping
"01230120022455012623010202").

Archival US-English Soundex: keep the first letter; code the rest
(vowels A E I O U Y -> 0, H/W transparent — they do NOT break a run of
equal codes, vowels DO); collapse adjacent equal codes including the
first letter's own code; strip the zeros; first letter + first three
digits, zero-padded.

Two mirrored implementations:
- soundex(word): driver-side Python (query-term coding);
- soundex_col(col): a pure Column expression (translate + a bounded
  chain of regexp_replace, all inside whole-stage codegen) for coding
  the term dictionary distributedly. Parity is pytest-pinned on
  goldens and random words.

The search analog of Solr's "sounds-like" field: code the vocabulary
(a dictionary-sized scan, never the postings), expand the query word
to its phonetic equivalence class, and run a scoring OR — the same
shape as FuzzyQuery's dictionary expansion.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CODES = "01230120022455012623010202"
_MAP = dict(zip(_ALPHA, _CODES))


def soundex(word: str) -> str:
    """Driver-side Soundex of one word ('' for a letterless input)."""
    up = "".join(ch for ch in word.upper() if "A" <= ch <= "Z")
    if not up:
        return ""
    first = up[0]
    rest = [ch for ch in up[1:] if ch not in "HW"]
    codes = _MAP[first] + "".join(_MAP[ch] for ch in rest)
    collapsed = []
    for c in codes:
        if not collapsed or collapsed[-1] != c:
            collapsed.append(c)
    digits = "".join(c for c in collapsed[1:] if c != "0")
    return first + (digits[:3]).ljust(3, "0")


def soundex_col(c: Column) -> Column:
    """Column-expression Soundex, identical to soundex() (pinned)."""
    up = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    first = F.substring(up, 1, 1)
    rest = F.regexp_replace(F.substring(up, 2, 2048), "[HW]", "")
    codes = F.translate(F.concat(first, rest), _ALPHA, _CODES)
    collapsed = codes
    for d in "0123456":
        collapsed = F.regexp_replace(collapsed, d + "+", d)
    digits = F.regexp_replace(
        F.substring(collapsed, 2, 2048), "0", ""
    )
    return F.when(up == F.lit(""), F.lit("")).otherwise(
        F.concat(first, F.rpad(F.substring(digits, 1, 3), 3, "0"))
    )


def soundex_sql(expr: str) -> str:
    """The same coding as ONE DuckDB SQL expression over `expr` —
    used by the contract oracle so the expansion is recomputed, not
    pasted."""
    up = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    first = f"substr({up}, 1, 1)"
    rest = f"regexp_replace(substr({up}, 2), '[HW]', '', 'g')"
    codes = f"translate({first} || {rest}, '{_ALPHA}', '{_CODES}')"
    collapsed = codes
    for d in "0123456":
        collapsed = f"regexp_replace({collapsed}, '{d}+', '{d}', 'g')"
    digits = f"replace(substr({collapsed}, 2), '0', '')"
    return (
        f"CASE WHEN {up} = '' THEN '' "
        f"ELSE {first} || rpad(substr({digits}, 1, 3), 3, '0') END"
    )
