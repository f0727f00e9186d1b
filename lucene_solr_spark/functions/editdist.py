"""Transposition-aware edit distance for fuzzy term expansion.

The reference's FuzzyQuery defaults ``transpositions = true``
(search/FuzzyQuery.java:59): an adjacent-character swap counts as ONE
primitive edit, matched by LevenshteinAutomata built with the
transposition extension (util/automaton/LevenshteinAutomata.java:53).
The reference pins those automata against a dynamic program in
TestLevenshteinAutomata.java:333 (``getTDistance``) — the restricted
(optimal-string-alignment-style) Damerau variant, where a transposed
pair cannot be edited again.  This module reimplements exactly that DP
so the engine's dictionary expansion accepts the same term set the
automaton intersection would.

Scale note: this never touches postings.  It runs as an Arrow-batched
pandas UDF over the *term dictionary* frame, after a JVM-side
pre-filter (``|len(a)-len(b)| <= d`` and classic ``levenshtein <= 2d``
— sound because one transposition costs at most two classic edits), so
the Python path only sees the handful of near-miss candidate terms.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def transposition_distance(target: str, other: str) -> int:
    """Edit distance where an adjacent transposition is one edit.

    Exact port of the semantics the reference tests its fuzzy automata
    against (TestLevenshteinAutomata.java:333 ``getTDistance``):
    unit-cost insert/delete/substitute plus ``d[i-2][j-2] + cost`` when
    the current character pair is a crossed (transposed) pair.  This is
    the restricted Damerau distance — a substring is never edited after
    being transposed — so e.g. distance('ca', 'abc') == 3, where the
    unrestricted Damerau distance would be 2.
    """
    n, m = len(target), len(other)
    if n == 0 or m == 0:
        return max(n, m)
    prev2: list[int] = []
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        ti = target[i - 1]
        for j in range(1, m + 1):
            cost = 0 if ti == other[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and ti == other[j - 2]
                and target[i - 2] == other[j - 1]
            ):
                d = min(d, prev2[j - 2] + cost)
            cur[j] = d
        prev2, prev = prev, cur
    return prev[m]


def transposition_distance_udf(query_term: str):
    """Arrow-batched column function: distance of each term to
    ``query_term`` under :func:`transposition_distance`.  Built per
    query (the query term is closed over, so the batch loop is a pure
    single-argument map)."""

    @F.pandas_udf(IntegerType())
    def _dist(terms: pd.Series) -> pd.Series:
        return terms.map(lambda t: transposition_distance(query_term, t)).astype(
            "int32"
        )

    return _dist
