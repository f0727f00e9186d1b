"""English stemmers (PorterStemFilter / EnglishMinimalStemFilter analogs).

Two stemmers, each with a vectorized python engine AND a DuckDB-SQL
generator so the driver's oracle can reproduce index-time stemming
independently:

- ``porter_stem``: the Porter algorithm exactly as the reference ships
  it (analysis/common/.../en/PorterStemmer.java:115-488 — the updated
  variant with the ``bli``->``ble`` / ``logi``->``log`` step-3 rules
  and the "Bug 1/2" guards; words of length <= 2 are returned
  unchanged, PorterStemmer.java:484).
- ``minimal_stem_en``: Harman's S-stemmer
  (analysis/common/.../en/EnglishMinimalStemmer.java:28-45).

Scale design: stemming is pure per-TERM work, so the engines never run
it per token occurrence — the arrow segment builder stems the pyarrow
dictionary (|vocab| python calls per segment batch, not |tokens|), and
the pandas analyzer memoizes per unique token. The SQL oracle mirrors
this: it stems ``SELECT DISTINCT term`` and joins the mapping back.

SQL-engine note: DuckDB's regexp is RE2 (no lookbehind), so the
consonant/vowel map resolves the recursive ``y`` rule
(PorterStemmer.java:115-124 — y is a consonant iff word-initial or
after a vowel, where "vowel" includes a vowel-y) by bounded
alternation passes: each pass settles the next unresolved y of every
y-run. _CV_PASSES=4 settles runs up to ~8 consecutive y's; longer runs
(no such English words; parity is asserted against the exact python
map in tests) would leave a y unclassified and raise via a CHECK-style
NULL, never silently diverge.
"""

from __future__ import annotations

import re

_VOWELS = frozenset("aeiou")


# ----------------------------------------------------------------------
# exact consonant/vowel machinery (python engine)
# ----------------------------------------------------------------------


def _cv(w: str) -> str:
    """Consonant/vowel map: 'C'/'V' per char, with the recursive y rule
    (cons(y) = word-initial or !cons(prev), PorterStemmer.java:115-124).
    The class of position i depends only on chars 0..i, so the map of
    a prefix IS the prefix of the map — every step condition below
    measures prefixes of one map."""
    out: list[str] = []
    for i, c in enumerate(w):
        if c in _VOWELS:
            out.append("V")
        elif c == "y":
            out.append("C" if (i == 0 or out[i - 1] == "V") else "V")
        else:
            out.append("C")
    return "".join(out)


def _m(cvs: str) -> int:
    """Measure: number of VC sequences after collapsing runs
    (PorterStemmer.java:137-166)."""
    return re.sub("V+", "V", re.sub("C+", "C", cvs)).count("VC")


def _doublec(w: str, cvs: str) -> bool:
    """Ends in a double consonant (PorterStemmer.java:180-186)."""
    return len(w) >= 2 and w[-1] == w[-2] and cvs[-1] == "C"


def _cvc_at(w: str, cvs: str, i: int) -> bool:
    """cvc(i): chars i-2..i are C,V,C and char i is not w/x/y
    (PorterStemmer.java:195-203)."""
    if i < 2:
        return False
    return cvs[i - 2 : i + 1] == "CVC" and w[i] not in "wxy"


# ----------------------------------------------------------------------
# Porter steps (python engine; java step numbering, steps 1..6)
# ----------------------------------------------------------------------

# (suffix, replacement) tables for the three uniform m>0 / m>1 steps.
# Order within each table = longest suffix first, which reproduces the
# reference's char-dispatched ends() order (verified rule-set-wide:
# no shorter suffix precedes a longer one it suffixes).
STEP3_RULES = (
    ("ational", "ate"), ("ization", "ize"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"),
    ("tional", "tion"), ("biliti", "ble"),
    ("entli", "ent"), ("ousli", "ous"), ("ation", "ate"),
    ("alism", "al"), ("aliti", "al"), ("iviti", "ive"),
    ("enci", "ence"), ("anci", "ance"), ("izer", "ize"),
    ("alli", "al"), ("ator", "ate"), ("logi", "log"),
    ("bli", "ble"), ("eli", "e"),
)
STEP4_RULES = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
)
# step5: all (m>1) -> delete; 'ion' additionally needs stem ending s/t
STEP5_SUFFIXES = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ion", "ism", "ate", "iti", "ous", "ive", "ize",
    "ou", "al", "er", "ic",
)


def _step1(w: str) -> str:
    # plurals (PorterStemmer.java:258-263)
    if w.endswith("s"):
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-3] + "i"
        elif len(w) >= 2 and w[-2] != "s":
            w = w[:-1]
    # -eed / -ed / -ing (PorterStemmer.java:264-279)
    if w.endswith("eed"):
        if _m(_cv(w)[: len(w) - 3]) > 0:
            w = w[:-1]
        return w
    base = None
    if w.endswith("ed") and "V" in _cv(w)[: len(w) - 2]:
        base = w[:-2]
    elif w.endswith("ing") and "V" in _cv(w)[: len(w) - 3]:
        base = w[:-3]
    if base is None:
        return w
    if base.endswith(("at", "bl", "iz")):
        return base + "e"
    bcv = _cv(base)
    if _doublec(base, bcv):
        if base[-1] in "lsz":
            return base
        return base[:-1]
    if _m(bcv) == 1 and _cvc_at(base, bcv, len(base) - 1):
        return base + "e"
    return base


def _step2(w: str) -> str:
    # terminal y -> i when the stem has a vowel (java:284-289)
    if w.endswith("y") and "V" in _cv(w)[: len(w) - 1]:
        return w[:-1] + "i"
    return w


def _rules_step(w: str, rules, min_m: int) -> str:
    for sfx, rep in rules:
        if w.endswith(sfx) and len(w) > len(sfx):
            stem = w[: len(w) - len(sfx)]
            if _m(_cv(w)[: len(stem)]) > min_m - 1:
                return stem + rep
            return w
    return w


def _step5(w: str) -> str:
    for sfx in STEP5_SUFFIXES:
        if w.endswith(sfx) and len(w) > len(sfx):
            stem = w[: len(w) - len(sfx)]
            if sfx == "ion" and stem[-1] not in "st":
                continue  # java falls through to the 'ou' check
            if _m(_cv(w)[: len(stem)]) > 1:
                return stem
            return w
    return w


def _step6(w: str) -> str:
    cvs = _cv(w)
    if w.endswith("e"):
        a = _m(cvs)  # java measures INCLUDING the final e (same value:
        # a trailing vowel never closes a VC pair)
        if a > 1 or (a == 1 and not _cvc_at(w, cvs, len(w) - 2)):
            w = w[:-1]
            cvs = cvs[:-1]
    if w.endswith("l") and _doublec(w, cvs) and _m(cvs) > 1:
        w = w[:-1]
    return w


def porter_stem(w: str) -> str:
    """Stem one lowercase word (PorterStemmer.java:477-494).

    Words of length <= 2 are returned unchanged (java:484 `k > k0+1`)."""
    if len(w) <= 2:
        return w
    return _step6(_step5(_rules_step(
        _rules_step(_step2(_step1(w)), STEP3_RULES, 1), STEP4_RULES, 1
    )))


def minimal_stem_en(w: str) -> str:
    """Harman S-stemmer (EnglishMinimalStemmer.java:28-45): plural-only.

    -ies -> -y (unless -aies/-eies), keep -ss/-us and -Ves vowels,
    else strip one trailing s."""
    if len(w) < 3 or not w.endswith("s"):
        return w
    c2 = w[-2]
    if c2 in ("u", "s"):
        return w
    if c2 == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "e"):
            return w
    return w[:-1]


def stem_tokens(token_lists, stem=porter_stem):
    """Memoized per-unique-token stemming of a Series[list[str]] —
    the PorterStemFilter seam for the pandas analyzers. Python cost is
    O(|vocab|), not O(|tokens|)."""
    memo: dict[str, str] = {}

    def one(toks):
        out = []
        for t in toks:
            s = memo.get(t)
            if s is None:
                s = memo[t] = stem(t)
            out.append(s)
        return out

    return token_lists.map(one)


def stem_unique(terms: list[str], stem=porter_stem) -> list[str]:
    """Stem a dictionary (unique-term) list — the arrow builder seam."""
    return [stem(t) for t in terms]


# ----------------------------------------------------------------------
# DuckDB-SQL generators (oracle side)
# ----------------------------------------------------------------------

_CV_PASSES = 4  # settles y-runs up to length ~2*passes (see module doc)


def cv_sql(w: str) -> str:
    """SQL expression: consonant/vowel map of lowercase word `w`.

    Exact for y-runs <= ~2*_CV_PASSES (parity with _cv pinned in
    tests); an unresolved y (absurd y-run) yields a map containing
    'y', which makes every downstream LIKE/measure NULL-safe-false —
    loud in the parity tests, impossible on English text."""
    x = f"regexp_replace(regexp_replace({w}, '[aeiou]', 'V', 'g'), '[^Vy]', 'C', 'g')"
    x = f"regexp_replace({x}, '^y', 'C')"
    for _ in range(_CV_PASSES):
        x = f"regexp_replace({x}, 'Vy', 'VC', 'g')"
        x = f"regexp_replace({x}, 'Cy', 'CV', 'g')"
    return x


def m_sql(cvs: str) -> str:
    """SQL expression: the measure of a CV-map string."""
    collapsed = (
        f"regexp_replace(regexp_replace({cvs}, 'C+', 'C', 'g'), 'V+', 'V', 'g')"
    )
    return (
        f"CAST((length({collapsed}) - "
        f"length(replace({collapsed}, 'VC', ''))) / 2 AS INTEGER)"
    )


def _sfx_case(rules) -> tuple[str, str]:
    """(sfx CASE, rep CASE) over column w, longest-first order."""
    sfx = " ".join(
        f"WHEN w LIKE '%{s}' AND length(w) > {len(s)} THEN '{s}'"
        for s, _ in rules
    )
    rep = " ".join(
        f"WHEN w LIKE '%{s}' AND length(w) > {len(s)} THEN '{r}'"
        for s, r in rules
    )
    return f"CASE {sfx} ELSE NULL END", f"CASE {rep} ELSE NULL END"


def porter_sql_ctes(src: str, col: str = "term") -> str:
    """CTE chain stemming `src`(.. col ..) -> relation `porter_out`
    with columns (.. col .., stem). Apply to DISTINCT terms only.

    Mirrors porter_stem step by step; every condition measures a
    prefix of ONE cv map per step (the prefix property of _cv)."""

    def doublec(w: str = "w") -> str:
        return (
            f"(length({w}) >= 2 AND "
            f"substr({w}, length({w})-1, 1) = substr({w}, length({w}), 1)"
            f" AND substr({cv_sql(w)}, length({w}), 1) = 'C')"
        )

    def cvc_end(w: str = "w", off: int = 0) -> str:
        # cvc at position len(w)-off (1-indexed end offset)
        return (
            f"(length({w}) >= {3 + off} AND "
            f"substr({cv_sql(w)}, length({w})-{off + 2}, 3) = 'CVC' AND "
            f"substr({w}, length({w})-{off}, 1) NOT IN ('w','x','y'))"
        )

    s3_sfx, s3_rep = _sfx_case(STEP3_RULES)
    s4_sfx, s4_rep = _sfx_case(STEP4_RULES)
    s5_sfx = " ".join(
        (
            f"WHEN (w LIKE '%sion' OR w LIKE '%tion') AND length(w) > 3 THEN 'ion'"
            if s == "ion"
            else f"WHEN w LIKE '%{s}' AND length(w) > {len(s)} THEN '{s}'"
        )
        for s in STEP5_SUFFIXES
    )
    return f"""
p0 AS MATERIALIZED (SELECT {col}, lower({col}) AS w FROM {src}),
-- step1: plurals, then eed/ed/ing
p1a AS MATERIALIZED (SELECT {col}, CASE
    WHEN w LIKE '%sses' THEN substr(w, 1, length(w)-2)
    WHEN w LIKE '%ies' THEN substr(w, 1, length(w)-3) || 'i'
    WHEN w LIKE '%ss' THEN w
    WHEN w LIKE '%s' AND length(w) >= 2 THEN substr(w, 1, length(w)-1)
    ELSE w END AS w
  FROM (SELECT {col}, w FROM p0 WHERE length(w) > 2)),
p1b AS MATERIALIZED (SELECT {col}, w, CASE
    WHEN w LIKE '%eed' THEN NULL
    WHEN w LIKE '%ed' AND substr({cv_sql('w')}, 1, length(w)-2) LIKE '%V%'
      THEN substr(w, 1, length(w)-2)
    WHEN w LIKE '%ing' AND substr({cv_sql('w')}, 1, length(w)-3) LIKE '%V%'
      THEN substr(w, 1, length(w)-3)
    ELSE NULL END AS base
  FROM p1a),
p1 AS MATERIALIZED (SELECT {col}, CASE
    WHEN w LIKE '%eed' THEN
      CASE WHEN {m_sql(f"substr({cv_sql('w')}, 1, length(w)-3)")} > 0
           THEN substr(w, 1, length(w)-1) ELSE w END
    WHEN base IS NULL THEN w
    WHEN base LIKE '%at' OR base LIKE '%bl' OR base LIKE '%iz' THEN base || 'e'
    WHEN {doublec('base')} THEN
      CASE WHEN substr(base, length(base), 1) IN ('l','s','z') THEN base
           ELSE substr(base, 1, length(base)-1) END
    WHEN {m_sql(cv_sql('base'))} = 1 AND {cvc_end('base')} THEN base || 'e'
    ELSE base END AS w
  FROM p1b),
-- step2: y -> i
p2 AS MATERIALIZED (SELECT {col}, CASE
    WHEN w LIKE '%y' AND substr({cv_sql('w')}, 1, length(w)-1) LIKE '%V%'
      THEN substr(w, 1, length(w)-1) || 'i'
    ELSE w END AS w
  FROM p1),
-- step3: double suffixes (m > 0)
p3s AS MATERIALIZED (SELECT {col}, w, {s3_sfx} AS sfx, {s3_rep} AS rep FROM p2),
p3 AS MATERIALIZED (SELECT {col}, CASE
    WHEN sfx IS NOT NULL AND
      {m_sql(f"substr({cv_sql('w')}, 1, length(w)-length(sfx))")} > 0
      THEN substr(w, 1, length(w)-length(sfx)) || rep
    ELSE w END AS w
  FROM p3s),
-- step4: -icate/-ative/... (m > 0)
p4s AS MATERIALIZED (SELECT {col}, w, {s4_sfx} AS sfx, {s4_rep} AS rep FROM p3),
p4 AS MATERIALIZED (SELECT {col}, CASE
    WHEN sfx IS NOT NULL AND
      {m_sql(f"substr({cv_sql('w')}, 1, length(w)-length(sfx))")} > 0
      THEN substr(w, 1, length(w)-length(sfx)) || rep
    ELSE w END AS w
  FROM p4s),
-- step5: -ance/-ence/... deleted when m(stem) > 1
p5s AS MATERIALIZED (SELECT {col}, w, CASE {s5_sfx} ELSE NULL END AS sfx FROM p4),
p5 AS MATERIALIZED (SELECT {col}, CASE
    WHEN sfx IS NOT NULL AND
      {m_sql(f"substr({cv_sql('w')}, 1, length(w)-length(sfx))")} > 1
      THEN substr(w, 1, length(w)-length(sfx))
    ELSE w END AS w
  FROM p5s),
-- step6: final -e, then -ll
p6e AS MATERIALIZED (SELECT {col}, CASE
    WHEN w LIKE '%e' AND ({m_sql(cv_sql('w'))} > 1 OR
      ({m_sql(cv_sql('w'))} = 1 AND NOT {cvc_end('w', 1)}))
      THEN substr(w, 1, length(w)-1)
    ELSE w END AS w
  FROM p5),
p6 AS MATERIALIZED (SELECT {col}, CASE
    WHEN w LIKE '%l' AND {doublec()} AND {m_sql(cv_sql('w'))} > 1
      THEN substr(w, 1, length(w)-1)
    ELSE w END AS w
  FROM p6e),
porter_out AS MATERIALIZED (
  SELECT {col}, w AS stem FROM p6
  UNION ALL
  SELECT {col}, lower({col}) AS stem FROM p0 WHERE length(w) <= 2
)"""


def minimal_stem_sql(w: str) -> str:
    """SQL expression: EnglishMinimalStemmer of lowercase word `w`."""
    return f"""CASE
  WHEN length({w}) < 3 OR {w} NOT LIKE '%s' THEN {w}
  WHEN substr({w}, length({w})-1, 1) IN ('u','s') THEN {w}
  WHEN substr({w}, length({w})-1, 1) = 'e' THEN CASE
    WHEN length({w}) > 3 AND substr({w}, length({w})-2, 1) = 'i'
         AND substr({w}, length({w})-3, 1) NOT IN ('a','e')
      THEN substr({w}, 1, length({w})-3) || 'y'
    WHEN substr({w}, length({w})-2, 1) IN ('i','a','o','e') THEN {w}
    ELSE substr({w}, 1, length({w})-1) END
  ELSE substr({w}, 1, length({w})-1) END"""
