"""Classic QueryParser subset (reference: queryparser/.../classic/
QueryParser.jj grammar via QueryParserBase.java:114-118, the demo
entry point demo/SearchFiles.java:100-170).

Grammar (default operator OR — the reference default; `field:` scopes
a term, wildcard, fuzzy, or range clause):

    query   := clause+
    clause  := [conj] [mods] (group | phrase | range | term)
    conj    := AND | && | OR | ||
    mods    := + | - | NOT | !
    group   := '(' query ')' ['^' boost]
    phrase  := '"' text '"' ['~' slop] ['^' boost]
    range   := [field ':'] ('[' | '{') lo TO hi (']' | '}')
               ['^' boost]     (QueryParser.jj:76,167 Range tokens:
               '[' ']' inclusive, '{' '}' exclusive; '*' = open bound;
               bounds lowercased, not analyzed -> TermRangeQuery)
    group   may be field-scoped: `field:(...)` sets the default field
               of the grouped sub-query; phrases likewise accept a
               `field:"..."` prefix (QueryParser.jj Clause production)
    term    := [field ':'] word ['~' [edits | float-similarity]]
               ['^' boost]
               ('-'/'+' are operators only at clause start; mid-word
                they are term characters, per _TERM_CHAR in the
                reference grammar)
              (word with '*' / '?' -> wildcard; trailing-'*'-only ->
               prefix; both CONSTANT_SCORE rewrites, field-scoped
               when prefixed)

Clause-occur resolution reproduces QueryParserBase.addClause for the
OR default operator: `a AND b` retro-promotes the previous clause to
MUST; `+`/`-`/NOT set MUST / MUST_NOT; everything else is SHOULD.

Query text is analyzed with the same analyzer as the index
(QueryBuilder semantics): a term that analyzes to nothing (stopword)
drops its clause; one that analyzes to several tokens becomes a
SHOULD-disjunction (unquoted) or keeps phrase order (quoted).
"""

from __future__ import annotations

import re

import pandas as pd

from lucene_solr_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    Clause,
    DisMaxQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<bang>!)
  | (?P<andop>&&)
  | (?P<orop>\|\|)
  | (?:(?P<pfield>[^\s()+\-!"^~:\[\]{}]+):)?"(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<pboost>[0-9]+(?:\.[0-9]+)?))?
  | (?P<gfield>[^\s()+\-!"^~:\[\]{}]+):(?=\()
  | \^(?P<boost>[0-9]+(?:\.[0-9]+)?)
  | (?:(?P<rfield>[^\s()+\-!"^~:\[\]{}]+):)?(?P<lbr>[\[{])\s*(?P<rlo>[^\s\]}]+)\s+TO\s+(?P<rhi>[^\s\]}]+)\s*(?P<rbr>[\]}])(?:\^(?P<rboost>[0-9]+(?:\.[0-9]+)?))?
  | (?P<term>[^\s()+\-!"^~][^\s()!"^~]*)(?:~(?P<edits>[0-9]*(?:\.[0-9]+)?))?(?:\^(?P<tboost>[0-9]+(?:\.[0-9]+)?))?
    """,
    re.X,
)


def _lex(s: str) -> list[tuple]:
    """-> [(type, payload)] with types: ( ) + - ! AND OR NOT BOOST
    PHRASE TERM."""
    out: list[tuple] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            raise ValueError(f"cannot lex query at offset {pos}: {s[pos:]!r}")
        pos = m.end()
        if m.group("ws"):
            continue
        if m.group("lparen"):
            out.append(("(", None))
        elif m.group("rparen"):
            out.append((")", None))
        elif m.group("plus"):
            out.append(("+", None))
        elif m.group("minus"):
            out.append(("-", None))
        elif m.group("bang"):
            out.append(("NOT", None))
        elif m.group("andop"):
            out.append(("AND", None))
        elif m.group("orop"):
            out.append(("OR", None))
        elif m.group("phrase") is not None:
            out.append(
                (
                    "PHRASE",
                    {
                        "text": m.group("phrase"),
                        "field": m.group("pfield"),
                        "slop": int(m.group("slop")) if m.group("slop") else 0,
                        "boost": float(m.group("pboost"))
                        if m.group("pboost")
                        else None,
                    },
                )
            )
        elif m.group("gfield") is not None:
            # `field:(...)` — the field scopes the following group
            # (QueryParser.jj Clause: [TermToken COLON] LPAREN Query)
            out.append(("FIELD", m.group("gfield")))
        elif m.group("boost") is not None:
            out.append(("BOOST", float(m.group("boost"))))
        elif m.group("lbr") is not None:
            out.append(
                (
                    "RANGE",
                    {
                        "field": m.group("rfield"),
                        "lower": m.group("rlo"),
                        "upper": m.group("rhi"),
                        "include_lower": m.group("lbr") == "[",
                        "include_upper": m.group("rbr") == "]",
                        "boost": float(m.group("rboost"))
                        if m.group("rboost")
                        else None,
                    },
                )
            )
        else:
            word = m.group("term")
            if word == "AND":
                out.append(("AND", None))
            elif word == "OR":
                out.append(("OR", None))
            elif word == "NOT":
                out.append(("NOT", None))
            else:
                edits = m.group("edits")
                if edits:
                    if "." in edits:
                        # legacy float similarity: FuzzyQuery.floatToEdits
                        # — edits = min((1-sim)*termLen, 2)
                        sim = float(edits)
                        n_edits = min(int((1.0 - sim) * len(word)), 2)
                    else:
                        n_edits = int(edits)
                else:
                    n_edits = 2
                out.append(
                    (
                        "TERM",
                        {
                            "text": word,
                            "fuzzy": edits is not None,
                            "edits": n_edits,
                            "boost": float(m.group("tboost"))
                            if m.group("tboost")
                            else None,
                        },
                    )
                )
    return out


class QueryParser:
    """parse(s) -> Query over the configured analyzer."""

    def __init__(self, analyzer: str = "standard"):
        from lucene_solr_spark.analysis.analyzers import ANALYZERS

        self._analyze = ANALYZERS[analyzer]

    def _tokens(self, text: str) -> list[str]:
        return list(self._analyze(pd.Series([text]))[0])

    # multi-term-query text hooks (QueryParserBase
    # lowercaseExpandedTerms default: lowercase, don't analyze).
    # AnalyzingQueryParser overrides both to run the analysis chain.
    def _mtq_chunk(self, text: str) -> str:
        return text.lower()

    def _wildcard_text(self, word: str) -> str:
        return word.lower()

    def parse(self, s: str) -> Query | None:
        toks = _lex(s)
        q, i = self._parse_query(toks, 0)
        if i != len(toks):
            raise ValueError(f"unbalanced ')' at token {i} in {s!r}")
        return q

    # ---- recursive descent ------------------------------------------

    def _parse_query(
        self, toks: list, i: int, field: str | None = None
    ) -> tuple[Query | None, int]:
        """`field` is the enclosing `field:(...)` scope (QueryParser.jj
        sets the default field for the grouped sub-query); an explicit
        `f:term` inside still overrides it."""
        clauses: list[Clause] = []
        conj = None
        mods = None
        while i < len(toks):
            t, payload = toks[i]
            if t == ")":
                break
            if t in ("AND", "OR"):
                conj = t
                i += 1
                continue
            if t == "NOT":
                mods = "NOT"
                i += 1
                continue
            if t == "+":
                mods = "PLUS"
                i += 1
                continue
            if t == "-":
                mods = "MINUS"
                i += 1
                continue
            sub_field = field
            if t == "FIELD":
                if i + 1 >= len(toks) or toks[i + 1][0] != "(":
                    raise ValueError("field scope must precede a group")
                sub_field = payload
                i += 1
                t, payload = toks[i]
            if t == "(":
                sub, i = self._parse_query(toks, i + 1, field=sub_field)
                if i >= len(toks) or toks[i][0] != ")":
                    raise ValueError("missing ')'")
                i += 1
                if i < len(toks) and toks[i][0] == "BOOST":
                    if sub is not None:
                        sub = BoostQuery(sub, toks[i][1])
                    i += 1
                q = sub
            elif t == "PHRASE":
                q = self._phrase_query(payload, default_field=field)
                i += 1
            elif t == "RANGE":
                q = self._range_query(payload, default_field=field)
                i += 1
            elif t == "TERM":
                q = self._term_query(payload, default_field=field)
                i += 1
            else:
                raise ValueError(f"unexpected token {t}")
            self._add_clause(clauses, conj, mods, q)
            conj = None
            mods = None
        return self._build(clauses), i

    @staticmethod
    def _add_clause(clauses: list[Clause], conj, mods, q) -> None:
        """QueryParserBase.addClause, OR default operator: CONJ_AND
        retro-promotes the previous non-prohibited clause to MUST."""
        if clauses and conj == "AND":
            last = clauses[-1]
            if last.occur != "MUST_NOT":
                clauses[-1] = Clause("MUST", last.query)
        if q is None:  # analyzer erased it (pure stopwords)
            return
        if mods in ("MINUS", "NOT"):
            occur = "MUST_NOT"
        elif mods == "PLUS" or conj == "AND":
            occur = "MUST"
        else:
            occur = "SHOULD"
        clauses.append(Clause(occur, q))

    @staticmethod
    def _build(clauses: list[Clause]) -> Query | None:
        if not clauses:
            return None
        if len(clauses) == 1 and clauses[0].occur in ("MUST", "SHOULD"):
            return clauses[0].query
        return BooleanQuery(tuple(clauses))

    def _term_query(self, p: dict, default_field: str | None = None) -> Query | None:
        word = p["text"]
        boost = p["boost"]
        field = default_field
        if ":" in word:
            # classic fielded clause `field:term`
            # (QueryParser.jj Clause production)
            fld, rest = word.split(":", 1)
            if fld and rest:
                field = fld
                word = rest
        if "*" in word or "?" in word:
            # expanded terms are lowercased, not analyzed
            # (QueryParserBase lowercaseExpandedTerms default true);
            # the AnalyzingQueryParser subclass overrides the chunk
            # hooks to run the analysis chain instead;
            # field-scoped expansion when a `field:` prefix is present
            w = self._wildcard_text(word)
            if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                q: Query = PrefixQuery(w[:-1], field=field)
            else:
                q = WildcardQuery(w, field=field)
        elif p["fuzzy"]:
            q = FuzzyQuery(
                self._mtq_chunk(word), max_edits=p["edits"], field=field
            )
        else:
            toks = self._tokens(word)
            if not toks:
                return None
            if len(toks) == 1:
                q = TermQuery(toks[0], field=field)
            else:
                q = BooleanQuery(
                    tuple(
                        Clause("SHOULD", TermQuery(t, field=field))
                        for t in toks
                    )
                )
        return BoostQuery(q, boost) if boost is not None else q

    def _range_query(self, p: dict, default_field: str | None = None) -> Query:
        """`[a TO b]` / `{a TO b}` -> TermRangeQuery (QueryParser.jj
        Range production; RangeQueryNode semantics). Bounds are
        lowercased, not analyzed (lowercaseExpandedTerms); `*` is an
        open bound."""
        from lucene_solr_spark.search.query import TermRangeQuery

        lo = None if p["lower"] == "*" else self._mtq_chunk(p["lower"])
        hi = None if p["upper"] == "*" else self._mtq_chunk(p["upper"])
        q: Query = TermRangeQuery(
            lo,
            hi,
            include_lower=p["include_lower"],
            include_upper=p["include_upper"],
            field=p["field"] or default_field,
        )
        boost = p["boost"]
        return BoostQuery(q, boost) if boost is not None else q

    def _phrase_query(self, p: dict, default_field: str | None = None) -> Query | None:
        field = p.get("field") or default_field
        toks = self._tokens(p["text"])
        if not toks:
            return None
        if len(toks) == 1:
            q: Query = TermQuery(toks[0], field=field)
        else:
            q = PhraseQuery(tuple(toks), slop=p["slop"], field=field)
        boost = p["boost"]
        return BoostQuery(q, boost) if boost is not None else q


def parse_query(s: str, analyzer: str = "standard") -> Query | None:
    return QueryParser(analyzer).parse(s)


class AnalyzingQueryParser(QueryParser):
    """queryparser/analyzing/AnalyzingQueryParser.java: the classic
    grammar, but wildcard / prefix / fuzzy / range term text runs
    through the ANALYSIS CHAIN instead of plain lowercasing —
    `Café*` under a folding chain seeks the `cafe` prefix, where the
    classic parser would seek `café` and miss.

    - wildcard terms split on `[?*]+` runs (wildcardPattern, :43);
      each non-wildcard chunk must analyze to EXACTLY one token
      (analyzeSingleChunk, :148-180 — 0 or >1 raises, the
      ParseException analog);
    - prefix / fuzzy / range text analyzes whole (:124-146;
      setAnalyzeRangeTerms(true) in the ctor)."""

    def _mtq_chunk(self, text: str) -> str:
        toks = self._tokens(text)
        if len(toks) != 1:
            raise ValueError(
                f"analyzer returned {len(toks)} terms for multi-term "
                f"chunk {text!r}; expected 1 (AnalyzingQueryParser."
                f"analyzeSingleChunk)"
            )
        return toks[0]

    def _wildcard_text(self, word: str) -> str:
        parts = re.split(r"([?*]+)", word)
        return "".join(
            p if (not p or p[0] in "?*") else self._mtq_chunk(p)
            for p in parts
        )


def analyzing_parse_query(
    s: str, analyzer: str = "standard"
) -> Query | None:
    return AnalyzingQueryParser(analyzer).parse(s)


def edismax_query(
    s: str,
    qf: dict[str, float],
    tie: float = 0.0,
    mm: int = 0,
    analyzer: str = "standard",
    pf: dict[str, float] | None = None,
    ps: int = 0,
) -> Query | None:
    """(e)dismax parser subset (solr/.../search/DisMaxQParser.java:77-131,
    ExtendedDismaxQParser.java main-clause path): analyze the user
    string, turn EACH term into a DisjunctionMax across the qf fields
    (per-field boost folded into the alternative's weight), and combine
    the per-term DisMaxes as SHOULD clauses with minShouldMatch = mm
    (DisMaxQParser.parseClauses + U.setMinShouldMatch). Returns None
    for an empty/all-stopword string.

    `pf` (phrase fields) + `ps` (phrase slop): when the string analyzes
    to >= 2 tokens, a boosted PhraseQuery over the WHOLE token sequence
    is added per pf field as an optional clause on top of the required
    main query (DisMaxQParser.addBoostQuery / getPhraseQuery — docs
    matching the full phrase score main + phrase, others keep the main
    score: ReqOptSumScorer shape)."""
    from lucene_solr_spark.analysis.analyzers import ANALYZERS

    toks = ANALYZERS[analyzer](pd.Series([s]))[0]
    if not toks:
        return None
    clauses = []
    for t in toks:
        alts: list[Query] = []
        for f, b in qf.items():
            tq: Query = TermQuery(t, field=f)
            alts.append(BoostQuery(tq, float(b)) if float(b) != 1.0 else tq)
        clauses.append(Clause("SHOULD", DisMaxQuery(tuple(alts), tie)))
    main = BooleanQuery(tuple(clauses), min_should_match=mm)
    if not pf or len(toks) < 2:
        return main
    phrase_clauses: list[Clause] = []
    for f, b in pf.items():
        pq: Query = PhraseQuery(tuple(toks), slop=int(ps), field=f)
        phrase_clauses.append(
            Clause("SHOULD", BoostQuery(pq, float(b)) if float(b) != 1.0 else pq)
        )
    return BooleanQuery((Clause("MUST", main), *phrase_clauses))


class ComplexPhraseQueryParser(QueryParser):
    """ComplexPhraseQueryParser analog (lucene/queryparser/.../
    complexPhrase/ComplexPhraseQueryParser.java): inside a quoted
    phrase, wildcard words expand POSITIONALLY — `"ta* scan"` matches
    any term starting 'ta' immediately before 'scan'. The reference
    parses the phrase content as a mini-query and rewrites it to
    SpanNearQuery(allSpanClauses, slopFactor, inOrder) (:309); here
    each wildcard word lifts via SpanMultiTermQueryWrapper (the
    SCORING_SPAN_QUERY_REWRITE dictionary expansion, df-bounded) and
    plain words become SpanTermQuery, joined by SpanNearQuery with the
    phrase's `~slop` and the parser's in_order flag (:69-78
    setInOrder). Phrases without wildcards fall back to the classic
    PhraseQuery path (identical scoring to the base parser).

    Subset: word-level wildcards ('*' / '?'); the reference's embedded
    fuzzy/range-in-phrase forms are out of scope (documented)."""

    def __init__(self, analyzer: str = "standard", in_order: bool = True,
                 max_expansions: int = 50):
        super().__init__(analyzer)
        self._in_order = in_order
        self._max_expansions = max_expansions

    def _phrase_query(self, p: dict, default_field: str | None = None):
        words = p["text"].split()
        if not any("*" in w or "?" in w for w in words):
            return super()._phrase_query(p, default_field)
        from lucene_solr_spark.search.query import (
            SpanMultiTermQueryWrapper,
            SpanNearQuery,
            SpanTermQuery,
        )

        field = p.get("field") or default_field
        clauses: list = []
        for w in words:
            lw = w.lower()
            if "*" in lw or "?" in lw:
                if lw.endswith("*") and "*" not in lw[:-1] and "?" not in lw:
                    mtq: Query = PrefixQuery(
                        lw[:-1], field=field,
                        max_expansions=self._max_expansions,
                    )
                else:
                    mtq = WildcardQuery(
                        lw, field=field,
                        max_expansions=self._max_expansions,
                    )
                clauses.append(SpanMultiTermQueryWrapper(mtq))
            else:
                toks = self._tokens(lw)
                if not toks:
                    # stop/empty word: the reference's analyzer drops it
                    # from the phrase too (position gap not preserved in
                    # this subset)
                    continue
                clauses.append(SpanTermQuery(toks[0], field=field))
        if not clauses:
            return None
        if len(clauses) == 1:
            q: Query = clauses[0]
        else:
            q = SpanNearQuery(tuple(clauses), p["slop"], self._in_order)
        boost = p["boost"]
        return BoostQuery(q, boost) if boost is not None else q


def complex_phrase_query(
    s: str, analyzer: str = "standard", in_order: bool = True
) -> Query | None:
    return ComplexPhraseQueryParser(analyzer, in_order).parse(s)
