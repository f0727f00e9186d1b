"""SimpleQueryParser — the never-throws end-user grammar
(lucene/queryparser/.../simple/SimpleQueryParser.java, 6.0 snapshot).

Grammar (all operators enabled, the reference's default flags = -1):

    +   AND            |   OR             -   NOT (prefix)
    "..."[~N]          phrase (N = slop, NEAR operator)
    term*              prefix query       term~N  fuzzy (N edits, <= 2)
    ( ... )            sub-query          \\c     escape

Parsing is the reference's forgiving character state machine
(parseSubQuery:159-218 / consumeSubQuery:220-277 / consumePhrase:
279-347 / consumeToken:349-415): syntax errors NEVER raise — an
unmatched ')' is extraneous, an unclosed '(' or '"' is dropped and its
content re-parsed as plain text, '+'/'|' with no preceding clause are
ignored, doubled '-' negations cancel (not % 2).

Tree building reproduces buildQueryTree:432-471 exactly:
- a negated branch wraps as BooleanQuery[(MUST_NOT sub),
  (SHOULD MatchAllDocs)] — negation is self-contained, so `-a | b`
  really is "everything-but-a OR b" (:436-442);
- the running tree re-parents under a fresh BooleanQuery whenever the
  boolean operation CHANGES (:458-464) — `a + b | c` becomes
  ((+a +b) c), the reference's left-fold precedence;
- with no explicit operator the default occur applies (SHOULD, like
  the reference's defaultOperator).

Tokens run through the index analyzer (newDefaultQuery ->
createBooleanQuery): a token analyzing to nothing (stopword) drops its
branch; to several terms, a default-occur BooleanQuery. Prefix and
fuzzy text is lowercased but NOT analyzed (the reference passes raw
text to PrefixQuery/FuzzyQuery; lowercasing matches this engine's
classic-parser treatment of multi-term queries, which the dictionary
expansion expects)."""

from __future__ import annotations

import pandas as pd

from lucene_solr_spark.search.query import (
    BooleanQuery,
    Clause,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

_WS = (" ", "\t", "\n", "\r")
_DELIMS = ('"', "|", "+", "(", ")") + _WS


class _State:
    __slots__ = ("data", "i", "top", "cur_op", "prev_op", "not_count")

    def __init__(self, data: str):
        self.data = data
        self.i = 0
        self.top: Query | None = None
        self.cur_op: str | None = None
        self.prev_op: str | None = None
        self.not_count = 0


def parse_simple_query(
    text: str,
    analyzer: str = "standard",
    default_operator: str = "SHOULD",
) -> Query | None:
    """Parse `text`; returns None for an empty/all-stopword query (the
    reference returns MatchNoDocsQuery — this engine's convention for
    match-nothing is None, like `parse_query`)."""
    if default_operator not in ("SHOULD", "MUST"):
        raise ValueError("default_operator must be SHOULD or MUST")
    state = _State(text)
    _parse_sub(state, analyzer, default_operator)
    return state.top


def _parse_sub(state: _State, analyzer: str, default_op: str) -> None:
    """parseSubQuery:159-218 — one pass over the character data."""
    while state.i < len(state.data):
        ch = state.data[state.i]
        if ch == "(":
            _consume_subquery(state, analyzer, default_op)
        elif ch == ")":
            state.i += 1  # extraneous, ignored (:165)
        elif ch == '"':
            _consume_phrase(state, analyzer, default_op)
        elif ch == "+":
            # ignored unless a previous clause exists and no op is
            # already set (:171-175)
            if state.cur_op is None and state.top is not None:
                state.cur_op = "MUST"
            state.i += 1
        elif ch == "|":
            if state.cur_op is None and state.top is not None:
                state.cur_op = "SHOULD"
            state.i += 1
        elif ch == "-":
            # two '-' in a row negate each other (:193-198); the not
            # state survives ONLY an immediately following clause char
            state.not_count += 1
            state.i += 1
            continue
        elif ch in _WS:
            state.i += 1
        else:
            _consume_token(state, analyzer, default_op)
        # any non-'-' branch resets the pending negation — even
        # whitespace breaks a '-term' attachment (:214-217)
        if ch != "-":
            state.not_count = 0


def _consume_subquery(state: _State, analyzer: str, default_op: str) -> None:
    """consumeSubQuery:220-277 — find the balanced ')', recursively
    parse the inside; unbalanced '(' is extraneous; empty '()' resets
    the pending operation."""
    start = state.i + 1
    depth, j, escaped = 1, start, False
    while j < len(state.data):
        c = state.data[j]
        if escaped:
            escaped = False
        elif c == "\\":
            escaped = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if depth != 0:
        state.i = start  # unclosed: '(' ignored (:258-260)
        return
    inner = state.data[start:j]
    state.i = j + 1
    if not inner.strip():
        state.cur_op = None  # '()' resets the op (:262-265)
        return
    sub = _State(inner)
    _parse_sub(sub, analyzer, default_op)
    _build_tree(state, sub.top, default_op)


def _consume_phrase(state: _State, analyzer: str, default_op: str) -> None:
    """consumePhrase:279-347 — raw chars to the closing '"', then an
    optional NEAR '~N' slop; unclosed quote is extraneous."""
    start = state.i + 1
    j, escaped, buf = start, False, []
    while j < len(state.data):
        c = state.data[j]
        if escaped:
            buf.append(c)
            escaped = False
        elif c == "\\":
            escaped = True
        elif c == '"':
            break
        else:
            buf.append(c)
        j += 1
    if j >= len(state.data):
        state.i = start  # unclosed: '"' ignored (:323-325)
        return
    state.i = j + 1
    slop = 0
    if state.i < len(state.data) and state.data[state.i] == "~":
        slop = _parse_int_after_tilde(state)
    phrase = "".join(buf)
    if not phrase.strip():
        state.cur_op = None  # '""' resets the op (:327-330)
        return
    _build_tree(state, _new_phrase_query(phrase, slop, analyzer), default_op)


def _consume_token(state: _State, analyzer: str, default_op: str) -> None:
    """consumeToken:349-415 — chars to the next delimiter; trailing
    unescaped '*' = prefix; '~' after >= 1 char = fuzzy."""
    buf: list[str] = []
    escaped = prefix = fuzzy = False
    while state.i < len(state.data):
        c = state.data[state.i]
        if not escaped:
            if c == "\\":
                escaped = True
                prefix = False
                state.i += 1
                continue
            if c in _DELIMS:
                break
            if buf and c == "~":
                fuzzy = True
                break
            prefix = bool(buf) and c == "*"
        escaped = False
        buf.append(c)
        state.i += 1
    if not buf:
        return
    token = "".join(buf)
    if fuzzy:
        edits = min(_parse_int_after_tilde(state), 2)  # LevenshteinAutomata
        branch = (
            _new_default_query(token, analyzer, default_op)
            if edits == 0
            else FuzzyQuery(token.lower(), max_edits=edits)
        )
    elif prefix:
        branch = PrefixQuery(token[:-1].lower())
    else:
        branch = _new_default_query(token, analyzer, default_op)
    _build_tree(state, branch, default_op)


def _parse_int_after_tilde(state: _State) -> int:
    """parseFuzziness:478-508 — digits after '~' to the next delimiter;
    non-numeric or negative -> 0."""
    assert state.data[state.i] == "~"
    state.i += 1
    j = state.i
    while j < len(state.data) and state.data[j] not in _DELIMS:
        j += 1
    text = state.data[state.i : j]
    state.i = j
    try:
        n = int(text)
    except ValueError:
        n = 0
    return max(n, 0)


def _analyze(text: str, analyzer: str) -> list[str]:
    from lucene_solr_spark.analysis.analyzers import ANALYZERS

    return list(ANALYZERS[analyzer](pd.Series([text]))[0])


def _new_default_query(
    token: str, analyzer: str, default_op: str
) -> Query | None:
    """newDefaultQuery -> createBooleanQuery: analyze; 0 terms = no
    branch, 1 = TermQuery, several = default-occur BooleanQuery."""
    terms = _analyze(token, analyzer)
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(terms[0])
    return BooleanQuery(
        tuple(Clause(default_op, TermQuery(t)) for t in terms)
    )


def _new_phrase_query(text: str, slop: int, analyzer: str) -> Query | None:
    """newPhraseQuery -> createPhraseQuery (1 term degrades to a
    TermQuery, like QueryBuilder)."""
    terms = _analyze(text, analyzer)
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(terms[0])
    return PhraseQuery(tuple(terms), slop=slop)


def _build_tree(state: _State, branch: Query | None, default_op: str) -> None:
    """buildQueryTree:432-471 — negation wrap, op-change re-parent,
    clause append."""
    if branch is not None:
        if state.not_count % 2 == 1:
            branch = BooleanQuery(
                (
                    Clause("MUST_NOT", branch),
                    Clause("SHOULD", MatchAllDocsQuery()),
                )
            )
        if state.top is None:
            state.top = branch
        else:
            if state.cur_op is None:
                state.cur_op = default_op
            if state.prev_op != state.cur_op:
                state.top = BooleanQuery(
                    (Clause(state.cur_op, state.top),)
                )
            assert isinstance(state.top, BooleanQuery)
            state.top = BooleanQuery(
                state.top.clauses + (Clause(state.cur_op, branch),),
                state.top.min_should_match,
            )
            state.prev_op = state.cur_op
    # the op was meant for this branch even if it was dropped (:467-470)
    state.cur_op = None
