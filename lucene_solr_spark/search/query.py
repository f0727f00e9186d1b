"""Query model + logical rewrites (reference: search/BooleanQuery.java,
search/MultiTermQuery.java; rewrite driver IndexSearcher.java:634-640).

Queries compile to a flat clause spec consumed by the vectorized per-shard
kernel. Clause combination semantics (BooleanWeight.java:260-359):
  AND  — conjunction, score = sum of sub-scores (coord = 1 for BM25)
  OR   — disjunction, score = sum of matching sub-scores
  MSM  — disjunction with minShouldMatch >= n (MinShouldMatchSumScorer.java)
  NOT  — required minus excluded (ReqExclScorer.java:30)
  DISMAX — max(sub) + tie * (sum - max) (DisjunctionMaxQuery.java)
"""

from __future__ import annotations

from dataclasses import dataclass, field


class TooManyClauses(RuntimeError):
    """Raised when a multi-term expansion exceeds maxClauseCount
    (BooleanQuery.java:39-48 — the reference throws TooManyClauses past
    1024 clauses). Callers can either raise the searcher's
    max_clause_count or request a bounded top-terms rewrite
    (max_expansions, TopTermsRewrite.java semantics)."""


@dataclass(frozen=True)
class Query:
    def terms(self) -> list[str]:
        raise NotImplementedError


@dataclass(frozen=True)
class TermQuery(Query):
    """A Lucene Term is (field, bytes) (index/Term.java:36,49-57).
    field=None means the index's default analyzed field; other fields
    must be indexed via IndexConfig.extra_fields."""

    term: str
    field: str | None = None

    def terms(self) -> list[str]:
        return [self.term]


@dataclass(frozen=True)
class BooleanAnd(Query):
    """All terms required; score = sum (ConjunctionScorer, coord=1)."""

    must: tuple[str, ...]

    def terms(self) -> list[str]:
        return list(self.must)


@dataclass(frozen=True)
class BooleanOr(Query):
    """Any term matches; score = sum over matching (DisjunctionSumScorer).

    min_should_match > 1 -> MinShouldMatchSumScorer semantics.
    """

    should: tuple[str, ...]
    min_should_match: int = 1

    def terms(self) -> list[str]:
        return list(self.should)


@dataclass(frozen=True)
class BooleanNot(Query):
    """Required clauses minus excluded terms (ReqExclScorer.java:30).

    Scores come from the required side only (MUST_NOT never scores,
    BooleanWeight.java)."""

    must: tuple[str, ...]
    must_not: tuple[str, ...]

    def terms(self) -> list[str]:
        return list(self.must) + list(self.must_not)


@dataclass(frozen=True)
class DisjunctionMax(Query):
    """score = max(sub-scores) + tie * (sum - max) over matching clauses
    (DisjunctionMaxScorer.java:28)."""

    should: tuple[str, ...]
    tie: float = 0.0

    def terms(self) -> list[str]:
        return list(self.should)


@dataclass(frozen=True)
class DisMaxQuery(Query):
    """DisjunctionMaxQuery over arbitrary sub-queries
    (search/DisjunctionMaxQuery.java:60): score = max(matching sub-
    scores) + tie * (sum - max). The flat `DisjunctionMax` covers
    bare-term disjunctions; this nested form is what the (e)dismax
    parsers build — one DisMax per query term across the qf fields,
    each alternative typically a boosted fielded TermQuery."""

    queries: tuple[Query, ...]
    tie: float = 0.0

    def terms(self) -> list[str]:
        out: list[str] = []
        for q in self.queries:
            out.extend(q.terms())
        return out


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """Scores every term with BLENDED collection statistics so that
    near-equivalent variants (synonyms, cross-field copies) rank on a
    common idf scale (search/BlendedTermQuery.java:272-288: the
    rewritten df is max(df_i) over all terms, then every TermQuery's
    TermContext is adjusted to that artificial df). The default rewrite
    is a DisjunctionMax with tie=0.01
    (BlendedTermQuery.java:185 DISJUNCTION_MAX_REWRITE)."""

    terms_: tuple[str, ...]
    tie: float = 0.01

    def terms(self) -> list[str]:
        return list(self.terms_)


@dataclass(frozen=True)
class BooleanMustShould(Query):
    """General BooleanQuery with required and optional scoring clauses
    (BooleanWeight.java:260-359 -> ReqOptSumScorer.java:28): required
    clauses drive matching; optional clauses add their score when they
    align. score = f32(f32(sum must) + f32(sum matching should)).

    CommonTermsQuery (queries/.../CommonTermsQuery.java:63) rewrites to
    this form: terms with df/maxDoc above the cutoff become SHOULD
    (high-frequency terms stop gating recall), the rest stay MUST."""

    must: tuple[str, ...]
    should: tuple[str, ...]

    def terms(self) -> list[str]:
        return list(self.must) + list(self.should)


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """High-df terms demoted to optional (CommonTermsQuery.java:63).

    The split uses GLOBAL df: term is "common" when df > cutoff *
    maxDoc. Rewrites at search time (df lookup) to BooleanMustShould."""

    terms_: tuple[str, ...]
    max_term_frequency: float = 0.3

    def terms(self) -> list[str]:
        return list(self.terms_)


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Exact phrase: terms must appear at consecutive positions
    (search/PhraseQuery.java:64, ExactPhraseScorer.java:27). Matching is
    two-phase: docID conjunction first, then position verification.
    Score = BM25 with tf = phrase frequency and idf = sum of the
    terms' idfs (BM25Similarity.computeWeight over multiple
    TermStatistics)."""

    phrase: tuple[str, ...]
    slop: int = 0
    field: str | None = None

    def terms(self) -> list[str]:
        return list(self.phrase)


@dataclass(frozen=True)
class PrefixQuery(Query):
    """Terms starting with `prefix`, CONSTANT_SCORE rewrite
    (search/PrefixQuery.java, MultiTermQuery.java:68-94): every matching
    doc scores 1.0. Expansion is a pushed-down `term LIKE 'p%'` scan of
    the dictionary (the FST prefix-seek analog).

    max_expansions: when set, rewrite keeps only the N highest-df
    matching terms (df desc, term asc — the df-bounded TopTermsRewrite
    for constant score, TopTermsRewrite.java / MultiTermQuery.java:
    68-115) instead of the full expansion."""

    prefix: str
    max_expansions: int | None = None
    field: str | None = None

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class WildcardQuery(Query):
    """Wildcard pattern (`*` any run, `?` one char), CONSTANT_SCORE
    rewrite (search/WildcardQuery.java:127). Compiled to an anchored
    regex over the term dictionary. max_expansions: df-bounded
    top-terms rewrite (see PrefixQuery)."""

    pattern: str
    max_expansions: int | None = None
    field: str | None = None

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class RegexpQuery(Query):
    """Anchored regular-expression term query, CONSTANT_SCORE rewrite
    (search/RegexpQuery.java:127): dictionary expansion by regex.
    max_expansions: df-bounded top-terms rewrite (see PrefixQuery)."""

    pattern: str
    max_expansions: int | None = None
    field: str | None = None

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class TermRangeQuery(Query):
    """Terms within [lower, upper] bytewise (search/TermRangeQuery.java,
    164 LoC), CONSTANT_SCORE rewrite: dictionary expansion is a
    pushed-down BETWEEN over the term-sorted dictionary. None bounds
    are open-ended. max_expansions: df-bounded top-terms rewrite (see
    PrefixQuery)."""

    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    max_expansions: int | None = None
    field: str | None = None

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with term alternatives per position
    (search/MultiPhraseQuery.java, 538 LoC): position i matches ANY of
    positions_[i]'s terms; freq counts matching occurrences; idf = f32
    sum over ALL terms in declaration order (MultiPhraseWeight pulls
    TermStatistics for every added term)."""

    positions_: tuple[tuple[str, ...], ...]

    def terms(self) -> list[str]:
        return [t for alts in self.positions_ for t in alts]


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """Terms within edit distance <= max_edits of `term`
    (search/FuzzyQuery.java:54), rewritten to a scoring OR over the
    expanded terms (ScoringRewrite; we score each expansion as a plain
    TermQuery and sum like a disjunction — the blended-freq boost of
    TopTermsBlendedFreqScoringRewrite is documented as out of scope).
    Expansion runs as a distributed distance filter on the dictionary
    (automaton-intersection analog).

    `transpositions` defaults True like the reference
    (FuzzyQuery.java:59 `defaultTranspositions = true`): an adjacent
    swap counts as ONE edit, so `tabel~1` matches `table`.  The
    distance is the restricted-Damerau DP the reference pins its
    automata against (TestLevenshteinAutomata.java:333; see
    functions/editdist.py).  Set False for classic Levenshtein.

    max_expansions bounds the expansion like the reference's default
    TopTermsBlendedFreqScoringRewrite(maxExpansions=50)
    (FuzzyQuery.java defaultMaxExpansions): terms ranked by edit
    distance asc (closest first), then df desc, then term asc."""

    term: str
    max_edits: int = 2
    max_expansions: int = 50
    field: str | None = None
    transpositions: bool = True
    prefix_length: int = 0

    def __post_init__(self):
        # FuzzyQuery.java:86-92 constructor validation
        if not (0 <= self.max_edits <= 2):
            raise ValueError(
                f"maxEdits must be between 0 and 2, got {self.max_edits}"
            )
        if self.prefix_length < 0:
            raise ValueError("prefixLength cannot be less than 0")

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class BoostQuery(Query):
    """Per-clause boost wrapper (search/BoostQuery.java analog; in the
    6.0 snapshot every Query carries setBoost — BM25 folds it into the
    term weight: weight = idf * boost * topLevelBoost,
    BM25Similarity.java:288-293). Boosts MULTIPLY down the tree."""

    query: Query
    boost: float

    def terms(self) -> list[str]:
        return self.query.terms()


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Generic constant-score wrapper (search/ConstantScoreQuery.java):
    matches exactly the wrapped query's docs, every hit scores `boost`
    (the inner scores are discarded)."""

    query: Query
    boost: float = 1.0

    def terms(self) -> list[str]:
        return self.query.terms()


@dataclass(frozen=True)
class FieldValueQuery(Query):
    """Docs that have a value for `field` (search/FieldValueQuery.java,
    ~200 LoC): matches documents with at least one indexed token in the
    field. The engine's witness is the norms table — Lucene writes a
    norm only when the inverted field length is > 0
    (DefaultIndexingChain.java:558), and the smallfloat encoding maps
    length 0 to norm byte 0 (SmallFloat.java:78-88), so `norm_byte !=
    0` IS the docValues/norms existence test. CONSTANT_SCORE (matching
    docs score 1.0, docID asc). field=None = the default field."""

    field: str | None = None

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    """search/MatchAllDocsQuery.java: matches every live document with
    constant score 1.0 (times boost). Usable standalone and as a tree
    clause — SimpleQueryParser wraps every negation as
    (MUST_NOT sub, SHOULD MatchAllDocs) (SimpleQueryParser.java:436-442),
    so pure-negative queries are expressible."""

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class SpanQuery(Query):
    """Base of the positional interval queries (search/spans/
    SpanQuery.java). Spans enumerate (start, end, width) intervals per
    doc; scoring sums slop factors 1/(1+width) (SpanScorer.java:90-118)
    into a float freq fed to BM25 with idf = f32 sum over the scoring
    terms. Kernel: search/spans.py."""


@dataclass(frozen=True)
class SpanTermQuery(SpanQuery):
    """All positions of one term as unit-width spans
    (spans/SpanTermQuery.java, TermSpans.java:96-110)."""

    term: str
    field: str | None = None

    def terms(self) -> list[str]:
        return [self.term]


@dataclass(frozen=True)
class SpanNearQuery(SpanQuery):
    """Sub-spans within `slop` of each other
    (spans/SpanNearQuery.java). in_order=True: clause order in the
    document, non-overlapping, width = sum of the gaps
    (NearSpansOrdered.java:95-118); False: any arrangement, matched
    when maxEnd - minStart - totalSpanLength <= slop
    (NearSpansUnordered.java atMatch)."""

    clauses: tuple
    slop: int = 0
    in_order: bool = True

    def terms(self) -> list[str]:
        return [t for c in self.clauses for t in c.terms()]


@dataclass(frozen=True)
class SpanOrQuery(SpanQuery):
    """Union of sub-spans in (start, end) order
    (spans/SpanOrQuery.java:237-295)."""

    clauses: tuple

    def terms(self) -> list[str]:
        return [t for c in self.clauses for t in c.terms()]


@dataclass(frozen=True)
class SpanNotQuery(SpanQuery):
    """Include spans with no exclude span overlapping
    [start - pre, end + post) (spans/SpanNotQuery.java:151-190).
    Exclude-side terms never score (extractTermContexts pulls the
    include weight only)."""

    include: SpanQuery
    exclude: SpanQuery
    pre: int = 0
    post: int = 0

    def terms(self) -> list[str]:
        return self.include.terms() + self.exclude.terms()


@dataclass(frozen=True)
class SpanFirstQuery(SpanQuery):
    """Match spans fully within the first `end` positions
    (spans/SpanFirstQuery.java: accept while start < end and
    span.end <= end)."""

    match: SpanQuery
    end: int

    def terms(self) -> list[str]:
        return self.match.terms()


@dataclass(frozen=True)
class SpanContainingQuery(SpanQuery):
    """Big spans that contain a little span
    (spans/SpanContainingQuery.java over ContainSpans.java): iterate
    big, advance little past starts before big's, match when
    big.end >= little.end. Source = big; BOTH sides' terms score."""

    big: SpanQuery
    little: SpanQuery

    def terms(self) -> list[str]:
        return self.big.terms() + self.little.terms()


@dataclass(frozen=True)
class SpanWithinQuery(SpanQuery):
    """Little spans lying inside a big span
    (spans/SpanWithinQuery.java): iterate little, advance big past
    ends before little's, match when big.start <= little.start.
    Source = little; BOTH sides' terms score."""

    big: SpanQuery
    little: SpanQuery

    def terms(self) -> list[str]:
        return self.big.terms() + self.little.terms()


@dataclass(frozen=True)
class SpanPositionRangeQuery(SpanQuery):
    """Spans of `match` lying fully inside positions [start, end)
    (spans/SpanPositionRangeQuery.java acceptPosition: start_pos >= S
    and end_pos <= E; SpanFirstQuery is the S=0 case)."""

    match: SpanQuery
    start: int
    end: int

    def terms(self) -> list[str]:
        return self.match.terms()


@dataclass(frozen=True)
class TermsQuery(Query):
    """Constant-score filter over an explicit term SET
    (queries/TermsQuery.java: docs matching ANY listed term score 1.0;
    the reference bulk-ORs the sorted PrefixCodedTerms' postings into
    one bitset — never a scoring BooleanQuery). Expansion is a
    pushed-down `term IN (...)` on the dictionary-sorted postings."""

    terms_: tuple[str, ...]
    field: str | None = None

    def terms(self) -> list[str]:
        return []  # constant-score: no scoring stats pulled


class TermAutomatonQuery(Query):
    """Proximity automaton over terms (lucene/sandbox/.../search/
    TermAutomatonQuery.java) — the generalization of Phrase/
    MultiPhrase/SpanNear: states + term-labelled transitions (plus
    ANY-term transitions), matched by graph intersection against each
    candidate document's position stream; acts like a DISJUNCTION
    (any doc holding any query term is a candidate), then counts
    automaton acceptances as the doc's freq.

    Builder API mirrors the reference: create_state / set_accept /
    add_transition / add_any_transition, then finish() — which
    validates (no leading/trailing ANY, TermAutomatonQuery.java:
    134-153), expands ANY arcs to the whole term alphabet (:155-181
    — so a query-term token also satisfies an ANY arc), and
    determinizes by powerset construction (Operations.determinize is
    the same subset construction, so the resulting state graph — and
    therefore the scorer's acceptance COUNT, which is per
    (state-entry, accepting step) — is isomorphic to the
    reference's). State 0 is always initial."""

    def __init__(self, field: str | None = None):
        self.field = field
        self._n_states = 1
        self._accept: set[int] = set()
        self._arcs: list[tuple[int, int, int]] = []
        self._term_ids: dict[str | None, int] = {}
        self._id_terms: list[str | None] = []
        self._det: tuple | None = None

    def _term_id(self, term: str | None) -> int:
        if term not in self._term_ids:
            self._term_ids[term] = len(self._id_terms)
            self._id_terms.append(term)
        return self._term_ids[term]

    def create_state(self) -> int:
        s = self._n_states
        self._n_states += 1
        return s

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self._accept.add(state)
        else:
            self._accept.discard(state)

    def add_transition(self, src: int, dst: int, term: str) -> None:
        if term is None:
            raise ValueError("term should not be null")
        self._arcs.append((src, dst, self._term_id(term)))

    def add_any_transition(self, src: int, dst: int) -> None:
        self._arcs.append((src, dst, self._term_id(None)))

    @property
    def any_id(self) -> int | None:
        return self._term_ids.get(None)

    def finish(self) -> "TermAutomatonQuery":
        any_id = self.any_id
        if any_id is not None:
            for src, dst, tid in self._arcs:
                if tid == any_id and src == 0:
                    raise ValueError(
                        "automaton cannot lead with an ANY transition"
                    )
                if tid == any_id and dst in self._accept:
                    raise ValueError(
                        "automaton cannot end with an ANY transition"
                    )
        n_ids = len(self._id_terms)
        # expand ANY arcs to every symbol (TermAutomatonQuery:155-181)
        nfa: dict[tuple[int, int], set[int]] = {}
        for src, dst, tid in self._arcs:
            ids = range(n_ids) if (any_id is not None and tid == any_id) \
                else (tid,)
            for i in ids:
                nfa.setdefault((src, i), set()).add(dst)
        # powerset determinization from {0}
        start = frozenset([0])
        det_ids = {start: 0}
        order = [start]
        step: dict[tuple[int, int], int] = {}
        i = 0
        while i < len(order):
            cur = order[i]
            for sym in range(n_ids):
                dest = set()
                for s in cur:
                    dest |= nfa.get((s, sym), set())
                if dest:
                    fz = frozenset(dest)
                    if fz not in det_ids:
                        det_ids[fz] = len(order)
                        order.append(fz)
                    step[(det_ids[cur], sym)] = det_ids[fz]
            i += 1
        accepts = {
            det_ids[s] for s in order if s & self._accept
        }
        # removeDeadStates analog: drop states that cannot reach accept
        rev: dict[int, set[int]] = {}
        for (src, _sym), dst in step.items():
            rev.setdefault(dst, set()).add(src)
        live = set(accepts)
        frontier = list(accepts)
        while frontier:
            s = frontier.pop()
            for p in rev.get(s, ()):
                if p not in live:
                    live.add(p)
                    frontier.append(p)
        step = {
            k: v for k, v in step.items() if v in live and k[0] in live
        }
        self._det = (step, frozenset(accepts))
        return self

    @property
    def det(self) -> tuple:
        if self._det is None:
            raise ValueError("call finish() before executing the query")
        return self._det

    def terms(self) -> list[str]:
        return [t for t in self._id_terms if t is not None]


def token_stream_to_term_automaton(
    tokens,
    field: str | None = None,
    preserve_position_increments: bool = True,
) -> TermAutomatonQuery:
    """TokenStreamToTermAutomatonQuery analog (lucene/sandbox/.../
    TokenStreamToTermAutomatonQuery.java:57-114): map a token GRAPH —
    `tokens` = iterable of (term, pos_inc, pos_length) — onto an
    automaton where state == position, each token adds an arc
    pos -> pos + pos_length, the literal term '*' adds an ANY arc,
    and the last created state is the sole accept. Holes (pos_inc >
    1) raise like the reference ("cannot handle holes; to accept any
    term, use '*' term") unless preserve_position_increments=False,
    which squashes them to 1. This is the query-time synonym-graph
    path: a multi-word synonym emits one token with pos_length > 1
    and matches in parallel with the words it spans."""
    q = TermAutomatonQuery(field)
    pos = -1
    state = 0
    first = True
    for term, pos_inc, pos_length in tokens:
        if not preserve_position_increments and pos_inc > 1:
            pos_inc = 1
        if first and pos_inc <= 0:
            raise ValueError("first token must have pos_inc > 0")
        first = False
        if pos_inc > 1:
            raise ValueError(
                "cannot handle holes; to accept any term, use '*' term"
            )
        if pos_inc > 0:
            pos += pos_inc
        end_pos = pos + pos_length
        while state < end_pos:
            state = q.create_state()
        if term == "*":
            q.add_any_transition(pos, end_pos)
        else:
            q.add_transition(pos, end_pos, term)
    q.set_accept(state, True)
    q.finish()
    return q


@dataclass(frozen=True)
class BoostingQuery(Query):
    """queries/BoostingQuery.java: score by `match`; demote (or
    promote) docs that ALSO match `context` by multiplying their
    score with `boost` (context-only matches are ignored — the
    reference zeroes the context boost). The canonical use is
    boost < 1: downweight without excluding (a soft NOT)."""

    match: Query
    context: Query
    boost: float

    def terms(self) -> list[str]:
        return self.match.terms()


@dataclass(frozen=True)
class PayloadNearQuery(SpanQuery):
    """SpanNearQuery whose score is spanScore * PayloadFunction
    docScore over the payloads collected at each matched span
    (core/.../search/payloads/PayloadNearQuery.java:151-174:
    setFreqCurrentDoc folds every span's payloads into the running
    payload score; scoreCurrentDoc multiplies). `fn` is
    'avg' (the reference default) / 'max' / 'min' / 'sum';
    docScore defaults to 1 when no payloads were seen."""

    clauses: tuple  # of SpanQuery
    slop: int
    in_order: bool = True
    fn: str = "avg"

    def terms(self) -> list[str]:
        return [t for c in self.clauses for t in c.terms()]


@dataclass(frozen=True)
class SpanPayloadCheckQuery(SpanQuery):
    """Match spans whose collected payloads equal `payloads`
    (core/.../search/payloads/SpanPayloadCheckQuery.java:118-141:
    same count AND elementwise equality, in sub-span collection
    order; positions without a payload are skipped by the collector,
    PayloadSpanCollector.java:31-38). Payloads here are the
    FloatEncoder floats of the delimited_payload chain; equality is
    f32-exact. Requires an index built with index_payloads=True
    (a payload-less index collects nothing, so only an empty
    `payloads` tuple could match). Scoring is ordinary span scoring
    over the surviving spans."""

    match: SpanQuery
    payloads: tuple  # expected f32 payload values, in order

    def terms(self) -> list[str]:
        return self.match.terms()


@dataclass(frozen=True)
class SpanMultiTermQueryWrapper(SpanQuery):
    """Lift a multi-term query (Prefix/Wildcard/Regexp/TermRange) into
    span position (spans/SpanMultiTermQueryWrapper.java): rewrites to a
    SpanOr over the matching dictionary terms
    (SCORING_SPAN_QUERY_REWRITE -> SpanOrQuery of SpanTermQuery), so
    e.g. spanNear([prefix*, term]) works. Expansion honors the wrapped
    query's max_expansions (df-ranked top-terms) and the searcher's
    maxClauseCount guard."""

    query: Query  # a multi-term query carrying field/max_expansions

    def terms(self) -> list[str]:
        return []


@dataclass(frozen=True)
class Clause:
    """One BooleanQuery clause (search/BooleanClause.java): occur in
    MUST / SHOULD / MUST_NOT / FILTER."""

    occur: str
    query: Query


@dataclass(frozen=True)
class BooleanQuery(Query):
    """General nested BooleanQuery (search/BooleanQuery.java:308 LoC,
    BooleanWeight.java:260-359): clauses are arbitrary sub-queries, so
    `(+a +(b c)) -d` is expressible. Scoring (coord = 1 for BM25):

    - MUST/FILTER clauses all match; FILTER never scores.
    - required score = float32(double-sum of MUST sub-scores)
      (ConjunctionScorer.score()).
    - SHOULD with required clauses present = optional score added when
      aligned: total = f32(f32(req) + f32(f64-sum of matching SHOULD))
      (ReqOptSumScorer.java:28).
    - no required clauses: pure disjunction, f32(f64 sum), with
      min_should_match (MinShouldMatchSumScorer.java).
    - MUST_NOT excludes and never scores (ReqExclScorer.java:30).
    """

    clauses: tuple[Clause, ...]
    min_should_match: int = 0

    def terms(self) -> list[str]:
        out: list[str] = []
        for c in self.clauses:
            out.extend(c.query.terms())
        return out


def rewrite(q: Query) -> Query:
    """Logical rewrites to fixpoint (IndexSearcher.java:634-640).

    - 1-clause BooleanQuery inlining (BooleanQuery.java:201-207)
    - SHOULD->MUST promotion when minShouldMatch == #optional
      (BooleanWeight.java:293-314)
    """
    if isinstance(q, BooleanAnd) and len(q.must) == 1:
        return TermQuery(q.must[0])
    if isinstance(q, BooleanOr):
        if len(q.should) == 1 and q.min_should_match <= 1:
            return TermQuery(q.should[0])
        if q.min_should_match >= len(q.should):
            return rewrite(BooleanAnd(q.should))
    if isinstance(q, BooleanNot) and not q.must_not:
        return rewrite(BooleanAnd(q.must))
    if isinstance(q, BooleanQuery):
        # 1-clause inlining (BooleanQuery.java:201-207): a lone
        # MUST/SHOULD clause with no msm constraint IS its sub-query
        if len(q.clauses) == 1 and q.min_should_match <= 1:
            c = q.clauses[0]
            if c.occur == "MUST" or (
                c.occur == "SHOULD" and q.min_should_match == 0
            ):
                return rewrite(c.query)
    if isinstance(q, BoostQuery) and q.boost == 1.0:
        return rewrite(q.query)
    return q
