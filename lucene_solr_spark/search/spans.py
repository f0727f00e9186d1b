"""Spans family: positional interval queries (reference:
search/spans/ — Spans.java, TermSpans.java, NearSpansOrdered.java,
NearSpansUnordered.java, SpanOrQuery.java, SpanNotQuery.java,
SpanFirstQuery.java, SpanScorer.java; 3,703 LoC total).

A Spans enumerates, per matching document, an ordered stream of
(start, end, width) intervals. Scoring (SpanScorer.java:90-118):
freq = sum of slop factors 1/(1 + width) over the enumerated spans
(SimScorer.computeSlopFactor, BM25Similarity.java:240-243); the float
freq feeds the ordinary BM25 term kernel with idf = f32 sum over the
query's scoring terms (SpanWeight.buildSimWeight over the extracted
TermContexts — exclude-side terms of a SpanNot never contribute,
SpanNotQuery.java extractTermContexts).

Deviations (documented):
- freq accumulates in f64 and casts to f32 once per doc (the reference
  accumulates f32 per match); same convention as the sloppy-phrase
  kernel, so the DuckDB oracles can state the sum exactly.
- idf sums the DISTINCT scoring terms in sorted order; the reference's
  per-Term contexts ride a HashMap whose iteration order is
  JVM-unspecified, so no portable order exists to mirror.
- absent terms contribute no idf (the reference folds a df=0
  TermStatistics into the weight).

Execution model: this kernel runs inside the per-shard cogroup stage —
the same distribution as every other query kind (one shard-keyed
exchange, per-shard vectorized decode). Candidate docs come from the
document-level conjunction/union structure FIRST (vectorized numpy set
algebra over the postings, like _eval_phrase); only then does the
doc-at-a-time interval walk run, exactly the reference's two-phase
shape (ConjunctionSpans approximation -> twoPhaseCurrentDocMatches).
At 100 TB the scale knob is the shard count, not this kernel: the
per-doc walk touches only documents that already passed the candidate
intersection."""

from __future__ import annotations

import heapq
from functools import reduce

import numpy as np

# Sentinel ordering contract: NMP compares greater than any real
# position (Spans.NO_MORE_POSITIONS = Integer.MAX_VALUE)
NMP = 1 << 40


class TermSpans:
    """One term's positions in ONE doc (TermSpans.java:96-110):
    spans are (pos, pos+1), width 0. `pay` (optional) is the f32
    payload per position, NaN = none; collect() appends the current
    position's payload if present (TermSpans.java:115-117 via
    PayloadSpanCollector.collectLeaf, which SKIPS null payloads)."""

    __slots__ = ("pos", "pay", "i", "start", "end", "width")

    def __init__(self, pos: np.ndarray, pay: np.ndarray | None = None):
        self.pos = pos
        self.pay = pay
        self.i = -1
        self.start = -1
        self.end = -1
        self.width = 0

    def next(self) -> int:
        self.i += 1
        if self.i >= len(self.pos):
            self.start = self.end = NMP
            return NMP
        self.start = int(self.pos[self.i])
        self.end = self.start + 1
        return self.start

    def collect(self, out: list) -> None:
        if self.pay is not None:
            v = self.pay[self.i]
            if not np.isnan(v):
                out.append(np.float32(v))


class NearOrderedSpans:
    """NearSpansOrdered.java:58-118: advance subSpans[0], stretch the
    rest into document order past overlaps (sub-span state persists
    across matches), width = sum of the gaps, match when <= slop."""

    __slots__ = ("subs", "slop", "start", "end", "width", "_dead")

    def __init__(self, subs: list, slop: int):
        self.subs = subs
        self.slop = slop
        self.start = self.end = -1
        self.width = 0
        self._dead = False

    def _stretch(self) -> bool:
        prev = self.subs[0]
        self.start = prev.start
        w = 0
        for s in self.subs[1:]:
            while prev.end > s.start:  # overlapping (or unpositioned -1)
                if s.next() == NMP:
                    self._dead = True
                    return False
            w += s.start - prev.end
            prev = s
        self.width = w
        self.end = self.subs[-1].end
        return True

    def next(self) -> int:
        while not self._dead and self.subs[0].next() != NMP:
            if self._stretch() and self.width <= self.slop:
                return self.start
        self.start = self.end = NMP
        return NMP

    def collect(self, out: list) -> None:
        for s in self.subs:  # subSpans order = clause order
            s.collect(out)


class NearUnorderedSpans:
    """NearSpansUnordered.java: min-heap of sub-spans by (start, end);
    each state (advance the min cell) is tested with
    maxEnd - minStart - totalSpanLength <= slop; the emitted width is
    maxEndCell.start - minCell.start (NearSpansUnordered.width())."""

    __slots__ = ("cells", "slop", "heap", "total", "maxend",
                 "start", "end", "width", "_lens")

    def __init__(self, subs: list, slop: int):
        self.cells = subs
        self.slop = slop
        self.heap = None
        self.total = 0
        self.maxend = None
        self._lens = [-1] * len(subs)
        self.start = self.end = -1
        self.width = 0

    def _adv(self, i: int) -> int:
        c = self.cells[i]
        r = c.next()
        if r != NMP:
            if self._lens[i] != -1:
                self.total -= self._lens[i]
            self._lens[i] = c.end - c.start
            self.total += self._lens[i]
            if self.maxend is None or c.end > self.cells[self.maxend].end:
                self.maxend = i
        return r

    def _at_match(self) -> bool:
        mn = self.heap[0]
        mx = self.cells[self.maxend]
        return (mx.end - mn[3].start - self.total) <= self.slop

    def _emit(self) -> int:
        mn = self.heap[0][3]
        mx = self.cells[self.maxend]
        self.start = mn.start
        self.end = mx.end
        self.width = mx.start - mn.start
        return self.start

    def next(self) -> int:
        if self.heap is None:
            self.heap = []
            for i, c in enumerate(self.cells):
                if self._adv(i) == NMP:  # caller guarantees presence
                    self.start = self.end = NMP
                    return NMP
                heapq.heappush(self.heap, (c.start, c.end, i, c))
            if self._at_match():
                return self._emit()
        while True:
            _, _, i, c = heapq.heappop(self.heap)
            if self._adv(i) == NMP:
                self.start = self.end = NMP
                return NMP
            heapq.heappush(self.heap, (c.start, c.end, i, c))
            if self._at_match():
                return self._emit()

    def collect(self, out: list) -> None:
        for c in self.cells:  # subSpans order = clause order
            c.collect(out)


class OrSpans:
    """SpanOrQuery.java:237-295: all sub-span intervals merged in
    (start, end) order; width = the emitted sub-span's width."""

    __slots__ = ("subs", "heap", "start", "end", "width")

    def __init__(self, subs: list):
        self.subs = subs
        self.heap = None
        self.start = self.end = -1
        self.width = 0

    def next(self) -> int:
        if self.heap is None:
            self.heap = []
            for i, s in enumerate(self.subs):
                if s.next() != NMP:
                    heapq.heappush(self.heap, (s.start, s.end, i, s))
        else:
            _, _, i, s = heapq.heappop(self.heap)
            if s.next() != NMP:
                heapq.heappush(self.heap, (s.start, s.end, i, s))
        if not self.heap:
            self.start = self.end = NMP
            return NMP
        top = self.heap[0][3]
        self.start, self.end, self.width = top.start, top.end, top.width
        return self.start

    def collect(self, out: list) -> None:
        if self.heap:  # the emitting sub-span
            self.heap[0][3].collect(out)


class NotSpans:
    """SpanNotQuery.java:151-190 accept(): keep an include span unless
    an exclude span overlaps [start - pre, end + post); the exclude
    stream advances forward only (its state persists across
    candidates). Exhausted exclude (start = end = NMP) accepts
    everything naturally."""

    __slots__ = ("inc", "exc", "pre", "post", "start", "end", "width")

    def __init__(self, inc, exc, pre: int = 0, post: int = 0):
        self.inc = inc
        self.exc = exc  # None = no exclusion in this doc
        self.pre = pre
        self.post = post
        self.start = self.end = -1
        self.width = 0

    def _accept(self) -> bool:
        if self.exc is None:
            return True
        if self.exc.start == -1:
            self.exc.next()
        while self.exc.end <= self.inc.start - self.pre:
            if self.exc.next() == NMP:
                return True
        return self.inc.end + self.post <= self.exc.start

    def next(self) -> int:
        while self.inc.next() != NMP:
            if self._accept():
                self.start = self.inc.start
                self.end = self.inc.end
                self.width = self.inc.width
                return self.start
        self.start = self.end = NMP
        return NMP

    def collect(self, out: list) -> None:
        self.inc.collect(out)


class ContainingSpans:
    """SpanContainingQuery (ContainSpans.java + SpanContainingQuery.
    java): big spans that contain a little span. Per the reference's
    greedy: iterate big; advance little (persistent) while
    little.start < big.start; match when big.end >= little.end.
    Source spans = big (start/end/width from the big side)."""

    __slots__ = ("big", "little", "start", "end", "width")

    def __init__(self, big, little):
        self.big = big
        self.little = little
        self.start = self.end = -1
        self.width = 0

    def next(self) -> int:
        while self.big.next() != NMP:
            while self.little.start < self.big.start:
                if self.little.next() == NMP:
                    self.start = self.end = NMP
                    return NMP
            if self.big.end >= self.little.end:
                self.start = self.big.start
                self.end = self.big.end
                self.width = self.big.width
                return self.start
        self.start = self.end = NMP
        return NMP

    def collect(self, out: list) -> None:
        self.big.collect(out)  # source spans = big


class WithinSpans:
    """SpanWithinQuery: little spans lying inside a big span. Iterate
    little; advance big (persistent) while big.end < little.end; match
    when big.start <= little.start. Source spans = little."""

    __slots__ = ("big", "little", "start", "end", "width")

    def __init__(self, big, little):
        self.big = big
        self.little = little
        self.start = self.end = -1
        self.width = 0

    def next(self) -> int:
        while self.little.next() != NMP:
            while self.big.end < self.little.end:
                if self.big.next() == NMP:
                    self.start = self.end = NMP
                    return NMP
            if self.big.start <= self.little.start:
                self.start = self.little.start
                self.end = self.little.end
                self.width = self.little.width
                return self.start
        self.start = self.end = NMP
        return NMP

    def collect(self, out: list) -> None:
        self.little.collect(out)  # source spans = little


class FirstSpans:
    """SpanFirstQuery.java (SpanPositionRangeQuery with range [0, E)):
    accept while start < E and end <= E; a span starting at or past E
    ends the doc (AcceptStatus.NO_MORE_IN_CURRENT_DOC)."""

    __slots__ = ("m", "E", "start", "end", "width")

    def __init__(self, m, end: int):
        self.m = m
        self.E = end
        self.start = self.end = -1
        self.width = 0

    def next(self) -> int:
        while self.m.next() != NMP:
            if self.m.start >= self.E:
                break
            if self.m.end <= self.E:
                self.start, self.end = self.m.start, self.m.end
                self.width = self.m.width
                return self.start
        self.start = self.end = NMP
        return NMP

    def collect(self, out: list) -> None:
        self.m.collect(out)


class PositionRangeSpans:
    """SpanPositionRangeQuery.java acceptPosition: accept spans with
    start >= S and end <= E; a span starting at or past E ends the doc
    (NO_MORE_IN_CURRENT_DOC). FirstSpans is the S=0 special case."""

    __slots__ = ("m", "S", "E", "start", "end", "width")

    def __init__(self, m, start: int, end: int):
        self.m = m
        self.S = start
        self.E = end
        self.start = self.end = -1
        self.width = 0

    def next(self) -> int:
        while self.m.next() != NMP:
            if self.m.start >= self.E:
                break
            if self.m.start >= self.S and self.m.end <= self.E:
                self.start, self.end = self.m.start, self.m.end
                self.width = self.m.width
                return self.start
        self.start = self.end = NMP
        return NMP

    def collect(self, out: list) -> None:
        self.m.collect(out)


class PayCheckSpans:
    """SpanPayloadCheckQuery (core/.../payloads/SpanPayloadCheckQuery.
    java:118-141 checkPayloads + the FilterSpans accept loop): a match
    span survives iff the payloads collected from its term positions
    (in sub-span order, nulls skipped) equal the expected list —
    same count AND elementwise f32 equality (Arrays.equals on the
    FloatEncoder bytes)."""

    __slots__ = ("m", "expect", "start", "end", "width")

    def __init__(self, m, expect: tuple):
        self.m = m
        self.expect = expect
        self.start = self.end = -1
        self.width = 0

    def next(self) -> int:
        while self.m.next() != NMP:
            got: list = []
            self.m.collect(got)
            if len(got) == len(self.expect) and all(
                np.float32(a) == np.float32(b)
                for a, b in zip(got, self.expect)
            ):
                self.start, self.end = self.m.start, self.m.end
                self.width = self.m.width
                return self.start
        self.start = self.end = NMP
        return NMP

    def collect(self, out: list) -> None:
        self.m.collect(out)


def _resolve(node: dict, lt) -> dict | None:
    """Null-spans propagation (SpanWeight.getSpans returning null):
    an absent term is null; a near with any null child is null; an or
    drops null children (null when all are); a not with null include
    is null, with null exclude is just its include; first follows its
    match."""
    op = node["op"]
    if op == "term":
        t = node["term"]
        if t not in lt or lt.pos_stream(t) is None:
            return None
        return node
    if op == "near":
        kids = [_resolve(c, lt) for c in node["clauses"]]
        if any(k is None for k in kids):
            return None
        return {**node, "clauses": kids}
    if op == "or":
        kids = [k for k in (_resolve(c, lt) for c in node["clauses"])
                if k is not None]
        if not kids:
            return None
        return {**node, "clauses": kids}
    if op == "not":
        inc = _resolve(node["include"], lt)
        if inc is None:
            return None
        exc = _resolve(node["exclude"], lt)
        if exc is None:
            return inc
        return {**node, "include": inc, "exclude": exc}
    if op in ("first", "posrange"):
        m = _resolve(node["match"], lt)
        if m is None:
            return None
        return {**node, "match": m}
    if op in ("containing", "within"):
        # prepareConjunction returns null when EITHER side is null
        big = _resolve(node["big"], lt)
        little = _resolve(node["little"], lt)
        if big is None or little is None:
            return None
        return {**node, "big": big, "little": little}
    if op in ("paycheck", "payscore"):
        m = _resolve(node["match"], lt)
        if m is None:
            return None
        return {**node, "match": m}
    raise ValueError(f"unknown span node {op}")


def span_all_terms(node: dict) -> list[str]:
    """Every term the node touches, exclude sides included (their
    postings must reach the shard kernel for the overlap check)."""
    op = node["op"]
    if op == "term":
        return [node["term"]]
    if op in ("near", "or"):
        return [t for c in node["clauses"] for t in span_all_terms(c)]
    if op == "not":
        return span_all_terms(node["include"]) + span_all_terms(
            node["exclude"])
    if op in ("first", "posrange"):
        return span_all_terms(node["match"])
    if op in ("containing", "within"):
        return span_all_terms(node["big"]) + span_all_terms(node["little"])
    if op in ("paycheck", "payscore"):
        return span_all_terms(node["match"])
    raise ValueError(f"unknown span node {op}")


def span_needs_payloads(node: dict) -> bool:
    """True when the tree contains a paycheck node — only then do the
    .pay streams ship through the shard exchange and decode."""
    op = node["op"]
    if op in ("paycheck", "payscore"):
        return True
    if op == "term":
        return False
    if op in ("near", "or"):
        return any(span_needs_payloads(c) for c in node["clauses"])
    if op == "not":
        return (span_needs_payloads(node["include"])
                or span_needs_payloads(node["exclude"]))
    if op in ("first", "posrange"):
        return span_needs_payloads(node["match"])
    if op in ("containing", "within"):
        return (span_needs_payloads(node["big"])
                or span_needs_payloads(node["little"]))
    raise ValueError(f"unknown span node {op}")


def _scoring_terms(node: dict) -> list[str]:
    """Terms contributing idf (SpanNotWeight.extractTermContexts pulls
    the include side only; SpanContainWeight pulls BOTH sides)."""
    op = node["op"]
    if op == "term":
        return [node["term"]]
    if op in ("near", "or"):
        return [t for c in node["clauses"] for t in _scoring_terms(c)]
    if op == "not":
        return _scoring_terms(node["include"])
    if op in ("first", "posrange"):
        return _scoring_terms(node["match"])
    if op in ("containing", "within"):
        return _scoring_terms(node["big"]) + _scoring_terms(node["little"])
    if op in ("paycheck", "payscore"):
        return _scoring_terms(node["match"])
    raise ValueError(f"unknown span node {op}")


def _cand_docs(node: dict, lt) -> np.ndarray:
    """Document-level approximation (ConjunctionSpans /
    DisjunctionDISIApproximation): vectorized postings set algebra,
    run BEFORE any per-doc interval walk."""
    op = node["op"]
    if op == "term":
        return lt.full(node["term"])[0]
    if op == "near":
        return reduce(
            lambda a, b: a[np.isin(a, b, assume_unique=True)],
            [_cand_docs(c, lt) for c in node["clauses"]],
        )
    if op == "or":
        return reduce(
            np.union1d, [_cand_docs(c, lt) for c in node["clauses"]]
        )
    if op == "not":
        return _cand_docs(node["include"], lt)
    if op in ("first", "posrange"):
        return _cand_docs(node["match"], lt)
    if op in ("containing", "within"):
        a = _cand_docs(node["big"], lt)
        b = _cand_docs(node["little"], lt)
        return a[np.isin(a, b, assume_unique=True)]
    if op in ("paycheck", "payscore"):
        return _cand_docs(node["match"], lt)
    raise ValueError(f"unknown span node {op}")


def _build(node: dict, lo_hi, posmap: dict, doc: int):
    """Instantiate the per-doc iterator tree; None = no spans for this
    doc (possible under or/not where candidates are a union)."""
    op = node["op"]
    if op == "term":
        entry = posmap[node["term"]]
        doc_rep, pos_abs = entry[0], entry[1]
        pay = entry[2] if len(entry) > 2 else None
        lo = np.searchsorted(doc_rep, doc, "left")
        hi = np.searchsorted(doc_rep, doc, "right")
        if lo == hi:
            return None
        return TermSpans(
            pos_abs[lo:hi], pay[lo:hi] if pay is not None else None
        )
    if op == "near":
        kids = [_build(c, lo_hi, posmap, doc) for c in node["clauses"]]
        if any(k is None for k in kids):
            return None
        if node.get("in_order", True):
            return NearOrderedSpans(kids, int(node["slop"]))
        return NearUnorderedSpans(kids, int(node["slop"]))
    if op == "or":
        kids = [k for k in (_build(c, lo_hi, posmap, doc)
                            for c in node["clauses"]) if k is not None]
        if not kids:
            return None
        return OrSpans(kids)
    if op == "not":
        inc = _build(node["include"], lo_hi, posmap, doc)
        if inc is None:
            return None
        exc = _build(node["exclude"], lo_hi, posmap, doc)
        return NotSpans(inc, exc, int(node.get("pre", 0)),
                        int(node.get("post", 0)))
    if op == "first":
        m = _build(node["match"], lo_hi, posmap, doc)
        if m is None:
            return None
        return FirstSpans(m, int(node["end"]))
    if op == "posrange":
        m = _build(node["match"], lo_hi, posmap, doc)
        if m is None:
            return None
        return PositionRangeSpans(m, int(node["start"]), int(node["end"]))
    if op in ("containing", "within"):
        big = _build(node["big"], lo_hi, posmap, doc)
        little = _build(node["little"], lo_hi, posmap, doc)
        if big is None or little is None:
            return None
        cls = ContainingSpans if op == "containing" else WithinSpans
        return cls(big, little)
    if op == "paycheck":
        m = _build(node["match"], lo_hi, posmap, doc)
        if m is None:
            return None
        return PayCheckSpans(m, tuple(node["payloads"]))
    if op == "payscore":
        return _build(node["match"], lo_hi, posmap, doc)
    raise ValueError(f"unknown span node {op}")


def doc_freq_spans(node: dict, posmap: dict, doc: int) -> float:
    """f64 sloppy freq of ONE doc: sum of 1/(1+width) over the
    enumerated spans (SpanScorer.setFreqCurrentDoc)."""
    sp = _build(node, None, posmap, doc)
    if sp is None:
        return 0.0
    acc = 0.0
    while sp.next() != NMP:
        acc += 1.0 / (1.0 + sp.width)
    return acc


def doc_freq_payload(node: dict, posmap: dict, doc: int, fn: str):
    """One doc's (sloppy freq, PayloadFunction docScore) — the
    PayloadNearSpanScorer.setFreqCurrentDoc walk
    (PayloadNearQuery.java:151-166): per matched span, freq += slop
    factor, collect the span's payloads (sub-span order, nulls
    skipped) and fold each into the running payload score
    (Max/Min/Average currentScore); docScore defaults to 1 when no
    payloads were seen. avg accumulates f64 then casts (documented
    deviation: the reference adds sequentially in f32)."""
    sp = _build(node, None, posmap, doc)
    if sp is None:
        return 0.0, np.float32(1.0)
    acc = 0.0
    pscore = 0.0
    seen = 0
    while sp.next() != NMP:
        acc += 1.0 / (1.0 + sp.width)
        got: list = []
        sp.collect(got)
        for v in got:
            v = float(np.float32(v))
            if fn == "max":
                pscore = v if seen == 0 else max(pscore, v)
            elif fn == "min":
                pscore = v if seen == 0 else min(pscore, v)
            else:  # avg / sum accumulate
                pscore = pscore + v
            seen += 1
    if seen == 0:
        return acc, np.float32(1.0)
    if fn == "avg":
        return acc, np.float32(pscore / seen)
    return acc, np.float32(pscore)


def eval_spans(
    node: dict,
    lt,
    base: int,
    norms_map: dict,
    idfs: dict,
    caches: dict,
    boost: float = 1.0,
    deleted: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Span query kernel for one shard -> (docs, f32 scores)."""
    from lucene_solr_spark.functions import bm25
    from lucene_solr_spark.index.codec import decode_position_lists
    from lucene_solr_spark.search.searcher import _alive, _nc

    E = (np.empty(0, np.int64), np.empty(0, np.float32))
    resolved = _resolve(node, lt)
    if resolved is None:
        return E
    cand = _alive(_cand_docs(resolved, lt), deleted)
    if len(cand) == 0:
        return E
    with_pay = span_needs_payloads(resolved)
    posmap = {}
    for t in set(span_all_terms(resolved)):
        d, tf = lt.full(t)
        pos_abs = decode_position_lists(lt.pos_stream(t), tf)
        doc_rep = np.repeat(d, tf)
        mask = np.isin(doc_rep, cand, assume_unique=False)
        if with_pay:
            ps = lt.pay_stream(t)
            pay_abs = np.frombuffer(ps, "<f4") if ps is not None else None
            if pay_abs is None or len(pay_abs) != len(doc_rep):
                # payload-less index (or mixed generations): every
                # position counts as no-payload
                pay_abs = np.full(len(doc_rep), np.nan, np.float32)
            posmap[t] = (doc_rep[mask], pos_abs[mask], pay_abs[mask])
        else:
            posmap[t] = (doc_rep[mask], pos_abs[mask])
    pay_fn = resolved["fn"] if resolved["op"] == "payscore" else None
    walk_node = resolved["match"] if pay_fn is not None else resolved
    docs_out: list[int] = []
    freqs: list[float] = []
    pay_mults: list[np.float32] = []
    for doc in cand:
        if pay_fn is not None:
            f, pm = doc_freq_payload(walk_node, posmap, int(doc), pay_fn)
        else:
            f, pm = doc_freq_spans(resolved, posmap, int(doc)), None
        if f > 0.0:
            docs_out.append(int(doc))
            freqs.append(f)
            if pm is not None:
                pay_mults.append(pm)
    if not docs_out:
        return E
    udocs = np.asarray(docs_out, np.int64)
    freqs32 = np.asarray(freqs, np.float64).astype(np.float32)
    sterms = sorted(set(_scoring_terms(resolved)))
    idf_sum = np.float32(0.0)
    for t in sterms:
        if t in idfs:
            idf_sum = np.float32(idf_sum + idfs[t])
    nrm, cch = _nc(sterms[0], norms_map, caches)
    scores = bm25.score_term(
        freqs32, nrm[udocs - base], idf_sum, cch, boost=boost
    ).astype(np.float32)
    if pay_mults:
        # PayloadNearSpanScorer.scoreCurrentDoc: spanScore * docScore
        scores = (scores * np.asarray(pay_mults, np.float32)).astype(
            np.float32
        )
    return udocs, scores
