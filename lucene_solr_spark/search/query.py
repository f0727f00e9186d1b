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


@dataclass(frozen=True)
class Query:
    def terms(self) -> list[str]:
        raise NotImplementedError


@dataclass(frozen=True)
class TermQuery(Query):
    term: str

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
    return q
