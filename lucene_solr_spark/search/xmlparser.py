"""XML query parser — CoreParser's element-to-Query builder registry
(lucene/queryparser/.../xml/CoreParser.java:67-110 and builders/*.java).

The reference walks a DOM and dispatches each element tag to a
registered QueryBuilder; this module is that registry over the
engine's Query dataclasses, built on xml.etree. Covered element set
(the CoreParser default registrations):

    TermQuery            text = ONE term (not analyzed,
                         TermQueryBuilder.java — lowercased here, the
                         dictionary stores post-analysis bytes)
    TermsQuery           text analyzed -> constant-score any-of set
                         (TermsQueryBuilder.java builds queries.
                         TermsQuery = a filter-shaped disjunction)
    MatchAllDocsQuery    (MatchAllDocsQueryBuilder.java)
    BooleanQuery         <Clause occurs="must|should|mustNot|filter">
                         children; minimumNumberShouldMatch attr
                         (BooleanQueryBuilder.java)
    RangeQuery           lowerTerm/upperTerm/includeLower/includeUpper
                         attrs -> TermRangeQuery (RangeQueryBuilder.java)
    DisjunctionMaxQuery  tieBreaker attr, sub-queries as children
                         (DisjunctionMaxQueryBuilder.java)
    ConstantScoreQuery   one child query (ConstantScoreQueryBuilder.java)
    UserQuery            text -> classic QueryParser
                         (UserInputQueryBuilder.java)
    SpanTerm / SpanNear / SpanOr / SpanOrTerms / SpanFirst / SpanNot
                         (builders/Span*.java; SpanNear: slopFactor +
                         inOrder, SpanFirst: end, SpanNot: children
                         Include/Exclude)

Every element honors `boost` (wrapped as BoostQuery when != 1, like
DOMUtils.getAttribute(e, "boost", 1.0f) feeding setBoost). fieldName
attributes select non-default fields (must be in
IndexConfig.extra_fields); absent = the default analyzed field.

Unknown tags raise ValueError (ParserException in the reference:
"Element content claims to be a query, but no query builder is
registered")."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_solr_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    Clause,
    ConstantScoreQuery,
    DisMaxQuery,
    MatchAllDocsQuery,
    Query,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
    TermQuery,
    TermRangeQuery,
)

_OCCURS = {
    "must": "MUST",
    "should": "SHOULD",
    "mustnot": "MUST_NOT",
    "filter": "FILTER",
}


def parse_xml_query(xml: str, analyzer: str = "standard") -> Query:
    """CoreParser.parse(InputStream) analog: xml string -> Query."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise ValueError(f"Error parsing XML query: {e}") from e
    return _build(root, analyzer)


def _field(e: ET.Element) -> str | None:
    f = e.get("fieldName")
    return f if f else None


def _boost(e: ET.Element, q: Query) -> Query:
    b = float(e.get("boost", "1.0"))
    return BoostQuery(q, b) if b != 1.0 else q


def _text(e: ET.Element) -> str:
    # DOMUtils.getNonBlankTextOrFail
    t = (e.text or "").strip()
    if not t:
        raise ValueError(f"<{e.tag}> requires text content")
    return t


def _analyze(text: str, analyzer: str) -> list[str]:
    import pandas as pd

    from lucene_solr_spark.analysis.analyzers import ANALYZERS

    return list(ANALYZERS[analyzer](pd.Series([text]))[0])


def _children(e: ET.Element) -> list[ET.Element]:
    return list(e)


def _build(e: ET.Element, analyzer: str) -> Query:
    tag = e.tag

    if tag == "TermQuery":
        return _boost(e, TermQuery(_text(e).lower(), field=_field(e)))

    if tag == "TermsQuery":
        # queries.TermsQuery: a constant-score "any of these terms"
        # set; the builder analyzes the element text
        terms = _analyze(_text(e), analyzer)
        if not terms:
            raise ValueError("<TermsQuery> text analyzed to no terms")
        inner = BooleanQuery(
            tuple(
                Clause("SHOULD", TermQuery(t, field=_field(e)))
                for t in dict.fromkeys(terms)
            )
        )
        return ConstantScoreQuery(inner, boost=float(e.get("boost", "1.0")))

    if tag == "MatchAllDocsQuery":
        return _boost(e, MatchAllDocsQuery())

    if tag == "BooleanQuery":
        clauses = []
        for c in _children(e):
            if c.tag != "Clause":
                raise ValueError(
                    f"<BooleanQuery> child must be <Clause>, got <{c.tag}>"
                )
            occ = _OCCURS.get((c.get("occurs") or "should").lower())
            if occ is None:
                raise ValueError(f"bad occurs {c.get('occurs')!r}")
            subs = _children(c)
            if len(subs) != 1:
                raise ValueError("<Clause> wraps exactly one query element")
            clauses.append(Clause(occ, _build(subs[0], analyzer)))
        msm = int(e.get("minimumNumberShouldMatch", "0"))
        return _boost(e, BooleanQuery(tuple(clauses), msm))

    if tag == "RangeQuery":
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        return _boost(
            e,
            TermRangeQuery(
                lo.lower() if lo is not None else None,
                hi.lower() if hi is not None else None,
                include_lower=e.get("includeLower", "true") == "true",
                include_upper=e.get("includeUpper", "true") == "true",
                field=_field(e),
            ),
        )

    if tag == "DisjunctionMaxQuery":
        subs = tuple(_build(c, analyzer) for c in _children(e))
        if not subs:
            raise ValueError("<DisjunctionMaxQuery> needs sub-queries")
        tie = float(e.get("tieBreaker", "0.0"))
        return _boost(e, DisMaxQuery(subs, tie))

    if tag == "ConstantScoreQuery":
        subs = _children(e)
        if len(subs) != 1:
            raise ValueError("<ConstantScoreQuery> wraps one query")
        return ConstantScoreQuery(
            _build(subs[0], analyzer), boost=float(e.get("boost", "1.0"))
        )

    if tag == "UserQuery":
        from lucene_solr_spark.search.parser import parse_query

        q = parse_query(_text(e), analyzer=analyzer)
        if q is None:
            raise ValueError("<UserQuery> text parsed to no query")
        return _boost(e, q)

    if tag in ("SpanTerm", "SpanNear", "SpanOr", "SpanOrTerms",
               "SpanFirst", "SpanNot"):
        return _build_span(e, analyzer)

    raise ValueError(
        f"Element content claims to be a query, but no query builder is "
        f"registered for <{tag}>"
    )


def _build_span(e: ET.Element, analyzer: str) -> SpanQuery:
    tag = e.tag
    if tag == "SpanTerm":
        return SpanTermQuery(_text(e).lower(), field=_field(e))
    if tag == "SpanNear":
        clauses = tuple(_build_span(c, analyzer) for c in _children(e))
        return SpanNearQuery(
            clauses,
            slop=int(e.get("slopFactor", "0")),
            in_order=e.get("inOrder", "true") == "true",
        )
    if tag == "SpanOr":
        return SpanOrQuery(
            tuple(_build_span(c, analyzer) for c in _children(e))
        )
    if tag == "SpanOrTerms":
        terms = _analyze(_text(e), analyzer)
        if not terms:
            raise ValueError("<SpanOrTerms> text analyzed to no terms")
        return SpanOrQuery(
            tuple(
                SpanTermQuery(t, field=_field(e))
                for t in dict.fromkeys(terms)
            )
        )
    if tag == "SpanFirst":
        subs = _children(e)
        if len(subs) != 1:
            raise ValueError("<SpanFirst> wraps one span")
        return SpanFirstQuery(
            _build_span(subs[0], analyzer), int(e.get("end", "1"))
        )
    if tag == "SpanNot":
        inc = e.find("Include")
        exc = e.find("Exclude")
        if inc is None or exc is None:
            raise ValueError("<SpanNot> needs <Include> and <Exclude>")
        return SpanNotQuery(
            _build_span(_children(inc)[0], analyzer),
            _build_span(_children(exc)[0], analyzer),
        )
    raise ValueError(f"not a span element: <{tag}>")
