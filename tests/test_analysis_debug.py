"""FieldAnalysisRequestHandler analog: the token-stream debug surface
runs the SAME Column expression the index build uses."""
from __future__ import annotations

import pytest


def test_standard_chain(spark):
    from lucene_solr_spark.analysis.debug import analyze_field

    rows = analyze_field(
        spark, "standard", ["The Quick-Brown fox", "a the"]
    ).collect()
    by_val = {}
    for r in rows:
        by_val.setdefault(r.value_id, []).append((r.term, r.pos, r.pay))
    # stopwords consume positions (posIncr preserved), hyphen splits
    assert by_val[0] == [("quick", 1, None), ("brown", 2, None),
                        ("fox", 3, None)]
    assert 1 not in by_val  # all-stopword value -> no tokens


def test_payload_chain(spark):
    from lucene_solr_spark.analysis.debug import analyze_field

    rows = analyze_field(
        spark, "delimited_payload", ["a|1.5 b"]
    ).collect()
    assert [(r.term, r.pos, r.pay) for r in rows] == [
        ("a", 0, 1.5), ("b", 1, None)
    ]


def test_unknown_analyzer(spark):
    from lucene_solr_spark.analysis.debug import analyze_field

    with pytest.raises(ValueError, match="unknown analyzer"):
        analyze_field(spark, "nope", ["x"])
