"""Plan-shape guards for the payload paths (the scale properties):

1. payload_rows is a PUSHED-DOWN single-term seek (PushedFilters on
   `term`), and its scan projection includes pay_enc.
2. Non-payload queries never ship pay_enc: the scan ReadSchema of a
   plain term search excludes it even on a payload-bearing index.
3. A paycheck span spec keeps pay_enc in its exchange; a plain span
   spec drops it.
"""
from __future__ import annotations

import pandas as pd
import pytest

from lucene_solr_spark.index.builder import IndexConfig, build_index
from lucene_solr_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("planpay") / "ix")
    df = spark.createDataFrame(pd.DataFrame(
        [(i, f"alpha|{i} beta|{i + 1} gamma") for i in range(40)],
        columns=["doc_id", "text"],
    ))
    build_index(
        spark, df, out,
        IndexConfig(n_shards=2, segs_per_shard=2,
                    analyzer="delimited_payload", index_positions=True,
                    index_payloads=True),
    )
    return IndexSearcher(spark, out)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_payload_rows_pushdown_and_projection(pidx):
    plan = _plan(pidx.payload_rows("alpha", fn="max"))
    assert "PushedFilters" in plan and "term" in plan
    assert "pay_enc" in plan  # projection carries the .pay stream


def test_term_search_excludes_pay_enc(pidx):
    from lucene_solr_spark.search.query import TermQuery

    plan = _plan(pidx.search(TermQuery("alpha"), k=5))
    assert "pay_enc" not in plan  # pruned pre-shuffle on non-payload paths


def test_span_specs_gate_pay_enc(pidx):
    from lucene_solr_spark.search.query import (
        SpanPayloadCheckQuery, SpanTermQuery,
    )

    plain = _plan(pidx.search(SpanTermQuery("alpha"), k=5))
    assert "pay_enc" not in plain
    check = _plan(pidx.search(
        SpanPayloadCheckQuery(SpanTermQuery("alpha"), (1.0,)), k=5
    ))
    assert "pay_enc" in check
