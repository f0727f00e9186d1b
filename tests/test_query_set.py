"""The reference query set (FIXTURES.md §4): every query in
tests/fixtures/queries.jsonl must be rank-identical (docIDs + bitwise
float32 scores) between the engine (batched search_many) and the
independent brute-force oracle. Tokenizer golden vectors pin the
analyzer (FIXTURES.md §3)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_tokenizer_golden_vectors():
    from lucene_solr_spark.analysis.analyzers import (
        tokenize_standard_with_positions,
    )

    with open(os.path.join(FIXTURES, "tokens_golden.jsonl")) as fh:
        recs = [json.loads(line) for line in fh]
    texts = pd.Series([r["text"] for r in recs])
    got = tokenize_standard_with_positions(texts)
    for r, toks in zip(recs, got):
        want = [(t["term"], t["pos"]) for t in r["tokens"]]
        assert list(toks) == want, r["text"][:50]


def _load_queries():
    from lucene_solr_spark.search.query import (
        BooleanAnd,
        BooleanNot,
        BooleanOr,
        DisjunctionMax,
        TermQuery,
    )

    out = {}
    meta = {}
    with open(os.path.join(FIXTURES, "queries.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            t = rec["type"]
            if t == "term":
                q = TermQuery(rec["terms"][0])
            elif t == "and":
                q = BooleanAnd(tuple(rec["terms"]))
            elif t == "or":
                q = BooleanOr(tuple(rec["terms"]), min_should_match=rec.get("msm", 1))
            elif t == "not":
                q = BooleanNot(tuple(rec["must"]), tuple(rec["must_not"]))
            elif t == "dismax":
                q = DisjunctionMax(tuple(rec["terms"]), tie=rec.get("tie", 0.0))
            else:
                raise ValueError(t)
            out[rec["qid"]] = q
            meta[rec["qid"]] = rec
    return out, meta


def test_reference_query_set_rank_identical(spark, docs_index):
    from lucene_solr_spark.search.oracle import build_oracle_index, oracle_topk
    from lucene_solr_spark.search.searcher import IndexSearcher

    out, _ = docs_index
    s = IndexSearcher(spark, out)
    qs, meta = _load_queries()

    # independent oracle over the same canonical docID assignment
    dm = s.doc_map().orderBy("doc_id").toPandas()
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")
    )
    texts = docs.loc[dm["key"]]["text"].reset_index(drop=True)
    ix = build_oracle_index(
        dm["key"].to_numpy(), texts, dm["doc_id"].to_numpy()
    )

    K = 20
    batched = s.search_many(qs, k=K).collect()
    by_qid: dict[str, list] = {}
    for r in batched:
        by_qid.setdefault(r.qid, []).append((r.doc_id, np.float32(r.score)))

    n_nonempty = 0
    for qid, rec in meta.items():
        kind = rec["type"]
        terms = rec.get("terms") or rec.get("must")
        want = [
            (int(d), np.float32(sc))
            for d, sc in oracle_topk(
                ix,
                kind if kind != "not" else "not",
                list(terms),
                K,
                must_not=rec.get("must_not"),
                min_should_match=rec.get("msm", 1),
                tie=rec.get("tie", 0.0),
            )
        ]
        got = by_qid.get(qid, [])
        assert got == want, (qid, got[:3], want[:3])
        n_nonempty += bool(got)
    assert n_nonempty >= 60  # the set is overwhelmingly non-empty
