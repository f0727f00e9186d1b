"""Query-serving entrypoint for spark-submit: batched BM25 top-k.

    spark-submit --py-files dist/lucene_solr_spark.zip tools/submit_search.py \\
        --index /data/index --queries queries.jsonl --k 10 --out results.parquet

`queries.jsonl`: one JSON object per line:
    {"qid": "q1", "type": "term",   "terms": ["table"]}
    {"qid": "q2", "type": "and",    "terms": ["table", "scan"]}
    {"qid": "q3", "type": "or",     "terms": ["a", "b"], "msm": 2}
    {"qid": "q4", "type": "not",    "must": ["a"], "must_not": ["b"]}
    {"qid": "q5", "type": "phrase", "terms": ["table", "scan"]}
    {"qid": "q6", "type": "dismax", "terms": ["a", "b"], "tie": 0.3}

All queries evaluate in ONE Spark job (IndexSearcher.search_many)."""

from __future__ import annotations

import argparse
import json


def parse_query(rec: dict):
    from lucene_solr_spark.search.query import (
        BooleanAnd,
        BooleanNot,
        BooleanOr,
        DisjunctionMax,
        PhraseQuery,
        TermQuery,
    )

    t = rec["type"]
    if t == "term":
        return TermQuery(rec["terms"][0])
    if t == "and":
        return BooleanAnd(tuple(rec["terms"]))
    if t == "or":
        return BooleanOr(tuple(rec["terms"]), min_should_match=rec.get("msm", 1))
    if t == "not":
        return BooleanNot(tuple(rec["must"]), tuple(rec["must_not"]))
    if t == "phrase":
        return PhraseQuery(tuple(rec["terms"]))
    if t == "dismax":
        return DisjunctionMax(tuple(rec["terms"]), tie=rec.get("tie", 0.0))
    raise ValueError(f"unknown query type {t}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lss-search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from lucene_solr_spark.search.searcher import IndexSearcher

    qs = {}
    with open(args.queries) as fh:
        for line in fh:
            if line.strip():
                rec = json.loads(line)
                qs[rec["qid"]] = parse_query(rec)

    s = IndexSearcher.open(spark, args.index)
    s.search_many(qs, k=args.k).write.mode("overwrite").parquet(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
