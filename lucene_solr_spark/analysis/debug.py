"""FieldAnalysisRequestHandler analog (solr/core/.../handler/
FieldAnalysisRequestHandler.java + AnalysisRequestHandlerBase:
the admin/analysis endpoint that shows how a value tokenizes under a
field's analysis chain, token-by-token with positions).

`analyze_field(spark, analyzer, texts)` runs the SAME Column
expression the index build uses (analysis/jvm.py registry), so what
this reports is — by construction, not by convention — exactly what
gets indexed. One Spark job for N values; the per-token rows carry
`pos` (position increment semantics preserved by the chain) and
`pay` (float payload, delimited_payload chain only, null otherwise).

The reference also reports a per-stage breakdown (tokenizer output,
then each filter); the JVM chains here are fused single expressions,
so the per-stage view is a documented deviation — the FINAL stream is
the contract, and the analyzers' engine parity (Column vs Python) is
pinned in tests/test_analyzer.py.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def analyze_field(
    spark: SparkSession, analyzer: str, texts: list[str]
) -> DataFrame:
    """Token stream of each value under `analyzer`'s indexing chain.

    Returns (value_id, term, pos, pay): one row per emitted token, in
    stream order; `pay` is null except for the delimited_payload
    chain. Unknown analyzer names raise with the registry's keys
    (the reference 400s on an unknown field type)."""
    from lucene_solr_spark.analysis.jvm import JVM_ANALYZERS_POS

    if analyzer not in JVM_ANALYZERS_POS:
        raise ValueError(
            f"unknown analyzer {analyzer!r}; one of "
            f"{sorted(JVM_ANALYZERS_POS)}"
        )
    src = spark.createDataFrame(
        pd.DataFrame(
            {"value_id": range(len(texts)), "text": list(texts)}
        )
    )
    toks = JVM_ANALYZERS_POS[analyzer](F.col("text"))
    out = (
        src.select("value_id", F.explode(toks).alias("t"))
        .select(
            "value_id",
            F.col("t.term").alias("term"),
            F.col("t.pos").cast("int").alias("pos"),
        )
    )
    # payload-bearing chains expose the pay field; others emit null
    has_pay = analyzer == "delimited_payload"
    pay = (
        src.select("value_id", F.explode(toks).alias("t")).select(
            "value_id", F.col("t.term").alias("term"),
            F.col("t.pos").cast("int").alias("pos"),
            F.col("t.pay").cast("float").alias("pay"),
        )
        if has_pay
        else out.withColumn("pay", F.lit(None).cast("float"))
    )
    return pay.orderBy("value_id", "pos", "term")
