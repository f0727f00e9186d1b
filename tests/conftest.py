from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_MID = os.environ.get("SPARK_GRAFT_SF_MID", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("lucene_solr_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def docs_index(spark, tmp_path_factory):
    """Index built once over sf0.001 documents."""
    from lucene_solr_spark.index.builder import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("index") / "docs_sf0001")
    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    manifest = build_index(
        spark,
        src,
        out,
        IndexConfig(n_shards=4, segs_per_shard=4, analyzer="standard",
                    id_col="doc_id", text_col="text", sharding="range_int"),
    )
    return out, manifest
