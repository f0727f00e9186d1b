"""Delete / update support (live-docs semantics).

Reference model: deletes are a sidecar liveDocs bitset applied at the
scorer level (codecs/lucene50/Lucene50LiveDocsFormat.java, the
`liveDocs` argument threaded through every Scorer); collection
statistics (maxDoc, docFreq, sumTotalTermFreq) deliberately STILL
include deleted docs until a merge rewrites the segments
(BM25Similarity uses maxDoc, not numDocs — SURVEY §2.6). We reproduce
exactly that: deleted keys accumulate in a tombstone table; the
searcher resolves them to docIDs and filters candidates; scores of
surviving docs are bit-unchanged.

`update_documents` = delete-by-key + NRT append of the new versions
(IndexWriter.updateDocument semantics, index/IndexWriter.java:1456-1473).

Scale shape: tombstones are a (key, watermark) table; the searcher
resolves them to docIDs DISTRIBUTIVELY (doc_map ⋈ tombstones, see
IndexSearcher.deleted_df) and attaches each shard's deleted-id array
to that shard's cogrouped norms row — the per-shard liveDocs-bitmap
analog; no O(deleted) driver state anywhere on the query path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tomb_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def _current_total_docs(manifest: dict) -> int:
    return manifest["max_doc"] + sum(
        g["n_docs"] for g in manifest.get("delta_generations", [])
    )


def delete_by_keys(spark: SparkSession, index_dir: str, keys: list) -> int:
    """Append delete-by-uniqueKey tombstones. Returns total tombstones.

    Each tombstone carries a docID watermark (total docs at delete
    time): it kills only doc versions that existed when the delete was
    issued — a later re-add (update) gets a docID above the watermark
    and survives (Lucene's delete-then-add sequencing on the in-order
    update stream, BufferedUpdates delGen semantics)."""
    import json

    with open(os.path.join(index_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    key_type = "string" if manifest.get("key_kind") == "s" else "long"
    wm = _current_total_docs(manifest)
    df = spark.createDataFrame(
        [(k, wm) for k in keys], f"key {key_type}, wm long"
    )
    df.write.mode("append").parquet(_tomb_dir(index_dir))
    return spark.read.parquet(_tomb_dir(index_dir)).count()


def update_documents(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    batch_id: int | str,
) -> None:
    """updateDocument = delete-by-key + NRT append of the new docs.

    The tombstones are written straight from the batch DataFrame (one
    distributed projection, no driver-side key collection), so an
    update batch of any size stays executor-bound end-to-end."""
    import json

    from lucene_solr_spark.streaming.nrt import append_batch

    with open(os.path.join(index_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    id_col = manifest["config"]["id_col"]
    key_type = "string" if manifest.get("key_kind") == "s" else "long"
    wm = _current_total_docs(manifest)
    batch.select(
        F.col(id_col).cast(key_type).alias("key"),
        F.lit(wm).cast("long").alias("wm"),
    ).write.mode("append").parquet(_tomb_dir(index_dir))
    append_batch(spark, batch, index_dir, batch_id)
