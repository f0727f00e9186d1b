"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
`mapInPandas` stages.  The container has no image/audio libraries, so
the *decode* kernels are stubbed behind `NotImplementedError` or a
deterministic byte-level fake — but the Spark-side plumbing (schema,
partition shape, UDF signatures, Arrow batch handling) is real and
tested (tests/test_ops.py).

Scale notes: binary payloads dominate row size, so the scan partition
size is governed by spark.sql.files.maxPartitionBytes, and feature
extraction is a mapInPandas (no shuffle) — features are written
alongside a foreign key, never re-joined to the blob."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, n_chars long, byte_mean double, byte_entropy double"


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload column (utf-8 bytes of the
    text — the sandbox stand-in for an image/audio blob) plus typed
    metadata, mirroring how a crawl table carries `html: binary`."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode(F.col("text"), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Image decode stub — requires an image library not present in
    this container.  The plumbing around it (binary_features) is real."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this container"
    )


def binary_features(docs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Deterministic byte-level features (length, decoded char count,
    byte mean, byte entropy) computed with vectorized numpy per Arrow
    batch — the same batch shape a real image featurizer would use."""
    payloads = with_binary_payload(docs)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            raw = [bytes(b) for b in pdf["payload"]]
            lens = np.fromiter((len(b) for b in raw), np.int64, n)
            nchars = np.fromiter((len(b.decode("utf-8")) for b in raw), np.int64, n)
            means = np.empty(n, np.float64)
            ents = np.empty(n, np.float64)
            for i, b in enumerate(raw):
                arr = np.frombuffer(b, np.uint8)
                if arr.size == 0:
                    means[i] = 0.0
                    ents[i] = 0.0
                    continue
                means[i] = arr.mean()
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / arr.size
                ents[i] = float(-(p * np.log2(p)).sum())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "n_bytes": lens,
                    "n_chars": nchars,
                    "byte_mean": np.round(means, 6),
                    "byte_entropy": np.round(ents, 6),
                }
            )

    return payloads.mapInPandas(extract, FEATURE_SCHEMA)


def binary_length_stats(docs: DataFrame) -> DataFrame:
    """Oracle-checkable slice of the binary path: byte/char counts per
    doc, computed through the real binary column (encode -> decode)."""
    feats = binary_features(docs)
    return feats.select("doc_id", "n_bytes", "n_chars").orderBy("doc_id")
