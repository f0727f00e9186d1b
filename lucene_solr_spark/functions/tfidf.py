"""Classic TF-IDF similarity — the 6.0 snapshot's DEFAULT similarity
(search/IndexSearcher.java:145 -> similarities/DefaultSimilarity.java:45,
a TFIDFSimilarity). Float discipline reproduced exactly:

- idf        = (float)(log(numDocs/(double)(docFreq+1)) + 1.0)
               (ClassicSimilarity.idf)
- queryNorm  = (float)(1.0 / Math.sqrt(sumOfSquaredWeights)) with
               sumOfSquaredWeights = f32 sum of f32(queryWeight²) in
               clause order (BooleanWeight.getValueForNormalization)
- normalize  : queryWeight = queryNorm * boost * idf;
               value = queryWeight * idf  (IDFStats.normalize)
- score      = tf(freq) * value * decodeNorm(normByte) with
               tf = (float)sqrt(freq), decodeNorm = byte315ToFloat
               (TFIDFSimScorer.score, SmallFloat.java:91-98)
- coord      = overlap / (float)maxOverlap multiplies boolean sums
               (ClassicSimilarity.coord; BM25 disables coord, classic
               does not)
"""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.functions.smallfloat import byte315_to_float

DECODE = byte315_to_float(np.arange(256, dtype=np.uint8))


def idf(df: int | np.ndarray, num_docs: int) -> np.float32:
    """ClassicSimilarity.idf: (float)(log(numDocs/(df+1)) + 1.0)."""
    df64 = np.asarray(df, np.float64)
    return (np.log(num_docs / (df64 + 1.0)) + 1.0).astype(np.float32)


def term_values(idfs: list[np.float32], boost: float = 1.0) -> list[np.float32]:
    """Per-clause weightValue with the shared queryNorm
    (IndexSearcher.createNormalizedWeight over a BooleanWeight)."""
    b = np.float32(boost)
    qws = [np.float32(np.float32(i) * b) for i in idfs]
    ssw = np.float32(0.0)
    for w in qws:
        ssw = np.float32(ssw + np.float32(w * w))
    qn = np.float32(1.0 / np.sqrt(np.float64(ssw))) if ssw > 0 else np.float32(1.0)
    out = []
    for i in idfs:
        qw = np.float32(np.float32(np.float32(qn) * b) * np.float32(i))
        out.append(np.float32(qw * np.float32(i)))
    return out


def score_term(
    tf: np.ndarray, norm_bytes: np.ndarray, value: np.float32
) -> np.ndarray:
    """TFIDFSimScorer.score: raw = tf(freq)*value; raw * decodeNorm."""
    tff = np.sqrt(np.asarray(tf, np.float64)).astype(np.float32)
    raw = tff * np.float32(value)
    return (raw * DECODE[np.asarray(norm_bytes, np.uint8)]).astype(np.float32)
