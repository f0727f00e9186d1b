"""Language-model similarities — LM Dirichlet and LM Jelinek-Mercer
(similarities/LMDirichletSimilarity.java, LMJelinekMercerSimilarity.java,
both SimilarityBase/LMSimilarity subclasses). Float discipline
reproduced exactly:

- docLen    : SimilarityBase.NORM_TABLE[normByte] = 1f/(f*f) with
              f = byte315ToFloat(normByte) (SimilarityBase.java:218-226)
              — the SAME norm byte the index stores for BM25
              (floatToByte315(1/sqrt(length))), so LM scoring reuses the
              stored norms unchanged.
- collectionProbability = (totalTermFreq + 1F) / (numberOfFieldTokens
              + 1F) float division (LMSimilarity.DefaultCollectionModel.
              computeProbability; BasicStats totalTermFreq == the
              dictionary's cf, numberOfFieldTokens == sumTotalTermFreq).
- Dirichlet : score = boost * (float)(log(1 + freq/(mu*cp))
              + log(mu/(docLen + mu))), clamped at 0
              (LMDirichletSimilarity.score:55-60; the inner ratios are
              FLOAT arithmetic, the two logs DOUBLE, their sum DOUBLE,
              one final cast).
- JM        : score = boost * (float)log(1 + ((1-lambda)*freq/docLen)
              / (lambda*cp)) (LMJelinekMercerSimilarity.score:49-53).
- Boolean composition: leaf scores are f32; conjunction/disjunction
  accumulate f64 and cast once (same as the BM25 path — SimilarityBase
  similarities disable coord, Similarity.coord() default 1).
"""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.functions.smallfloat import norm_table

# SimilarityBase.NORM_TABLE: decoded doc length per norm byte
# (byte 0 -> +inf, matching Java's 1f/0f)
DOCLEN_TABLE = norm_table()


def collection_probability(cf: int, num_field_tokens: int) -> np.float32:
    """LMSimilarity.DefaultCollectionModel.computeProbability:
    (totalTermFreq + 1F) / (numberOfFieldTokens + 1F), float ops."""
    return np.float32(
        np.float32(np.float64(cf) + 1.0) /
        np.float32(np.float64(num_field_tokens) + 1.0)
    )


def score_dirichlet(
    tf: np.ndarray, norm_bytes: np.ndarray, mu: float, cp: np.float32,
    boost: float = 1.0,
) -> np.ndarray:
    """LMDirichletSimilarity.score (mu default 2000): per-doc f32 leaf
    scores for one term."""
    mu32 = np.float32(mu)
    freq = np.asarray(tf, np.float64).astype(np.float32)
    doclen = DOCLEN_TABLE[np.asarray(norm_bytes, np.uint8)]
    # float ratios, double logs, one final cast (Java promotion rules)
    x = (freq / np.float32(mu32 * cp)).astype(np.float32)
    y = (mu32 / (doclen + mu32)).astype(np.float32)
    # Math.log(1 + x): literal 1.0 + (double)x, NOT log1p — Java has no
    # fused log1p here and the ULPs differ
    with np.errstate(divide="ignore"):
        s = (
            np.log(1.0 + x.astype(np.float64))
            + np.log(y.astype(np.float64))
        )
    out = (np.float32(boost) * s.astype(np.float32)).astype(np.float32)
    return np.where(out > 0.0, out, np.float32(0.0)).astype(np.float32)


def score_jm(
    tf: np.ndarray, norm_bytes: np.ndarray, lam: float, cp: np.float32,
    boost: float = 1.0,
) -> np.ndarray:
    """LMJelinekMercerSimilarity.score (lambda default 0.1)."""
    lam32 = np.float32(lam)
    freq = np.asarray(tf, np.float64).astype(np.float32)
    doclen = DOCLEN_TABLE[np.asarray(norm_bytes, np.uint8)]
    num = ((np.float32(1.0) - lam32) * freq / doclen).astype(np.float32)
    den = np.float32(lam32 * cp)
    x = (num / den).astype(np.float32)
    s = np.log(1.0 + x.astype(np.float64))
    return (np.float32(boost) * s.astype(np.float32)).astype(np.float32)
