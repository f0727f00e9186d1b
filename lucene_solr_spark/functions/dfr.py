"""DFR and IB similarities (similarities/DFRSimilarity.java,
IBSimilarity.java — SimilarityBase subclasses, same NORM_TABLE docLen
decode as functions/lm.py). Implemented configurations:

- DFR I(n)L2: BasicModelIn + AfterEffectL + NormalizationH2(c=1)
  (BasicModelIn.java:33-37, AfterEffectL.java:32-34,
  NormalizationH2.java:52-54; DFRSimilarity.score:110-114 multiplies
  boost * basicModel * afterEffect in f32).
- IB SPL-DF-H2: DistributionSPL + LambdaDF + NormalizationH2(c=1)
  (DistributionSPL.java:34-40, LambdaDF.java:32-34;
  IBSimilarity.score:98-104).

Float discipline: stats ratios in f32, log2(x) == Math.log(x)/LOG_2 in
f64 (SimilarityBase.java:50,255-257), one cast back to f32 per
component; avgFieldLength = (float)numberOfFieldTokens /
numberOfDocuments (SimilarityBase.fillBasicStats:129)."""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.functions.lm import DOCLEN_TABLE

LOG_2 = np.log(2.0)  # SimilarityBase.LOG_2 = Math.log(2)


def avg_field_length(num_field_tokens: int, num_docs: int) -> np.float32:
    """SimilarityBase.fillBasicStats: (float)numberOfFieldTokens /
    numberOfDocuments (both operands convert to float)."""
    return np.float32(np.float32(num_field_tokens) / np.float32(num_docs))


def tfn_h2(
    tf: np.ndarray, norm_bytes: np.ndarray, avg_len: np.float32,
    c: float = 1.0,
) -> np.ndarray:
    """NormalizationH2.tfn: (float)(tf * log2(1 + c*avgLen/len)) —
    the inner ratio is f32, the log2 and the tf-multiply f64, one
    final cast."""
    doclen = DOCLEN_TABLE[np.asarray(norm_bytes, np.uint8)]
    x = ((np.float32(c) * avg_len) / doclen).astype(np.float32)
    lg = np.log(1.0 + x.astype(np.float64)) / LOG_2
    freq = np.asarray(tf, np.float64).astype(np.float32)
    return (freq.astype(np.float64) * lg).astype(np.float32)


def score_dfr_inl2(
    tf: np.ndarray, norm_bytes: np.ndarray, df: int, num_docs: int,
    avg_len: np.float32, c: float = 1.0, boost: float = 1.0,
) -> np.ndarray:
    """DFR I(n)L2 leaf: boost * [tfn * (float)log2((N+1)/(df+0.5))]
    * [1/(tfn+1)] — BasicModelIn then AfterEffectL, f32 products."""
    tfn = tfn_h2(tf, norm_bytes, avg_len, c)
    inf = np.float32(np.log((num_docs + 1) / (df + 0.5)) / LOG_2)
    bm = (tfn * inf).astype(np.float32)
    ae = (np.float32(1.0) / (tfn + np.float32(1.0))).astype(np.float32)
    return (np.float32(boost) * bm * ae).astype(np.float32)


def lambda_df(df: int, num_docs: int) -> np.float32:
    """LambdaDF.lambda: (docFreq + 1F) / (numberOfDocuments + 1F)."""
    return np.float32(
        np.float32(np.float64(df) + 1.0) /
        np.float32(np.float64(num_docs) + 1.0)
    )


def score_ib_spl(
    tf: np.ndarray, norm_bytes: np.ndarray, df: int, num_docs: int,
    avg_len: np.float32, c: float = 1.0, boost: float = 1.0,
) -> np.ndarray:
    """IB SPL-DF-H2 leaf: (float)-log((lambda^(tfn/(tfn+1)) - lambda)
    / (1 - lambda)) — the exponent is a f32 ratio, the pow/log f64
    (DistributionSPL.score; lambda == 1f snaps to 0.99f)."""
    lam = lambda_df(df, num_docs)
    if lam == np.float32(1.0):
        lam = np.float32(0.99)
    tfn = tfn_h2(tf, norm_bytes, avg_len, c)
    e = (tfn / (tfn + np.float32(1.0))).astype(np.float32)
    lam64 = np.float64(lam)
    num = np.power(lam64, e.astype(np.float64)) - lam64
    s = -np.log(num / (1.0 - lam64))
    return (np.float32(boost) * s.astype(np.float32)).astype(np.float32)
