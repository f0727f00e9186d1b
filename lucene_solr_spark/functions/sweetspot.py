"""SweetSpotSimilarity — the misc module's DefaultSimilarity subclass
(lucene/misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java).

Two overrides on top of the classic TF-IDF chain (functions/tfidf.py),
everything else (idf, queryNorm, coord, normalize) inherited:

- tf(freq) = baselineTf(freq) (SweetSpotSimilarity.java:162-185):
  0 -> 0; freq <= tf_min -> tf_base;
  else (float)sqrt(freq + tf_base^2 - tf_min), float operand chain
  (freq + (base*base)) - min evaluated left-to-right in f32.
- lengthNorm plateau (SweetSpotSimilarity.java:119-153):
  computeLengthNorm(numTerms) =
  (float)(1.0f / sqrt(steep * (float)(|x-lo| + |x-hi| - (hi-lo)) + 1.0f))
  — 1.0 between lo and hi, sqrt falloff outside; degenerates to
  1/sqrt(x) at lo=hi=1, steep=0.5 (== DefaultSimilarity.lengthNorm).

Index-time story: the reference encodes the SweetSpot norm at index
time — byte = floatToByte315(computeLengthNorm(numTokens))
(DefaultSimilarity.encodeNormValue over the overridden lengthNorm).
This engine's index stores the BM25/classic byte315(1/sqrt(len))
norm; the SweetSpot decode table therefore recovers the QUANTIZED
document length from the stored byte (numTerms =
rint(NORM_TABLE[b]), the same 1/(f*f) decode SimilarityBase uses),
applies computeLengthNorm, and round-trips the result through
floatToByte315/byte315ToFloat to reproduce the reference's
index-time quantization. Documented deviation: numTerms is the
byte315-quantized length, exact only where 1/sqrt(len) survives the
3-mantissa-bit truncation — the same approximation class the LM/DFR
family (functions/lm.py, functions/dfr.py) already carries.
"""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.functions.smallfloat import (
    byte315_to_float,
    float_to_byte315,
    norm_table,
)

DECODE = byte315_to_float(np.arange(256, dtype=np.uint8))


def baseline_tf(
    freq: np.ndarray, base: float = 0.0, tmin: float = 0.0
) -> np.ndarray:
    """SweetSpotSimilarity.baselineTf:162-185, vectorized f32.

    (freq + (base*base)) - min in f32 left-to-right, sqrt in f64,
    result cast f32 (Java `(float)Math.sqrt(float)`)."""
    f = np.asarray(freq, np.float32)
    b = np.float32(base)
    m = np.float32(tmin)
    inner = np.float32(np.float32(b * b))  # tf_base * tf_base
    arg = (f + inner).astype(np.float32)
    arg = (arg - m).astype(np.float32)
    out = np.sqrt(arg.astype(np.float64)).astype(np.float32)
    out = np.where(f <= m, b, out)
    return np.where(f == 0.0, np.float32(0.0), out).astype(np.float32)


def compute_length_norm(
    num_terms: np.ndarray, lo: int = 1, hi: int = 1, steep: float = 0.5
) -> np.ndarray:
    """SweetSpotSimilarity.computeLengthNorm:139-153, vectorized f32.

    steep * (float)(|x-lo| + |x-hi| - (hi-lo)) + 1.0f in f32,
    Math.sqrt on the f64 promotion, 1.0f/double division, (float) cast.
    """
    x = np.asarray(num_terms, np.int64)
    tri = (np.abs(x - lo) + np.abs(x - hi) - (hi - lo)).astype(np.float32)
    inner = (np.float32(steep) * tri).astype(np.float32)
    inner = (inner + np.float32(1.0)).astype(np.float32)
    return (1.0 / np.sqrt(inner.astype(np.float64))).astype(np.float32)


def _representative_lengths() -> np.ndarray:
    """Per norm byte b: the SMALLEST integer doc length whose
    index-time encode (encode_norm = byte315(1/sqrt(len))) yields b.

    byte315 truncates, so encode is monotone non-increasing in len and
    each byte in its image owns a contiguous length range; the range
    start is floor(1/decode(next_byte)^2) + 1. Choosing the range
    start makes the table EXACT (the true length) wherever the encode
    is injective, and makes the degenerate SweetSpot factors
    (lo=hi=1, steep=0.5 -> 1/sqrt(len)) round-trip to the stored
    byte's own decode — the classic-equivalence pin in
    tests/test_sweetspot.py. Bytes outside the encode image fall back
    to rint(NORM_TABLE[b]) (never produced by the builder)."""
    from lucene_solr_spark.functions.smallfloat import encode_norm

    dec = DECODE.astype(np.float64)
    qlen = norm_table().astype(np.float64)
    reps = np.zeros(256, np.int64)
    for b in range(1, 256):
        if b + 1 < 256 and dec[b + 1] > 0:
            cand = int(np.floor(1.0 / (dec[b + 1] ** 2))) + 1
        else:
            cand = 1
        for length in (cand - 1, cand, cand + 1):
            if length >= 1 and int(
                encode_norm(np.array([length]))[0]
            ) == b:
                reps[b] = length
                break
        else:
            reps[b] = max(
                1, int(np.rint(qlen[b])) if np.isfinite(qlen[b]) else 1
            )
    return reps


_REPS = _representative_lengths()


def sweet_norm_decode_table(
    lo: int = 1, hi: int = 1, steep: float = 0.5
) -> np.ndarray:
    """256-entry decoded-norm table for stored byte315(1/sqrt(len))
    norm bytes scored under SweetSpotSimilarity.

    Per byte b: numTerms = the byte's representative length (see
    _representative_lengths — exact while the encode is injective,
    range-start above); value = byte315ToFloat(floatToByte315(
    computeLengthNorm(numTerms))) — the reference's index-time
    encode/decode round-trip. Byte 0 (doc never normed) decodes 0.
    """
    cln = compute_length_norm(_REPS, lo, hi, steep)
    dec = byte315_to_float(float_to_byte315(cln))
    dec[0] = np.float32(0.0)
    return dec.astype(np.float32)


def score_term_sweet(
    tf: np.ndarray,
    norm_bytes: np.ndarray,
    value: np.float32,
    table: np.ndarray,
    tf_base: float = 0.0,
    tf_min: float = 0.0,
) -> np.ndarray:
    """TFIDFSimScorer.score with SweetSpot's tf(): raw =
    baselineTf(freq) * weightValue; raw * decodedNorm, all f32."""
    tff = baseline_tf(tf, tf_base, tf_min)
    raw = (tff * np.float32(value)).astype(np.float32)
    return (raw * table[np.asarray(norm_bytes, np.uint8)]).astype(np.float32)
