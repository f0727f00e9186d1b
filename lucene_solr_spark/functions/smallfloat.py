"""Lucene SmallFloat 3-mantissa-bit / zero-exp-15 quantization, numpy-exact.

Reference semantics: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98
(floatToByte315 / byte315ToFloat). Norm bytes are the only per-doc statistic
BM25 needs at query time (BM25Similarity.java:97-99,128-136).

All functions are vectorized over numpy arrays; no Python-level loops.
"""

from __future__ import annotations

import numpy as np

_FZERO = (63 - 15) << 3  # 384


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.floatToByte315 (SmallFloat.java:78-88).

    bits = floatToRawIntBits(f); smallfloat = bits >> 21 (arithmetic);
    <= fzero -> 0 if f<=0 else 1; >= fzero+0x100 -> 255; else smallfloat-fzero.
    """
    f = np.asarray(f, dtype=np.float32)
    bits = f.view(np.int32)
    smallfloat = bits >> (24 - 3)  # arithmetic shift, like Java
    out = (smallfloat - _FZERO).astype(np.int32)
    under = smallfloat <= _FZERO
    over = smallfloat >= _FZERO + 0x100
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    out = np.where(over, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.byte315ToFloat (SmallFloat.java:91-98)."""
    b = np.asarray(b, dtype=np.uint8).astype(np.int32)
    bits = (b << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32).copy()
    out[b == 0] = 0.0
    return out


def norm_table() -> np.ndarray:
    """NORM_TABLE[256]: decoded doc length per norm byte.

    BM25Similarity.java:128-136 — NORM_TABLE[i] = 1f / (f*f) with
    f = byte315ToFloat(i); float32 multiply then float32 reciprocal.
    NORM_TABLE[0] = 1/0 = +inf (Java float division by zero).
    """
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    with np.errstate(divide="ignore"):
        return (np.float32(1.0) / (f * f)).astype(np.float32)


def encode_norm(doc_len: np.ndarray, boost: float = 1.0) -> np.ndarray:
    """Norm byte for a doc of `doc_len` emitted tokens (BM25Similarity.java:97-99).

    byte = floatToByte315(boost / (float) Math.sqrt(fieldLength)).
    Java: sqrt in double, divide as float32. doc_len==0 -> never scored;
    Lucene writes no norm row (DefaultIndexingChain.java:558); we emit 0.
    """
    dl = np.asarray(doc_len, dtype=np.float64)
    with np.errstate(divide="ignore"):
        f = (np.float32(boost) / np.sqrt(dl).astype(np.float32)).astype(np.float32)
    b = float_to_byte315(f)
    return np.where(dl <= 0, np.uint8(0), b).astype(np.uint8)
