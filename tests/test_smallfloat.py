"""SmallFloat quantization vectors (util/SmallFloat.java:78-98 semantics)."""

import numpy as np

from lucene_solr_spark.functions.smallfloat import (
    byte315_to_float,
    encode_norm,
    float_to_byte315,
    norm_table,
)


def test_known_extremes():
    # documented in SmallFloat.java:74-77: smallest nonzero / largest / epsilon
    assert byte315_to_float(np.array([1], np.uint8))[0] == np.float32(5.820766e-10)
    assert byte315_to_float(np.array([255], np.uint8))[0] == np.float32(7.5161928e9)
    assert byte315_to_float(np.array([0], np.uint8))[0] == 0.0


def test_zero_negative_under_overflow():
    f = np.array([0.0, -1.0, 1e-12, 1e11, np.inf], np.float32)
    b = float_to_byte315(f)
    assert list(b) == [0, 0, 1, 255, 255]


def test_roundtrip_all_bytes():
    b = np.arange(256, dtype=np.uint8)
    rt = float_to_byte315(byte315_to_float(b))
    assert (rt[1:] == b[1:]).all()


def test_truncation_not_rounding():
    # values between representable points truncate toward zero (bit shift)
    lo = byte315_to_float(np.array([100], np.uint8))[0]
    hi = byte315_to_float(np.array([101], np.uint8))[0]
    mid = np.float32((float(lo) + float(hi)) / 2 + 1e-12)
    assert float_to_byte315(np.array([mid], np.float32))[0] == 100


def test_norm_encoding_vs_scalar_reference():
    # dueling vs an independent scalar transcription of the Java code
    def scalar(f):
        bits = int(np.float32(f).view(np.int32))
        small = bits >> 21
        if small <= (63 - 15) << 3:
            return 0 if bits <= 0 else 1
        if small >= ((63 - 15) << 3) + 0x100:
            return 255
        return small - ((63 - 15) << 3)

    lens = np.arange(1, 2000)
    import math

    expect = [scalar(np.float32(1.0) / np.float32(math.sqrt(float(n)))) for n in lens]
    got = encode_norm(lens)
    assert got.tolist() == expect


def test_norm_table_monotone_and_inf_at_zero():
    t = norm_table()
    assert np.isinf(t[0])
    assert (np.diff(t[1:]) < 0).all()  # decoded length decreases with byte
