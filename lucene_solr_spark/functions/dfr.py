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


# ---------------------------------------------------------------------
# Full DFR / IB model matrix (round-4 verdict #5).
#
# DFRSimilarity.score (DFRSimilarity.java:110-114):
#   boost * basicModel.score(stats, tfn) * afterEffect.score(stats, tfn)
# with tfn = normalization.tfn(stats, freq, docLen); IBSimilarity.score
# (IBSimilarity.java:98-104): boost * distribution.score(stats, tfn,
# lambda.lambda(stats)).  Float discipline per component is transcribed
# from the reference sources cited on each function: f32 where Java
# arithmetic stays in float, f64 where operands widen to double
# (log2/pow take double), one (float) cast at each component boundary.
# The I(n)L2 / SPL-DF-H2 points above predate the matrix and stay
# byte-for-byte (the generic path reproduces them bitwise — pinned in
# tests/test_dfr_matrix.py).
# ---------------------------------------------------------------------

LOG2_E = np.log(np.e) / LOG_2  # BasicModelP.LOG2_E = log2(Math.E)


def _doclen(norm_bytes: np.ndarray) -> np.ndarray:
    return DOCLEN_TABLE[np.asarray(norm_bytes, np.uint8)]


# --- Normalizations (NormalizationH1/H2/H3/Z.java tfn) ----------------

def tfn_h1(
    tf: np.ndarray, norm_bytes: np.ndarray, avg_len: np.float32,
    c: float = 1.0,
) -> np.ndarray:
    """NormalizationH1.tfn: tf * avgFieldLength / len — pure float
    arithmetic, left-associated (NormalizationH1.java:44). The c
    parameter exists on the class but is unused by tfn (matching the
    reference)."""
    freq = np.asarray(tf, np.float64).astype(np.float32)
    dl = _doclen(norm_bytes)
    return ((freq * avg_len).astype(np.float32) / dl).astype(np.float32)


def tfn_h3(
    tf: np.ndarray, norm_bytes: np.ndarray, cf: int, field_tokens: int,
    mu: float = 800.0,
) -> np.ndarray:
    """NormalizationH3.tfn (NormalizationH3.java:44): (tf + mu *
    ((F+1F)/(fieldTokens+1F))) / (len + mu) * mu — every operation in
    float (no double anywhere in the reference expression)."""
    freq = np.asarray(tf, np.float64).astype(np.float32)
    dl = _doclen(norm_bytes)
    mu32 = np.float32(mu)
    ratio = np.float32(
        np.float32(np.float64(cf) + 1.0)
        / np.float32(np.float64(field_tokens) + 1.0)
    )
    num = (freq + (mu32 * ratio).astype(np.float32)).astype(np.float32)
    return ((num / (dl + mu32).astype(np.float32)).astype(np.float32)
            * mu32).astype(np.float32)


def tfn_z(
    tf: np.ndarray, norm_bytes: np.ndarray, avg_len: np.float32,
    z: float = 0.30,
) -> np.ndarray:
    """NormalizationZ.tfn (NormalizationZ.java:44): (float)(tf *
    Math.pow(avgFieldLength / len, z)) — the ratio is a float
    division, pow and the tf-multiply run in double."""
    dl = _doclen(norm_bytes)
    ratio32 = (avg_len / dl).astype(np.float32)
    p = np.power(ratio32.astype(np.float64), np.float64(z))
    freq = np.asarray(tf, np.float64).astype(np.float32)
    return (freq.astype(np.float64) * p).astype(np.float32)


def compute_tfn(
    normalization: str, tf: np.ndarray, norm_bytes: np.ndarray, *,
    avg_len: np.float32, cf: int = 0, field_tokens: int = 0,
    c: float = 1.0, mu: float = 800.0, z: float = 0.30,
) -> np.ndarray:
    """Dispatch a Normalization name (h1/h2/h3/z/none) to its tfn."""
    n = normalization.lower()
    if n == "h1":
        return tfn_h1(tf, norm_bytes, avg_len, c)
    if n == "h2":
        return tfn_h2(tf, norm_bytes, avg_len, c)
    if n == "h3":
        return tfn_h3(tf, norm_bytes, cf, field_tokens, mu)
    if n == "z":
        return tfn_z(tf, norm_bytes, avg_len, z)
    if n in ("no", "none"):
        # Normalization.NoNormalization (Normalization.java:57): tfn=tf
        return np.asarray(tf, np.float64).astype(np.float32)
    raise ValueError(f"unknown normalization {normalization!r}")


# --- Basic models (BasicModel*.java score) ----------------------------

def _log2(x):
    return np.log(x) / LOG_2


def bm_be(tfn: np.ndarray, cf: int, n_docs: int) -> np.ndarray:
    """BasicModelBE.java:39-46 (Bose-Einstein, f64 end to end, one f32
    cast): F = cf+1+tfn, N += F, -log2((N-1)e) + f(N+F-1, N+F-tfn-2)
    - f(F, F-tfn) with f(n,m) = (m+0.5)log2(n/m) + (n-m)log2(n)."""
    t = tfn.astype(np.float64)
    big_f = np.float64(cf) + 1.0 + t
    big_n = big_f + np.float64(n_docs)

    def f(a, b):
        return (b + 0.5) * _log2(a / b) + (a - b) * _log2(a)

    s = (-_log2((big_n - 1.0) * np.e)
         + f(big_n + big_f - 1.0, big_n + big_f - t - 2.0)
         - f(big_f, big_f - t))
    return s.astype(np.float32)


def bm_d(tfn: np.ndarray, cf: int, n_docs: int) -> np.ndarray:
    """BasicModelD.java:39-48 (divergence approximation): F = cf+1+tfn,
    phi = tfn/F, D = phi*log2(phi/p) + (1-phi)*log2((1-phi)/(1-p)),
    p = 1/(N+1); (float)(D*F + 0.5*log2(1 + 2*pi*tfn*(1-phi)))."""
    t = tfn.astype(np.float64)
    big_f = np.float64(cf) + 1.0 + t
    phi = t / big_f
    nphi = 1.0 - phi
    p = 1.0 / (np.float64(n_docs) + 1.0)
    d = phi * _log2(phi / p) + nphi * _log2(nphi / (1.0 - p))
    s = d * big_f + 0.5 * _log2(1.0 + 2.0 * np.pi * t * nphi)
    return s.astype(np.float32)


def bm_g(tfn: np.ndarray, cf: int, n_docs: int) -> np.ndarray:
    """BasicModelG.java:39-46 (geometric): lambda = F/(N+F) with
    F = cf+1; (float)(log2(lambda+1) + tfn*log2((1+lambda)/lambda))."""
    big_f = np.float64(cf) + 1.0
    lam = big_f / (np.float64(n_docs) + big_f)
    t = tfn.astype(np.float64)
    s = _log2(lam + 1.0) + t * _log2((1.0 + lam) / lam)
    return s.astype(np.float32)


def bm_if(tfn: np.ndarray, cf: int, n_docs: int) -> np.ndarray:
    """BasicModelIF.java:33-37: tfn * (float)log2(1 + (N+1)/(F+0.5))
    — the log factor casts to f32 BEFORE the tfn multiply."""
    inf = np.float32(
        _log2(1.0 + (np.float64(n_docs) + 1.0) / (np.float64(cf) + 0.5))
    )
    return (tfn * inf).astype(np.float32)


def bm_in(tfn: np.ndarray, df: int, n_docs: int) -> np.ndarray:
    """BasicModelIn.java:33-37: tfn * (float)log2((N+1)/(df+0.5))."""
    inf = np.float32(_log2((np.float64(n_docs) + 1.0)
                           / (np.float64(df) + 0.5)))
    return (tfn * inf).astype(np.float32)


def bm_ine(tfn: np.ndarray, cf: int, n_docs: int) -> np.ndarray:
    """BasicModelIne.java:33-38: ne = N*(1 - ((N-1)/N)^F) with F = cf
    (no +1 here, unlike BE/D/G); tfn * (float)log2((N+1)/(ne+0.5))."""
    n64 = np.float64(n_docs)
    ne = n64 * (1.0 - np.power((n64 - 1.0) / n64, np.float64(cf)))
    inf = np.float32(_log2((n64 + 1.0) / (ne + 0.5)))
    return (tfn * inf).astype(np.float32)


def bm_p(tfn: np.ndarray, cf: int, n_docs: int) -> np.ndarray:
    """BasicModelP.java:39-43 (Poisson): lambda = (float)(F+1)/(N+1)
    — an f32 ratio — then (float)(tfn*log2(tfn/lambda) + (lambda +
    1/(12*tfn) - tfn)*LOG2_E + 0.5*log2(2*pi*tfn)) in f64."""
    lam = np.float64(np.float32(
        np.float32(np.float64(cf) + 1.0)
        / np.float32(np.float64(n_docs) + 1.0)
    ))
    t = tfn.astype(np.float64)
    s = (t * _log2(t / lam)
         + (lam + 1.0 / (12.0 * t) - t) * LOG2_E
         + 0.5 * _log2(2.0 * np.pi * t))
    return s.astype(np.float32)


BASIC_MODELS = {
    "be": bm_be, "d": bm_d, "g": bm_g, "if": bm_if, "in": bm_in,
    "ine": bm_ine, "p": bm_p,
}


# --- After effects (AfterEffect*.java score) --------------------------

def ae_l(tfn: np.ndarray) -> np.ndarray:
    """AfterEffectL.java:32-34: 1/(tfn+1), float."""
    return (np.float32(1.0) / (tfn + np.float32(1.0))).astype(np.float32)


def ae_b(tfn: np.ndarray, df: int, cf: int) -> np.ndarray:
    """AfterEffectB.java:33-37: (F+1)/(n*(tfn+1)) with F = cf+1 and
    n = df+1 (longs) — the whole expression evaluates in float after
    Java's numeric promotion."""
    num = np.float32(np.float64(cf) + 2.0)
    den = (np.float32(np.float64(df) + 1.0)
           * (tfn + np.float32(1.0))).astype(np.float32)
    return (num / den).astype(np.float32)


# --- DFR composition --------------------------------------------------

def score_dfr(
    tf: np.ndarray, norm_bytes: np.ndarray, df: int, cf: int,
    num_docs: int, field_tokens: int, avg_len: np.float32,
    basic_model: str = "in", after_effect: str = "l",
    normalization: str = "h2", c: float = 1.0, mu: float = 800.0,
    z: float = 0.30, boost: float = 1.0,
) -> np.ndarray:
    """Generic DFR leaf (DFRSimilarity.java:110-114): boost *
    basicModel(tfn) * afterEffect(tfn), f32 left-to-right products.
    basic_model in {be,d,g,if,in,ine,p}, after_effect in {b,l,none},
    normalization in {h1,h2,h3,z,none}.  At (in, l, h2) this is
    bitwise score_dfr_inl2."""
    tfn = compute_tfn(
        normalization, tf, norm_bytes, avg_len=avg_len, cf=cf,
        field_tokens=field_tokens, c=c, mu=mu, z=z,
    )
    bm_fn = BASIC_MODELS.get(basic_model.lower())
    if bm_fn is None:
        raise ValueError(f"unknown DFR basic model {basic_model!r}")
    bm = bm_fn(tfn, df if basic_model.lower() == "in" else cf, num_docs)
    a = after_effect.lower()
    if a == "l":
        ae = ae_l(tfn)
    elif a == "b":
        ae = ae_b(tfn, df, cf)
    elif a in ("no", "none"):
        ae = np.ones_like(tfn, np.float32)
    else:
        raise ValueError(f"unknown DFR after effect {after_effect!r}")
    return ((np.float32(boost) * bm).astype(np.float32)
            * ae).astype(np.float32)


# --- IB distributions / lambdas ---------------------------------------

def lambda_ttf(cf: int, num_docs: int) -> np.float32:
    """LambdaTTF.lambda (LambdaTTF.java:32-34): (totalTermFreq + 1F) /
    (numberOfDocuments + 1F)."""
    return np.float32(
        np.float32(np.float64(cf) + 1.0)
        / np.float32(np.float64(num_docs) + 1.0)
    )


def dist_ll(tfn: np.ndarray, lam: np.float32) -> np.ndarray:
    """DistributionLL.java:30-32: (float)-log(lambda/(tfn+lambda)) —
    the inner ratio is a float division, log runs in double."""
    ratio32 = (lam / (tfn + lam).astype(np.float32)).astype(np.float32)
    return (-np.log(ratio32.astype(np.float64))).astype(np.float32)


def score_ib(
    tf: np.ndarray, norm_bytes: np.ndarray, df: int, cf: int,
    num_docs: int, field_tokens: int, avg_len: np.float32,
    distribution: str = "spl", lam_kind: str = "df",
    normalization: str = "h2", c: float = 1.0, mu: float = 800.0,
    z: float = 0.30, boost: float = 1.0,
) -> np.ndarray:
    """Generic IB leaf (IBSimilarity.java:98-104): boost *
    distribution(tfn, lambda).  distribution in {ll, spl}, lam_kind in
    {df, ttf}, normalization as in score_dfr.  At (spl, df, h2) this
    is bitwise score_ib_spl."""
    lk = lam_kind.lower()
    if lk == "df":
        lam = lambda_df(df, num_docs)
    elif lk == "ttf":
        lam = lambda_ttf(cf, num_docs)
    else:
        raise ValueError(f"unknown IB lambda {lam_kind!r}")
    tfn = compute_tfn(
        normalization, tf, norm_bytes, avg_len=avg_len, cf=cf,
        field_tokens=field_tokens, c=c, mu=mu, z=z,
    )
    d = distribution.lower()
    if d == "ll":
        s = dist_ll(tfn, lam)
    elif d == "spl":
        if lam == np.float32(1.0):
            lam = np.float32(0.99)
        e = (tfn / (tfn + np.float32(1.0))).astype(np.float32)
        lam64 = np.float64(lam)
        num = np.power(lam64, e.astype(np.float64)) - lam64
        s = (-np.log(num / (1.0 - lam64))).astype(np.float32)
    else:
        raise ValueError(f"unknown IB distribution {distribution!r}")
    return (np.float32(boost) * s).astype(np.float32)
