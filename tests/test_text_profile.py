"""TextProfileSignature parity vs a direct transcription of the
reference algorithm (update/processor/TextProfileSignature.java:70-138)
plus the dup-group semantics of SignatureUpdateProcessorFactory."""

from __future__ import annotations

import hashlib

import pytest

from lucene_solr_spark.ops.dedup import (
    text_profile_dup_groups,
    text_profile_signature,
)


def _ref_signature(text: str, quant_rate=0.01, min_token_len=2) -> str:
    """Line-by-line port of the reference's add() for the TEST ONLY,
    with the deterministic (cnt desc, tok asc) tie order the engine
    documents as its deviation."""
    tokens: dict[str, int] = {}
    cur = []
    max_freq = 0

    def flush():
        nonlocal max_freq
        if len(cur) > min_token_len:
            s = "".join(cur)
            tokens[s] = tokens.get(s, 0) + 1
            max_freq = max(max_freq, tokens[s])
        cur.clear()

    for c in text:
        if c.isalnum():
            cur.append(c.lower())
        else:
            flush()
    flush()
    quant = round(max_freq * quant_rate)
    if quant < 2:
        quant = 2 if max_freq > 1 else 1
    profile = []
    for tok, cnt in tokens.items():
        cnt = (cnt // quant) * quant
        if cnt < quant:
            continue
        profile.append((cnt, tok))
    profile.sort(key=lambda t: (-t[0], t[1]))
    joined = "\n".join(f"{tok} {cnt}" for cnt, tok in profile)
    return hashlib.md5(joined.encode()).hexdigest()


TEXTS = [
    "",
    "a bb ccc",  # len > 2 strictly: only 'ccc' survives
    "hello world hello world hello punctuation, here!",
    "The QUICK quick Brown-Fox fox fox 123 4567 4567",
    ("repeat token " * 120) + "rare",
    "unicode Ärger Ärger strasse 42a 42a 42a",
]


def test_signature_matches_reference_port(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.signature
        for r in text_profile_signature(df).collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == _ref_signature(t), (i, t)


def test_min_token_len_is_strict(spark):
    # 'abc' has length 3 > 2 -> counted; 'ab' dropped
    df = spark.createDataFrame([(0, "ab ab ab abc")], "doc_id long, text string")
    sig = text_profile_signature(df).collect()[0].signature
    assert sig == hashlib.md5(b"abc 1").hexdigest()


def test_near_duplicates_collapse(spark):
    base = ("common words appear often here " * 80).strip()
    df = spark.createDataFrame(
        [
            (0, base + " rareone"),
            (1, base + " raretwo"),
            (2, "completely different text that shares nothing at all"),
        ],
        "doc_id long, text string",
    )
    groups = text_profile_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2 and groups[0].keep_id == 0


def test_exact_duplicates_always_collapse(spark):
    df = spark.createDataFrame(
        [(0, "same text here"), (1, "same text here")],
        "doc_id long, text string",
    )
    g = text_profile_dup_groups(df).collect()
    assert len(g) == 1 and g[0].n_docs == 2
