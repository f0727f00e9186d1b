"""RandomPostingsTester analog (test-framework/.../index/
BasePostingsFormatTestCase.java + RandomPostingsTester): property-based
round-trip and random-advance verification of both block codecs, and
SmallFloat quantization invariants — hypothesis with fixed seeds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark import BLOCK_SIZE
from lucene_solr_spark.functions.smallfloat import (
    byte315_to_float,
    encode_norm,
    float_to_byte315,
)
from lucene_solr_spark.index.codec import (
    decode_blocks,
    decode_posting_list,
    encode_posting_lists,
    vbyte_decode,
    vbyte_encode,
)


@st.composite
def posting_lists(draw):
    """Random (doc_ids sorted unique, tfs, norms) like RandomPostingsTester."""
    n = draw(st.integers(1, 700))
    max_doc = draw(st.integers(n, 500_000))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    docs = np.sort(rng.choice(max_doc, size=n, replace=False)).astype(np.int64)
    tfs = rng.randint(1, draw(st.integers(2, 300)), size=n).astype(np.int64)
    norms = rng.randint(0, 256, size=n).astype(np.int64)
    return docs, tfs, norms


@settings(max_examples=40, deadline=None)
@given(posting_lists(), st.sampled_from(["vbyte", "for"]))
def test_single_list_roundtrip(pl, codec):
    docs, tfs, norms = pl
    enc = encode_posting_lists(
        np.array([len(docs)], np.int64), docs, tfs, norms, codec=codec
    )
    d, t = decode_posting_list(
        enc["doc_enc"][0], enc["tf_enc"][0], len(docs), codec=codec
    )
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    # skip-entry invariants (CheckIndex analog)
    bl = np.asarray(enc["block_last"][0], np.int64)
    assert bl[-1] == docs[-1]
    assert (np.diff(bl) > 0).all()
    assert len(bl) == (len(docs) + BLOCK_SIZE - 1) // BLOCK_SIZE


@settings(max_examples=25, deadline=None)
@given(posting_lists(), st.sampled_from(["vbyte", "for"]),
       st.integers(0, 2**31 - 1))
def test_random_advance_block_decode(pl, codec, seed):
    """Random advance() targets: decoding exactly the blocks that can
    contain each target must reproduce the full-list slice — the
    PostingsEnum.advance contract over the skip entries."""
    docs, tfs, norms = pl
    enc = encode_posting_lists(
        np.array([len(docs)], np.int64), docs, tfs, norms, codec=codec
    )
    bl = np.asarray(enc["block_last"][0], np.int64)
    rng = np.random.RandomState(seed)
    targets = np.sort(
        rng.randint(0, int(docs[-1]) + 2, size=min(10, len(docs)))
    ).astype(np.int64)
    bids = np.unique(np.searchsorted(bl, targets))
    bids = bids[bids < len(bl)]
    if len(bids) == 0:
        return
    d, t = decode_blocks(
        enc["doc_enc"][0], enc["tf_enc"][0], bids, bl,
        np.asarray(enc["block_doc_off"][0], np.int64),
        np.asarray(enc["block_tf_off"][0], np.int64),
        len(docs), codec=codec,
    )
    exp_d = np.concatenate([
        docs[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE] for b in bids
    ])
    assert np.array_equal(d, exp_d)
    # every target <= last doc is covered by the decoded blocks
    for tgt in targets[targets <= docs[-1]]:
        nxt = docs[np.searchsorted(docs, tgt)]
        assert nxt in d


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**48), min_size=1, max_size=300))
def test_vbyte_roundtrip(vals):
    v = np.array(vals, np.uint64)
    buf, _nb = vbyte_encode(v)
    assert np.array_equal(vbyte_decode(buf.tobytes(), len(v)), v)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 100_000))
def test_smallfloat_monotone_and_stable(doc_len):
    """floatToByte315 is a monotone quantizer and decode∘encode is a
    fixpoint (SmallFloat.java contract)."""
    b = encode_norm(np.array([doc_len], np.int64))[0]
    assert 1 <= b <= 255
    # longer docs never get a LARGER norm byte
    b2 = encode_norm(np.array([doc_len + 1], np.int64))[0]
    assert b2 <= b
    # re-encoding the decoded value is stable
    f = byte315_to_float(np.array([b], np.uint8))
    assert float_to_byte315(f)[0] == b
