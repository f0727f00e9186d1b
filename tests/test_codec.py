"""Block codec round-trip property tests (BasePostingsFormatTestCase /
RandomPostingsTester analog — SURVEY.md §5)."""

import numpy as np
import pytest

from lucene_solr_spark import BLOCK_SIZE
from lucene_solr_spark.index.codec import (
    decode_blocks,
    decode_posting_list,
    encode_posting_lists,
    vbyte_decode,
    vbyte_encode,
)


@pytest.mark.parametrize("seed", range(5))
def test_vbyte_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2**62, size=rng.integers(1, 5000), dtype=np.uint64)
    enc, nb = vbyte_encode(vals)
    assert int(nb.sum()) == len(enc)
    dec = vbyte_decode(enc, len(vals))
    assert (dec == vals).all()


def test_vbyte_edge_values():
    vals = np.array([0, 1, 127, 128, 2**14 - 1, 2**14, 2**35, 2**62], np.uint64)
    enc, _ = vbyte_encode(vals)
    assert (vbyte_decode(enc, len(vals)) == vals).all()
    # single-byte encoding for < 128
    e1, _ = vbyte_encode(np.array([5], np.uint64))
    assert len(e1) == 1


@pytest.mark.parametrize("seed", range(8))
def test_posting_lists_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n_terms = int(rng.integers(1, 40))
    lens = rng.integers(1, 600, n_terms)
    docs_per_term = [
        np.sort(rng.choice(10**6, size=L, replace=False)) for L in lens
    ]
    doc_ids = np.concatenate(docs_per_term)
    tfs = rng.integers(1, 500, len(doc_ids))
    norms = rng.integers(1, 256, len(doc_ids))
    enc = encode_posting_lists(lens, doc_ids, tfs, norms)
    off = 0
    for i, L in enumerate(lens):
        d, t = decode_posting_list(enc["doc_enc"][i], enc["tf_enc"][i], int(L))
        assert (d == docs_per_term[i]).all()
        assert (t == tfs[off : off + L]).all()
        bl = enc["block_last"][i]
        assert len(bl) == (L + BLOCK_SIZE - 1) // BLOCK_SIZE
        assert bl[-1] == docs_per_term[i][-1]
        # block maxima
        for b in range(len(bl)):
            s, e = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, L)
            assert enc["block_max_tf"][i][b] == tfs[off + s : off + e].max()
            assert enc["block_max_norm"][i][b] == norms[off + s : off + e].max()
        off += L


@pytest.mark.parametrize("seed", range(4))
def test_block_skip_decode(seed):
    """advance()-style selective decode (Lucene50PostingsReader.java:395-435)."""
    rng = np.random.default_rng(100 + seed)
    L = int(rng.integers(1, 2000))
    docs = np.sort(rng.choice(10**7, size=L, replace=False))
    tfs = rng.integers(1, 50, L)
    norms = rng.integers(1, 256, L)
    enc = encode_posting_lists(np.array([L]), docs, tfs, norms)
    nb = len(enc["block_last"][0])
    sel = np.sort(rng.choice(nb, size=int(rng.integers(1, nb + 1)), replace=False))
    d, t = decode_blocks(
        enc["doc_enc"][0], enc["tf_enc"][0], sel,
        enc["block_last"][0], enc["block_doc_off"][0], enc["block_tf_off"][0], L,
    )
    exp_d = np.concatenate([docs[b * 128 : (b + 1) * 128] for b in sel])
    exp_t = np.concatenate([tfs[b * 128 : (b + 1) * 128] for b in sel])
    assert (d == exp_d).all()
    assert (t == exp_t).all()
