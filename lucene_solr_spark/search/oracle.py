"""Brute-force pure-pandas/numpy BM25 oracle (dueling reference).

Independent of the engine's kernels on purpose (the cross-implementation
dueling strategy of the reference's test framework,
test-framework/.../index/RandomIndexWriter.java / SURVEY.md §5): formulas
are written out inline here, with the same float32/float64 discipline as
BM25Similarity.java, but with NO blocks, NO pruning, NO Spark. Tests
require the engine's top-k to match this oracle exactly (docIDs and
bitwise float32 scores).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from lucene_solr_spark.analysis.analyzers import ANALYZERS


def _float_to_byte315_scalar(f: float) -> int:
    bits = np.float32(f).view(np.int32)
    smallfloat = int(bits) >> 21
    if smallfloat <= (63 - 15) << 3:
        return 0 if bits <= 0 else 1
    if smallfloat >= ((63 - 15) << 3) + 0x100:
        return 255
    return smallfloat - ((63 - 15) << 3)


def _byte315_to_float_scalar(b: int) -> float:
    if b == 0:
        return 0.0
    bits = np.int32((b << 21) + ((63 - 15) << 24))
    return float(bits.view(np.float32))


@dataclass
class OracleIndex:
    doc_ids: np.ndarray          # canonical global ids, ascending
    keys: np.ndarray
    postings: dict[str, tuple[np.ndarray, np.ndarray]]  # term -> (doc idx, tf)
    doc_len: np.ndarray
    norm_byte: np.ndarray
    max_doc: int
    sum_ttf: int

    @property
    def avgdl(self) -> np.float32:
        if self.sum_ttf <= 0:
            return np.float32(1.0)
        return np.float32(self.sum_ttf / float(self.max_doc))

    def cache(self) -> np.ndarray:
        k1 = np.float32(1.2)
        b = np.float32(0.75)
        out = np.empty(256, np.float32)
        for i in range(256):
            d = np.float32(_byte315_to_float_scalar(i))
            decoded = np.float32(1.0) / (d * d) if d != 0 else np.float32("inf")
            out[i] = k1 * ((np.float32(1.0) - b) + b * decoded / self.avgdl)
        return out

    def idf(self, term: str) -> np.float32:
        df = len(self.postings.get(term, ((), ()))[0])
        return np.float32(
            math.log(1 + (self.max_doc - df + 0.5) / (df + 0.5))
        )


def build_oracle_index(
    keys: np.ndarray, texts: pd.Series, doc_ids: np.ndarray, analyzer: str = "standard"
) -> OracleIndex:
    """doc_ids must be the engine's canonical assignment (ascending order
    here == global scoring order)."""
    order = np.argsort(doc_ids, kind="stable")
    keys = np.asarray(keys)[order]
    doc_ids = np.asarray(doc_ids)[order]
    texts = texts.iloc[order].reset_index(drop=True)
    token_lists = ANALYZERS[analyzer](texts)
    doc_len = token_lists.str.len().to_numpy(np.int64)
    postings: dict[str, dict[int, int]] = {}
    for i, toks in enumerate(token_lists):
        for t in toks:
            postings.setdefault(t, {})
            postings[t][i] = postings[t].get(i, 0) + 1
    packed = {
        t: (
            np.array(sorted(m.keys()), np.int64),
            np.array([m[d] for d in sorted(m.keys())], np.int64),
        )
        for t, m in postings.items()
    }
    norm_byte = np.array(
        [
            _float_to_byte315_scalar(1.0 / np.float32(math.sqrt(dl))) if dl > 0 else 0
            for dl in doc_len
        ],
        np.uint8,
    )
    return OracleIndex(
        doc_ids=doc_ids,
        keys=keys,
        postings=packed,
        doc_len=doc_len,
        norm_byte=norm_byte,
        max_doc=len(doc_ids),
        sum_ttf=int(doc_len.sum()),
    )


def _term_scores(ix: OracleIndex, term: str, cache: np.ndarray):
    docs, tfs = ix.postings.get(term, (np.empty(0, np.int64), np.empty(0, np.int64)))
    idf = ix.idf(term)
    weight_value = idf * np.float32(2.2)  # idf * (k1 + 1), k1=1.2f
    c = cache[ix.norm_byte[docs]]
    tf32 = tfs.astype(np.float32)
    scores = (weight_value * tf32) / (tf32 + c)
    return docs, scores.astype(np.float32)


def oracle_topk(
    ix: OracleIndex, kind: str, terms: list[str], k: int,
    must_not: list[str] | None = None, min_should_match: int = 1, tie: float = 0.0,
) -> list[tuple[int, np.float32]]:
    """Returns [(doc_id, score_f32)] ordered score desc, doc asc."""
    cache = ix.cache()
    per = {t: _term_scores(ix, t, cache) for t in terms}

    if kind == "term":
        docs, scores = per[terms[0]]
        cand = dict(zip(docs.tolist(), scores.tolist()))
    elif kind == "and" or kind == "not":
        sets = [set(per[t][0].tolist()) for t in terms]
        inter = set.intersection(*sets) if sets else set()
        if kind == "not":
            for t in must_not or []:
                d, _ = _term_scores(ix, t, cache)
                inter -= set(d.tolist())
        cand = {}
        for d in inter:
            acc = 0.0  # double accumulation (ConjunctionScorer)
            for t in terms:
                docs, scores = per[t]
                acc += float(scores[np.searchsorted(docs, d)])
            cand[d] = np.float32(acc)
    elif kind in ("or", "dismax"):
        cand_map: dict[int, list[np.float32]] = {}
        for t in terms:
            docs, scores = per[t]
            for d, s in zip(docs.tolist(), scores.tolist()):
                cand_map.setdefault(d, []).append(np.float32(s))
        cand = {}
        for d, subs in cand_map.items():
            if len(subs) < min_should_match:
                continue
            if kind == "or":
                cand[d] = np.float32(sum(float(s) for s in subs))
            else:
                mx = np.float32(max(subs))
                sm = np.float32(0.0)
                for s in subs:
                    sm = np.float32(sm + s)
                cand[d] = np.float32(mx + (sm - mx) * np.float32(tie))
    else:
        raise ValueError(kind)

    ordered = sorted(cand.items(), key=lambda kv: (-float(kv[1]), kv[0]))
    return [(ix.doc_ids[d], s) for d, s in ordered[:k]]
