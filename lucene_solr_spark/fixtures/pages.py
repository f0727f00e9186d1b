"""Deterministic Common-Crawl-style `pages` generator (FIXTURES.md §1).

Produces the exact BASELINE.json input_hint shape:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

- Fully deterministic per row index i (seed folded into i), independent
  of partitioning and cluster size — generation runs as mapInPandas
  over spark.range(n), so the same (url, html) pair is produced whether
  the job runs on 1 or 1000 executors.
- `text` = pinned extractor applied to `html` (analysis/html.py), so
  the byte-identity invariant is checkable per row.
- Body text deliberately exercises the analyzer edge cases: the 33
  English stopwords, mixed case, numbers, hyphenated and apostrophe
  words, an occasional >255-char token, accented Latin terms
  (FIXTURES.md; StandardTokenizer.java:155-177 max-length skip).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from lucene_solr_spark.analysis.html import extract_text_series

SEED = 42
N_SITES = 20

_BASE_VOCAB = (
    "table scan spark window vector customer key order sort merge batch "
    "stream hash join filter group agg row column value query line part "
    "big small fast slow data dup index shard segment term norm score "
    "crawl page fetch parse render cache proxy robot sitemap anchor"
).split()
_STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with"
).split()
_SPECIALS = [
    "O'Neil's",
    "state-of-the-art",
    "Mixed-Case",
    "café",
    "naïve",
    "résumé",
    "42",
    "2024",
    "3.14159",
    "UPPERCASE",
    "CamelCase",
]
_LANGS = ["en", "de", "fr", "es"]
_LANG_P = [0.9, 0.04, 0.03, 0.03]

_SYLLABLES = (
    "ba be bi bo bu ca ce ci co cu da de di do du fa fe fi fo fu ga ge gi "
    "go gu ka ke ki ko ku la le li lo lu ma me mi mo mu na ne ni no nu pa "
    "pe pi po pu ra re ri ro ru sa se si so su ta te ti to tu va ve vi vo "
    "vu za ze zi zo zu"
).split()


def _tail_word(i: int) -> str:
    """Deterministic synthetic word #i (3-4 syllables, ~30k distinct)."""
    s = _SYLLABLES
    n = len(s)
    parts = [s[i % n], s[(i // n) % n], s[(i // (n * n)) % n]]
    if i % 7 == 0:
        parts.append(s[(i * 31) % n])
    return "".join(parts)


N_TAIL_WORDS = 30_000

# Vocabulary ordered by Zipf rank: stopwords most frequent (as in real
# English web text), then content words, specials mid-rank, then a
# 30k-word long tail — so segments see realistic term-dictionary sizes.
_VOCAB = (
    _STOPWORDS
    + _BASE_VOCAB
    + _SPECIALS
    + [_tail_word(i) for i in range(N_TAIL_WORDS)]
)
_RANKS = np.arange(1, len(_VOCAB) + 1, dtype=np.float64)
_ZIPF_W = 1.0 / _RANKS
_ZIPF_CDF = np.cumsum(_ZIPF_W / _ZIPF_W.sum())
_VOCAB_ARR = np.array(_VOCAB, dtype=object)


def _row_rng(i: int) -> np.random.RandomState:
    return np.random.RandomState((SEED * 1_000_003 + i) % (2**31 - 1))


def _make_row(i: int) -> tuple[str, int, bytes]:
    rng = _row_rng(i)
    url = f"https://site{i % N_SITES}.example/p/{i}"
    ts = 1_704_067_200 + i  # 2024-01-01T00:00:00Z + i seconds
    n_tokens = max(5, int(rng.lognormal(np.log(120.0), 0.8)))
    # Zipf sampling via inverse-CDF (O(n log V) per row, vocab-size free)
    draws = np.searchsorted(_ZIPF_CDF, rng.random_sample(n_tokens), side="right")
    words = list(_VOCAB_ARR[np.minimum(draws, len(_VOCAB) - 1)])
    if rng.rand() < 0.02:  # >255-char token (max-token-length skip case)
        words.insert(int(rng.randint(0, len(words))), "x" * 300)
    title = " ".join(words[: min(6, len(words))])
    mid = len(words) // 2
    p1, p2 = " ".join(words[:mid]), " ".join(words[mid:])
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>body {{ color: red }}</style></head>"
        f"<body><!-- generated page {i} --><p>{p1}</p>"
        f"<script>var x = {i};</script>"
        f"<p>{p2} &amp; more</p></body></html>"
    )
    return url, ts, html.encode("utf-8")


def _lang_for(i: int) -> str:
    rng = np.random.RandomState((SEED * 7_777_777 + i) % (2**31 - 1))
    return _LANGS[int(rng.choice(len(_LANGS), p=_LANG_P))]


def pages_pandas(indices: np.ndarray) -> pd.DataFrame:
    """Deterministic pages rows for the given row indices."""
    urls, tss, htmls, langs = [], [], [], []
    for i in indices:
        u, t, h = _make_row(int(i))
        urls.append(u)
        tss.append(t)
        htmls.append(h)
        langs.append(_lang_for(int(i)))
    html_s = pd.Series(htmls, dtype=object)
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(pd.Series(tss, dtype="int64"), unit="s"),
            "html": html_s,
            "text": extract_text_series(html_s),
            "lang": langs,
        }
    )


def generate_pages(spark, n: int, partitions: int = 16):
    """Distributed deterministic generation: same rows at any
    parallelism (per-index seeding; mapInPandas, no shuffle)."""
    from lucene_solr_spark.session import ensure_on_workers

    ensure_on_workers(spark)  # the gen closure imports this package

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pages_pandas(pdf["id"].to_numpy())

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, "url string, warc_ts timestamp, html binary, text string, lang string")
    )
