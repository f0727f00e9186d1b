"""DuckDB oracle SQL for the training-data ops (driver contract).

Each SQL string reproduces the corresponding Spark plan bit-for-bit:
portable hashes (ops/hashing.py), element-ordered double folds for
vector math, and identical rounding/tie-breaks. Tokenization is the
same whitespace split on both sides."""

from __future__ import annotations

from lucene_solr_spark.analysis.analyzers import ENGLISH_STOP_WORDS
from lucene_solr_spark.ops.hashing import (
    MERSENNE_P,
    minhash_perms_values_sql,
)
from lucene_solr_spark.ops.textstats import LANG_MARKERS, ROLL_MOD

# shared CTEs: whitespace tokens with positions, 3-gram shingles
_SHINGLE_CTES = """
tkarr AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS arr FROM documents
),
tk AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos FROM tkarr
),
sh AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS s
  FROM tk a
  JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tk c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
),
shsz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
"""

_JACCARD_SELECT = """
SELECT id_a, id_b, round(i::DOUBLE / (za.sz + zb.sz - i), 6) AS jaccard
FROM inter
JOIN shsz za ON za.doc_id = id_a
JOIN shsz zb ON zb.doc_id = id_b
WHERE round(i::DOUBLE / (za.sz + zb.sz - i), 6) >= 0.5
ORDER BY id_a, id_b
"""


def exact_dedup_sql() -> str:
    return """
WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
g AS (SELECT fp, count(*) AS copies FROM fp GROUP BY fp)
SELECT sum(copies)::BIGINT AS n_docs, count(*)::BIGINT AS n_distinct,
       (sum(copies) - count(*))::BIGINT AS n_dup_docs
FROM g"""


def ngram_jaccard_sql() -> str:
    return f"""
WITH {_SHINGLE_CTES},
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
{_JACCARD_SELECT}"""


def minhash_lsh_sql() -> str:
    return f"""
WITH {_SHINGLE_CTES},
hs AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % {MERSENNE_P} AS hp
  FROM sh
),
mh AS (
  SELECT doc_id, p.i, min((p.a * hp + p.b) % {MERSENNE_P}) AS m
  FROM hs, {minhash_perms_values_sql()}
  GROUP BY doc_id, p.i
),
band AS (
  SELECT doc_id, i // 4 AS band,
         md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bsig
  FROM mh GROUP BY doc_id, i // 4
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM band x
  JOIN band y ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.id_a
  JOIN sh y ON y.doc_id = c.id_b AND y.s = x.s
  GROUP BY 1, 2
)
{_JACCARD_SELECT}"""


_SIMHASH_TF_CTE = """
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
        FROM documents)
  WHERE term <> '' GROUP BY 1, 2
)"""


def _simhash_cte() -> str:
    """64-bit fingerprint as two 32-bit words: lo bits from md5 hex
    chars 1-8, hi bits from chars 9-16 (dedup.simhash_docs)."""
    sums_lo = ",\n         ".join(
        f"sum(CASE WHEN (hlo // {1 << j}) % 2 = 1 THEN tf ELSE -tf END) AS l{j}"
        for j in range(32)
    )
    sums_hi = ",\n         ".join(
        f"sum(CASE WHEN (hhi // {1 << j}) % 2 = 1 THEN tf ELSE -tf END) AS h{j}"
        for j in range(32)
    )
    lo_terms = " + ".join(
        f"(CASE WHEN l{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32)
    )
    hi_terms = " + ".join(
        f"(CASE WHEN h{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32)
    )
    return f"""
{_SIMHASH_TF_CTE},
hh AS (
  SELECT doc_id, tf,
         CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) AS hlo,
         CAST('0x' || substr(md5(term), 9, 8) AS BIGINT) AS hhi
  FROM tf
),
bs AS (
  SELECT doc_id, {sums_lo},
         {sums_hi}
  FROM hh GROUP BY doc_id
),
sim AS (
  SELECT doc_id, CAST({hi_terms} AS BIGINT) AS simhash_hi,
         CAST({lo_terms} AS BIGINT) AS simhash_lo FROM bs
)"""


def _simhash32_cte() -> str:
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN tf ELSE -tf END) AS b{j}"
        for j in range(32)
    )
    bit_terms = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32)
    )
    return f"""
{_SIMHASH_TF_CTE},
hh AS (
  SELECT doc_id, tf, CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) AS h FROM tf
),
bs AS (
  SELECT doc_id, {bit_sums}
  FROM hh GROUP BY doc_id
),
sim AS (
  SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM bs
)"""


def simhash_docs_sql(limit: int | None = None) -> str:
    lim = f" LIMIT {limit}" if limit else ""
    return (
        f"WITH {_simhash_cte()} SELECT doc_id, simhash_hi, simhash_lo "
        f"FROM sim ORDER BY doc_id{lim}"
    )


def simhash_docs32_sql(limit: int | None = None) -> str:
    lim = f" LIMIT {limit}" if limit else ""
    return (
        f"WITH {_simhash32_cte()} SELECT doc_id, simhash FROM sim "
        f"ORDER BY doc_id{lim}"
    )


def simhash_pairs_sql(max_hamming: int = 2) -> str:
    ham = (
        "bit_count(xor(a.simhash_hi, b.simhash_hi)) + "
        "bit_count(xor(a.simhash_lo, b.simhash_lo))"
    )
    return f"""
WITH {_simhash_cte()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b, ({ham})::BIGINT AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE {ham} <= {max_hamming}
ORDER BY id_a, id_b"""


# element-ordered fold helpers for vector math (match Spark F.aggregate)
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))), (x, y) -> x + y))"
    )


def embedding_topk_pairs_sql(k: int = 20) -> str:
    dot = _dot_sql("a.embedding", "b.embedding")
    na = _norm_sql("a.embedding")
    nb = _norm_sql("b.embedding")
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({dot} / ({na} * {nb}), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY cos DESC, id_a, id_b LIMIT {k}"""


def _ann_select(vec_id: int) -> str:
    dot = _dot_sql("e.embedding", "q.qe")
    ne = _norm_sql("e.embedding")
    nq = _norm_sql("q.qe")
    return f"""
SELECT e.vec_id, round({dot} / ({ne} * {nq}), 6) AS cos
FROM embeddings e, (SELECT embedding AS qe FROM embeddings WHERE vec_id = {vec_id}) q
WHERE e.vec_id <> {vec_id}"""


def ann_brute_sql(vec_id: int = 0, k: int = 10) -> str:
    return f"{_ann_select(vec_id)} ORDER BY cos DESC, vec_id LIMIT {k}"


def _bucket_sql(col: str, dim: int = 64) -> str:
    """LSH bucket code of `col` with the engine's frozen hyperplanes
    (similarity._hyperplanes — seeded, deterministic; testdata
    embeddings are 64-d). Dot products are the same element-ordered
    double folds as the Spark side, so bucket assignment matches
    bit-for-bit."""
    from lucene_solr_spark.ops.similarity import _hyperplanes

    planes = _hyperplanes(dim)
    terms = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN {_dot_sql(col, lit)} > 0 THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(terms)


def _oracle_adaptive_n_centroids() -> int:
    """Mirror of similarity.adaptive_n_centroids over the oracle sf's
    embeddings table, so oracle defaults track the engine defaults."""
    import os

    import duckdb

    from lucene_solr_spark.ops.similarity import adaptive_n_centroids

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    path = os.path.join(sf, "embeddings.parquet")
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{path}')"
    ).fetchone()[0]
    return adaptive_n_centroids(int(n))


def _kmeans_cents_values(n_centroids: int) -> str:
    """Train the SAME deterministic spherical k-means as the Spark side
    (similarity.kmeans_centroids over the frozen vec_id % MOD sample,
    vec_id asc) by reading the driver's sf parquet directly, and inline
    the resulting centroids as literal VALUES rows. Literal text is
    repr(float) on both sides, so both engines parse identical doubles
    and cell assignment matches bit-for-bit."""
    import os

    import duckdb

    from lucene_solr_spark.ops.similarity import (
        KMEANS_SAMPLE_MOD,
        kmeans_centroids,
    )

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    path = os.path.join(sf, "embeddings.parquet")
    from lucene_solr_spark.ops.similarity import KMEANS_MAX_SAMPLE

    rows = duckdb.connect().execute(
        f"SELECT embedding FROM read_parquet('{path}') "
        f"WHERE vec_id % {KMEANS_SAMPLE_MOD} = 0 ORDER BY vec_id "
        f"LIMIT {KMEANS_MAX_SAMPLE}"
    ).fetchall()
    import numpy as np

    vecs = np.array([[float(x) for x in r[0]] for r in rows], np.float64)
    cents = kmeans_centroids(vecs, n_centroids)
    vals = []
    for i, c in enumerate(cents):
        lits = ", ".join(repr(float(v)) for v in c)
        vals.append(f"({i}, CAST([{lits}] AS DOUBLE[]))")
    return ", ".join(vals)


def ann_ivf_sql(
    vec_id: int = 0, k: int = 10, n_probe: int | None = None,
    n_centroids: int | None = None,
) -> str:
    """Centroid IVF (similarity.ivf_topk), reproduced exactly: coarse
    cells = k-means centroids (trained identically on both sides and
    inlined as literals — see _kmeans_cents_values), assignment by
    cosine (ties -> smaller cid), probe the n_probe cells nearest the
    query, exact cosine re-rank inside. n_centroids=None mirrors the
    engine's adaptive max(16, isqrt(N)) default, and n_probe=None its
    quarter-of-the-cells probe width."""
    from lucene_solr_spark.ops.similarity import adaptive_n_probe

    if n_centroids is None:
        n_centroids = _oracle_adaptive_n_centroids()
    if n_probe is None:
        n_probe = adaptive_n_probe(n_centroids)
    dotec = _dot_sql("e.embedding", "c.ce")
    nec = _norm_sql("c.ce")
    dotqc = _dot_sql("q.qe", "c.ce")
    return f"""
WITH cents AS (
  SELECT * FROM (VALUES {_kmeans_cents_values(n_centroids)}) AS t(cid, ce)
),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {dotec} / {nec} DESC, c.cid) AS rn
  FROM embeddings e, cents c
),
b AS (SELECT vec_id, embedding, cid AS bucket FROM scored WHERE rn = 1),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {vec_id}),
probes AS (
  SELECT c.cid FROM cents c, q
  ORDER BY {dotqc} / {nec} DESC, c.cid LIMIT {n_probe}
),
cand AS (SELECT b.vec_id, b.embedding FROM b JOIN probes ON b.bucket = probes.cid)
SELECT cand.vec_id,
  round({_dot_sql("cand.embedding", "q.qe")}
        / ({_norm_sql("cand.embedding")} * {_norm_sql("q.qe")}), 6) AS cos
FROM cand, q WHERE cand.vec_id <> {vec_id}
ORDER BY cos DESC, vec_id LIMIT {k}"""


def embedding_topk_pairs_lsh_sql(k: int = 20, probe_hamming: int = 2) -> str:
    """Multi-probe LSH pair ranking (dedup.embedding_topk_pairs_lsh):
    the Spark side reaches radius-`probe_hamming` pairs through an
    equi-join on 1-bit-perturbed codes; the oracle states the same pair
    set directly as a code-Hamming predicate."""
    dot = _dot_sql("a.embedding", "b.embedding")
    na = _norm_sql("a.embedding")
    nb = _norm_sql("b.embedding")
    return f"""
WITH bk AS (
  SELECT e.vec_id, e.embedding, {_bucket_sql("e.embedding")} AS code
  FROM embeddings e
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({dot} / ({na} * {nb}), 6) AS cos
FROM bk a JOIN bk b
  ON bit_count(xor(a.code, b.code)) <= {probe_hamming}
  AND a.vec_id < b.vec_id
ORDER BY cos DESC, id_a, id_b LIMIT {k}"""


def knn_vote_sql(vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH nn AS ({_ann_select(vec_id)} ORDER BY cos DESC, vec_id LIMIT {k})
SELECT label AS pred_label, count(*)::BIGINT AS votes
FROM nn JOIN embeddings USING (vec_id)
GROUP BY label ORDER BY votes DESC, label LIMIT 1"""


def token_counts_sql() -> str:
    return """
SELECT lang, count(*)::BIGINT AS n_docs,
  sum(len(list_filter(string_split_regex(trim(text), ' +'), t -> t <> '')))::BIGINT
    AS ws_tokens,
  sum(len(regexp_extract_all(text, '[a-z0-9]+')))::BIGINT AS bpe_tokens
FROM documents GROUP BY lang ORDER BY lang"""


def lang_id_sql() -> str:
    def cnt(lang: str) -> str:
        words = ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
        return (
            f"len(list_filter(string_split_regex(trim(text), ' +'), "
            f"t -> list_contains([{words}], t)))"
        )

    return f"""
WITH c AS (
  SELECT lang,
    regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS cjk,
    {cnt('en')} AS c_en, {cnt('de')} AS c_de,
    {cnt('es')} AS c_es, {cnt('fr')} AS c_fr
  FROM documents
),
p AS (
  SELECT lang,
    CASE WHEN cjk THEN 'zh'
         WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
         WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
         WHEN c_es >= c_fr THEN 'es'
         ELSE 'fr' END AS pred_lang
  FROM c
)
SELECT pred_lang, lang, count(*)::BIGINT AS cnt
FROM p GROUP BY 1, 2 ORDER BY pred_lang, lang"""


def quality_topk_sql(k: int = 20) -> str:
    stop = ",".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    return f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks
  FROM documents
),
f AS (
  SELECT doc_id,
    len(toks)::BIGINT AS n_tokens,
    len(list_filter(toks, x -> list_contains([{stop}], x)))::BIGINT AS n_stop,
    length(array_to_string(toks, ''))::BIGINT AS char_sum
  FROM t
),
q AS (
  SELECT doc_id, n_tokens, n_stop,
    round(CAST(char_sum AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE), 6)
      AS mean_token_len,
    round(
      0.4 * least(CAST(n_tokens AS DOUBLE), 200.0) / 200.0
      + 0.3 * (CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE))
      + 0.3 * least(CAST(char_sum AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE),
                    8.0) / 8.0,
      6) AS quality
  FROM f
)
SELECT doc_id, n_tokens, n_stop, mean_token_len, quality
FROM q ORDER BY quality DESC, doc_id LIMIT {k}"""


def fingerprints_sql() -> str:
    return f"""
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(
      string_split_regex(trim(text), ' +'))), ' ')) AS bag_fp,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split_regex(substr(text, 1, 64), ''),
                     x -> CAST(ascii(x) AS BIGINT))),
      (a, b) -> (a * 31 + b) % {ROLL_MOD}) AS roll_fp
FROM documents ORDER BY doc_id"""


def multimodal_len_sql() -> str:
    return """
SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
       length(text)::BIGINT AS n_chars
FROM documents ORDER BY doc_id"""


def dedup_clusters_sql() -> str:
    """Connected components over the minhash-LSH pair graph: recursive
    reachability, cluster_id = min reachable doc_id (incl. self)."""
    return f"""
WITH RECURSIVE pairs AS ({minhash_lsh_sql()}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
lab AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
)
SELECT doc_id, cluster_id::BIGINT AS cluster_id FROM lab ORDER BY doc_id"""


def dedup_representatives_sql() -> str:
    """Keep/drop decision table: every document, its cluster (singleton
    = itself), keep = doc is the cluster's min-id representative."""
    return f"""
WITH RECURSIVE pairs AS ({minhash_lsh_sql()}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
lab AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
)
SELECT d.doc_id,
       COALESCE(lab.cluster_id, d.doc_id)::BIGINT AS cluster_id,
       (COALESCE(lab.cluster_id, d.doc_id) = d.doc_id) AS keep
FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id
ORDER BY d.doc_id"""


def repetition_topk_sql(k: int = 20) -> str:
    """Oracle for textstats.repetition_topk: duplicate-token fraction
    and top-2-gram dominance (Gopher/C4 repetition rules)."""
    return f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, toks,
    len(toks)::BIGINT AS n,
    len(list_distinct(toks))::BIGINT AS ndist,
    CASE WHEN len(toks) >= 2 THEN
      list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i + 1])
    ELSE [] END AS grams
  FROM t
),
f AS (
  SELECT doc_id, n, n - ndist AS dup_tokens,
    round(CAST(n - ndist AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE), 6)
      AS dup_token_frac,
    greatest(n - 1, 0)::BIGINT AS n_2grams,
    CASE WHEN n >= 2 THEN
      list_max(list_transform(list_distinct(grams),
                              g -> len(list_filter(grams, y -> y = g))))
    ELSE 0 END::BIGINT AS top_2gram_count
  FROM s
)
SELECT doc_id, n AS n_tokens, dup_tokens, dup_token_frac, n_2grams,
       top_2gram_count
FROM f ORDER BY dup_token_frac DESC, doc_id LIMIT {k}"""


def contamination_sql(k: int = 25, mod: int = 97) -> str:
    """Oracle for textstats.contamination_flags with n=4 and the
    deterministic eval set doc_id % mod == 0: distinct corpus 4-grams
    matched against the eval set's distinct 4-gram pool."""
    return f"""
WITH tkarr AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS arr FROM documents
),
tk AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM tkarr
),
g4 AS (
  SELECT DISTINCT a.doc_id,
    a.term || ' ' || b.term || ' ' || c.term || ' ' || d.term AS gram
  FROM tk a
  JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tk c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
  JOIN tk d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
),
ev AS (SELECT DISTINCT gram FROM g4 WHERE doc_id % {mod} = 0),
m AS (
  SELECT g4.doc_id, count(*) AS matched
  FROM g4 JOIN ev USING (gram) GROUP BY g4.doc_id
)
SELECT d.doc_id,
  COALESCE(m.matched, 0)::BIGINT AS matched_ngrams,
  COALESCE(m.matched, 0) > 0 AS contaminated
FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
ORDER BY matched_ngrams DESC, d.doc_id LIMIT {k}"""


def line_dedup_sql(width: int = 10, k: int = 20) -> str:
    """Oracle for textstats.line_dedup_topk: fixed width-token chunk
    hashes counted corpus-wide; per-doc duplicated-chunk fraction."""
    from lucene_solr_spark.ops.hashing import h32_sql

    return f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 1 THEN
      list_transform(range(0, CAST((len(toks) + {width - 1}) // {width} AS INT)),
        i -> array_to_string(toks[i * {width} + 1 : i * {width} + {width}], ' '))
    ELSE [] END AS chunks
  FROM t
),
l AS (
  SELECT doc_id, {h32_sql('unnest(chunks)')} AS lh FROM c
),
f AS (SELECT lh, count(*) AS cnt FROM l GROUP BY lh),
p AS (
  SELECT l.doc_id,
    count(*)::BIGINT AS n_lines,
    sum(CASE WHEN f.cnt >= 2 THEN 1 ELSE 0 END)::BIGINT AS dup_lines
  FROM l JOIN f USING (lh) GROUP BY l.doc_id
)
SELECT doc_id, n_lines, dup_lines,
  round(CAST(dup_lines AS DOUBLE) / CAST(greatest(n_lines, 1) AS DOUBLE), 6)
    AS dup_line_frac
FROM p ORDER BY dup_line_frac DESC, doc_id LIMIT {k}"""


def clean_boilerplate_sql(
    width: int = 10, max_freq: int = 2, min_words: int = 3
) -> str:
    """Oracle for textstats.clean_boilerplate: drop corpus-frequent or
    too-short chunks, rebuild text from the survivors in order
    (string-exact text_clean)."""
    from lucene_solr_spark.ops.hashing import h32_sql

    return f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 1 THEN
      list_transform(range(0, CAST((len(toks) + {width - 1}) // {width} AS INT)),
        i -> array_to_string(toks[i * {width} + 1 : i * {width} + {width}], ' '))
    ELSE [] END AS chunks
  FROM t
),
l AS (
  SELECT doc_id, generate_subscripts(chunks, 1) AS idx,
    unnest(chunks) AS chunk
  FROM c
),
lh AS (SELECT l.*, {h32_sql('chunk')} AS lh FROM l),
f AS (SELECT lh, count(*) AS cnt FROM lh GROUP BY lh),
k AS (
  SELECT lh.doc_id, lh.idx, lh.chunk,
    (f.cnt < {max_freq}
     AND len(string_split(lh.chunk, ' ')) >= {min_words}) AS keep
  FROM lh JOIN f USING (lh)
)
SELECT doc_id,
  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
  sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
  COALESCE(
    string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY idx), ''
  ) AS text_clean
FROM k GROUP BY doc_id ORDER BY doc_id"""


def _curation_ctes(
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    keep_langs: tuple[str, ...] = ("en",),
    rep_pct: int = 20,
    dupline_pct: int = 50,
    width: int = 10,
) -> str:
    """Shared CTE chain for the curation pipeline oracles: the staged
    keep-flags keep1..keep5 as chained CTEs ending at f5. Integer-only
    decisions (cross-multiplied percent thresholds)."""
    from lucene_solr_spark.ops.hashing import h32_sql
    from lucene_solr_spark.ops.textstats import LANG_MARKERS

    def cnt(lang: str) -> str:
        words = ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
        return f"len(list_filter(toks, t -> list_contains([{words}], t)))"

    langs = ",".join(f"'{lang}'" for lang in keep_langs)
    return f"""t AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks
  FROM documents
),
b AS (
  SELECT doc_id, toks,
    len(toks)::BIGINT AS n,
    len(list_distinct(toks))::BIGINT AS ndist,
    {h32_sql('text')} AS h,
    CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
         WHEN {cnt('en')} >= {cnt('de')} AND {cnt('en')} >= {cnt('es')}
              AND {cnt('en')} >= {cnt('fr')} THEN 'en'
         WHEN {cnt('de')} >= {cnt('es')} AND {cnt('de')} >= {cnt('fr')}
              THEN 'de'
         WHEN {cnt('es')} >= {cnt('fr')} THEN 'es'
         ELSE 'fr' END AS pred
  FROM t
),
fl AS (
  SELECT *,
    (row_number() OVER (PARTITION BY h ORDER BY doc_id)) = 1 AS keep1
  FROM b
),
f4 AS (
  SELECT *,
    keep1 AND n >= {min_tokens} AND n <= {max_tokens} AS keep2,
    keep1 AND n >= {min_tokens} AND n <= {max_tokens}
      AND pred IN ({langs}) AS keep3,
    keep1 AND n >= {min_tokens} AND n <= {max_tokens}
      AND pred IN ({langs})
      AND (n - ndist) * 100 <= n * {rep_pct} AS keep4
  FROM fl
),
c AS (
  SELECT doc_id,
    list_transform(range(0, CAST((n + {width - 1}) // {width} AS INT)),
      i -> array_to_string(toks[i * {width} + 1 : i * {width} + {width}], ' '))
      AS chunks
  FROM f4 WHERE keep4
),
l AS (SELECT doc_id, {h32_sql('unnest(chunks)')} AS lh FROM c),
lc AS (SELECT lh, count(*) AS cnt FROM l GROUP BY lh),
dl AS (
  SELECT l.doc_id, count(*)::BIGINT AS n_lines,
    sum(CASE WHEN lc.cnt >= 2 THEN 1 ELSE 0 END)::BIGINT AS dup_lines
  FROM l JOIN lc USING (lh) GROUP BY l.doc_id
),
f5 AS (
  SELECT f4.*,
    f4.keep4 AND COALESCE(dl.dup_lines * 100 < dl.n_lines * {dupline_pct},
                          FALSE) AS keep5
  FROM f4 LEFT JOIN dl ON f4.doc_id = dl.doc_id
)"""


def dataset_split_stats_sql(
    weights: tuple[tuple[str, int], ...] = (
        ("train", 98),
        ("val", 1),
        ("test", 1),
    ),
    mod: int = 100,
) -> str:
    """Oracle for curation.dataset_split_stats: hash-bucket split
    assignment, per (split, lang) doc/token accounting."""
    from lucene_solr_spark.ops.hashing import h32_sql

    case = "CASE"
    hi = 0
    for name, w in weights[:-1]:
        hi += w
        case += f" WHEN b < {hi} THEN '{name}'"
    case += f" ELSE '{weights[-1][0]}' END"
    return f"""
WITH a AS (
  SELECT lang,
    len(list_filter(string_split_regex(trim(text), ' +'), x -> x <> ''))::BIGINT
      AS n,
    {h32_sql('CAST(doc_id AS VARCHAR)')} % {mod} AS b
  FROM documents
)
SELECT {case} AS split, lang,
  count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS ws_tokens
FROM a GROUP BY 1, 2 ORDER BY split, lang"""


def curation_funnel_sql(**kw) -> str:
    """Oracle for curation.curation_funnel: flag-sum aggregate of the
    shared CTE chain, funnel rows via UNION ALL."""
    return f"""
WITH {_curation_ctes(**kw)},
a AS (
  SELECT count(*)::BIGINT AS n0,
    sum(CASE WHEN keep1 THEN 1 ELSE 0 END)::BIGINT AS n1,
    sum(CASE WHEN keep2 THEN 1 ELSE 0 END)::BIGINT AS n2,
    sum(CASE WHEN keep3 THEN 1 ELSE 0 END)::BIGINT AS n3,
    sum(CASE WHEN keep4 THEN 1 ELSE 0 END)::BIGINT AS n4,
    sum(CASE WHEN keep5 THEN 1 ELSE 0 END)::BIGINT AS n5
  FROM f5
)
SELECT 1::INT AS stage_idx, 'exact_dedup' AS stage, n0 AS docs_in,
  n1 AS docs_kept, n0 - n1 AS docs_dropped FROM a
UNION ALL SELECT 2, 'length', n1, n2, n1 - n2 FROM a
UNION ALL SELECT 3, 'lang_id', n2, n3, n2 - n3 FROM a
UNION ALL SELECT 4, 'repetition', n3, n4, n3 - n4 FROM a
UNION ALL SELECT 5, 'line_dup', n4, n5, n4 - n5 FROM a
ORDER BY stage_idx"""


def curation_decisions_sql(**kw) -> str:
    """Oracle for curation.curation_decisions: per-doc first-failed
    stage (or 'kept') over the shared CTE chain."""
    return f"""
WITH {_curation_ctes(**kw)}
SELECT doc_id,
  CASE WHEN NOT keep1 THEN 'exact_dedup'
       WHEN NOT keep2 THEN 'length'
       WHEN NOT keep3 THEN 'lang_id'
       WHEN NOT keep4 THEN 'repetition'
       WHEN NOT keep5 THEN 'line_dup'
       ELSE 'kept' END AS drop_stage
FROM f5 ORDER BY doc_id"""


def unigram_logprob_sql(k: int = 20) -> str:
    """Oracle for textstats.unigram_logprob_topk: corpus unigram MLE,
    per-doc mean token log-probability, k lowest."""
    return f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
vocab AS (SELECT term, count(*) AS tc FROM tok GROUP BY term),
tot AS (SELECT CAST(sum(tc) AS DOUBLE) AS total FROM vocab),
p AS (
  SELECT tok.doc_id,
    count(*)::BIGINT AS n_tokens,
    sum(ln(CAST(vocab.tc AS DOUBLE))) AS sum_ln
  FROM tok JOIN vocab USING (term) GROUP BY tok.doc_id
)
SELECT doc_id, n_tokens,
  round(sum_ln / CAST(n_tokens AS DOUBLE) - ln(total), 6) AS mean_logprob
FROM p, tot ORDER BY mean_logprob, doc_id LIMIT {k}"""


def source_balance_sql(cap: int = 25) -> str:
    """Oracle for textstats.source_balance_sample: per-source hash-rank
    downsample to `cap` docs."""
    from lucene_solr_spark.ops.hashing import h32_sql

    h = h32_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH r AS (
  SELECT source, doc_id,
    row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id)::BIGINT
      AS rnk
  FROM documents
)
SELECT source, doc_id, rnk FROM r WHERE rnk <= {cap}
ORDER BY source, rnk"""


def pack_shards_sql(budget: int = 2048) -> str:
    """Oracle for packing.shard_stats: the SINGLE-window SQL form of
    the exclusive-prefix-sum shard cut — proves the engine's
    distributed two-stage prefix sum (bucket offsets + per-bucket
    window) exact."""
    return f"""
WITH t AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '[a-z0-9]+'))::BIGINT AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, n_tokens,
    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
  FROM t
)
SELECT (pre // {budget})::BIGINT AS shard_id,
  count(*)::BIGINT AS n_docs,
  sum(n_tokens)::BIGINT AS sum_tokens
FROM p GROUP BY 1 ORDER BY shard_id"""


def mixture_weights_sql() -> str:
    """Oracle for mixing.mixture_weights (alpha=0.5): temperature-
    scaled source weights — sqrt is IEEE-correctly-rounded in both
    engines, so only the 5-term sum carries ulp risk (absorbed by the
    6dp round)."""
    return """
WITH per AS (
  SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source
),
tot AS (
  SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS st,
         sum(n_docs)::BIGINT AS nt FROM per
)
SELECT source, n_docs,
  round(sqrt(CAST(n_docs AS DOUBLE)) / st, 6) AS weight,
  round(sqrt(CAST(n_docs AS DOUBLE)) / st
        * CAST(nt AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS epochs
FROM per, tot ORDER BY source"""


def resample_stats_sql(overall_rate: float = 0.3) -> str:
    """Oracle for mixing.resample_stats: per-source hash-threshold
    selection counts at the temperature-rebalanced rates (rates built
    from the ROUNDED weight, exactly as the engine does)."""
    from lucene_solr_spark.ops.hashing import h32_sql

    h = h32_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH per AS (
  SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source
),
tot AS (
  SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS st,
         sum(n_docs)::BIGINT AS nt FROM per
),
rates AS (
  SELECT source, n_docs,
    round(least({overall_rate} * CAST(nt AS DOUBLE)
      * round(sqrt(CAST(n_docs AS DOUBLE)) / st, 6)
      / CAST(n_docs AS DOUBLE), 1.0), 6) AS rate
  FROM per, tot
)
SELECT r.source, r.n_docs, r.rate,
  sum(CASE WHEN {h} < CAST(floor(r.rate * 4294967296.0) AS BIGINT)
      THEN 1 ELSE 0 END)::BIGINT AS n_selected
FROM documents d JOIN rates r USING (source)
GROUP BY r.source, r.n_docs, r.rate ORDER BY r.source"""


def training_order_sql(k: int = 20, seed: str = "ep0") -> str:
    """Oracle for mixing.training_order_head: first k docs of the
    deterministic epoch shuffle (hash order)."""
    from lucene_solr_spark.ops.hashing import h32_sql

    h = h32_sql(f"'{seed}:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH t AS (
  SELECT doc_id, {h} AS shuffle_key FROM documents
  ORDER BY shuffle_key, doc_id LIMIT {k}
)
SELECT row_number() OVER (ORDER BY shuffle_key, doc_id)::BIGINT AS rank,
  doc_id, shuffle_key
FROM t ORDER BY rank"""


def semdedup_sql(tau: float = 0.42, n_centroids: int | None = None) -> str:
    """Oracle for dedup.semdedup_keep: the same centroid literals and
    first-occurrence cosine assignment as ann_ivf_sql, then the
    within-cluster lower-id drop rule on the round-6 cosine.
    n_centroids=None mirrors the engine's adaptive default."""
    if n_centroids is None:
        n_centroids = _oracle_adaptive_n_centroids()
    dotec = _dot_sql("e.embedding", "c.ce")
    nec = _norm_sql("c.ce")
    dotab = _dot_sql("a.embedding", "b.embedding")
    return f"""
WITH cents AS (
  SELECT * FROM (VALUES {_kmeans_cents_values(n_centroids)}) AS t(cid, ce)
),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {dotec} / {nec} DESC, c.cid) AS rn
  FROM embeddings e, cents c
),
bk AS (SELECT vec_id, embedding, cid AS bucket FROM scored WHERE rn = 1),
drp AS (
  SELECT DISTINCT b.vec_id
  FROM bk a JOIN bk b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round({dotab} / ({_norm_sql("a.embedding")}
        * {_norm_sql("b.embedding")}), 6) >= {tau!r}
)
SELECT bk.vec_id, bk.bucket::BIGINT AS bucket,
       (drp.vec_id IS NULL) AS keep
FROM bk LEFT JOIN drp USING (vec_id)
ORDER BY bk.vec_id"""


def bigram_logprob_sql(k: int = 20) -> str:
    """Oracle for textstats.bigram_logprob_topk: corpus bigram MLE
    p(w2|w1) = count(w1 w2) / count(w1 ·), per-doc mean conditional
    log-probability, k lowest."""
    return f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
  FROM t
),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT w1, w2, count(*) AS bc FROM big GROUP BY w1, w2),
cc AS (SELECT w1, count(*) AS cc FROM big GROUP BY w1),
p AS (
  SELECT big.doc_id, count(*)::BIGINT AS n_bigrams,
    sum(ln(CAST(bc.bc AS DOUBLE) / CAST(cc.cc AS DOUBLE))) AS sum_ln
  FROM big JOIN bc USING (w1, w2) JOIN cc USING (w1)
  GROUP BY big.doc_id
)
SELECT doc_id, n_bigrams,
  round(sum_ln / CAST(n_bigrams AS DOUBLE), 6) AS mean_logprob
FROM p ORDER BY mean_logprob, doc_id LIMIT {k}"""


def winnow_pairs_sql(k: int = 4, w: int = 5, topk: int = 20) -> str:
    """Oracle for dedup.winnow_pairs_topk: the same positional k-gram
    h32 hashes, per-window minimum (full windows only), distinct
    fingerprint set, pair self-join."""
    from lucene_solr_spark.ops.hashing import h32_sql

    gram = " || ' ' || ".join(f"arr[pos + {j}]" for j in range(k))
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS arr FROM documents
),
g AS (
  SELECT doc_id, pos, {h32_sql(f"({gram})")} AS h
  FROM t, unnest(range(1, len(arr) - {k - 1} + 1)) AS u(pos)
  WHERE len(arr) >= {k + w - 1}
),
sel AS (
  SELECT doc_id,
    min(h) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wmin,
    pos, max(pos) OVER (PARTITION BY doc_id) AS maxpos
  FROM g
),
fp AS (
  SELECT DISTINCT doc_id, wmin AS h FROM sel WHERE pos <= maxpos - {w - 1}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS shared
FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY shared DESC, id_a, id_b LIMIT {topk}"""


def _dup_span_ctes(w: int) -> str:
    """Shared CTEs for the ExactSubstr oracle (substr.py): positional
    w-token window h32 hashes, corpus-wide occurrence rank per hash
    (keep-first policy: rank >= 2 is a duplicate window), merged
    maximal spans per doc (gaps-and-islands)."""
    from lucene_solr_spark.ops.hashing import h32_sql

    gram = " || ' ' || ".join(f"arr[pos + {j}]" for j in range(w))
    return f"""
t AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS arr FROM documents
),
g AS (
  SELECT doc_id, pos, {h32_sql(f"({gram})")} AS h
  FROM t, unnest(range(1, len(arr) - {w - 1} + 1)) AS u(pos)
  WHERE len(arr) >= {w}
),
occ AS (
  SELECT doc_id, pos,
    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM g
),
dup AS (SELECT doc_id, pos FROM occ WHERE rn >= 2),
isl AS (
  SELECT doc_id, pos,
    CASE WHEN max(pos + {w - 1}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR pos > max(pos + {w - 1}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    THEN 1 ELSE 0 END AS ni
  FROM dup
),
isl2 AS (
  SELECT doc_id, pos,
    sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + {w - 1} AS e
  FROM isl2 GROUP BY doc_id, island
)"""


def dup_span_stats_sql(w: int = 8, k: int = 20) -> str:
    """Oracle for substr.dup_span_stats."""
    return f"""
WITH {_dup_span_ctes(w)},
st AS (
  SELECT doc_id, sum(e - s + 1)::BIGINT AS dup_tokens,
         count(*)::BIGINT AS n_spans
  FROM spans GROUP BY doc_id
),
nt AS (
  SELECT doc_id,
         len(list_filter(arr, x -> x <> ''))::BIGINT AS n_tokens
  FROM t
)
SELECT nt.doc_id, nt.n_tokens,
  coalesce(st.dup_tokens, 0)::BIGINT AS dup_tokens,
  coalesce(st.n_spans, 0)::BIGINT AS n_spans,
  round(coalesce(st.dup_tokens, 0) / CAST(nt.n_tokens AS DOUBLE), 6)
    AS dup_frac
FROM nt LEFT JOIN st USING (doc_id)
ORDER BY dup_tokens DESC, doc_id LIMIT {k}"""


def remove_dup_spans_sql(w: int = 8) -> str:
    """Oracle for substr.remove_dup_spans: rebuild changed docs with
    covered tokens removed (string-exact)."""
    return f"""
WITH {_dup_span_ctes(w)},
cov AS (
  SELECT DISTINCT doc_id, u.p AS pos
  FROM spans, unnest(range(s, e + 1)) AS u(p)
),
toks AS (
  SELECT doc_id, pos, arr[pos] AS tok
  FROM t, unnest(range(1, len(arr) + 1)) AS u(pos)
),
kept AS (
  SELECT k.doc_id, k.pos, k.tok
  FROM toks k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.pos = c.pos
  WHERE c.doc_id IS NULL
),
removed AS (
  SELECT doc_id, count(*)::BIGINT AS removed_tokens
  FROM cov GROUP BY doc_id
),
rebuilt AS (
  SELECT doc_id, coalesce(string_agg(tok, ' ' ORDER BY pos), '')
           AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT r.doc_id, coalesce(b.clean_text, '') AS clean_text,
       r.removed_tokens
FROM removed r LEFT JOIN rebuilt b USING (doc_id)
ORDER BY r.doc_id"""


def dsir_weights_sql(
    target_source: str = "src0",
    b: int = 256,
    alpha: float = 0.5,
    k: int = 20,
) -> str:
    """Oracle for mixing.dsir_weights_topk: hashed uni+bigram feature
    buckets, add-alpha bucket log-ratios target-vs-corpus, per-doc
    mean ratio top-k."""
    from lucene_solr_spark.ops.hashing import h32_sql

    ab = alpha * b
    return f"""
WITH t AS (
  SELECT doc_id, source,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS arr
  FROM documents
),
uni AS (SELECT doc_id, unnest(arr) AS g FROM t),
big AS (
  SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS g
  FROM t, unnest(range(1, len(arr))) AS u(i)
  WHERE len(arr) >= 2
),
feats AS (
  SELECT doc_id, {h32_sql('g')} % {b} AS bkt
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)
),
per AS (
  SELECT bkt, count(*)::BIGINT AS src_c,
    sum(CASE WHEN d.source = '{target_source}' THEN 1 ELSE 0 END)::BIGINT
      AS tgt_c
  FROM feats f JOIN documents d USING (doc_id) GROUP BY bkt
),
tot AS (SELECT sum(src_c) AS st, sum(tgt_c) AS tt FROM per),
lr AS (
  SELECT bkt,
    ln((tgt_c + {alpha}) / CAST(tt + {ab} AS DOUBLE))
      - ln((src_c + {alpha}) / CAST(st + {ab} AS DOUBLE)) AS logratio
  FROM per, tot
),
pd AS (
  SELECT f.doc_id, count(*)::BIGINT AS n_feats, sum(logratio) AS s
  FROM feats f JOIN lr USING (bkt) GROUP BY f.doc_id
)
SELECT doc_id, n_feats, round(s / CAST(n_feats AS DOUBLE), 6)
  AS avg_logratio
FROM pd ORDER BY avg_logratio DESC, doc_id LIMIT {k}"""


def ccnet_buckets_sql() -> str:
    """Oracle for mixing.ccnet_buckets: the same bigram per-doc means,
    single row_number window (fine at sf0.01 — the engine's
    distributed prefix-sum rank must match it exactly), fixed
    0.3/0.3/0.4 head/middle/tail cuts."""
    return """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
  FROM t
),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT w1, w2, count(*) AS bc FROM big GROUP BY w1, w2),
cc AS (SELECT w1, count(*) AS cc FROM big GROUP BY w1),
p AS (
  SELECT big.doc_id, count(*)::BIGINT AS n_bigrams,
    sum(ln(CAST(bc.bc AS DOUBLE) / CAST(cc.cc AS DOUBLE))) AS sum_ln
  FROM big JOIN bc USING (w1, w2) JOIN cc USING (w1)
  GROUP BY big.doc_id
),
pd AS (
  SELECT doc_id, round(sum_ln / CAST(n_bigrams AS DOUBLE), 6)
           AS mean_logprob
  FROM p
),
r AS (
  SELECT doc_id, mean_logprob,
    row_number() OVER (ORDER BY mean_logprob DESC, doc_id) - 1 AS rnk,
    count(*) OVER () AS n
  FROM pd
),
lab AS (
  SELECT CASE WHEN rnk < floor(n * 0.3) THEN 'head'
              WHEN rnk < floor(n * 0.6) THEN 'middle'
              ELSE 'tail' END AS bucket,
         mean_logprob
  FROM r
)
SELECT bucket, count(*)::BIGINT AS n_docs,
       min(mean_logprob) AS min_logprob,
       max(mean_logprob) AS max_logprob,
       round(avg(mean_logprob), 6) AS avg_logprob
FROM lab GROUP BY bucket ORDER BY bucket"""


def text_profile_signature_sql(k: int = 50) -> str:
    """TextProfileSignature (Nutch/Solr) recomputed in SQL: same
    tokenization, quantization, deterministic (cnt desc, tok asc)
    profile order and md5 — value-hash pins the whole pipeline."""
    return f"""
WITH tk AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{Nd}}]+')) AS tok
  FROM documents
),
t2 AS (SELECT doc_id, tok FROM tk WHERE length(tok) > 2),
fr AS (SELECT doc_id, tok, count(*)::INT AS cnt FROM t2 GROUP BY 1, 2),
mx AS (SELECT doc_id, max(cnt) AS maxfreq FROM fr GROUP BY 1),
qv AS (
  SELECT doc_id,
         CASE WHEN round(maxfreq * 0.01) >= 2
                THEN round(maxfreq * 0.01)::INT
              WHEN maxfreq > 1 THEN 2 ELSE 1 END AS quant
  FROM mx
),
pr AS (
  SELECT f.doc_id, f.tok, (f.cnt // q.quant) * q.quant AS qcnt, q.quant
  FROM fr f JOIN qv q USING (doc_id)
  WHERE (f.cnt // q.quant) * q.quant >= q.quant
),
ln AS (
  SELECT doc_id,
         string_agg(tok || ' ' || qcnt, chr(10)
                    ORDER BY qcnt DESC, tok ASC) AS profile
  FROM pr GROUP BY doc_id
)
SELECT d.doc_id, md5(coalesce(l.profile, '')) AS signature
FROM documents d LEFT JOIN ln l USING (doc_id)
ORDER BY d.doc_id LIMIT {k}"""
