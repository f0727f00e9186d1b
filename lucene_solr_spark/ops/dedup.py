"""Deduplication operators for large-scale training-data pipelines.

Five dedup families over a ``documents(doc_id, text, ...)`` table, each
expressed as declarative DataFrame plans (whole-stage-codegen JVM
expressions; no Python UDFs):

- exact dedup             — hash-groupBy on a content fingerprint
- n-gram Jaccard pairs    — exact shingle-set similarity (quadratic in
                            shared-shingle co-occurrence; the small-scale
                            truth oracle)
- MinHash + LSH           — the 100 TB scale path: O(docs) signature,
                            band-bucket join produces candidates, exact
                            Jaccard verifies them
- SimHash                 — 64-bit tf-weighted fingerprints (two
                            32-bit words) + Hamming pairs via
                            bit_count(xor) on banded candidates
- embedding cosine        — near-dup by vector similarity

Scale notes (1000-executor / 100 TB design point):
- The shingle self-join (`ngram_jaccard_pairs`) is the *oracle* path
  only: common shingles make it quadratic.  At scale use
  `minhash_lsh_pairs`: one shuffle to signatures (16 aggregates in a
  single hash-agg), one shuffle on (band, signature) buckets — bucket
  keys are 128-bit md5 values, so skew only occurs for true duplicate
  clusters, which is exactly the output.
- All hashes are oracle-portable (see ops/hashing.py).

Reference analogs: Solr's dedup update processor chain
(solr/core/src/java/org/apache/solr/update/processor/ — the
SignatureUpdateProcessorFactory computes content signatures at index
time); UniqueStream (SURVEY.md §2.8) is the sorted-stream dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.ops.hashing import (
    MERSENNE_P,
    MINHASH_PERMS,
    N_BANDS,
    ROWS_PER_BAND,
    h32,
    h32b,
    minhash_col,
)

# ----------------------------------------------------------------------
# tokenization / shingling (whitespace tokens, declarative)
# ----------------------------------------------------------------------


def ws_tokens(text: Column) -> Column:
    """Whitespace token array (split on runs of spaces, trimmed)."""
    return F.split(F.trim(text), " +")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (JVM-side; empty array when the doc
    has < n tokens).

    Built as arrays_zip over n shifted slices of the token array, then
    one concat_ws per zipped struct — stays inside whole-stage codegen.
    (The per-index `transform(sequence, i -> element_at(arr, i+j))`
    formulation forces an interpreted path and measured 7x slower.)"""
    arr = ws_tokens(text)
    cnt = F.size(arr) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(arr, j + 1, cnt).alias(f"w{j}") for j in range(n)]
    )
    make = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)])
    )
    return F.when(F.size(arr) >= n, make).otherwise(F.array().cast("array<string>"))


def _distinct_shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, s): distinct word-n-gram shingles per doc."""
    return (
        docs.select("doc_id", F.explode(shingles(F.col("text"), n)).alias("s"))
        .distinct()
    )


# ----------------------------------------------------------------------
# 1. exact dedup
# ----------------------------------------------------------------------


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """Exact-duplicate summary via content-hash groupBy.

    Returns one row: (n_docs, n_distinct, n_dup_docs) where n_dup_docs
    counts documents that are NOT the canonical (min doc_id) copy of
    their text.  The per-group keep/drop mapping is the same plan
    without the final agg.  One shuffle on the 128-bit fingerprint;
    no skew (identical docs collapse, which is the point)."""
    fp = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("fp"))
    groups = fp.groupBy("fp").agg(
        F.count(F.lit(1)).alias("copies"), F.min("doc_id").alias("keep_id")
    )
    return groups.agg(
        F.sum("copies").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (F.sum("copies") - F.count(F.lit(1))).cast("long").alias("n_dup_docs"),
    )


def text_profile_signature(
    docs: DataFrame,
    quant_rate: float = 0.01,
    min_token_len: int = 2,
) -> DataFrame:
    """Nutch/Solr TextProfileSignature — the fuzzy content signature of
    SignatureUpdateProcessorFactory (solr/core/.../update/processor/
    TextProfileSignature.java:70-138): letter/digit runs lowercased,
    tokens of length > min_token_len counted, counts rounded DOWN to
    the nearest multiple of QUANT (= round(maxFreq*quant_rate), floored
    at 2 when maxFreq > 1, else 1), sub-QUANT tokens discarded, the
    surviving "token cnt" lines joined by \\n in decreasing-count order
    and MD5-hashed. Near-identical pages (differing in rare tokens)
    collapse to one signature.

    Deviations (documented): the reference's count-tie order is the
    JVM HashMap iteration order (unspecified) — here ties sort by
    token ascending, deterministically; quant uses f64 arithmetic
    where the reference multiplies in f32.

    Plan: one explode + one (doc,token) hash-aggregate + one per-doc
    hash-aggregate; the profile sort/join/md5 are higher-order
    expressions inside codegen. Per-doc state is vocabulary-of-one-doc
    sized — nothing corpus-wide is collected or broadcast. Returns
    (doc_id, signature)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[\\p{L}\\p{Nd}]+', 0)")
        ).alias("tok"),
    ).where(F.length("tok") > min_token_len)
    freq = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("int").alias("cnt")
    )
    per_doc = freq.groupBy("doc_id").agg(
        F.max("cnt").alias("maxfreq"),
        F.collect_list(F.struct("tok", "cnt")).alias("toks"),
    )
    quant = (
        F.when(F.round(F.col("maxfreq") * F.lit(quant_rate)) >= 2,
               F.round(F.col("maxfreq") * F.lit(quant_rate)).cast("int"))
        .when(F.col("maxfreq") > 1, F.lit(2))
        .otherwise(F.lit(1))
    )
    q = per_doc.withColumn("quant", quant)
    # quantize, discard < quant, order by (cnt desc, tok asc), join
    profile = (
        q.withColumn(
            "prof",
            F.filter(
                F.transform(
                    "toks",
                    lambda t: F.struct(
                        (F.floor(t["cnt"] / F.col("quant"))
                         * F.col("quant")).cast("int").alias("qcnt"),
                        t["tok"].alias("tok"),
                    ),
                ),
                lambda s: s["qcnt"] >= F.col("quant"),
            ),
        )
        .withColumn(
            "prof",
            F.array_sort(
                F.transform(
                    "prof",
                    lambda s: F.struct(
                        (-s["qcnt"]).alias("negq"), s["tok"].alias("tok")
                    ),
                )
            ),
        )
        .select(
            "doc_id",
            F.md5(
                F.array_join(
                    F.transform(
                        "prof",
                        lambda s: F.concat_ws(
                            " ", s["tok"], (-s["negq"]).cast("string")
                        ),
                    ),
                    "\n",
                ).cast("binary")
            ).alias("signature"),
        )
    )
    # docs whose every token quantizes away (or that have no tokens)
    # sign the empty profile, like the reference's super.add("")
    return (
        docs.select("doc_id")
        .join(profile, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                "signature", F.lit("d41d8cd98f00b204e9800998ecf8427e")
            ).alias("signature"),
        )
    )


def text_profile_dup_groups(docs: DataFrame, **kw) -> DataFrame:
    """Signature groups with more than one member — the overwriteDupes
    view of SignatureUpdateProcessorFactory (dup docs share the
    signature key, the first doc_id is the canonical copy)."""
    sig = text_profile_signature(docs, **kw)
    return (
        sig.groupBy("signature")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .where(F.col("n_docs") > 1)
    )


# ----------------------------------------------------------------------
# 2. exact n-gram Jaccard (truth oracle for near-dup)
# ----------------------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, tau: float = 0.5) -> DataFrame:
    """All doc pairs with shingle-set Jaccard >= tau.

    Plan: distinct (doc, shingle) -> self-join on shingle -> count
    intersections -> join set sizes -> filter.  Exact but quadratic in
    per-shingle doc frequency; at 100 TB use minhash_lsh_pairs and keep
    this as the verification kernel."""
    ds = _distinct_shingles(docs, n)
    sizes = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = ds.alias("a")
    b = ds.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    j = (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= tau)
    )
    return j.select("id_a", "id_b", "jaccard").orderBy("id_a", "id_b")


# ----------------------------------------------------------------------
# 3. MinHash + LSH (the scale path)
# ----------------------------------------------------------------------


_CACHED_SHINGLES: list = []


def _signatures_from_shingles(ds: DataFrame) -> DataFrame:
    """(doc_id, m0..m15) from a (doc_id, s) distinct-shingle frame:
    ONE hash-aggregate (map-side partial min) — the 16 permutations
    are columns of the same groupBy, not 16 passes."""
    hashed = ds.withColumn("h", h32(F.col("s")))
    aggs = [
        F.min(minhash_col(F.col("h"), i)).alias(f"m{i}")
        for i in range(len(MINHASH_PERMS))
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, m0..m15): 16-permutation MinHash signature."""
    return _signatures_from_shingles(_distinct_shingles(docs, n))


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, tau: float = 0.5) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    Bands of 4 rows: band signature = md5 of the 4 minhash values.
    Docs sharing any band signature become candidate pairs; candidates
    are then verified with exact shingle Jaccard and filtered at tau.
    Output schema matches ngram_jaccard_pairs (id_a, id_b, jaccard).

    Scale: signatures are one narrow row per doc; the band-bucket
    shuffle joins on 128-bit keys so only true near-dup clusters
    collide.  Verification touches candidate pairs only. The distinct-
    shingle frame is computed ONCE and persisted — signatures and
    verification share the same scan (at the 100 TB design point this
    persist becomes a materialized shingle table). Only the most
    recent call's frames stay cached — the previous ones are
    unpersisted (at worst their still-referenced plans recompute)."""
    ds = _distinct_shingles(docs, n).persist()
    while _CACHED_SHINGLES:
        _CACHED_SHINGLES.pop().unpersist()
    _CACHED_SHINGLES.append(ds)
    sig = _signatures_from_shingles(ds)
    band_cols = []
    for bnd in range(N_BANDS):
        ms = [F.col(f"m{bnd * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        band_cols.append(F.md5(F.concat_ws(",", *ms).cast("binary")))
    bands = sig.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "bsig")
    )
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
        .persist()  # consumed twice: the verify join + the size semi-join
    )
    _CACHED_SHINGLES.append(cand)
    # exact verification restricted to candidates (reuses persisted ds)
    sa = ds.select(F.col("doc_id").alias("id_a"), F.col("s"))
    sb = ds.select(F.col("doc_id").alias("id_b"), F.col("s"))
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # Shingle-set sizes are ONE ROW PER DOCUMENT — never broadcast the
    # unrestricted frame (billions of rows at the 100 TB design point).
    # Left-semi-join it down to the docs that appear in a candidate
    # pair FIRST (candidates are tiny by LSH design: only near-dup
    # clusters collide); only the restricted frame is broadcast.
    cand_ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sizes = (
        ds.join(cand_ids, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    za = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(F.broadcast(za), "id_a")
        .join(F.broadcast(zb), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= tau)
    )
    return out.select("id_a", "id_b", "jaccard").orderBy("id_a", "id_b")


# ----------------------------------------------------------------------
# 4. SimHash
# ----------------------------------------------------------------------

# 64-bit fingerprints, carried as two 32-bit words (hi, lo): a web-scale
# corpus birthday-collides a 32-bit fingerprint far below 10^9 docs, and
# a single signed BIGINT cannot portably carry bit 63 (DuckDB's << range-
# checks). The legacy 32-bit variant stays for comparison (simhash_docs32).
SIMHASH_BITS = 64
SIMHASH_BITS32 = 32


def simhash_band_specs(bits: int, n_bands: int) -> list[tuple[int, int]]:
    """Balanced (offset, width) bit-bands partitioning a `bits`-wide
    fingerprint — the pigeonhole split: any pair within Hamming
    distance (n_bands - 1) agrees exactly on >= 1 band."""
    widths = [bits // n_bands] * n_bands
    widths[-1] += bits % n_bands
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    return list(zip(offsets, widths))


def _band_col_64(hi: Column, lo: Column, off: int, width: int) -> Column:
    """Band value of the conceptual 64-bit string (bit j<32 from lo,
    else hi) — handles bands spanning the word boundary."""
    if off + width <= 32:
        return (
            F.shiftright(lo, off).bitwiseAND(F.lit((1 << width) - 1))
        ).cast("long")
    if off >= 32:
        return (
            F.shiftright(hi, off - 32).bitwiseAND(F.lit((1 << width) - 1))
        ).cast("long")
    lo_w = 32 - off
    hi_w = width - lo_w
    lo_part = F.shiftright(lo, off).bitwiseAND(F.lit((1 << lo_w) - 1))
    hi_part = hi.bitwiseAND(F.lit((1 << hi_w) - 1)) * F.lit(1 << lo_w)
    return (lo_part + hi_part).cast("long")


def _simhash_tf(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("t"))
        .where(F.col("t") != "")
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def simhash_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash_hi, simhash_lo): 64-bit tf-weighted SimHash as
    two 32-bit words (lo = bits 0-31 from md5 chars 1-8, hi = bits
    32-63 from md5 chars 9-16).

    Per token: 64 bit-contributions of +tf / -tf; fingerprint bit j set
    iff the weighted sum is positive.  All 64 sums are columns of ONE
    hash-aggregate (map-side combine; no extra shuffles)."""
    tf = (
        _simhash_tf(docs)
        .withColumn("hlo", h32(F.col("t")))
        .withColumn("hhi", h32b(F.col("t")))
    )
    sums_lo = [
        F.sum(
            F.when(
                F.shiftright(F.col("hlo"), j).bitwiseAND(F.lit(1)) == 1,
                F.col("tf"),
            ).otherwise(-F.col("tf"))
        ).alias(f"l{j}")
        for j in range(32)
    ]
    sums_hi = [
        F.sum(
            F.when(
                F.shiftright(F.col("hhi"), j).bitwiseAND(F.lit(1)) == 1,
                F.col("tf"),
            ).otherwise(-F.col("tf"))
        ).alias(f"h{j}")
        for j in range(32)
    ]
    sums = tf.groupBy("doc_id").agg(*(sums_lo + sums_hi))

    def word(prefix: str) -> Column:
        w = None
        for j in range(32):
            term = (
                F.when(F.col(f"{prefix}{j}") > 0, F.lit(1 << j))
                .otherwise(F.lit(0))
                .cast("long")
            )
            w = term if w is None else w + term
        return w

    return sums.select(
        "doc_id", word("h").alias("simhash_hi"), word("l").alias("simhash_lo")
    ).orderBy("doc_id")


def simhash_docs32(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): the legacy 32-bit fingerprint (kept for
    comparison with the 64-bit default — same construction, one word)."""
    tf = _simhash_tf(docs).withColumn("h", h32(F.col("t")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS32)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_sums)
    sh = None
    for j in range(SIMHASH_BITS32):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
        sh = term if sh is None else sh + term
    return sums.select("doc_id", sh.alias("simhash")).orderBy("doc_id")


def simhash_pairs(docs: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash Hamming distance <= max_hamming
    — BANDED, not all-pairs.

    Pigeonhole: split the 64-bit fingerprint into (max_hamming + 1)
    balanced bit-bands (~21 bits each at the default — ~2M bucket keys
    per band, so intra-bucket joins stay tiny even at web scale; the
    round-3 32-bit variant's ~11-bit bands put corpus/2048 docs per
    bucket). Candidates come from an equi-join on (band_id, band_bits)
    — one shuffle keyed by band values, so only genuine near-dup
    clusters collide — then the exact 64-bit Hamming verify
    (bit_count over both words) runs on candidates only. Output
    identical to the all-pairs plan (same oracle)."""
    sh = simhash_docs(docs)
    specs = simhash_band_specs(SIMHASH_BITS, max_hamming + 1)
    band_cols = [
        _band_col_64(F.col("simhash_hi"), F.col("simhash_lo"), off, w)
        for off, w in specs
    ]
    bands = sh.select(
        "doc_id",
        "simhash_hi",
        "simhash_lo",
        F.posexplode(F.array(*band_cols)).alias("band", "bits"),
    )
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bits") == F.col("y.bits"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.col("x.simhash_hi").alias("ha_hi"),
            F.col("x.simhash_lo").alias("ha_lo"),
            F.col("y.simhash_hi").alias("hb_hi"),
            F.col("y.simhash_lo").alias("hb_lo"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ha_hi").bitwiseXOR(F.col("hb_hi")))
            + F.bit_count(F.col("ha_lo").bitwiseXOR(F.col("hb_lo"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    )


# ----------------------------------------------------------------------
# 5. embedding cosine near-dup
# ----------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    """Deterministic left-fold dot product in double (element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def embedding_topk_pairs(emb: DataFrame, k: int = 20) -> DataFrame:
    """Top-k most-cosine-similar embedding pairs (near-dup ranking).

    Brute-force cross join at sandbox scale; at 100 TB the same kernel
    runs inside LSH buckets (see similarity.ivf_topk) so the join is
    bucket-local.  Cosine folds are element-ordered so an external
    oracle reproduces them bitwise."""
    v = emb.select(
        F.col("vec_id"),
        F.col("embedding").alias("e"),
        _norm(F.col("embedding")).alias("nrm"),
    )
    a = v.select(F.col("vec_id").alias("id_a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos", F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6)
        )
        .select("id_a", "id_b", "cos")
    )
    return pairs.orderBy(F.desc("cos"), "id_a", "id_b").limit(k)


def embedding_topk_pairs_lsh(
    emb: DataFrame, k: int = 20, probe_hamming: int = 2
) -> DataFrame:
    """Bucket-local near-dup pair ranking — the 100 TB variant of
    embedding_topk_pairs: the quadratic cosine kernel runs only on
    pairs whose 16-plane sign-bit hyperplane codes differ in at most
    `probe_hamming` bits (MULTI-PROBE LSH — each vector is emitted
    under its own code plus every 1-bit perturbation, so a pair within
    code-Hamming 2 meets on an equi-join key; Lv et al., "Multi-Probe
    LSH", VLDB 2007). 16 planes give 65,536 buckets — at web scale the
    code is the table partition key and each bucket holds corpus/65536
    vectors, vs. the 16 buckets (corpus/16 quadratic joins) of the
    round-3 4-plane variant.

    Approximate by design (pairs past the probe radius are unseen) but
    fully deterministic — the DuckDB oracle reproduces the exact pair
    set via bit_count(xor(code_a, code_b)) <= probe_hamming."""
    from lucene_solr_spark.ops.similarity import (
        N_PLANES,
        _bucket_col,
        _hyperplanes,
    )

    assert probe_hamming <= 2, "both-side 1-bit perturbation covers <= 2"
    dim = len(emb.select("embedding").first()[0])
    planes = _hyperplanes(dim)
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("e"),
        _norm(F.col("embedding")).alias("nrm"),
        _bucket_col(F.col("embedding"), planes).alias("code"),
    )
    # probe codes: own code + all 1-bit perturbations; two perturbed
    # sides meet iff code-Hamming <= 2 (a xor b = e1 xor e2, both
    # single-bit), so the equi-join emits EXACTLY the radius-2 pairs
    flips = [F.col("code")] + [
        F.col("code").bitwiseXOR(F.lit(1 << j)) for j in range(N_PLANES)
    ]
    if probe_hamming < 2:
        flips = flips[: 1 + (N_PLANES if probe_hamming == 1 else 0)]
    probed = v.select(
        "vec_id", "e", "nrm", "code", F.explode(F.array(*flips)).alias("probe")
    )
    a = probed.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"), F.col("code").alias("code_a"),
        F.col("probe"),
    )
    b = (v if probe_hamming < 2 else probed).select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
        (F.col("code") if probe_hamming < 2 else F.col("probe")).alias("probe"),
    )
    pairs = (
        a.join(b, ["probe"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ea", "eb", "na", "nb")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cos",
            F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6),
        )
        .select("id_a", "id_b", "cos")
    )
    return pairs.orderBy(F.desc("cos"), "id_a", "id_b").limit(k)


def dedup_clusters(
    docs: DataFrame, n: int = 3, tau: float = 0.5, max_iter: int = 20
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    MinHash-LSH pair graph; cluster_id = min doc_id of the component —
    the canonical "keep" doc of a training-data dedup pass (the step
    after pair generation: pairs alone over-delete when A~B and B~C
    but a pipeline drops both B and C's partners independently).

    Distributed CC by iterative min-label propagation:
    label(v) <- min(label(v), min over neighbors' labels), iterated to
    fixpoint. Each round is ONE shuffle join + ONE groupBy on doc_id;
    rounds needed = component diameter (near-dup clusters are tiny
    dense cliques, so 2-3 rounds in practice); `max_iter` bounds
    pathological chains. No driver-side graph state — only the
    converged-yet? count crosses to the driver each round.

    Raises RuntimeError if propagation has not converged within
    max_iter rounds (a silent non-fixpoint would hand a training-data
    pipeline WRONG clusters with no signal).

    Returns (doc_id, cluster_id) for every doc in >=1 verified pair."""
    pairs = minhash_lsh_pairs(docs, n, tau).select("id_a", "id_b")
    return connected_components(pairs, max_iter)


def dedup_representatives(
    docs: DataFrame, n: int = 3, tau: float = 0.5, max_iter: int = 20
) -> DataFrame:
    """Full-corpus KEEP/DROP decision table — the step a training-data
    pipeline actually executes after clustering: every document gets
    its near-dup cluster (docs in no verified pair are singleton
    clusters of themselves) and `keep` = this doc is the cluster's
    canonical representative (min doc_id — which IS the cluster_id,
    so the predicate is cluster_id == doc_id).

    Scale shape: dedup_clusters' label frame holds ONLY docs that
    appear in a verified pair (dup sets, not the corpus), and the
    singleton completion is ONE left shuffle join keyed by doc_id —
    no broadcast of any per-document frame, no driver state. The
    downstream pass is `.where("keep")`, which prunes before anything
    heavier runs.

    Returns (doc_id, cluster_id, keep) for EVERY document."""
    labels = dedup_clusters(docs, n, tau, max_iter)
    return (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
        .orderBy("doc_id")
    )


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Distributed connected components over an (id_a, id_b) edge list
    by iterative min-label propagation; component label = min node id.

    Each round is ONE shuffle join + ONE groupBy; labels stabilize in
    `diameter` rounds and one extra no-change round confirms the
    fixpoint, so up to max_iter + 1 rounds run — max_iter = the
    largest component diameter you accept, with no off-by-one.
    Per-round `localCheckpoint` truncates the plan lineage (an
    iterative join chain otherwise grows the logical plan
    exponentially and overflows the optimizer past ~15 rounds — the
    standard iterative-graph-algorithm discipline). Loud failure:
    raises RuntimeError when labels are still changing after the
    budget (never returns a silently non-converged labeling)."""
    sym = (
        pairs.union(
            pairs.select(
                F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
            )
        )
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("id_a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .persist()
    )
    changed = 0
    # max_iter propagation rounds + 1 confirmation round: a component
    # of diameter d needs d label-moving rounds and one no-change round
    # to prove the fixpoint
    for _ in range(int(max_iter) + 1):
        nmin = (
            sym.join(
                labels.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("cluster_id").alias("nlabel"),
                ),
                "id_b",
            )
            .groupBy("id_a")
            .agg(F.min("nlabel").alias("nmin"))
            .select(F.col("id_a").alias("doc_id"), "nmin")
        )
        new = (
            labels.join(nmin, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nmin"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()  # materialize + truncate lineage
        )
        changed = (
            new.select("doc_id", F.col("cluster_id").alias("nc"))
            .join(labels, "doc_id")
            .where(F.col("nc") != F.col("cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    sym.unpersist()
    if changed:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} propagation rounds ({changed} labels still "
            "changing) — raise max_iter (rounds needed = component "
            "diameter)"
        )
    return labels.orderBy("doc_id")


def semdedup_keep(
    emb: DataFrame, tau: float = 0.42, n_centroids: int | None = None
) -> DataFrame:
    """SemDeDup semantic dedup (Abbas et al., "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication",
    arXiv:2303.09540): cluster the embeddings with the IVF coarse
    k-means quantizer, then WITHIN each cluster drop every vector whose
    cosine to a lower-vec_id cluster member reaches tau — keeping one
    representative (the lowest id) per semantic-duplicate neighborhood.

    Scale shape (the paper's own design): the expensive pairwise cosine
    runs ONLY inside clusters — a bucket-keyed equi-self-join, one
    shuffle on the cluster id — and n_centroids grows with the corpus
    (SemDeDup uses ~sqrt(N) clusters) so per-cluster membership stays
    bounded and the intra-cluster join never goes corpus-quadratic.
    The quantizer trains on the same hard-capped sample as ivf_topk
    (similarity.KMEANS_MAX_SAMPLE) and assignment is one map-side
    expression — no driver state beyond the centroid literals.

    Determinism: assignment + cosine folds are the bitwise-pinned
    kernels shared with ann_ivf_topk; the tau comparison happens on the
    round-6 cosine so the DuckDB oracle (ops/oracles.semdedup_sql)
    reproduces the exact keep/drop set.

    Returns (vec_id, bucket, keep) for EVERY vector, vec_id asc."""
    from lucene_solr_spark.ops.similarity import (
        _assign_bucket_col,
        _centroids,
    )

    # n_centroids=None -> adaptive max(16, isqrt(N)) inside _centroids —
    # the paper's ~sqrt(N) clusters by default, no caller opt-in needed
    cents = _centroids(emb, n_centroids)
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("e"),
        _norm(F.col("embedding")).alias("nrm"),
        _assign_bucket_col(F.col("embedding"), cents).alias("bucket"),
    )
    a = v.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"), F.col("bucket"),
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"),
        F.col("nrm").alias("nb"), F.col("bucket"),
    )
    dropped = (
        a.join(b, ["bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")),
                6,
            )
            >= tau
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        v.select("vec_id", "bucket")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("keep"),
        )
        .orderBy("vec_id")
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 5
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm): hash every word k-gram, slide a window
    of w consecutive k-gram hashes over the doc, and select each
    window's MINIMUM hash; the doc's fingerprint is the distinct set of
    selected hashes. Guarantees: any shared run of w + k - 1 tokens
    between two docs shares >= 1 selected fingerprint, while only
    ~2/(w+1) of all k-gram hashes are kept — the sampling that makes
    fingerprint joins tractable where full shingle joins are not.

    Plan: positional k-grams via zipped shifted slices (codegen), h32
    gram hashes, ONE doc-keyed window (rowsBetween 0..w-1, full windows
    only), distinct. At 100 TB the window function is a per-doc sort —
    docs are short relative to partitions, so this is a single
    doc_id-keyed exchange, no skew beyond doc length itself.

    Returns (doc_id, h) distinct selected fingerprints."""
    from pyspark.sql import Window

    arr = ws_tokens(F.col("text"))
    cnt = F.size(arr) - (k - 1)
    zipped = F.arrays_zip(
        *[F.slice(arr, j + 1, cnt).alias(f"w{j}") for j in range(k)]
    )
    gram = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(k)])
    )
    grams = (
        docs.where(F.size(arr) >= k + w - 1)
        .select("doc_id", F.posexplode(gram).alias("pos", "g"))
        .select("doc_id", "pos", h32(F.col("g")).alias("h"))
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    n_grams = Window.partitionBy("doc_id")
    return (
        grams.withColumn("wmin", F.min("h").over(win))
        .withColumn("maxpos", F.max("pos").over(n_grams))
        .where(F.col("pos") <= F.col("maxpos") - (w - 1))  # full windows
        .select("doc_id", F.col("wmin").alias("h"))
        .distinct()
    )


def winnow_pairs_topk(
    docs: DataFrame, k: int = 4, w: int = 5, topk: int = 20
) -> DataFrame:
    """Doc pairs ranked by shared winnowed fingerprints — the MOSS
    similarity report: fingerprint self-join on the hash (the winnowed
    set is ~2/(w+1) of the shingle volume, which is exactly why this
    join is run on fingerprints instead of raw shingles), one pair
    hash-aggregate, top-k by shared count. Ties: id_a, id_b asc."""
    fp = winnow_fingerprints(docs, k, w)
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .orderBy(F.desc("shared"), "id_a", "id_b")
        .limit(topk)
    )
