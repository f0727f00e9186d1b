"""Portable hash primitives shared by the dedup / similarity operators.

Every hash here is defined so an external ANSI-SQL oracle (DuckDB) can
reproduce it bit-for-bit:

- ``h32(col)``: first 8 hex chars of md5(utf8 bytes) as an int in
  [0, 2^32).  Spark: ``conv(substring(md5(col),1,8),16,10)``;
  DuckDB: ``CAST('0x'||substr(md5(col),1,8) AS BIGINT)``.
- MinHash permutations: ``(a_i * h + b_i) mod P`` with
  ``P = 2^31 - 1`` and fixed constants ``a_i, b_i < 2^31`` so the
  product stays within int64 (no overflow ambiguity between engines).

The reference's analog is murmur3-based shard routing
(solr/solrj/.../cloud/HashBasedRouter.java:31-34); we substitute a
cross-engine-reproducible hash because correctness here is defined by
the external oracle, not by murmur3 byte layout.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: (a*h + b) with a, h, b < P fits in int64.
MERSENNE_P = 2_147_483_647

# 16 fixed (a, b) permutation constants (generated once from a seeded
# PRNG, frozen as literals so SQL oracles can inline them verbatim).
MINHASH_PERMS: list[tuple[int, int]] = [
    (1203114875, 1150108325), (652169939, 356683215),
    (1851889403, 1848956376), (672560565, 1134817826),
    (16429503, 388302587), (711973577, 1618430751),
    (327412983, 1133176877), (1432282840, 1968946117),
    (374060462, 815911617), (1750539015, 1197072044),
    (105604547, 613413176), (830811156, 335529159),
    (1724520999, 2123168747), (774889413, 849062235),
    (1032414595, 228786779), (1099859120, 576905917),
]

N_BANDS = 4
ROWS_PER_BAND = 4
assert N_BANDS * ROWS_PER_BAND == len(MINHASH_PERMS)


def h32(col: Column) -> Column:
    """32-bit portable content hash (long in [0, 2^32))."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def h32b(col: Column) -> Column:
    """Second independent 32-bit hash (md5 hex chars 9-16) — bits 32-63
    of the portable 64-bit fingerprint (a single signed BIGINT cannot
    carry bit 63 portably, so 64-bit values ride as two words)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 9, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB SQL for h32 over a string expression."""
    return f"CAST('0x'||substr(md5({expr}),1,8) AS BIGINT)"


def h32b_sql(expr: str) -> str:
    """DuckDB SQL for h32b over a string expression."""
    return f"CAST('0x'||substr(md5({expr}),9,8) AS BIGINT)"


def minhash_col(h: Column, i: int) -> Column:
    """i-th MinHash permutation of an h32 value (JVM-side arithmetic)."""
    a, b = MINHASH_PERMS[i]
    return (F.lit(a) * (h % F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_perms_values_sql() -> str:
    """SQL VALUES list ``perms(i, a, b)`` for the oracle."""
    rows = ",".join(f"({i},{a},{b})" for i, (a, b) in enumerate(MINHASH_PERMS))
    return f"(VALUES {rows}) AS p(i, a, b)"
