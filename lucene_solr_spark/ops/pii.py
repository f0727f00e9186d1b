"""PII redaction for training-data pipelines.

Standard curation step before LLM pretraining (alongside dedup /
quality filtering / decontamination in this package): mask emails,
phone numbers, and IPv4 addresses in the text column and report
per-document match counts.

Spark-first: pure built-in `regexp_replace` / `regexp_extract_all`
column expressions — JVM-side, whole-stage codegen, map-only (no
shuffle, no UDF), so the pass streams at scan speed over any corpus
size and composes with the other curation ops in one projection.

Patterns deliberately stay in the common subset of Java regex and
RE2 (no backreferences, no lookaround) so the DuckDB oracle matches
them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\-()]{6,}\d"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"

# replacement order matters: emails first (their local part could
# otherwise be clipped by the phone pattern), then IPs (dotted digits)
# before the greedier phone pattern cannot — phones last.
_RULES: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast(
        "long"
    )


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Add `out_col` (masked text) plus per-doc `n_emails`, `n_ipv4`,
    `n_phones` counts (counted on the pre-redaction text)."""
    t = F.col(text_col)
    red = t
    for pat, repl in _RULES:
        red = F.regexp_replace(red, pat, repl)
    return (
        docs.withColumn("n_emails", _count(t, EMAIL_RE))
        .withColumn("n_ipv4", _count(t, IPV4_RE))
        .withColumn("n_phones", _count(t, PHONE_RE))
        .withColumn(out_col, red)
    )
