"""PII detection and redaction for pretraining-corpus curation.

Pure Catalyst regex expressions (JVM-side, codegen-friendly) — the standard
pre-training scrub pass (emails, IPv4 addresses, phone numbers) expressed so
it runs as a narrow map over 100 TB with zero shuffle and zero Python.

The patterns deliberately use the regex subset with identical semantics in
Java (Spark) and RE2 (DuckDB oracle): character classes, bounded repetition,
``\\b`` ASCII word boundaries — no lookaround, no backreferences. The phone
pattern is the strict international spelling ``+CC-NNN-NNN-NNNN`` so both
engines agree on match extents without backtracking-order ambiguity.

Redaction replaces longest-structure first (email → IPv4 → phone) so an
address inside an email's domain is never double-redacted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}-\d{3}-\d{3}-\d{4}"

EMAIL_TOKEN = "[EMAIL]"
IPV4_TOKEN = "[IP]"
PHONE_TOKEN = "[PHONE]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str) -> Column:
    """struct(n_email, n_ipv4, n_phone) — per-document PII hit counts."""
    c = _c(col)
    return F.struct(
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ipv4"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phone"),
    )


def pii_redact(col: Column | str) -> Column:
    """Replace every PII match with a typed placeholder token."""
    c = _c(col)
    out = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
