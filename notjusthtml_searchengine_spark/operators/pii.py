"""PII redaction for web-text training corpora.

Every production pretraining pipeline scrubs obvious personal
identifiers from crawled text before packing (the C4 / Dolma / BigCode
"PII redaction" pass): e-mail addresses, IPv4 addresses, and
NANP-style phone numbers are replaced with stable placeholder tokens
so the model never memorizes them, and per-doc hit counts are kept for
the corpus funnel report.

All three patterns are deliberately restricted to the syntax subset
shared by Java regex (Spark) and RE2 (DuckDB) — no lookarounds, no
backreferences — so the pass is a pure codegen projection on the
Spark side AND byte-identically re-derivable by the SQL oracle.
Redaction order is part of the contract (e-mail, then IPv4, then
phone): an e-mail's host can contain digit runs an IP/phone pattern
would otherwise bite into.

Scale shape: zero shuffles — one map stage over the corpus scan,
whole-stage-codegen throughout (regexp_replace / regexp_extract_all
are JVM built-ins, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: patterns valid in BOTH Java regex and RE2 (parity is tested by the
#: pii_redact oracle, which runs the same strings through DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("bigint")


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, redacted, n_emails, n_ips, n_phones) — one row per doc.

    Counts are taken on the pre-redaction text in the same order the
    replacements run, each against the residue of the previous pass,
    so a digit run consumed by the e-mail pass is never double-counted
    as an IP or phone.
    """
    t = F.col(text_col)
    n_emails = _count(t, EMAIL_RE)
    after_email = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    n_ips = _count(after_email, IPV4_RE)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IPV4_TOKEN)
    n_phones = _count(after_ip, PHONE_RE)
    redacted = F.regexp_replace(after_ip, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        F.col(id_col),
        redacted.alias("redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )
