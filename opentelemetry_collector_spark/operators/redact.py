"""PII redaction for corpus curation.

Web-scale training pipelines scrub personally-identifiable strings before
anything else sees the text: emails, bare IPv4 addresses, and phone
numbers are replaced with stable placeholder tokens, and per-document
match counts are kept for curation stats. The reference's OTTL
``replace_all_patterns`` is the same shape (replace-by-regex over a text
field, ottl/ottlfuncs/func_replace_all_patterns.go) — here it is applied
to the document body at scan time.

Patterns deliberately stay inside the RE2 ∩ java.util.regex common
subset (no lookaround, ASCII classes, non-capturing groups) so the DuckDB
oracle can run the byte-identical expressions.

Scale: a narrow per-row projection — three ``regexp_count`` + three
chained ``regexp_replace`` calls, 100% JVM codegen, zero shuffles; at
100 TB this runs at scan speed and fuses with whatever stage follows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe (no lookaround); '-' last in classes so it stays literal
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# conservative: requires the international '+' prefix so digit runs in
# ordinary prose (years, quantities) never match
PHONE_RE = r"\+\d{1,3}[ .-]?\(?\d{1,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) — non-overlapping match counts on the
    RAW text, each pattern counted independently (a string matched by two
    patterns counts in both)."""
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)),
        F.regexp_count(text, F.lit(IPV4_RE)),
        F.regexp_count(text, F.lit(PHONE_RE)),
    )


def redact_text(text: Column) -> Column:
    """Sequential replace: emails first (their hosts may contain
    IP-shaped substrings), then IPs, then phones."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Add ``out_col`` (redacted text) plus ``n_emails``/``n_ips``/
    ``n_phones`` match counters; every other column passes through."""
    text = F.col(text_col)
    n_emails, n_ips, n_phones = pii_counts(text)
    return df.select(
        "*",
        redact_text(text).alias(out_col),
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
        n_phones.cast("int").alias("n_phones"),
    )
