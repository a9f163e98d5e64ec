"""PII detection/redaction (functions/pii.py) — pure-relational scrub."""

import pytest
from pyspark.sql import functions as F


def _run(spark, rows):
    from rkmh_spark.functions.pii import (
        pii_email_count,
        pii_ipv4_count,
        pii_phone_count,
        redact_pii,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "id long, text string")
    out = df.select(
        "id",
        pii_email_count("text").alias("e"),
        pii_phone_count("text").alias("p"),
        pii_ipv4_count("text").alias("i"),
        redact_pii("text").alias("r"),
    ).orderBy("id")
    return out.collect()


def test_email_detection_and_redaction(spark):
    got = _run(
        spark,
        [
            "write to alice.smith+tag@sub.example.co.uk or bob_99@x.io now",
            "no pii here at all",
            "an @ alone, half@domain (no tld dot after) stays",
        ],
    )
    assert (got[0].e, got[0].r) == (
        2,
        "write to [EMAIL] or [EMAIL] now",
    )
    assert got[1] == (1, 0, 0, 0, "no pii here at all")
    # half@domain: "domain (no tld)" — pattern requires dot+tld
    assert got[2].e == 0 and "[EMAIL]" not in got[2].r


def test_phone_spellings(spark):
    got = _run(
        spark,
        [
            "call +1-555-0199 or +44 020 7946 today",
            "ring 555-0134 please",
            "the year 2024 and 19991231 are not phones",
        ],
    )
    assert got[0].p == 2 and got[0].r == "call [PHONE] or [PHONE] today"
    assert got[1].p == 1 and got[1].r == "ring [PHONE] please"
    assert got[2].p == 0 and "[PHONE]" not in got[2].r  # untouched digits


def test_phone_digit_boundaries(spark):
    """Digit-bounded: the 555 alternative must not fire inside longer
    digit runs (years, counts, prices)."""
    got = _run(
        spark,
        [
            "In 1555 1234 men marched",
            "id 555 123456 is a serial",
            "call 555 0199 ok",
        ],
    )
    assert got[0].p == 0 and "[PHONE]" not in got[0].r
    assert got[1].p == 0 and "[PHONE]" not in got[1].r
    assert got[2].p == 1 and got[2].r == "call [PHONE] ok"


def test_ipv4_octet_ranges(spark):
    got = _run(
        spark,
        [
            "hosts 10.0.0.1 and 255.255.255.255 up",
            "not an ip: 256.1.1.1 nor 1.2.3",
            "weird 999.1.2.3.4 tail",
        ],
    )
    assert got[0].i == 2 and got[0].r == "hosts [IP] and [IP] up"
    # digit/dot boundaries: a malformed quad (256.x) or a 5-part
    # version string must NOT partially match — no truncated redaction
    assert got[1].i == 0 and got[1].r == "not an ip: 256.1.1.1 nor 1.2.3"
    assert got[2].i == 0 and got[2].r == "weird 999.1.2.3.4 tail"


def test_ipv4_version_string_untouched(spark):
    got = _run(spark, ["build 1.2.3.4.5 and lib 1234.5.6.7 ship"])
    assert got[0].i == 0 and "[IP]" not in got[0].r


def test_redaction_order_email_before_ip_and_phone(spark):
    # an email whose local part carries digit runs must redact as ONE
    # email, not leak phone/ip fragments
    got = _run(spark, ["mail 555-0199.10.0.0.7@ex.org end"])
    assert got[0].r == "mail [EMAIL] end"


def test_pii_plan_is_pure_projection(spark):
    """No UDF, no shuffle: the scrub is one codegen'd Project."""
    from rkmh_spark.functions.pii import pii_email_count, redact_pii

    df = spark.range(10).select(
        F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@x.io")).alias("t")
    )
    out = df.select(pii_email_count("t").alias("e"), redact_pii("t").alias("r"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
