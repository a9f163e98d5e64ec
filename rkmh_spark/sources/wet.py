"""WET (WARC-encapsulated text) source — the Common-Crawl delivery
format for extracted page text, which is exactly the corpus shape the
north rule names ("Common-Crawl-style web pages").

Reference analog: the S1-S3 record scans — rkmh's kseq loop walks
delimited records (header line + payload) out of a flat file
(/root/reference/src/kseq.hpp, rkmh.cpp:700-741); a WET file is the
same shape with WARC headers in place of '>' lines.

Two read paths, both returning (url, warc_ts, text):

- ``wet_pages(..., strict=False)`` (default): `spark.read.text` with
  ``lineSep = "WARC/1.0\\r\\n"`` splits the file into records
  JVM-side — splittable, zero Python, the fast path. Caveat
  (documented, not hidden): a body that itself contains the delimiter
  bytes would be split early; spec-conformant WET bodies are extracted
  plain text so the sequence is effectively absent, and the strict
  path exists for hostile inputs.
- ``strict=True``: `binaryFile` scan + one `mapInPandas` that walks
  records honoring **Content-Length** byte-exactly (the only correct
  general parse — bodies may contain anything). Parallelism is
  per-file, which is how Common Crawl is actually processed: the crawl
  ships ~10^5 WET files per dump, so a 1000-executor cluster is kept
  busy by file count, not by intra-file splits. Arrow-batched; the
  payload crosses into Python once.

Timestamps: WARC-Date is ISO-8601 Zulu; parsed with to_timestamp after
stripping the trailing Z (session timezone is UTC in tests; production
pins spark.sql.session.timeZone).

``wet_bytes`` is the matching writer (record headers + Content-Length
computed from the UTF-8 body) used by round-trip tests and the
deterministic fixture generator — parse(write(x)) == x is the pinned
property.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

_DELIM = "WARC/1.0\r\n"


def wet_bytes(records: list[tuple[str, str, str]]) -> bytes:
    """Serialize (url, iso_ts, text) triples as a WET file (warcinfo
    header record first, then one conversion record per page)."""
    info = b"software: rkmh-spark-wet\r\n"
    out = [
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(info)}\r\n".encode()
        + b"\r\n" + info + b"\r\n\r\n"
    ]
    for url, ts, text in records:
        body = text.encode("utf-8")
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"\r\n"
        ).encode("utf-8")
        out.append(head + body + b"\r\n\r\n")
    return b"".join(out)


def _finish(parsed: DataFrame) -> DataFrame:
    return parsed.where(
        (F.col("rec_type") == "conversion") & (F.col("url") != "")
    ).select(
        "url",
        F.to_timestamp(
            F.regexp_replace("ts_raw", r"Z$", ""),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("warc_ts"),
        "text",
    )


def wet_pages(
    spark: SparkSession, path: str, strict: bool = False
) -> DataFrame:
    """-> (url string, warc_ts timestamp, text string), one row per
    WET conversion record under ``path`` (warcinfo/request records
    dropped)."""
    if strict:
        return _wet_pages_strict(spark, path)
    rec = spark.read.option("lineSep", _DELIM).text(path)
    # each value = one record's "headers\r\n\r\nbody\r\n\r\n" (the
    # chunk before the first delimiter is empty or file preamble and
    # fails the WARC-Type filter)
    v = F.col("value")
    header_end = F.instr(v, "\r\n\r\n")
    # body = everything past the FIRST blank line; then strip exactly
    # the one trailing CRLFCRLF record separator (never a regex-greedy
    # strip — bodies may legitimately end in newlines, and round-trip
    # parse(wet_bytes(x)) == x is a pinned property)
    body_plus = F.substr(v, header_end + F.lit(4))
    body = F.when(
        body_plus.endswith("\r\n\r\n"),
        F.substring(body_plus, F.lit(1), F.length(body_plus) - F.lit(4)),
    ).otherwise(body_plus)
    parsed = rec.select(
        F.regexp_extract(v, r"WARC-Type: (\S+)", 1).alias("rec_type"),
        F.regexp_extract(v, r"WARC-Target-URI: (\S+)", 1).alias("url"),
        F.regexp_extract(v, r"WARC-Date: (\S+)", 1).alias("ts_raw"),
        F.when(header_end > 0, body).otherwise(F.lit("")).alias("text"),
    )
    return _finish(parsed)


def _wet_pages_strict(spark: SparkSession, path: str) -> DataFrame:
    """Content-Length-honoring parse over binaryFile scans (one task
    per WET file — the Common-Crawl unit of parallelism)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            urls, tss, texts = [], [], []
            for blob in pdf["content"]:
                data = bytes(blob)
                pos = 0
                while True:
                    start = data.find(b"WARC/1.0\r\n", pos)
                    if start < 0:
                        break
                    hdr_end = data.find(b"\r\n\r\n", start)
                    if hdr_end < 0:
                        break
                    header = data[start:hdr_end].decode(
                        "utf-8", errors="replace"
                    )
                    fields = {}
                    for line in header.split("\r\n")[1:]:
                        k, _, val = line.partition(":")
                        fields[k.strip().lower()] = val.strip()
                    try:
                        clen = int(fields.get("content-length", ""))
                    except ValueError:
                        pos = hdr_end + 4
                        continue
                    body_start = hdr_end + 4
                    body = data[body_start:body_start + clen]
                    pos = body_start + clen
                    if fields.get("warc-type") == "conversion" and fields.get(
                        "warc-target-uri"
                    ):
                        urls.append(fields["warc-target-uri"])
                        tss.append(fields.get("warc-date", ""))
                        texts.append(body.decode("utf-8", errors="replace"))
            yield pd.DataFrame(
                {"url": urls, "ts_raw": tss, "text": texts}
            )

    parsed = files.mapInPandas(
        parse, "url string, ts_raw string, text string"
    ).withColumn("rec_type", F.lit("conversion"))
    return _finish(parsed)
