"""WET source: round-trip parse(wet_bytes(x)) == x on both read paths,
record-type filtering, Content-Length fidelity on hostile bodies."""

import datetime

from rkmh_spark.sources.wet import wet_bytes, wet_pages

TS = "2026-03-01T12:30:05Z"
DT = datetime.datetime(2026, 3, 1, 12, 30, 5)

ROWS = [
    ("https://ex.com/a", TS, "plain body text"),
    ("https://ex.com/b", "2026-03-02T00:00:59Z", "unicode éß中 body"),
    ("https://ex.com/c", TS, "multi\nline\n\nbody with blank line"),
    ("https://ex.com/d", TS, "trailing newline body\r\n"),
    ("https://ex.com/e", TS, ""),
]


def _write(tmp_path, name, records):
    p = tmp_path / name
    p.write_bytes(wet_bytes(records))
    return str(p)


def _got(df):
    return sorted(
        (r["url"], r["warc_ts"], r["text"]) for r in df.collect()
    )


def _expect(rows):
    return sorted(
        (
            u,
            datetime.datetime.fromisoformat(ts.rstrip("Z")),
            tx,
        )
        for u, ts, tx in rows
    )


def test_wet_roundtrip_fast_path(spark, tmp_path):
    path = _write(tmp_path, "f.wet", ROWS)
    assert _got(wet_pages(spark, path)) == _expect(ROWS)


def test_wet_roundtrip_strict_path(spark, tmp_path):
    path = _write(tmp_path, "f.wet", ROWS)
    assert _got(wet_pages(spark, path, strict=True)) == _expect(ROWS)


def test_wet_multi_file_directory(spark, tmp_path):
    _write(tmp_path, "a.wet", ROWS[:2])
    _write(tmp_path, "b.wet", ROWS[2:])
    for strict in (False, True):
        assert _got(wet_pages(spark, str(tmp_path), strict=strict)) == _expect(
            ROWS
        ), strict


def test_wet_warcinfo_and_other_records_dropped(spark, tmp_path):
    """wet_bytes always prepends a warcinfo record; splice in a request
    record by hand — only conversion records must surface."""
    body = b"GET / HTTP/1.1\r\nHost: ex.com\r\n"
    req = (
        b"WARC/1.0\r\n"
        b"WARC-Type: request\r\n"
        b"WARC-Target-URI: https://ex.com/req\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n" + body + b"\r\n\r\n"
    )
    p = tmp_path / "f.wet"
    info_len = len(wet_bytes([]))  # the warcinfo preamble record
    p.write_bytes(wet_bytes(ROWS[:1]) + req + wet_bytes(ROWS[1:2])[info_len:])
    for strict in (False, True):
        got = _got(wet_pages(spark, str(p), strict=strict))
        assert got == _expect(ROWS[:2]), strict


def test_wet_strict_survives_delimiter_inside_body(spark, tmp_path):
    """A body containing the record delimiter bytes: only the
    Content-Length-honoring strict path parses it intact (the fast
    path's documented caveat)."""
    evil = [("https://ex.com/evil", TS, "look: WARC/1.0\r\nfake header")]
    path = _write(tmp_path, "evil.wet", evil)
    assert _got(wet_pages(spark, path, strict=True)) == _expect(evil)


def test_wet_empty_file(spark, tmp_path):
    p = tmp_path / "empty.wet"
    p.write_bytes(b"")
    for strict in (False, True):
        assert wet_pages(spark, str(p), strict=strict).count() == 0, strict
