"""WARC source: byte-exact round trip, record filtering, gzip members."""

import os
from datetime import datetime

import pytest

from clawrag_spark.warc import (
    _parse_warc_records, read_warc, write_warc,
)

T0 = datetime(2025, 6, 1, 12, 0)

PAGES = [
    {"url": "https://a.ex/1", "warc_ts": T0, "html": b"<html>one</html>"},
    {"url": "https://a.ex/2", "warc_ts": T0, "html": b"<html>two</html>"},
    # binary payload with CRLFs inside — Content-Length framing must win
    {"url": "https://a.ex/3", "warc_ts": T0,
     "html": b"\r\n\r\nWARC/1.0\r\n" + bytes(range(256))},
    {"url": "https://a.ex/4", "warc_ts": T0, "html": b"gone",
     "status": "404 Not Found"},
    {"url": "https://a.ex/5", "warc_ts": T0, "html": b"GET / HTTP/1.1",
     "type": "request"},
]


def test_parser_round_trip(tmp_path):
    path = write_warc(str(tmp_path / "f.warc"), PAGES)
    recs = list(_parse_warc_records(open(path, "rb").read()))
    assert len(recs) == 5
    assert [r["url"] for r in recs] == [p["url"] for p in PAGES]
    assert recs[2]["body"].endswith(bytes(range(256)))


def test_read_warc_keeps_only_200_responses(spark, tmp_path):
    write_warc(str(tmp_path / "f.warc"), PAGES)
    rows = {r["url"]: r for r in read_warc(spark, str(tmp_path)).collect()}
    # 404 and request records filtered; payloads byte-exact, headers cut
    assert set(rows) == {"https://a.ex/1", "https://a.ex/2", "https://a.ex/3"}
    assert bytes(rows["https://a.ex/1"]["html"]) == b"<html>one</html>"
    assert bytes(rows["https://a.ex/3"]["html"]).endswith(bytes(range(256)))
    assert rows["https://a.ex/1"]["warc_ts"] == T0


def test_read_warc_gzip_members(spark, tmp_path):
    write_warc(str(tmp_path / "f.warc.gz"), PAGES, gzip_members=True)
    rows = read_warc(spark, str(tmp_path)).collect()
    assert {r["url"] for r in rows} == {
        "https://a.ex/1", "https://a.ex/2", "https://a.ex/3"
    }


def test_truncated_record_raises():
    blob = write_warc_bytes()
    with pytest.raises(ValueError, match="truncated WARC body"):
        list(_parse_warc_records(blob[:-20]))


def write_warc_bytes():
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = write_warc(os.path.join(d, "f.warc"), PAGES[:1])
        return open(p, "rb").read()


def test_warc_feeds_the_pipeline(spark, tmp_path):
    from clawrag_spark.pipeline import run_pipeline

    write_warc(str(tmp_path / "f.warc"),
               [dict(p, url=p["url"], html=p["html"]) for p in PAGES[:2]])
    pages = read_warc(spark, str(tmp_path), default_lang="en")
    out = str(tmp_path / "out")
    m = run_pipeline(spark, pages, out)
    assert m["n_processed"] == 2
    got = {r["url"] for r in spark.read.parquet(out + "/extracted").collect()}
    assert got == {"https://a.ex/1", "https://a.ex/2"}


def test_wet_round_trip_and_record_grammar(spark, tmp_path):
    """export_wet -> read_wet is lossless, and the bytes follow the
    WARC/1.0 conversion-record grammar (Content-Length exact, CRLF
    terminators) so external WET consumers can read the files."""
    import datetime

    from clawrag_spark.warc import export_wet, read_wet

    rows = [
        (f"https://h{i % 3}.ex/p/{i}",
         datetime.datetime(2026, 3, 1, 12, 0, i),
         f"extracted text {i}\nsecond line with ünïcode €{i}")
        for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp_ntz, text string"
    ).repartition(4)
    out = str(tmp_path / "wet")
    export_wet(df, out)

    import glob
    files = sorted(glob.glob(out + "/part-*.warc.wet"))
    assert 1 <= len(files) <= 4
    blob = open(files[0], "rb").read()
    assert blob.startswith(b"WARC/1.0\r\n")
    assert b"WARC-Type: conversion\r\n" in blob
    # Content-Length is the exact utf-8 body length of the first record
    import re
    m = re.search(rb"Content-Length: (\d+)\r\n\r\n", blob)
    body_start = m.end()
    n = int(m.group(1))
    assert blob[body_start + n: body_start + n + 4] == b"\r\n\r\n"

    back = read_wet(spark, out + "/*.warc.wet")
    got = {(r["url"], r["warc_ts"], r["text"]) for r in back.collect()}
    assert got == set(rows)


def test_wet_export_empty_partitions_write_nothing(spark, tmp_path):
    from clawrag_spark.warc import export_wet

    df = spark.createDataFrame(
        [], "url string, warc_ts timestamp_ntz, text string"
    ).repartition(4)
    out = str(tmp_path / "wet_empty")
    export_wet(df, out)
    import glob
    assert glob.glob(out + "/part-*") == []
