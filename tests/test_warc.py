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
