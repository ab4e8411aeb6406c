"""WARC source: read Common-Crawl-style WARC files into the pages table.

The reference ingests individual uploaded files (SURVEY.md §2.1); the
web-scale equivalent input is the Common Crawl WARC layout — files of
concatenated ``WARC/1.0`` records, each a block of CRLF-separated
headers, a blank line, ``Content-Length`` bytes of body, and a trailing
``\\r\\n\\r\\n``.  This module implements a codec-free reader and a
fixture writer:

- :func:`read_warc` — ``spark.read.format('binaryFile')`` over
  ``*.warc`` → ``mapInPandas`` record parser → the pipeline's pages
  schema (url, warc_ts, html, text, lang).  One task per WARC file
  (Common Crawl files are ~1 GB — the natural task granularity; at
  10^12 documents the file listing itself is the partition index).
- :func:`write_warc` — deterministic fixture twin, byte-exact round
  trip pinned by pytest.

Only ``response`` records with an HTTP 200 status line surface as
pages; ``request``/``metadata`` records and non-200 responses are
counted but not emitted, mirroring how extraction pipelines consume
Common Crawl.  The HTTP header block inside the body is stripped; the
remaining payload is the page's raw bytes.

Gzip members (the ``.warc.gz`` member-per-record layout) are supported
via stdlib zlib when the file starts with the gzip magic — each record
is its own deflate member, so the stream decompresses as a whole.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

_CRLF = b"\r\n"


def _parse_warc_records(blob: bytes) -> Iterator[dict]:
    """Yield dicts for every record in a WARC blob (strict grammar:
    version line, CRLF headers, blank line, Content-Length body,
    CRLF CRLF separator)."""
    pos = 0
    n = len(blob)
    while pos < n:
        # tolerate extra separators between records
        while blob[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(f"WARC header block not terminated at offset {pos}")
        head = blob[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"missing WARC version line at offset {pos}")
        hdrs = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        length = int(hdrs.get("content-length", "0"))
        body_start = head_end + 4
        body = blob[body_start : body_start + length]
        if len(body) != length:
            raise ValueError(
                f"truncated WARC body at offset {body_start} "
                f"(want {length}, have {len(body)})"
            )
        yield {
            "type": hdrs.get("warc-type", ""),
            "url": hdrs.get("warc-target-uri", ""),
            "date": hdrs.get("warc-date", ""),
            "body": body,
        }
        pos = body_start + length
        if blob[pos : pos + 4] == _CRLF + _CRLF:
            pos += 4


def _split_http(body: bytes) -> tuple[str, bytes]:
    """(status line, payload) from an HTTP response block; a body with
    no HTTP preamble returns ('', body) — raw-payload records."""
    if not body.startswith(b"HTTP/"):
        return "", body
    sep = body.find(_CRLF + _CRLF)
    if sep < 0:
        return body.split(b"\r\n", 1)[0].decode("ascii", "replace"), b""
    status = body[:sep].split(b"\r\n", 1)[0].decode("ascii", "replace")
    return status, body[sep + 4 :]


def _maybe_gunzip(blob: bytes) -> bytes:
    if blob[:2] == b"\x1f\x8b":
        import zlib

        out = bytearray()
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(blob)
        # member-per-record gzip: keep inflating trailing members
        while d.unused_data:
            rest = d.unused_data
            d = zlib.decompressobj(wbits=31)
            out += d.decompress(rest)
        return bytes(out)
    return blob


def _parse_ts(s: str):
    try:
        return (
            datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc)
            .replace(tzinfo=None)
        )
    except ValueError:
        return None


def read_warc(spark: SparkSession, path: str, default_lang: str = "") -> DataFrame:
    """WARC files → the pipeline's pages DataFrame.

    ``binaryFile`` hands each WARC file to one task as a single blob
    (record offsets aren't split-aligned without an external index —
    the same reason Common Crawl ships ``.warc.gz`` member-per-record);
    the Arrow-batched parser emits one pages row per HTTP-200 response
    record.  Feed the result straight to ``pipeline.run_pipeline``.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
            for blob in batch["content"]:
                for rec in _parse_warc_records(_maybe_gunzip(bytes(blob))):
                    if rec["type"] != "response":
                        continue
                    status, payload = _split_http(rec["body"])
                    if status and " 200 " not in status + " ":
                        continue
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(_parse_ts(rec["date"]))
                    rows["html"].append(payload)
                    rows["text"].append("")
                    rows["lang"].append(default_lang)
            yield pd.DataFrame(rows)

    blobs = spark.read.format("binaryFile").load(path).select("content")
    return blobs.mapInPandas(parse, PAGES_SCHEMA)


def write_warc(path: str, pages: list[dict], gzip_members: bool = False) -> str:
    """Fixture twin of :func:`read_warc`: write pages dicts
    (url, warc_ts, html, plus optional status/type) as a WARC file.
    ``gzip_members`` writes the Common-Crawl member-per-record gzip
    layout."""
    import gzip as _gzip

    chunks = []
    for p in pages:
        body = (
            b"HTTP/1.1 " + p.get("status", "200 OK").encode() + _CRLF
            + b"Content-Type: text/html" + _CRLF + _CRLF
            + p["html"]
        )
        ts = p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {p.get('type', 'response')}\r\n"
            f"WARC-Target-URI: {p['url']}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(body)}\r\n"
            "\r\n"
        ).encode()
        rec = head + body + _CRLF + _CRLF
        if gzip_members:
            rec = _gzip.compress(rec, mtime=0)
        chunks.append(rec)
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))
    return path


# ------------------------------------------------------------------ WET
# WET ("WARC Encapsulated Text") is the Common Crawl interchange format
# for EXTRACTED text: the same WARC record grammar, but `conversion`
# records whose body is the plain text of the page.  An extraction
# pipeline's deliverable at web scale IS a WET corpus — this pair makes
# the engine a producer as well as a consumer.

WET_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampNTZType()),
        T.StructField("text", T.StringType()),
    ]
)


def _wet_record(url: str, ts, text: str) -> bytes:
    body = text.encode("utf-8")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body + _CRLF + _CRLF


def export_wet(df: DataFrame, out_dir: str) -> None:
    """Distributed WET export: every partition writes ONE
    ``part-<pid>.warc.wet`` file of `conversion` records — the custom-
    format sink pattern (foreachPartition + local file handle), since
    WET's CRLF record grammar is not a parquet/text row format.  Input
    needs (url, warc_ts, text) columns; record order inside a file is
    the partition's row order, so repartition/sort upstream for a
    deterministic layout.  At 10^12 docs each task streams its own
    file — no driver collect, no single-writer bottleneck."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)

    def write_part(rows):
        first = True
        fh = None
        try:
            for row in rows:
                if first:
                    from pyspark import TaskContext

                    pid = TaskContext.get().partitionId()
                    fh = open(
                        _os.path.join(out_dir, f"part-{pid:05d}.warc.wet"),
                        "wb",
                    )
                    first = False
                fh.write(_wet_record(row["url"], row["warc_ts"], row["text"]))
        finally:
            if fh is not None:
                fh.close()

    df.select("url", "warc_ts", "text").foreachPartition(write_part)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET files → (url, warc_ts, text): the conversion-record twin of
    :func:`read_warc`, one task per file, Arrow-batched."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = {k: [] for k in ("url", "warc_ts", "text")}
            for blob in batch["content"]:
                for rec in _parse_warc_records(_maybe_gunzip(bytes(blob))):
                    if rec["type"] != "conversion":
                        continue
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(_parse_ts(rec["date"]))
                    rows["text"].append(rec["body"].decode("utf-8"))
            yield pd.DataFrame(rows)

    blobs = spark.read.format("binaryFile").load(path).select("content")
    return blobs.mapInPandas(parse, WET_SCHEMA)
