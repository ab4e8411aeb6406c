"""S13/S5/C7/C9 routing layer: detector branches, extension-vs-content
crosscheck, row chunker, and the routed pipeline end-to-end over a mixed
synthetic corpus (code/email/csv/html/pdf/unknown)."""

import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from clawrag_spark.core import data_type as dt
from clawrag_spark.core.chunkers import row_chunks
from clawrag_spark.routing import detect_and_chunk, route_chunks

CSV_GOOD = "a,b,c\n1,2,3\n4,5,6\n7,8,9"
CSV_BAD = "just one column\nno delimiters\nhere either"
EMAIL_RAW = "From: a@b.c\r\nTo: x@y.z\r\nSubject: hi\r\n\r\nBody text here. More words."
CODE_PY = "import os\n\ndef main():\n    return 1\n\nclass Thing:\n    pass\n"
HTML_DOC = b"<html><body><p>hello world</p></body></html>"


class TestDetector:
    @pytest.mark.parametrize("url,payload,expect", [
        ("http://h/x.eml", b"irrelevant", dt.EMAIL),
        ("http://h/x.py", b"print(1)", dt.CODE),
        ("http://h/x.csv", CSV_GOOD.encode(), dt.STRUCTURED_TABLE),
        ("http://h/x.csv", CSV_BAD.encode(), dt.UNSTRUCTURED_TEXT),
        ("http://h/x.pdf", b"%PDF-1.4", dt.UNSTRUCTURED_TEXT),
        ("http://h/x.txt", b"plain words", dt.UNSTRUCTURED_TEXT),
        # content fallback (no extension)
        ("http://h/page", HTML_DOC, dt.UNSTRUCTURED_TEXT),
        ("http://h/page", EMAIL_RAW.encode(), dt.EMAIL),
        ("http://h/page", CODE_PY.encode(), dt.CODE),
        ("http://h/page", CSV_GOOD.encode(), dt.STRUCTURED_TABLE),
        ("http://h/page", b"ordinary prose with words", dt.UNSTRUCTURED_TEXT),
        ("http://h/page", b"", dt.UNKNOWN),
        ("http://h/page", bytes(range(256)) * 4, dt.UNKNOWN),
    ])
    def test_detect(self, url, payload, expect):
        assert dt.detect_data_type(url, payload) == expect

    def test_extension_wins_over_content(self):
        # .py file containing csv-looking content is still CODE (:97)
        assert dt.detect_data_type("http://h/x.py", CSV_GOOD.encode()) == dt.CODE

    def test_url_extension_parsing(self):
        assert dt.url_extension("http://h/a/b.PDF?x=1#f") == ".pdf"
        assert dt.url_extension("http://h/a/b") == ""
        assert dt.url_extension(None) == ""


class TestCrosscheck:
    def test_mismatch_rejected(self):
        err = dt.crosscheck_extension("http://h/doc.pdf", HTML_DOC)
        assert err and err.startswith("ext_content_mismatch:.pdf")

    def test_match_and_unknown_ext_pass(self):
        assert dt.crosscheck_extension("http://h/doc.pdf", b"%PDF-1.4 x") is None
        assert dt.crosscheck_extension("http://h/doc.weird", HTML_DOC) is None
        # markup in a .txt is tolerated (text family)
        assert dt.crosscheck_extension("http://h/doc.txt", HTML_DOC) is None


class TestRowChunks:
    def test_header_repeated_and_rows_grouped(self):
        text = "h1,h2\n" + "\n".join(f"r{i},{i}" for i in range(7))
        out = row_chunks(text, rows_per_chunk=3)
        assert len(out) == 3
        assert all(c.text.startswith("h1,h2\n") for c in out)
        assert out[0].text == "h1,h2\nr0,0\nr1,1\nr2,2"
        assert out[2].text == "h1,h2\nr6,6"

    def test_spans_cover_data_rows(self):
        text = "h\na\nb\nc\nd"
        out = row_chunks(text, rows_per_chunk=2)
        assert text[out[0].char_start:out[0].char_end] == "a\nb"
        assert text[out[1].char_start:out[1].char_end] == "c\nd"

    def test_empty_and_header_only(self):
        assert row_chunks("") == []
        assert len(row_chunks("only header")) == 1


class TestDispatch:
    def test_email_route_chunks_parsed_body(self):
        chunks = route_chunks(dt.EMAIL, "text/plain", EMAIL_RAW)
        assert chunks
        assert "From:" not in chunks[0].text  # headers stripped
        assert "Body text here" in chunks[0].text

    def test_code_route_uses_structure(self):
        chunks = route_chunks(dt.CODE, "text/plain", CODE_PY)
        assert len(chunks) >= 2  # preamble/def/class boundaries

    def test_profile_config_applied(self):
        long_text = "word. " * 600  # '. ' is the first matching separator
        default = route_chunks(dt.UNSTRUCTURED_TEXT, "text/plain", long_text)
        legal = route_chunks(dt.UNSTRUCTURED_TEXT, "text/plain", long_text,
                             profile="legal")
        # legal profile = 1024/256 vs text/plain 512/128 → fewer chunks
        assert len(legal) < len(default)

    def test_crosscheck_rejects_in_dispatch(self):
        route, _, chunks = detect_and_chunk(
            "http://h/x.pdf", "text/html", "<html><body>hi</body></html>"
        )
        assert route.startswith("rejected:") and chunks == []


class TestProfileScan:
    URLS = [
        "https://h/src/app.py",
        "https://h/docs/a.pdf",
        "https://h/node_modules/x/index.js",   # pruned dir
        "https://h/.git/config.md",            # pruned dir
        "https://h/style/site.css",
        "https://h/img/x.png",
        "https://h/readme.md?v=2",             # query string stripped
    ]

    def _kept(self, spark, **kw):
        from clawrag_spark.pipeline import scan_profile_filter

        df = spark.createDataFrame([(u,) for u in self.URLS], "url string")
        return {r["url"] for r in scan_profile_filter(df, **kw).collect()}

    def test_default_profile(self, spark):
        assert self._kept(spark) == {
            "https://h/src/app.py", "https://h/docs/a.pdf",
            "https://h/readme.md?v=2",
        }

    def test_codebase_profile_and_prune(self, spark):
        kept = self._kept(spark, profile="codebase")
        assert "https://h/style/site.css" in kept
        assert "https://h/node_modules/x/index.js" not in kept
        assert "https://h/.git/config.md" not in kept

    def test_explicit_extensions_override(self, spark):
        assert self._kept(spark, allowed_extensions=[".PNG"]) == {
            "https://h/img/x.png"
        }


@pytest.fixture(scope="module")
def mixed_pages(tmp_path_factory):
    """Synthetic mixed-type corpus: each row exercises one route."""
    import pyarrow.parquet as pq
    from datetime import datetime

    rows = [
        ("https://h0.ex/app/main.py", CODE_PY.encode()),
        ("https://h0.ex/mail/msg1.eml", EMAIL_RAW.encode()),
        ("https://h0.ex/data/tbl.csv", CSV_GOOD.encode()),
        ("https://h0.ex/site/page.html", HTML_DOC),
        ("https://h0.ex/docs/plain.txt", b"Plain words. " * 40),
        # S5 mismatch -> rejected (distinct body: same payload as
        # page.html would version-dedup it instead)
        ("https://h0.ex/bad/fake.pdf", b"<html><body><p>impostor pdf</p></body></html>"),
    ]
    table = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([datetime(2025, 6, 1, 0, 0, i) for i in range(len(rows))],
                            pa.timestamp("us")),
        "html": pa.array([r[1] for r in rows], pa.binary()),
        "text": pa.array([""] * len(rows), pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })
    path = str(tmp_path_factory.mktemp("mixed") / "pages.parquet")
    pq.write_table(table, path)
    return path


def test_routed_pipeline_end_to_end(spark, mixed_pages, out_dir):
    from clawrag_spark.pipeline import run_pipeline

    run_pipeline(spark, spark.read.parquet(mixed_pages), out_dir,
                 routed_chunking=True, run_id="routed")
    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    routes = {
        r["url"]: r["route"]
        for r in chunks.select("url", "route").distinct().collect()
    }
    assert routes["https://h0.ex/app/main.py"] == dt.CODE
    assert routes["https://h0.ex/mail/msg1.eml"] == dt.EMAIL
    assert routes["https://h0.ex/data/tbl.csv"] == dt.STRUCTURED_TABLE
    assert routes["https://h0.ex/site/page.html"] == dt.UNSTRUCTURED_TEXT
    assert routes["https://h0.ex/bad/fake.pdf"].startswith("rejected:")
    # rejected doc = one marker row with zero chunks
    marker = chunks.filter(F.col("url") == "https://h0.ex/bad/fake.pdf").collect()
    assert len(marker) == 1 and marker[0]["total_chunks"] == 0
    # profile column applied per route (C9)
    profs = {r["route"]: r["profile"]
             for r in chunks.select("route", "profile").distinct().collect()}
    assert profs[dt.CODE] == "code"
    assert profs[dt.STRUCTURED_TABLE] == "technical"
