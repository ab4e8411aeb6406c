"""Property-based tests (hypothesis) over the pure-Python core.

Invariants the 10^12-document pipeline depends on: total functions
(never raise on arbitrary bytes/strings), deterministic outputs, span
arithmetic that always indexes into the source text.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from clawrag_spark.core.bm25_tokenize import tokenize
from clawrag_spark.core.chunkers import (
    fixed_window_chunks,
    sentence_chunks,
    separator_cascade_chunks,
)
from clawrag_spark.core.embedder import embed_text, embed_text_np
from clawrag_spark.core.langid import detect_language
from clawrag_spark.core.mime import decode_text, detect_mime
from clawrag_spark.core.oracle import process_document
from clawrag_spark.core.quality import score_extraction

TEXT = st.text(max_size=2000)
PAYLOAD = st.binary(max_size=4096)


class TestTotality:
    @given(PAYLOAD, st.sampled_from(["en", "de", "", "xx"]))
    @settings(max_examples=200, deadline=None)
    def test_process_document_never_raises(self, payload, hint):
        r = process_document(payload, hint)
        assert isinstance(r.text, str)
        assert len(r.doc_hash) == 64
        assert len(r.doc_id) == 16
        assert 0.0 <= r.quality_score <= 1.0

    @given(PAYLOAD)
    @settings(max_examples=200, deadline=None)
    def test_mime_total_and_decode_total(self, payload):
        mime = detect_mime(payload)
        assert isinstance(mime, str) and "/" in mime
        assert isinstance(decode_text(payload), str)

    @given(TEXT)
    @settings(max_examples=100, deadline=None)
    def test_scalar_functions_total(self, text):
        assert isinstance(tokenize(text), list)
        assert detect_language(text) in ("en", "de", "fr", "es", "unknown")
        assert 0.0 <= score_extraction(text, "en") <= 1.0


class TestDeterminism:
    @given(PAYLOAD)
    @settings(max_examples=50, deadline=None)
    def test_process_document_deterministic(self, payload):
        a = process_document(payload)
        b = process_document(payload)
        assert a == b

    @given(TEXT)
    @settings(max_examples=50, deadline=None)
    def test_embedding_deterministic_and_normalized(self, text):
        v1 = embed_text(text, 64)
        v2 = [float(x) for x in embed_text_np(text, 64)]
        assert v1 == v2
        norm = math.sqrt(sum(x * x for x in v1))
        assert norm == 0.0 or abs(norm - 1.0) < 1e-5


class TestChunkerInvariants:
    @given(TEXT, st.integers(8, 400), st.integers(0, 7))
    @settings(max_examples=150, deadline=None)
    def test_fixed_window_spans_exact(self, text, size, overlap):
        overlap = min(overlap, size - 1)
        chunks = fixed_window_chunks(text, size, overlap)
        if not text:
            assert chunks == []
            return
        # every chunk text is exactly the span it claims
        for c in chunks:
            assert text[c.char_start:c.char_end] == c.text
        # coverage: first starts at 0; windows reach the end of text
        assert chunks[0].char_start == 0
        assert chunks[-1].char_end == len(text)

    @given(TEXT, st.integers(8, 300), st.integers(0, 50))
    @settings(max_examples=150, deadline=None)
    def test_separator_cascade_spans_bounded(self, text, size, overlap):
        chunks = separator_cascade_chunks(text, size, overlap)
        for c in chunks:
            assert 0 <= c.char_start <= c.char_end <= len(text)
        if text.strip():
            # content preservation (modulo whitespace): concatenated
            # chunk text contains every non-space char of the source
            joined = "".join(c.text for c in chunks).replace(" ", "")
            src = "".join(text.split())
            for ch in set(src):
                assert ch in joined

    @given(TEXT, st.integers(4, 64), st.integers(0, 8))
    @settings(max_examples=100, deadline=None)
    def test_sentence_chunks_spans_valid(self, text, size, overlap):
        for c in sentence_chunks(text, size, overlap):
            assert 0 <= c.char_start <= c.char_end <= len(text)
            assert c.text == text[c.char_start:c.char_end].strip()


class TestEmail:
    def test_parse_email_headers_and_body(self):
        from clawrag_spark.core.email_parse import parse_email

        raw = (
            b"From: alice@example.com\r\n"
            b"To: bob@example.com\r\n"
            b"Subject: Quarterly report\r\n"
            b"Message-ID: <abc@example.com>\r\n"
            b"Content-Type: text/plain; charset=utf-8\r\n"
            b"\r\n"
            b"Please find the numbers attached.\r\n"
        )
        r = parse_email(raw)
        assert r.error is None
        assert r.headers["from"] == "alice@example.com"
        assert r.headers["subject"] == "Quarterly report"
        assert "numbers attached" in r.body

    @given(PAYLOAD)
    @settings(max_examples=100, deadline=None)
    def test_parse_email_total(self, payload):
        from clawrag_spark.core.email_parse import parse_email

        r = parse_email(payload)
        assert isinstance(r.body, str)
        assert isinstance(r.headers, dict)
