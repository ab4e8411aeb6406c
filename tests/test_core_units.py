"""Unit tests for the pure-Python core (oracle side, no Spark)."""

from clawrag_spark.core.bm25_tokenize import tokenize
from clawrag_spark.core.chunkers import (
    fixed_window_chunks,
    sentence_chunks,
    separator_cascade_chunks,
)
from clawrag_spark.core.html_extract import extract_html
from clawrag_spark.core.langid import detect_language
from clawrag_spark.core.mime import detect_mime
from clawrag_spark.core.oracle import process_document
from clawrag_spark.core.pdf_extract import analyze_pdf, extract_pdf
from clawrag_spark.core.quality import score_extraction, structure_score


class TestMime:
    def test_pdf(self):
        assert detect_mime(b"%PDF-1.4\n...") == "application/pdf"

    def test_zip(self):
        assert detect_mime(b"PK\x03\x04rest") == "application/zip"

    def test_html_doctype_ws_bom(self):
        assert detect_mime(b"\xef\xbb\xbf  <!DOCTYPE html><html>") == "text/html"
        assert detect_mime(b"<HTML><body>x</body>") == "text/html"

    def test_plain_and_binary(self):
        assert detect_mime("plain text café".encode()) == "text/plain"
        assert detect_mime(bytes(range(256)) * 4) == "application/octet-stream"
        assert detect_mime(b"") == "application/octet-stream"


class TestHtmlExtract:
    def test_boilerplate_stripped(self):
        html = (
            "<html><head><title>T</title><script>junk()</script></head><body>"
            "<nav><a href='/a'>a</a> <a href='/b'>b</a></nav>"
            "<div class='ad-banner'>BUY <a href='x'>click</a></div>"
            "<main><h1>Heading</h1><p>A real paragraph with enough words to keep.</p>"
            "<ul><li>item one</li><li>item two</li></ul>"
            "<table><tr><td>a</td><td>b</td></tr></table></main>"
            "<footer><a href='/i'>imprint</a></footer></body></html>"
        )
        text, counts = extract_html(html)
        assert text.startswith("# Heading")
        assert "A real paragraph" in text
        assert "- item one" in text
        assert "| a | b |" in text
        assert "junk" not in text and "BUY" not in text
        assert "imprint" not in text and "click" not in text
        assert counts["headings_count"] == 1
        assert counts["lists_count"] == 2
        assert counts["tables_count"] == 1

    def test_link_density(self):
        # a short link-heavy paragraph is boilerplate; a long one is content
        linky = "<p>" + " ".join(f"<a href='/{i}'>link{i}</a>" for i in range(8)) + "</p>"
        text, _ = extract_html(f"<html><body>{linky}</body></html>")
        assert text == ""
        long_text = "word " * 60
        keep = f"<p>{long_text}<a href='/x'>see more</a></p>"
        text2, _ = extract_html(f"<html><body>{keep}</body></html>")
        assert "word" in text2

    def test_malformed_is_lenient(self):
        text, _ = extract_html("<html><body><p>unclosed paragraph")
        assert "unclosed paragraph" in text

    def test_entities_unescaped(self):
        text, _ = extract_html("<p>fish &amp; chips &lt;3 for only &euro;5 today okay</p>")
        assert "fish & chips <3" in text and "€5" in text


class TestPdfExtract:
    PDF = (
        b"%PDF-1.4\n"
        b"stream\n"
        b"BT /F1 12 Tf 72 660 Td (second line) Tj ET\n"
        b"BT /F1 20 Tf 72 720 Td (Title Here) Tj ET\n"
        b"BT /F1 12 Tf 72 674 Td (first line) Tj ET\n"
        b"BT /F1 12 Tf 72 600 Td (new paragraph) Tj ET\n"
        b"endstream\n%%EOF\n"
    )

    def test_reading_order_and_blocks(self):
        text, counts = extract_pdf(self.PDF)
        assert text == "# Title Here\n\nfirst line second line\n\nnew paragraph"
        assert counts["headings_count"] == 1

    def test_analyze(self):
        info = analyze_pdf(self.PDF)
        assert info["page_count"] == 1
        assert info["has_text"] is False  # only 44 stripped chars (>50 needed)
        assert info["is_encrypted"] is False

    def test_encrypted_gate(self):
        enc = b"%PDF-1.4\n/Encrypt 1 0 R\nstream\nBT 0 0 Td (x) Tj ET\nendstream"
        assert analyze_pdf(enc)["is_encrypted"] is True
        try:
            extract_pdf(enc)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    def test_escapes(self):
        pdf = b"%PDF-1.4\nstream\nBT /F1 12 Tf 72 720 Td (a \\(b\\) c\\\\d) Tj ET\nendstream"
        text, _ = extract_pdf(pdf)
        assert text == "a (b) c\\d"

    TWO_COL = (
        b"%PDF-1.4\n"
        b"stream\n"
        # shuffled on purpose: right column first, header last
        b"BT /F1 12 Tf 320 680 Td (right top) Tj ET\n"
        b"BT /F1 12 Tf 72 666 Td (left second) Tj ET\n"
        b"BT /F1 12 Tf 320 666 Td (right bottom) Tj ET\n"
        b"BT /F1 12 Tf 72 680 Td (left top) Tj ET\n"
        b"BT /F1 20 Tf 72 720 Td (Wide Header) Tj ET\n"
        b"endstream\n%%EOF\n"
    )

    def test_two_column_reading_order(self):
        # header band first, then the left column fully, then the right
        # column — NOT the y-interleaved order a naive global sort gives
        text, counts = extract_pdf(self.TWO_COL)
        assert text == (
            "# Wide Header\n\n"
            "left top left second\n\n"
            "right top right bottom"
        )
        assert counts["headings_count"] == 1
        assert counts["paragraphs_count"] == 2

    def test_single_column_path_unchanged_by_column_support(self):
        # x jitter below _COL_GAP stays one cluster -> the pre-column
        # behavior (global y-desc sort) byte-for-byte
        pdf = (
            b"%PDF-1.4\nstream\n"
            b"BT /F1 12 Tf 90 700 Td (indented) Tj ET\n"
            b"BT /F1 12 Tf 72 714 Td (flush) Tj ET\n"
            b"endstream\n%%EOF\n"
        )
        text, _ = extract_pdf(pdf)
        assert text == "flush indented"

    def test_corpus_two_col_pages_roundtrip_logical_order(self):
        # the corpus lays ~1/4 of PDF pages out in two columns without
        # consuming extra rng draws: same seed + a layout key that maps
        # to two columns must read back the SAME logical word order as
        # the single-column layout of the same content
        import random as _random
        import zlib as _zlib

        from clawrag_spark.corpus import _pdf_page_stream

        keys = [f"t{i}" for i in range(64)]
        k2 = next(k for k in keys if _zlib.crc32(k.encode()) % 4 == 0)
        k1 = next(k for k in keys if _zlib.crc32(k.encode()) % 4 != 0)

        def build(key):
            rng = _random.Random(7)
            page = _pdf_page_stream(rng, "en", key, layout_key=key)
            return b"%PDF-1.4\n" + page + b"%%EOF\n"

        two, _ = extract_pdf(build(k2))
        one, _ = extract_pdf(build(k1))
        assert b" 320 " in build(k2) and b" 320 " not in build(k1)
        strip = lambda t: t.replace("#", "").split()[1:]  # titles differ
        assert strip(two) == strip(one)

    TABLE_PDF = (
        b"%PDF-1.4\nstream\n"
        b"BT /F1 12 Tf 72 700 Td (intro prose) Tj ET\n"
        b"BT /F1 12 Tf 72 650 Td (name) Tj ET\n"
        b"BT /F1 12 Tf 220 650 Td (qty) Tj ET\n"
        b"BT /F1 12 Tf 368 650 Td (price) Tj ET\n"
        b"BT /F1 12 Tf 72 632 Td (apples) Tj ET\n"
        b"BT /F1 12 Tf 220 632 Td (3) Tj ET\n"
        b"BT /F1 12 Tf 368 632 Td (1.20) Tj ET\n"
        b"BT /F1 12 Tf 72 600 Td (closing prose) Tj ET\n"
        b"endstream\n%%EOF\n"
    )

    def test_table_band_detected_and_inlined(self):
        # >=2 consecutive rows with an identical >=3-column x-signature
        # become a markdown table, read inline at its y position
        text, counts = extract_pdf(self.TABLE_PDF)
        assert counts["tables_count"] == 1
        assert text == (
            "intro prose\n\n"
            "| name | qty | price |\n"
            "| --- | --- | --- |\n"
            "| apples | 3 | 1.20 |\n\n"
            "closing prose"
        )

    def test_two_wide_alignment_is_layout_not_table(self):
        # aligned baselines with only TWO x positions are a two-column
        # layout (the documented disambiguator), never a table
        text, counts = extract_pdf(self.TWO_COL)
        assert counts["tables_count"] == 0
        assert "|" not in text

    def test_corpus_table_pages_detected(self):
        import random as _random
        import zlib as _zlib

        from clawrag_spark.corpus import _pdf_page_stream

        kt = next(
            k
            for k in (f"t{i}" for i in range(256))
            if _zlib.crc32(k.encode()) % 16 == 2
        )
        rng = _random.Random(11)
        page = _pdf_page_stream(rng, "en", kt, layout_key=kt)
        text, counts = extract_pdf(b"%PDF-1.4\n" + page + b"%%EOF\n")
        assert counts["tables_count"] == 1
        assert "| --- | --- | --- |" in text


class TestChunkers:
    def test_fixed_window_reference_semantics(self):
        # pipeline.py:141-154: start += size - overlap; end-guard break
        text = "abcdefghij" * 10  # 100 chars
        chunks = fixed_window_chunks(text, 40, 10)
        assert [c.char_start for c in chunks] == [0, 30, 60]
        assert chunks[0].text == text[0:40]
        assert chunks[-1].char_end == 100
        # reassembly: each next chunk starts `overlap` before previous end
        for a, b in zip(chunks, chunks[1:]):
            assert b.char_start == a.char_end - 10

    def test_fixed_window_short(self):
        assert fixed_window_chunks("abc", 10, 2) == [("abc", 0, 3)]
        assert fixed_window_chunks("", 10, 2) == []

    def test_separator_cascade_first_separator_only(self):
        # text has both \n\n and ". " — only \n\n is used (reference bug)
        text = "aaa. bbb\n\nccc. ddd\n\neee"
        chunks = separator_cascade_chunks(text, chunk_size=10, chunk_overlap=0)
        assert [c.text for c in chunks] == ["aaa. bbb", "ccc. ddd", "eee"]

    def test_separator_cascade_overlap(self):
        text = "one two three\n\nfour five six\n\nseven eight nine"
        chunks = separator_cascade_chunks(text, chunk_size=16, chunk_overlap=4)
        # overlap = last 4 chars of previous *stripped* chunk
        assert chunks[1].text.startswith(chunks[0].text[-4:])

    def test_separator_cascade_spans_cover_text(self):
        text = ("word " * 50).strip()
        chunks = separator_cascade_chunks(text, 40, 10)
        assert chunks[0].char_start == 0
        assert chunks[-1].char_end == len(text)
        for c in chunks:
            assert 0 <= c.char_start <= c.char_end <= len(text)

    def test_separator_cascade_no_separator(self):
        # single unbroken token: the reference would crash on "".split("");
        # we split into chars (documented divergence)
        chunks = separator_cascade_chunks("x" * 25, chunk_size=10, chunk_overlap=0)
        assert "".join(c.text for c in chunks) == "x" * 25

    def test_sentence_chunks_token_budget(self):
        text = ("This is a sentence with seven words here. " * 20).strip()
        chunks = sentence_chunks(text, chunk_size=20, overlap=8)
        assert len(chunks) > 1
        for c in chunks:
            assert len(c.text.split()) <= 20 + 8

    def test_deterministic(self):
        text = "Alpha beta. Gamma delta.\n\nEpsilon zeta eta theta."
        for fn in (
            lambda: fixed_window_chunks(text, 16, 4),
            lambda: separator_cascade_chunks(text, 16, 4),
            lambda: sentence_chunks(text, 6, 2),
        ):
            assert fn() == fn()


class TestQuality:
    def test_min_length_zero(self):
        assert score_extraction("too short", "en") == 0.0

    def test_weighted_sum(self):
        text = "x" * 5000
        # length 1.0*0.1 + lang 1.0*0.2 + ocr 0.5*0.3 + struct 0.2*0.4 = 0.53
        assert abs(score_extraction(text, "en") - 0.53) < 1e-9

    def test_no_lang(self):
        text = "y" * 2500
        # 0.5*0.1 + 0 + 0.15 + 0.08 = 0.28
        assert abs(score_extraction(text, None) - 0.28) < 1e-9

    def test_structure_score(self):
        assert structure_score(None) == 0.1
        assert abs(structure_score({"tables_count": 1, "headings_count": 2,
                                    "lists_count": 3, "images_count": 0}) - 0.9) < 1e-9
        s = structure_score({"tables_count": 5, "headings_count": 5,
                             "lists_count": 5, "images_count": 1})
        assert s == 1.0  # 1.0 * 1.2 capped

    def test_ocr_penalty_spaced_words(self):
        bad = "l i k e t h i s " * 30 + "z" * 100
        good = "a normal sentence " * 20
        assert score_extraction(bad, "en") < score_extraction(good, "en")


class TestLangId:
    def test_basic(self):
        en = "the quick fox and the lazy dog are in the yard with all of them"
        de = "der schnelle fuchs und der faule hund sind mit einer katze im garten"
        fr = "le renard rapide et le chien paresseux sont dans le jardin avec des chats"
        assert detect_language(en) == "en"
        assert detect_language(de) == "de"
        assert detect_language(fr) == "fr"

    def test_min_chars(self):
        assert detect_language("short") == "unknown"
        assert detect_language(None) == "unknown"


class TestBm25Tokenize:
    def test_section_numbers(self):
        # "§ 230" → §230 + bare number (bm25_index.py:33,43-46)
        assert tokenize("See § 230 now") == ["see", "§230", "230", "now"]

    def test_digit_expansion(self):
        # multi-digit numbers add each nonzero digit (bm25_index.py:48-52)
        assert tokenize("room 205") == ["room", "205", "2", "5"]

    def test_lowercase_words(self):
        assert tokenize("Hello World") == ["hello", "world"]
        assert tokenize("") == []


class TestOracleRouting:
    def test_routes(self):
        html = b"<html><body><p>hello world paragraph with some text</p></body></html>"
        r = process_document(html)
        assert r.mime == "text/html" and r.engine == "docling"
        r2 = process_document(b"plain text here")
        assert r2.engine == "text_reader" and r2.text == "plain text here"
        r3 = process_document(b"")
        assert r3.error == "empty_input"
        r4 = process_document(bytes(range(256)))
        assert r4.error == "unsupported_type"

    def test_doc_hash_is_sha256_of_payload(self):
        import hashlib

        payload = b"<html><body><p>abc def ghi</p></body></html>"
        r = process_document(payload)
        assert r.doc_hash == hashlib.sha256(payload).hexdigest()
        assert r.doc_id == hashlib.sha256(r.text.encode()).hexdigest()[:16]


def test_row_chunks_crlf_offsets_exact():
    """CRLF / exotic terminators: spans must index the true source
    positions (round-2 advice: len+1 arithmetic drifted per line)."""
    from clawrag_spark.core.chunkers import row_chunks

    for nl in ("\n", "\r\n", "\x0b", " "):
        text = nl.join(["name,value", "a,1", "b,2", "c,3", "d,4"]) + nl
        chunks = row_chunks(text, rows_per_chunk=2)
        assert len(chunks) == 2
        for ch in chunks:
            # chunk body (minus the re-prefixed header) must be exactly
            # the source slice, modulo the terminator flavour
            body = ch.text.split("\n", 1)[1]
            src = text[ch.char_start:ch.char_end]
            assert [l for l in src.splitlines()] == body.split("\n"), (
                nl.encode(), ch, src
            )


def test_pdf_repair_recovers_truncated_documents():
    """S8: structural repair must recover text from a PDF truncated
    mid-text-op, be the identity on intact documents, and pass the
    original failure through when nothing is salvageable."""
    import random

    from clawrag_spark.core.oracle import process_document
    from clawrag_spark.core.pdf_extract import extract_pdf, repair_pdf
    from clawrag_spark.corpus import _pdf_doc

    rng = random.Random(3)
    doc = _pdf_doc(rng, "en", "Repair fixture title")
    assert repair_pdf(doc) == doc, "intact doc must pass through unchanged"
    full = process_document(doc, "en")
    assert full.error is None and full.text_length > 0

    for frac in (2, 3):
        broken = doc[: len(doc) * (frac - 1) // frac]
        naive, _ = extract_pdf(broken)
        r = process_document(broken, "en")
        assert r.error is None
        assert r.text_length >= len(naive), "repair must never lose text"
        assert r.artifacts.get("repaired_count") == 1
        # the repaired text is a prefix-consistent subset of the intact doc
        assert r.text_length <= full.text_length

    # leading-garbage repair (direct API: mime routing can't see it)
    garb = b"\x00\x01junk" + doc
    assert extract_pdf(repair_pdf(garb))[0] == full.text

    # unsalvageable: %PDF header but no streams at all — empty text,
    # no crash, no phantom repair flag (P3 gates it downstream)
    r = process_document(b"%PDF-1.4\nnothing here", "en")
    assert r.text == ""
    assert "repaired_count" not in r.artifacts


def test_embedder_fallback_chain():
    """E2: primary failure walks the chain (skipping the tried model),
    the resolution is cached under the ORIGINAL key, and exhausting the
    chain raises (embedding_manager.py:43-67,146-163)."""
    import numpy as np
    import pytest as _pytest

    from clawrag_spark.core import embedder as E

    E._RESOLVE_CACHE.clear()
    # healthy primary resolves directly
    assert E.resolve_embedder("hash", "hash-64:v1") == ("hash-64:v1", 64)

    # dead primary falls back to the first live chain entry
    E._RESOLVE_CACHE.clear()
    down = {"hash-64:v1"}
    name, dim = E.resolve_embedder(
        "hash", "hash-64:v1", available=lambda m: m not in down
    )
    assert (name, dim) == ("hash-32:v1", 32)
    # cached under the original key: a later call with everything
    # healthy still returns the fallback (reference :158-160)
    assert E.resolve_embedder("hash", "hash-64:v1") == ("hash-32:v1", 32)

    # exhausted chain raises; fallback off fails fast
    E._RESOLVE_CACHE.clear()
    with _pytest.raises(LookupError):
        E.resolve_embedder("hash", "hash-64:v1", available=lambda m: False)
    with _pytest.raises(LookupError):
        E.resolve_embedder(
            "hash", "hash-64:v1",
            available=lambda m: m != "hash-64:v1", use_fallback=False,
        )

    # the resolved model embeds at its registry dim, same math as
    # embed_many_np
    E._RESOLVE_CACHE.clear()
    vecs = E.embed_with_model(["alpha beta"], "hash-32:v1")
    assert vecs.shape == (1, 32)
    assert np.allclose(vecs, E.embed_many_np(["alpha beta"], 32))


class TestMadAnomalies:
    def test_hand_computed_spike_and_degenerate_key(self, spark):
        from clawrag_spark.operators import stats as S

        rows = (
            # key "a": values 10,12,11,13,11,400 -> med 11.5, spike at 400
            [("a", f"d{i}", v) for i, v in
             enumerate([10, 12, 11, 13, 11, 400])]
            # key "b": constant values -> MAD 0 -> null z, never flagged
            + [("b", f"d{i}", 5) for i in range(4)]
        )
        df = spark.createDataFrame(rows, ["k", "day", "cnt"])
        got = {(r.k, r.day): r for r in
               S.mad_anomalies(df, "k", "cnt").collect()}
        import statistics
        vals = [10, 12, 11, 13, 11, 400]
        med = statistics.median(vals)           # order-stat mean = 11.5
        mad = statistics.median(sorted(abs(v - med) for v in vals))
        spike = got[("a", "d5")]
        assert spike.med == med and spike.mad == mad
        assert spike.robust_z == round(0.6745 * (400 - med) / mad, 6)
        assert spike.is_spike
        normal = got[("a", "d0")]
        assert not normal.is_spike
        degen = got[("b", "d0")]
        assert degen.mad == 0 and degen.robust_z is None
        assert degen.is_spike is False

    def test_odd_count_median_is_exact_order_stat(self, spark):
        from clawrag_spark.operators import stats as S

        df = spark.createDataFrame(
            [("k", str(i), v) for i, v in enumerate([7, 1, 9])],
            ["k", "day", "cnt"],
        )
        r = S.mad_anomalies(df, "k", "cnt").collect()[0]
        assert r.med == 7.0
