"""Byte-level charset sniffing (core/charset.py) + kernel integration.

Reference parity: the reference reads text with a UTF-8→latin-1
fallback (backend/src/services/extraction_service.py:150-163); the
sniffer generalizes that chain with WHATWG-prescan declared-encoding
handling while keeping undeclared pages byte-identical to the old path.
"""

from clawrag_spark.core import charset as cs
from clawrag_spark.core import mime, oracle


class TestSniff:
    def test_bom_beats_meta(self):
        assert cs.sniff_charset(b'\xef\xbb\xbf<meta charset="shift_jis">') == (
            "utf-8", "bom-utf-8"
        )
        assert cs.sniff_charset(b"\xff\xfex\x00") == ("utf-16-le", "bom-utf-16le")
        assert cs.sniff_charset(b"\xfe\xff\x00x") == ("utf-16-be", "bom-utf-16be")

    def test_meta_forms_and_label_mangling(self):
        assert cs.sniff_charset(b'<meta charset="windows-1251">')[0] == "windows-1251"
        # http-equiv form, case-insensitive, whitespace-padded label
        assert cs.sniff_charset(
            b'<META HTTP-EQUIV="Content-Type" CONTENT="text/html; CHARSET=GB2312">'
        ) == ("gbk", "meta")
        assert cs.sniff_charset(b"<meta charset=' Shift_JIS '>")[0] == "shift_jis"

    def test_whatwg_special_rules(self):
        # declared latin-1 family means windows-1252 on the real web
        assert cs.sniff_charset(b'<meta charset="iso-8859-1">')[0] == "windows-1252"
        assert cs.sniff_charset(b'<meta charset="x-user-defined">')[0] == "windows-1252"
        # a UTF-16 label found by the ASCII prescan is self-refuting → utf-8
        for label in (b"utf-16", b"utf-16le", b"utf-16be"):
            assert cs.sniff_charset(b'<meta charset="' + label + b'">')[0] == "utf-8"

    def test_meta_beats_xml_and_xml_beats_default(self):
        both = b'<?xml version="1.0" encoding="utf-8"?><meta charset="latin1">'
        assert cs.sniff_charset(both) == ("windows-1252", "meta")
        assert cs.sniff_charset(
            b'<?xml version="1.0" encoding="ISO-8859-2"?><html/>'
        ) == ("iso-8859-2", "xml")

    def test_unknown_label_falls_through(self):
        assert cs.sniff_charset(b'<meta charset="klingon-8">ascii page') == (
            "utf-8", "utf-8-valid"
        )

    def test_undeclared_chain_matches_legacy_decode(self):
        # valid utf-8 → utf-8; invalid → latin-1 (the reference chain)
        assert cs.sniff_charset("caf\xe9 utf8".encode("utf-8")) == (
            "utf-8", "utf-8-valid"
        )
        assert cs.sniff_charset("caf\xe9 latin".encode("latin-1")) == (
            "latin-1", "fallback"
        )

    def test_declaration_outside_scan_window_is_ignored(self):
        page = b" " * 2000 + b'<meta charset="koi8-r">'
        assert cs.sniff_charset(page)[1] == "utf-8-valid"


class TestDecode:
    def test_declared_cp1251_roundtrip(self):
        text = "Привет мир"
        got, enc, src = cs.decode_html(
            b'<meta charset="windows-1251">' + text.encode("windows-1251")
        )
        assert enc == "windows-1251" and src == "meta"
        assert text in got

    def test_declared_with_stray_byte_does_not_flip_to_fallback(self):
        page = b'<meta charset="windows-1251">' + "Да".encode("windows-1251") + b"\x98"
        got, enc, _ = cs.decode_html(page)  # 0x98 undefined in cp1251
        assert enc == "windows-1251" and "Да" in got and "�" in got

    def test_utf16le_bom_decode(self):
        got, enc, src = cs.decode_html(b"\xff\xfe" + "héllo".encode("utf-16-le"))
        assert (enc, src) == ("utf-16-le", "bom-utf-16le")
        assert got == "héllo"

    def test_undeclared_pages_decode_identically_to_decode_text(self):
        for raw in (
            "plain ascii".encode(),
            "caf\xe9 d\xe9j\xe0".encode("utf-8"),
            "caf\xe9 d\xe9j\xe0".encode("latin-1"),
            b"\xef\xbb\xbfbom utf8",
        ):
            assert cs.decode_html(raw)[0] == mime.decode_text(raw)


class TestKernelIntegration:
    def test_cp1251_page_extracts_real_cyrillic(self):
        html = (
            '<html><head><meta charset="windows-1251"><title>Т</title></head>'
            "<body><p>Привет мир, это тестовая страница про кошек.</p></body></html>"
        )
        r = oracle.process_document(html.encode("windows-1251"), "")
        assert r.error is None
        assert "Привет мир" in r.text
        assert r.artifacts["encoding"] == "windows-1251"
        assert r.artifacts["encoding_source"] == "meta"

    def test_utf16_html_routes_and_extracts(self):
        html = (
            "<html><head><title>Hi</title></head>"
            "<body><p>utf sixteen body with several words here.</p></body></html>"
        )
        payload = b"\xff\xfe" + html.encode("utf-16-le")
        assert mime.detect_mime(payload) == mime.MIME_HTML
        r = oracle.process_document(payload, "")
        assert r.error is None and "utf sixteen body" in r.text

    def test_undeclared_utf8_page_unchanged(self):
        html = (
            "<html><head><title>t</title></head>"
            "<body><p>ordinary page body text for the gate.</p></body></html>"
        )
        r = oracle.process_document(html.encode("utf-8"), "")
        assert r.error is None
        assert r.artifacts["encoding_source"] == "utf-8-valid"

    def test_utf16_plain_text_decodes(self):
        payload = b"\xff\xfe" + "plain sixteen text".encode("utf-16-le")
        assert mime.decode_text(payload) == "plain sixteen text"
