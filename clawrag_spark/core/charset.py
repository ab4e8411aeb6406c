"""Byte-level character-encoding sniffing (WHATWG-prescan style).

A Common-Crawl-scale extraction pipeline cannot assume UTF-8: ~5 % of
the web still declares windows-125x / Shift_JIS / GB-family encodings,
and decoding those as UTF-8-with-fallback silently mojibakes the
extracted text.  This module implements the byte-level "prescan the
byte stream to determine its encoding" algorithm shape from the WHATWG
HTML standard §13.2.3 over the first 1024 bytes of a payload:

    BOM  >  <meta charset> / http-equiv content-type  >  <?xml encoding>
         >  strict-UTF-8 validity  >  latin-1 fallback

The last two steps replace WHATWG's locale default (windows-1252) with
the reference's own fallback chain (UTF-8 then latin-1,
backend/src/services/extraction_service.py:150-163) so pages with no
declaration decode byte-identically to the pre-sniff pipeline; the
spec's windows-1252 mapping still applies to *declared* latin-1-family
labels (a page that says iso-8859-1 means windows-1252 on the real
web — WHATWG encoding §4.2).

Spec fidelity kept deliberately:
- labels are matched case-insensitively after ASCII whitespace trim;
- x-user-defined declared in a meta maps to windows-1252;
- utf-16 / utf-16le / utf-16be declared in a meta map to UTF-8 (the
  prescan only ever sees ASCII-compatible bytes, so a UTF-16 label is
  self-refuting — WHATWG §13.2.3.2 "get an encoding from meta" step 5);
- a UTF-16 BOM wins over everything and suppresses the prescan.

Simplification vs the full prescan: any ``charset=`` inside a
``<meta ...>`` tag body counts (the spec's attribute tokenizer accepts
both the charset attribute and the http-equiv content form; both reach
the same ``charset=`` byte pattern).

Everything here is stdlib-only, byte-deterministic, and runs inside the
existing Arrow extraction stage (one regex scan over ≤1024 bytes per
document — negligible next to HTML tokenization).
"""

from __future__ import annotations

import codecs
import re

__all__ = ["normalize_label", "sniff_charset", "decode_html"]

BOM_UTF8 = b"\xef\xbb\xbf"
BOM_UTF16_BE = b"\xfe\xff"
BOM_UTF16_LE = b"\xff\xfe"

#: WHATWG encoding-label subset → python codec (canonical WHATWG name).
#: Every value must be a codec python can decode with.
_LABELS: dict[str, str] = {
    # utf-8 labels
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "unicode11utf8": "utf-8", "unicode20utf8": "utf-8", "x-unicode20utf8": "utf-8",
    # windows-1252 labels (the latin-1 family collapses here per spec)
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252", "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252", "iso88591": "windows-1252",
    "iso_8859-1": "windows-1252", "iso_8859-1:1987": "windows-1252",
    "iso-ir-100": "windows-1252", "latin1": "windows-1252",
    "l1": "windows-1252", "ascii": "windows-1252",
    "us-ascii": "windows-1252", "ansi_x3.4-1968": "windows-1252",
    "cp819": "windows-1252", "ibm819": "windows-1252",
    "csisolatin1": "windows-1252",
    # other single-byte windows/iso pages common in crawls
    "windows-1250": "windows-1250", "cp1250": "windows-1250",
    "iso-8859-2": "iso-8859-2", "latin2": "iso-8859-2",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8_r": "koi8-r",
    "windows-1253": "windows-1253", "windows-1254": "windows-1254",
    "windows-1255": "windows-1255", "windows-1256": "windows-1256",
    "windows-1257": "windows-1257", "windows-1258": "windows-1258",
    "iso-8859-15": "iso-8859-15", "latin9": "iso-8859-15",
    "iso-8859-7": "iso-8859-7", "iso-8859-9": "windows-1254",
    # CJK multi-byte
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "x-sjis": "shift_jis", "ms_kanji": "shift_jis",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk", "gb_2312-80": "gbk",
    "x-gbk": "gbk", "csgb2312": "gbk", "chinese": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5", "x-x-big5": "big5", "cn-big5": "big5",
    "euc-kr": "euc-kr", "korean": "euc-kr", "ks_c_5601-1987": "euc-kr",
    "csksc56011987": "euc-kr", "windows-949": "euc-kr",
    # labels with special meta semantics
    "x-user-defined": "windows-1252",
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
}

# charset= inside a <meta ...> tag: both <meta charset="x"> and
# <meta http-equiv="content-type" content="text/html; charset=x">
# reduce to this byte pattern.  Bounded repeats only (RE2-portable
# grammar, same discipline as the corpus regexes).
_META_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9._:-]{1,40})",
    re.IGNORECASE,
)
_XML_RE = re.compile(
    rb"^\s{0,32}<\?xml[^>]{0,128}?encoding\s*=\s*[\"']([a-zA-Z0-9._:-]{1,40})[\"']",
    re.IGNORECASE,
)


def normalize_label(label: str | bytes | None) -> str | None:
    """WHATWG "get an encoding" for a declared label: trim ASCII
    whitespace, lowercase, look up the alias table.  None for labels
    outside the table (caller falls back to the undeclared chain)."""
    if label is None:
        return None
    if isinstance(label, bytes):
        try:
            label = label.decode("ascii")
        except UnicodeDecodeError:
            return None
    enc = _LABELS.get(label.strip(" \t\n\r\x0c").lower())
    if enc is None:
        return None
    try:  # the table only holds decodable codecs; keep the guard anyway
        codecs.lookup(enc)
    except LookupError:  # pragma: no cover
        return None
    return enc


def sniff_charset(payload: bytes, scan_bytes: int = 1024) -> tuple[str, str]:
    """Return (encoding, source) for an HTML payload.

    source ∈ {bom-utf-8, bom-utf-16le, bom-utf-16be, meta, xml,
    utf-8-valid, fallback} — kept so extraction metadata can report
    *why* a page decoded the way it did (the coverage report groups on
    it; a rising `fallback` share is a crawl-quality alarm).
    """
    if payload.startswith(BOM_UTF8):
        return "utf-8", "bom-utf-8"
    if payload.startswith(BOM_UTF16_LE):
        return "utf-16-le", "bom-utf-16le"
    if payload.startswith(BOM_UTF16_BE):
        return "utf-16-be", "bom-utf-16be"
    head = payload[:scan_bytes]
    m = _META_RE.search(head)
    if m:
        enc = normalize_label(m.group(1))
        if enc is not None:
            return enc, "meta"
    m = _XML_RE.match(head)
    if m:
        enc = normalize_label(m.group(1))
        if enc is not None:
            return enc, "xml"
    try:
        payload.decode("utf-8")
        return "utf-8", "utf-8-valid"
    except (UnicodeDecodeError, ValueError):
        return "latin-1", "fallback"


def decode_html(payload: bytes) -> tuple[str, str, str]:
    """Sniff + decode an HTML payload → (text, encoding, source).

    Declared/BOM encodings decode with errors="replace" (a page that
    declares cp1251 and contains one stray byte should not flip the
    whole document to the fallback); the undeclared chain is strict
    UTF-8 then latin-1, which never fails.  A leading BOM character is
    stripped after decode so downstream text is BOM-free either way.
    """
    enc, src = sniff_charset(payload)
    if src.startswith("bom-"):
        drop = len(BOM_UTF8) if src == "bom-utf-8" else len(BOM_UTF16_LE)
        text = payload[drop:].decode(enc, errors="replace")
    else:
        text = payload.decode(enc, errors="replace")
    if text.startswith("﻿"):
        text = text[1:]
    return text, enc, src
