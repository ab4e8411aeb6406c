"""Magic-byte MIME sniffing over raw page payloads.

Reference behavior: python-magic content sniff with mimetypes fallback and a
generic ``application/octet-stream`` default
(backend/src/services/metadata_extractor.py:31-61), plus the magic-byte
table used for upload validation
(backend/src/api/v1/rag/documents/upload.py:48-56, 70-116): ``%PDF`` for
PDF, ``PK\\x03\\x04`` for zip/office, leading ``<`` markup for HTML, and
"text types must be UTF-8-decodable".

This module re-expresses that as a deterministic pure function over the
leading bytes of the ``html`` binary column (no libmagic dependency).
"""

from __future__ import annotations

MIME_PDF = "application/pdf"
MIME_ZIP = "application/zip"
MIME_HTML = "text/html"
MIME_TEXT = "text/plain"
MIME_BINARY = "application/octet-stream"

_BOM_UTF8 = b"\xef\xbb\xbf"

# lowercase markers that identify HTML once the payload is known to be text
_HTML_MARKERS = (b"<!doctype", b"<html", b"<head", b"<body")


def detect_mime(payload: bytes) -> str:
    """Sniff the MIME type of a raw payload from its magic bytes.

    Deterministic, order-sensitive checks mirroring upload.py:48-56:
    PDF and ZIP magic first, then HTML markers (case-insensitive, after
    stripping an optional UTF-8 BOM and leading whitespace), then a UTF-8
    decodability test for text/plain, else application/octet-stream.
    """
    if not payload:
        return MIME_BINARY
    if payload.startswith(b"%PDF"):
        return MIME_PDF
    if payload.startswith(b"PK\x03\x04"):
        return MIME_ZIP

    head = payload
    if head.startswith(_BOM_UTF8):
        head = head[len(_BOM_UTF8):]
    elif head[:2] in (b"\xff\xfe", b"\xfe\xff"):
        # UTF-16 BOM: marker matching must happen on DECODED text — the
        # raw bytes interleave NULs ("<\\x00h\\x00..."), which is valid
        # UTF-8 and would silently misroute a UTF-16 HTML page to
        # text/plain.  Re-encode the decoded head to reuse the byte
        # marker table below.
        try:
            head = (
                payload[: 512]
                .decode("utf-16-le" if head[:2] == b"\xff\xfe" else "utf-16-be",
                        errors="ignore")
                .encode("utf-8")
            )
        except Exception:  # pragma: no cover - decode with ignore can't raise
            pass
    stripped = head.lstrip()
    low = stripped[:256].lower()
    for marker in _HTML_MARKERS:
        if low.startswith(marker):
            return MIME_HTML
    # a tag soup that merely *contains* an html marker early still counts
    if any(m in low for m in _HTML_MARKERS) or low.startswith(b"<"):
        return MIME_HTML

    try:
        head.decode("utf-8")
        return MIME_TEXT
    except (UnicodeDecodeError, ValueError):
        pass
    # latin-1 always decodes; treat mostly-printable latin-1 as text, the
    # reference reads text files with a latin-1 fallback
    # (backend/src/services/extraction_service.py:150-163)
    sample = head[:4096]
    if sample:
        printable = sum(1 for b in sample if 32 <= b < 127 or b in (9, 10, 13))
        if printable / len(sample) >= 0.9:
            return MIME_TEXT
    return MIME_BINARY


def decode_text(payload: bytes) -> str:
    """UTF-8 decode with latin-1 fallback (extraction_service.py:150-163).

    UTF-16 BOMs are honored first — without the check a BOM'd UTF-16
    payload is NUL-laced "valid UTF-8" and decodes to garbage."""
    if payload.startswith(_BOM_UTF8):
        payload = payload[len(_BOM_UTF8):]
    elif payload[:2] == b"\xff\xfe":
        return payload[2:].decode("utf-16-le", errors="replace")
    elif payload[:2] == b"\xfe\xff":
        return payload[2:].decode("utf-16-be", errors="replace")
    try:
        return payload.decode("utf-8")
    except (UnicodeDecodeError, ValueError):
        return payload.decode("latin-1")
