"""Single-process oracle: the reference semantics for one document.

This is the byte-identity gate of BASELINE.json: given one page's raw
payload it produces the extracted text, engine route, quality score,
language and chunk spans the Spark pipeline must reproduce *byte for
byte per url*.  The Spark pandas UDFs call the same ``process_document``
function, and pytest runs this module outside Spark against the Spark
output to verify the two independent execution paths agree.

Routing mirrors backend/src/services/extraction_service.py:120-187 and
docling_service.py:264-444:
- ``application/pdf``  → PDF layout parser with S8 repair-then-retry
  (``repair_pdf`` structurally fixes truncated text ops / unbalanced
  streams, mirroring pdf_repair_service.py:12-46's pikepdf round-trip;
  a failure the repair cannot salvage passes through as empty text +
  error, the reference's passthrough-on-failure),
- ``text/html``        → DOM + boilerplate-strip extractor,
- ``text/plain``       → UTF-8/latin-1 read, text kept as-is
  (extraction_service.py:150-163),
- anything else        → ``unsupported`` error row.
"""

from __future__ import annotations

import hashlib
from typing import NamedTuple

from . import charset as charset_mod
from . import mime as mime_mod
from .chunkers import Chunk, separator_cascade_chunks
from .html_extract import extract_html
from .langid import detect_language
from .pdf_extract import analyze_pdf, extract_pdf, repair_pdf
from .quality import score_extraction, structure_score

MAX_PAYLOAD_BYTES = 100 * 1024 * 1024  # 100 MB cap (docling_service.py:38)

ENGINE_DOCLING = "docling"        # html/pdf structured extraction route
ENGINE_TEXT = "text_reader"
ENGINE_UNSUPPORTED = "unsupported"

# default chunk config: separator cascade 1000/200 (indexing_service.py:33-43)
DEFAULT_CHUNK_SIZE = 1000
DEFAULT_CHUNK_OVERLAP = 200


class DocResult(NamedTuple):
    doc_hash: str          # sha256(payload) hex — extraction_service.py:95-99
    doc_id: str            # sha256(text)[:16]  — indexing_service.py:54-58
    mime: str
    engine: str
    text: str
    text_length: int
    quality_score: float
    language: str
    error: str | None
    artifacts: dict


def process_document(payload: bytes | None, lang_hint: str | None = None) -> DocResult:
    """Run the full per-document reference pipeline on one payload."""
    payload = payload or b""
    doc_hash = hashlib.sha256(payload).hexdigest()

    error: str | None = None
    artifacts: dict = {}
    text = ""
    engine = ENGINE_UNSUPPORTED

    if len(payload) == 0:
        error = "empty_input"
        detected = mime_mod.MIME_BINARY
    elif len(payload) > MAX_PAYLOAD_BYTES:
        error = "file_too_large"
        detected = mime_mod.detect_mime(payload)
    else:
        detected = mime_mod.detect_mime(payload)
        if detected == mime_mod.MIME_PDF:
            engine = ENGINE_DOCLING
            info = analyze_pdf(payload)
            if info["is_encrypted"]:
                error = "encrypted_pdf"  # docling_service.py:304-309 gate
            else:
                try:
                    text, artifacts = extract_pdf(payload)
                except Exception:
                    error = "pdf_parse_failure"
                # S8 repair-then-retry (pdf_repair_service.py:12-46):
                # structural repair runs whenever the document is
                # damaged (repair_pdf is identity on intact documents);
                # the repaired parse wins only when it recovers MORE
                # text, and the original failure passes through when
                # the repair salvages nothing (passthrough-on-failure)
                repaired = repair_pdf(payload)
                if repaired != payload:
                    try:
                        r_text, r_artifacts = extract_pdf(repaired)
                    except Exception:
                        r_text = ""
                    if r_text and (error or len(r_text) > len(text)):
                        text = r_text
                        artifacts = dict(r_artifacts, repaired_count=1)
                        error = None
        elif detected == mime_mod.MIME_HTML:
            engine = ENGINE_DOCLING
            try:
                # WHATWG-prescan charset sniff (core/charset.py): BOM >
                # meta/http-equiv > xml decl > strict UTF-8 > latin-1.
                # Undeclared pages decode byte-identically to the old
                # decode_text chain; declared cp125x/Shift_JIS/GB pages
                # stop mojibaking.  encoding+source land in artifacts so
                # the extraction-metadata sink can report decode mix.
                decoded, enc, enc_src = charset_mod.decode_html(payload)
                text, artifacts = extract_html(decoded)
                artifacts = dict(artifacts, encoding=enc, encoding_source=enc_src)
            except Exception:
                error = "html_parse_failure"
            if not error and not text:
                error = "no_content"
        elif detected == mime_mod.MIME_TEXT:
            engine = ENGINE_TEXT
            text = mime_mod.decode_text(payload)
        else:
            error = "unsupported_type"

    language = detect_language(text)
    if language == "unknown" and lang_hint and text:
        # input `lang` column is used as a prior when the detector abstains
        # (SURVEY.md A11)
        language = lang_hint

    st = structure_score(artifacts) if artifacts else None
    quality = score_extraction(text, language if language != "unknown" else None,
                               ocr_confidence=None, struct_score=st)

    doc_id = hashlib.sha256(text.encode("utf-8")).hexdigest()[:16]
    return DocResult(
        doc_hash=doc_hash,
        doc_id=doc_id,
        mime=detected,
        engine=engine,
        text=text,
        text_length=len(text),
        quality_score=quality,
        language=language,
        error=error,
        artifacts=artifacts,
    )


def chunk_document(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> list[Chunk]:
    """Reference chunker for the pipeline (C2 separator cascade)."""
    if not text:
        return []
    return separator_cascade_chunks(text, chunk_size, overlap)
