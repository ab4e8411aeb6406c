"""S13 data-type detection + S5 extension-vs-content crosscheck + C9
route dispatch — the smart-ingestion routing layer.

Reference: backend/src/services/data_type_detector.py:68-124 (extension
tables, CSV/Excel table validation ≥2 cols × ≥2 rows), applied by
backend/src/services/document_router_service.py:80-146 (routing rules →
per-profile chunk params) and backend/src/api/v1/rag/documents/
upload.py:70-116 (magic-byte vs extension crosscheck → reject).

Divergence (documented): the reference detects from the *filesystem
path* only; crawl URLs often have no extension, so when the extension
is unknown this detector falls back to content sniffing (MIME magic
bytes + email-header / code-declaration / delimiter heuristics over the
text head).  Everything is a pure function shared by the Arrow UDFs,
the oracle and the tests.
"""

from __future__ import annotations

import re

from .mime import MIME_BINARY, MIME_HTML, MIME_PDF, MIME_TEXT, decode_text, detect_mime

# reference enum values — data_type_detector.py:33-38
UNSTRUCTURED_TEXT = "unstructured_text"
STRUCTURED_TABLE = "structured_table"
CODE = "code"
EMAIL = "email"
UNKNOWN = "unknown"

# extension tables — data_type_detector.py:58-64
EMAIL_EXTENSIONS = {".eml", ".mbox", ".msg"}
CODE_EXTENSIONS = {
    ".py", ".js", ".ts", ".jsx", ".tsx", ".java", ".cpp", ".c",
    ".h", ".hpp", ".go", ".rs", ".rb", ".php", ".cs", ".swift",
}
TABLE_EXTENSIONS = {".xlsx", ".xls", ".csv", ".tsv"}
DOCLING_EXTENSIONS = {".pdf", ".docx", ".pptx", ".html", ".md"}
TEXT_EXTENSIONS = {".txt"}

_EXT_RE = re.compile(r"\.[A-Za-z0-9]{1,8}$")
_EMAIL_HEAD_RE = re.compile(
    r"^(from|to|subject|received|return-path|message-id):", re.IGNORECASE
)
_CODE_HEAD_RE = re.compile(
    r"^\s*(?:(?:pub\s+)?(?:fn|struct|impl|trait|mod)|(?:async\s+)?def|class"
    r"|function|import|from\s+\S+\s+import|#include|package)\b",
    re.MULTILINE,
)


def url_extension(url: str | None) -> str:
    """Lowercased extension of a url path ('' if none)."""
    if not url:
        return ""
    path = url.split("?", 1)[0].split("#", 1)[0]
    m = _EXT_RE.search(path.rsplit("/", 1)[-1])
    return m.group(0).lower() if m else ""


def validate_table(text: str, delimiter: str | None = None) -> bool:
    """A 'real table' needs ≥2 columns and ≥2 data rows past the header
    (data_type_detector.py:127-139), with a consistent column count."""
    lines = [ln for ln in (text or "").splitlines() if ln.strip()]
    if len(lines) < 3:  # header + 2 rows
        return False
    delims = [delimiter] if delimiter else [",", "\t", ";"]
    for d in delims:
        n_cols = lines[0].count(d) + 1
        if n_cols < 2:
            continue
        if all(ln.count(d) + 1 == n_cols for ln in lines[1:]):
            return True
    return False


def detect_data_type(url: str | None, payload: bytes | None) -> str:
    """Detect the ingestion route for one document from its raw payload.

    Extension-first (reference order — detector.detect():85-124), then
    content fallback when the extension is absent/unknown.
    """
    if payload is None or payload == b"":
        mime, text = None, ""
    else:
        mime = detect_mime(payload)
        text = decode_text(payload) if mime not in (MIME_PDF, MIME_BINARY) else ""
    return detect_data_type_from(url, mime, text)


def detect_data_type_from(url: str | None, mime: str | None, text: str) -> str:
    """Detector over pre-sniffed mime + decoded text (the pipeline's
    post-extraction stage already carries both)."""
    ext = url_extension(url)
    if ext in EMAIL_EXTENSIONS:
        return EMAIL
    if ext in CODE_EXTENSIONS:
        return CODE
    if ext in TABLE_EXTENSIONS:
        if validate_table(text):
            return STRUCTURED_TABLE
        return UNSTRUCTURED_TEXT  # table file without a real table — :139
    if ext in DOCLING_EXTENSIONS or ext in TEXT_EXTENSIONS:
        return UNSTRUCTURED_TEXT

    # no known extension → content sniff (divergence, documented above)
    if mime is None:
        return UNKNOWN
    if mime in (MIME_HTML, MIME_PDF):
        return UNSTRUCTURED_TEXT
    if mime == MIME_BINARY:
        return UNKNOWN
    head = (text or "")[:4096]
    first_lines = head.splitlines()[:10]
    n_header_hits = sum(1 for ln in first_lines if _EMAIL_HEAD_RE.match(ln))
    if n_header_hits >= 2:
        return EMAIL
    if _CODE_HEAD_RE.search(head):
        return CODE
    if validate_table(head):
        return STRUCTURED_TABLE
    return UNSTRUCTURED_TEXT


# S5: extension-vs-content crosscheck — upload.py:70-116's table of
# extensions whose magic bytes must match; a mismatch is a reject.
_EXPECTED_MIME_BY_EXT = {
    ".pdf": MIME_PDF,
    ".html": MIME_HTML,
    ".htm": MIME_HTML,
    ".txt": MIME_TEXT,
    ".md": MIME_TEXT,
    ".csv": MIME_TEXT,
    ".eml": MIME_TEXT,
}


def crosscheck_extension(url: str | None, payload: bytes | None) -> str | None:
    """Return an error label when the url extension promises a content
    type the magic bytes contradict (upload.py:70-116), else None."""
    if not payload:
        return None
    return crosscheck_extension_mime(url, detect_mime(payload))


def crosscheck_extension_mime(url: str | None, mime: str | None) -> str | None:
    """Crosscheck against a pre-sniffed mime (pipeline stage variant)."""
    ext = url_extension(url)
    expected = _EXPECTED_MIME_BY_EXT.get(ext)
    if expected is None or mime is None:
        return None
    if expected == MIME_TEXT and mime in (MIME_TEXT, MIME_HTML):
        return None  # markup inside a text-family file is acceptable
    if mime != expected:
        return f"ext_content_mismatch:{ext}:{mime}"
    return None


# C9: deterministic route → routing profile.  The reference picks the
# profile from an LLM classification (document_router_service.py:80-146);
# LLM ops are out of scope (SURVEY §2.2 / P13), so the engine maps the
# detected data type and lets callers override via an explicit profile
# column — the same injection point the router's rules occupy.
PROFILE_BY_ROUTE = {
    CODE: "code",
    STRUCTURED_TABLE: "technical",
    EMAIL: "default",
    UNSTRUCTURED_TEXT: "default",
    UNKNOWN: "default",
}
