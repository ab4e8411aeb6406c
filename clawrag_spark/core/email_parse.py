"""RFC-822 email parsing (S11 of SURVEY.md §2.1).

Reference: backend/src/services/email_loader.py:48-108 — headers
(from/to/cc/bcc/subject/date/message_id/in_reply_to/references) become
metadata, the plain-text body is preferred over HTML.  Implemented on
the stdlib ``email`` package (deterministic), as a pure function shared
by a pandas UDF and tests.
"""

from __future__ import annotations

import email
import email.policy
from typing import NamedTuple

_HEADER_KEYS = (
    "from", "to", "cc", "bcc", "subject", "date",
    "message-id", "in-reply-to", "references",
)


class ParsedEmail(NamedTuple):
    body: str
    headers: dict[str, str]
    error: str | None


def parse_email(payload: bytes | None) -> ParsedEmail:
    """Parse one RFC-822 message: headers → metadata, text body preferred."""
    if not payload:
        return ParsedEmail("", {}, "empty_input")
    try:
        msg = email.message_from_bytes(payload, policy=email.policy.default)
    except Exception:
        return ParsedEmail("", {}, "email_parse_failure")

    headers = {}
    for key in _HEADER_KEYS:
        val = msg.get(key)
        if val is not None:
            headers[key.replace("-", "_")] = str(val)

    body = ""
    try:
        part = msg.get_body(preferencelist=("plain", "html"))
        if part is not None:
            body = part.get_content()
            if part.get_content_type() == "text/html":
                from .html_extract import extract_html

                body, _ = extract_html(body)
    except Exception:
        return ParsedEmail("", headers, "email_body_failure")
    return ParsedEmail(body or "", headers, None)
