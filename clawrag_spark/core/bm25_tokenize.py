"""BM25 tokenizer — index-side semantics of the reference.

Reference: backend/src/core/bm25_index.py:21-54 (``_tokenize_text``):
- lowercase,
- ``§ 230`` → ``§230`` (collapse space between § and digits),
- tokens are ``§\\d+`` or ``\\w+`` runs,
- a ``§NNN`` token also emits the bare number,
- a multi-digit numeric token also emits each nonzero digit (the
  reference skips '0' digits for multi-char numbers).

Note the reference's *query-side* retriever tokenizes differently
(``text.lower().split()`` — bm25_retriever.py:11-13), an index/query
mismatch bug; this engine standardizes on the index tokenizer for both
sides (SURVEY.md §2.8 F5).
"""

from __future__ import annotations

import re

_SECTION_SPACE_RE = re.compile(r"§\s+(\d+)")
_TOKEN_RE = re.compile(r"§\d+|[\w]+")


def tokenize(text: str | None) -> list[str]:
    if not text:
        return []
    text = text.lower()
    text = _SECTION_SPACE_RE.sub(r"§\1", text)
    tokens: list[str] = []
    for token in _TOKEN_RE.findall(text):
        tokens.append(token)
        if token.startswith("§"):
            number = token[1:]
            if number.isdigit():
                tokens.append(number)
        elif token.isdigit() and len(token) > 1:
            for digit in token:
                if digit != "0" or len(token) == 1:
                    tokens.append(digit)
    return tokens
