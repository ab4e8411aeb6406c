"""Deterministic language identification.

The reference uses ``langdetect.detect`` with the seed pinned to 0 and a
50-char minimum (backend/src/services/metadata_extractor.py:91-115, seed
:22).  langdetect is still randomized across library versions, so the new
engine replaces it with a fully deterministic stopword-profile classifier
over the languages the synthetic corpus exercises (en/de/fr/es), with the
same 50-char minimum and ``"unknown"`` fallback (SURVEY.md A11).
"""

from __future__ import annotations

import re

MIN_CHARS = 50

_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the and of to in is that it for on with as was at by this have from "
        "or be are not but had his which they you were her she all".split()
    ),
    "de": frozenset(
        "der die das und ist nicht ein eine zu mit von den dem des im für "
        "auf als auch es an werden sich bei einer nach wird aus durch".split()
    ),
    "fr": frozenset(
        "le la les et de des du en un une est que qui dans pour pas sur au "
        "avec ne se ce il elle sont plus par mais ou nous vous".split()
    ),
    "es": frozenset(
        "el la los las y de del en un una es que no se con por para su al "
        "lo como más pero sus le ya o este sin sobre entre".split()
    ),
}
_LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tie-break order

_WORD_RE = re.compile(r"[a-zà-ÿäöüß]+")


def detect_language(text: str | None) -> str:
    """Return a 2-letter code or ``"unknown"``.

    Deterministic: counts stopword hits per profile over lowercase word
    tokens; the highest count wins, ties broken by ``_LANG_ORDER``; zero
    hits or fewer than ``MIN_CHARS`` chars → ``"unknown"``.
    """
    if not text or len(text) < MIN_CHARS:
        return "unknown"
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "unknown"
    best_lang = "unknown"
    best_hits = 0
    for lang in _LANG_ORDER:
        profile = _PROFILES[lang]
        hits = sum(1 for w in words if w in profile)
        if hits > best_hits:
            best_hits = hits
            best_lang = lang
    return best_lang if best_hits > 0 else "unknown"
