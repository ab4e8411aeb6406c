"""Extraction quality scorer — same math as the reference.

Reference: backend/src/core/quality_scorer.py
- weights length/lang/ocr/structure = 0.10/0.20/0.30/0.40 (:10-15)
- target length 5000, min length 20, artifact penalty 0.1 (:17-20)
- structure score from artifact counts (:22-60)
- OCR artifact penalties (:62-91)
- weighted sum, penalty subtraction, clamp [0,1] (:94-143)

Implemented as a pure function for the oracle/UDF path; the arithmetic
part is also mirrored as Spark column expressions in
``clawrag_spark.operators.textops.quality_score_cols`` for the
SQL-expressible oracle check.
"""

from __future__ import annotations

import re

W_LENGTH = 0.10
W_LANG = 0.20
W_OCR = 0.30
W_STRUCT = 0.40

TARGET_TEXT_LENGTH = 5000
MIN_TEXT_LENGTH = 20
ARTIFACT_PENALTY = 0.1

_SPACED_RE = re.compile(r"\b\w\s\w\s\w\b")


def structure_score(artifacts: dict | None) -> float:
    """Structure preservation score from artifact counts (:22-60)."""
    if not artifacts:
        return 0.1
    score = 0.0
    if artifacts.get("tables_count", 0) > 0:
        score += 0.4
    if artifacts.get("headings_count", 0) > 0:
        score += 0.3
    if artifacts.get("lists_count", 0) > 0:
        score += 0.2
    if artifacts.get("images_count", 0) > 0:
        score += 0.1
    total = (
        artifacts.get("tables_count", 0)
        + artifacts.get("headings_count", 0)
        + artifacts.get("lists_count", 0)
    )
    if total > 10:
        score = min(1.0, score * 1.2)
    elif total == 0:
        return 0.1
    return min(1.0, score)


def ocr_artifact_penalty(text: str) -> float:
    """Penalty for replacement chars, spaced-out words, short lines (:62-91)."""
    if not text:
        return 0.0
    penalty = 0.0
    repl = text.count("�")
    if repl > 5:
        penalty += ARTIFACT_PENALTY * min(1.0, repl / 50)
    if len(_SPACED_RE.findall(text)) > 10:
        penalty += ARTIFACT_PENALTY
    lines = text.splitlines()
    short = sum(1 for line in lines if len(line.strip()) in (1, 2))
    if short > 20 and lines and short / len(lines) > 0.1:
        penalty += ARTIFACT_PENALTY
    return penalty


def score_extraction(
    text: str | None,
    language: str | None,
    ocr_confidence: float | None = None,
    struct_score: float | None = None,
) -> float:
    """Weighted quality score, clamped to [0, 1] (:94-143)."""
    n = len(text) if text else 0
    if n < MIN_TEXT_LENGTH:
        return 0.0
    length_score = min(1.0, n / TARGET_TEXT_LENGTH)
    lang_score = 1.0 if language and language != "unknown" else 0.0
    ocr_score = ocr_confidence if ocr_confidence is not None else 0.5
    st = struct_score if struct_score is not None else 0.2
    final = (
        length_score * W_LENGTH
        + lang_score * W_LANG
        + ocr_score * W_OCR
        + st * W_STRUCT
    )
    final -= ocr_artifact_penalty(text)
    return max(0.0, min(1.0, final))
