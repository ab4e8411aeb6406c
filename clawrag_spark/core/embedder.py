"""Deterministic hashing-trick text embeddings.

Replaces the reference's network embedding providers (Ollama/OpenAI/HF,
nomic-embed-text 768-dim default — backend/src/core/embedding_manager.py:
58-67,104-302) with a feature-hashing embedder: token counts are hashed
into ``dim`` buckets with a ±1 sign hash, then L2-normalized (float32).
Fully deterministic across processes (crc32-based, never Python's
salted ``hash``), vectorizable with numpy inside the pandas UDF, and a
drop-in config point for a real model provider at production scale.

Default ``dim=64`` at test scale (FIXTURES.md §2); 768 mirrors the
reference default.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

DEFAULT_DIM = 64

_TOKEN_RE = re.compile(r"\w+")


def embed_text_np(text: str | None, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Embed one string → float32 numpy vector (UDF hot path)."""
    vec = np.zeros(dim, dtype=np.float64)
    if text:
        for tok in _TOKEN_RE.findall(text.lower()):
            h = zlib.crc32(tok.encode("utf-8"))
            idx = h % dim
            sign = 1.0 if (h >> 31) & 1 == 0 else -1.0
            vec[idx] += sign
    norm = float(np.sqrt((vec * vec).sum()))
    if norm > 0:
        vec /= norm
    return vec.astype(np.float32)


def embed_text(text: str | None, dim: int = DEFAULT_DIM) -> list[float]:
    """Embed one string (oracle path; same math as ``embed_text_np``)."""
    return [float(x) for x in embed_text_np(text, dim)]


def embed_batch(texts, dim: int = DEFAULT_DIM) -> list[list[float]]:
    """Embed a batch (UDF path) — same math, loop kept in numpy per text."""
    return [embed_text(t, dim) for t in texts]
