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


# token → crc32 memo: web text is Zipf-distributed, so the hit rate is
# high; the value is dim-independent (idx/sign derive from the hash).
_HASH_CACHE: dict[str, int] = {}
_HASH_CACHE_MAX = 1_000_000


def embed_text_np(text: str | None, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Embed one string → float32 numpy vector (UDF hot path).

    Identical math to the original definition; tokens are counted first
    (Counter) so each distinct token pays one hash lookup, and hashes
    are memoized across calls within a worker.
    """
    vec = np.zeros(dim, dtype=np.float64)
    if text:
        from collections import Counter

        cache_get = _HASH_CACHE.get
        for tok, count in Counter(_TOKEN_RE.findall(text.lower())).items():
            h = cache_get(tok)
            if h is None:
                h = zlib.crc32(tok.encode("utf-8"))
                if len(_HASH_CACHE) < _HASH_CACHE_MAX:
                    _HASH_CACHE[tok] = h
            sign = 1.0 if (h >> 31) & 1 == 0 else -1.0
            vec[h % dim] += sign * count
    norm = float(np.sqrt((vec * vec).sum()))
    if norm > 0:
        vec /= norm
    return vec.astype(np.float32)


def embed_text(text: str | None, dim: int = DEFAULT_DIM) -> list[float]:
    """Embed one string (oracle path; same math as ``embed_text_np``)."""
    return [float(x) for x in embed_text_np(text, dim)]


def embed_many_np(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Embed a whole batch → (n, dim) float32 matrix.

    Bit-identical to per-text ``embed_text_np`` (sign*count sums are
    exact integers in float64; normalization math unchanged) but the
    numpy allocation/normalization cost is paid once per batch instead
    of once per chunk.
    """
    from collections import Counter

    n = len(texts)
    mat = np.zeros((n, dim), dtype=np.float64)
    cache_get = _HASH_CACHE.get
    for i, text in enumerate(texts):
        if not text:
            continue
        row = mat[i]
        for tok, count in Counter(_TOKEN_RE.findall(text.lower())).items():
            h = cache_get(tok)
            if h is None:
                h = zlib.crc32(tok.encode("utf-8"))
                if len(_HASH_CACHE) < _HASH_CACHE_MAX:
                    _HASH_CACHE[tok] = h
            row[h % dim] += (1.0 if (h >> 31) & 1 == 0 else -1.0) * count
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0.0] = 1.0
    return (mat / norms[:, None]).astype(np.float32)


def embed_batch(texts, dim: int = DEFAULT_DIM) -> list[list[float]]:
    """Embed a batch (UDF path) — same math, loop kept in numpy per text."""
    return [embed_text(t, dim) for t in texts]
