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
    (b"BM", "image", "bmp"),
    (b"P6", "image", "ppm"),
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
            if fmt == "ppm" and (len(payload) < 3 or payload[2:3] not in b" \t\n\r"):
                continue  # 'P6' must be followed by whitespace
            return mtype, fmt
    return "unknown", "unknown"


# ------------------------------------------------ real decoders (no libs)
# BMP (24/32-bit uncompressed BI_RGB), binary PPM (P6), PNG (8-bit
# gray/RGB/RGBA, non-interlaced — stdlib zlib + the five filter
# predictors) and GIF (non-interlaced, real LZW) decode REAL pixels
# end-to-end in this container; jpeg gets real HEADER parsing
# (dimensions) but pixel decode still needs a codec library.

def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal BITMAPINFOHEADER 24-bit BMP writer (test-fixture twin of
    ``decode_bmp``; bottom-up rows, BGR, 4-byte row padding)."""
    import struct

    h, w = img.shape[:2]
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        img[y, :, ::-1].astype(np.uint8).tobytes() + b"\x00" * pad
        for y in range(h - 1, -1, -1)
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BI_RGB BMP to HxWx3 uint8 RGB."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip = h > 0          # positive height = bottom-up row order
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    data = np.frombuffer(payload, np.uint8, count=stride * h, offset=pixel_off)
    rows = data.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    rgb = rows[:, :, 2::-1]  # BGR(A) → RGB
    return (rgb[::-1] if flip else rgb).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval ≤ 255) to HxWx3 uint8 RGB,
    honouring whitespace/#-comment header grammar."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError(f"16-bit PPM not supported (maxval={maxval})")
    data = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (8-bit RGB/RGBA/gray, no interlace) — the
    test-fixture twin of ``decode_png``.  ``filter_type`` applies one
    scanline filter (0..4) to EVERY row so round-trip tests can
    exercise each predictor, not just filter 0."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[nch]
    img = img.astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w * nch, np.uint8)
    for y in range(h):
        row = img[y].reshape(-1)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(nch, np.uint8), row[:-nch]])
            filt = row - left
        elif filter_type == 2:  # Up
            filt = row - prev
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(nch, np.uint8), row[:-nch]])
            filt = row - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(nch, np.uint8), row[:-nch]])
            ul = np.concatenate([np.zeros(nch, np.uint8), prev[:-nch]])
            filt = row - _paeth(left, prev, ul)
        else:
            raise ValueError(f"unknown filter {filter_type}")
        raw.append(filter_type)
        raw += filt.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, ul: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (RFC 2083 §6.6) over whole scanlines."""
    a = left.astype(np.int16)
    b = up.astype(np.int16)
    c = ul.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced gray/RGB/RGBA PNG to HxWxC uint8
    — stdlib ``zlib`` + the five scanline filter predictors, no codec
    library.  Filters Sub/Up are vectorized (per-channel-lane cumsum /
    row add); Average and Paeth recurse on the just-reconstructed left
    neighbour, so they reconstruct pixel-sequentially per row with the
    up/upper-left terms precomputed as arrays.
    """
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    nch = {0: 1, 2: 3, 6: 4}.get(color_type)
    if depth != 8 or nch is None or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}) — 8-bit gray/RGB/RGBA only"
        )
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT stream corrupt: {exc}") from exc
    stride = w * nch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline data has wrong length")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        if f == 0:
            rec = row
        elif f == 1:  # Sub: per-channel-lane running sum mod 256
            rec = row
            for c in range(nch):
                rec[c::nch] = np.cumsum(rec[c::nch], dtype=np.uint64) & 0xFF
        elif f == 2:  # Up: uint8 addition wraps mod 256 per spec
            rec = row + prev
        elif f == 3:  # Average
            rec = row
            for x in range(stride):
                left = int(rec[x - nch]) if x >= nch else 0
                rec[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = row
            for x in range(stride):
                a = int(rec[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, nch).copy()


def _header_dims(payload: bytes, fmt: str) -> tuple[int, int] | None:
    """Real (height, width) from the container header, codec-free."""
    import struct

    try:
        if fmt == "bmp":
            w, h = struct.unpack_from("<ii", payload, 18)
            return abs(h), abs(w)
        if fmt == "ppm":
            img_hw = decode_ppm(payload).shape[:2]
            return img_hw[0], img_hw[1]
        if fmt == "png":  # IHDR: width/height big-endian at offset 16
            w, h = struct.unpack_from(">II", payload, 16)
            return h, w
        if fmt == "gif":  # logical screen descriptor at offset 6
            w, h = struct.unpack_from("<HH", payload, 6)
            return h, w
        if fmt == "jpeg":  # walk segments to the first SOFn marker
            pos = 2
            while pos + 9 < len(payload):
                if payload[pos] != 0xFF:
                    pos += 1
                    continue
                marker = payload[pos + 1]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack_from(">HH", payload, pos + 5)
                    return h, w
                seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
                pos += 2 + seg_len
    except (struct.error, ValueError, IndexError):
        return None
    return None


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in dimensions derived from the content hash.

    Used only for formats whose headers we don't parse; replaced by the
    real header parse for bmp/ppm/png/gif/jpeg above.
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
        dims = _header_dims(p, fmt) if p else (0, 0)
        if dims is None:
            dims = _fake_dims(p)
        h, w = dims
        out["media_type"].append(mtype)
        out["format"].append(fmt)
        out["width"].append(w)
        out["height"].append(h)
        out["n_bytes"].append(len(p))
        out["content_hash"].append(hashlib.sha256(p).hexdigest())
    return pd.DataFrame(out)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode to an HxWx3 uint8 array.

    BMP (24/32-bit BI_RGB), PPM (P6), and PNG (8-bit gray/RGB/RGBA,
    non-interlaced) decode for REAL, codec-free (decode_bmp /
    decode_ppm / decode_png above).  Other formats need Pillow; without
    it the deterministic fake emits a seeded gradient so downstream
    stages (resize, feature extract) still exercise real numpy work on
    real batch shapes.
    """
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6" and payload[2:3] in b" \t\n\r":
        return decode_ppm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        import struct
        import zlib

        try:
            img = decode_png(payload)
            if img.shape[2] == 1:       # gray → RGB
                return np.repeat(img, 3, axis=2)
            return img[:, :, :3].copy()  # RGBA → drop alpha
        except (ValueError, zlib.error, struct.error, IndexError):
            pass  # corrupt/unsupported PNG in a crawl → stand-in below
    if payload[:4] == b"GIF8":
        import struct

        try:
            return decode_gif(payload)
        except (ValueError, struct.error, IndexError):
            pass  # corrupt/unsupported GIF → stand-in below
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


# ------------------------------------------------------------------ GIF

def encode_gif(img: np.ndarray) -> bytes:
    """Minimal GIF89a writer (single frame, global color table, real
    LZW) — the test-fixture twin of ``decode_gif``.  The palette is
    built from the image's unique colors (≤256)."""
    import struct

    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif supports <=256 unique colors")
    depth = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    table = np.zeros((2**depth, 3), np.uint8)
    table[: len(palette)] = palette
    indices = inverse.astype(np.int32)

    # LZW encode: LSB-first bit packing; code width grows in lockstep
    # with the decoder (decoder widens when its table REACHES 2^width
    # after an append, so the encoder widens when dict_next does)
    min_code = depth
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    bits = bytearray()
    state = {"acc": 0, "n": 0, "width": min_code + 1}

    def emit(code: int) -> None:
        state["acc"] |= code << state["n"]
        state["n"] += state["width"]
        while state["n"] >= 8:
            bits.append(state["acc"] & 0xFF)
            state["acc"] >>= 8
            state["n"] -= 8

    def reset_dict():
        state["width"] = min_code + 1
        return {(i,): i for i in range(1 << min_code)}, eoi + 1

    emit(clear)
    table_d, dict_next = reset_dict()
    seq: tuple = ()
    for px in indices:
        cand = seq + (int(px),)
        if cand in table_d:
            seq = cand
            continue
        emit(table_d[seq])
        if dict_next < (1 << 12):
            table_d[cand] = dict_next
            dict_next += 1
            # the decoder lags the encoder by exactly one entry (it
            # builds E_{k-1} while reading c_k), so the encoder widens
            # one add LATER than the decoder's size==2^width rule
            if dict_next == (1 << state["width"]) + 1 and state["width"] < 12:
                state["width"] += 1
        else:
            emit(clear)
            table_d, dict_next = reset_dict()
        seq = (int(px),)
    if seq:
        emit(table_d[seq])
    emit(eoi)
    if state["n"]:
        bits.append(state["acc"] & 0xFF)

    blob = bytearray()
    blob += b"GIF89a"
    blob += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    blob += table.tobytes()
    blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    blob.append(min_code)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        blob.append(len(chunk))
        blob += chunk
    blob += b"\x00\x3b"
    return bytes(blob)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a non-interlaced GIF87a/89a to HxWx3
    uint8 RGB — real LZW with variable code width, dictionary resets,
    and sub-block reassembly; extensions are skipped per the grammar.
    """
    import struct

    if payload[:4] != b"GIF8" or len(payload) < 13:
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            left, top, iw, ih, ipack = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            table = gct
            if ipack & 0x80:
                n = 2 ** ((ipack & 0x07) + 1)
                table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ipack & 0x40:
                raise ValueError("interlaced GIF not supported")
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indices = _lzw_decode(bytes(data), min_code, iw * ih)
            img = table[np.array(indices, np.int32)].reshape(ih, iw, 3)
            return img.copy()
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x} at {pos}")
    raise ValueError("GIF contains no image data")


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> list[int]:
    """GIF LZW: LSB-first bit stream, width grows after the dictionary
    fills the current width, CLEAR resets, EOI ends."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: list[tuple] = [(i,) for i in range(1 << min_code)] + [(), ()]
    out: list[int] = []
    acc = n_acc = bit_pos = 0
    prev: tuple | None = None
    i = 0
    while len(out) < n_pixels and i <= len(data):
        while n_acc < width and i < len(data):
            acc |= data[i] << n_acc
            n_acc += 8
            i += 1
        if n_acc < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == clear:
            table = [(j,) for j in range(1 << min_code)] + [(), ()]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} of {len(table)}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(f"LZW stream short: {len(out)} of {n_pixels} pixels")
    return out[:n_pixels]


# ------------------------------------------------------------------ WAV

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE writer (PCM16, mono or multichannel) — fixture
    twin of ``decode_wav``.  ``samples`` is (n,) or (n, channels) int16."""
    import struct

    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, nch, sample_rate, sample_rate * nch * 2, nch * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 RIFF/WAVE payload to ((n, channels) int16 array,
    sample_rate) — real chunk-walking parse, stdlib struct only."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, nch, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, "<i2")
    samples = samples[: (len(samples) // nch) * nch].reshape(-1, nch)
    return samples.copy(), rate


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


def extract_audio_features(media_df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode→feature stage for audio payloads: PCM16 WAV decodes for
    REAL (duration, RMS, peak over normalized samples); other audio
    formats yield null features (honest: no codec in this container).
    Same mapInPandas shape as the image feature stage."""

    def run(iterator):
        import struct

        for batch in iterator:
            out = {k: [] for k in (
                "content_hash", "sample_rate", "n_samples",
                "duration_sec", "rms", "peak",
            )}
            for p in batch["media"]:
                p = bytes(p or b"")
                out["content_hash"].append(hashlib.sha256(p).hexdigest())
                try:
                    samples, rate = decode_wav(p)
                except (ValueError, struct.error, IndexError):
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["duration_sec"].append(None)
                    out["rms"].append(None)
                    out["peak"].append(None)
                    continue
                x = samples.astype(np.float64) / 32768.0
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(int(samples.shape[0]))
                out["duration_sec"].append(
                    float(samples.shape[0] / rate) if rate else 0.0
                )
                out["rms"].append(float(np.sqrt((x**2).mean())) if x.size else 0.0)
                out["peak"].append(float(np.abs(x).max()) if x.size else 0.0)
            yield pd.DataFrame(out)

    return media_df.select(F.col(media_col).alias("media")).mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )
