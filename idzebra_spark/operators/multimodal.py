"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels.

The decode step is REAL for every image/audio format here — PPM (P6),
BMP (24-bit BI_RGB, bottom-up + stride padding), PNG (zlib inflate +
full Sub/Up/Average/Paeth scanline unfilter), baseline JPEG (from-
scratch Huffman + DCT codec, ``functions/jpeg.py``) and a RIFF/WAV
PCM-16 audio codec — no external libraries. Only video (h264)
remains STUBBED behind ``_fake_decode`` (a video codec is genuinely
out of scope without ffmpeg); swapping the stub is a body-only change
inside the kernel, and :func:`decode_rate` reports the per-codec
real-decode fraction so pipelines can gate on it. The Spark-side
plumbing — schema, partition sizing, UDF signatures, Arrow batch
shapes — is identical either way.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from idzebra_spark.functions.jpeg import decode_jpeg, encode_jpeg

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),     # image|audio|video
    T.StructField("payload", T.BinaryType()),         # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("codec", T.StringType()),
    T.StructField("decoded", T.BooleanType()),  # real decode vs stub
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

FEATURE_DIM = 16
WAV_RATE = 8000


# ---------------------------------------------------------------- PPM

def encode_ppm(img: np.ndarray) -> bytes:
    """P6 binary PPM from an (h, w, 3) uint8 array."""
    h, w, c = img.shape
    if c != 3 or img.dtype != np.uint8:
        raise ValueError("PPM needs (h, w, 3) uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse binary PPM (P6) → (h, w, 3) uint8 — pure numpy.

    Header: magic, whitespace/comment-separated width height maxval,
    one whitespace byte, then raw RGB."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    i, fields = 2, []
    while len(fields) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":  # comment to EOL
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return arr.reshape(h, w, 3)


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """Real PNG from an (h, w, 3|4) uint8 array: IHDR + zlib-deflated
    IDAT (filter type 0 per scanline) + IEND — zlib is stdlib, so
    this is a genuine compressed codec, not a stub."""
    h, w, c = img.shape
    if c not in (3, 4) or img.dtype != np.uint8:
        raise ValueError("PNG needs (h, w, 3|4) uint8")
    color_type = 2 if c == 3 else 6
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = img.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Parse 8-bit truecolor PNG (color types 2/RGB and 6/RGBA, no
    interlace) → (h, w, c) uint8. Real decode: chunk walk, zlib
    inflate, then the full scanline UNFILTER pass — Sub/Up/Average/
    Paeth exactly per the PNG spec. None/Up/Sub unfilter vectorized
    (Sub is a per-byte-lane prefix sum — mod-256 addition is
    associative, so one final mask suffices); Average and Paeth are
    genuinely left-recurrent and take a per-pixel loop."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    i = len(_PNG_SIG)
    w = h = bit_depth = color_type = None
    idat = bytearray()
    while i + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[i:i + 4])
        tag = payload[i + 4:i + 8]
        body = payload[i + 8:i + 8 + ln]
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if bit_depth != 8 or color_type not in (2, 6) or interlace:
                raise ValueError("only 8-bit RGB/RGBA non-interlaced "
                                 "PNG supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + ln  # len + tag + body + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    c = 3 if color_type == 2 else 4
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * c
    if raw.size != h * stride:
        raise ValueError("PNG scanline payload size mismatch")
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * c), dtype=np.uint8)
    for y in range(h):
        ft, line = rows[y, 0], rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            w * c, np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub: per-byte-lane prefix sum (vectorized)
            cur = np.empty(w * c, np.int64)
            for r in range(c):
                cur[r::c] = np.cumsum(line[r::c], dtype=np.int64)
            cur &= 0xFF
        elif ft in (3, 4):  # Average / Paeth: genuinely left-recurrent
            cur = np.zeros(w * c, np.int32)
            for x in range(w * c):
                a = cur[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                if ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else cc)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, c)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize by index sampling (the 'resize' op of
    the brief) — vectorized fancy indexing, no loops."""
    h, w, _ = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray) -> np.ndarray:
    """FEATURE_DIM vector: per-channel mean/std (6) + a 2x2 gray
    thumbnail via nearest resize (4) + aspect + size (2), padded."""
    f = np.zeros(FEATURE_DIM, dtype=np.float32)
    x = img.astype(np.float32) / 255.0
    f[0:3] = x.mean(axis=(0, 1))
    f[3:6] = x.std(axis=(0, 1))
    thumb = resize_nearest(img, 2, 2).astype(np.float32).mean(axis=2) / 255.0
    f[6:10] = thumb.ravel()
    h, w, _ = img.shape
    f[10] = w / max(h, 1)
    f[11] = min(h * w / 65536.0, 1.0)
    return f


# ---------------------------------------------------------------- BMP

def encode_bmp(img: np.ndarray) -> bytes:
    """Uncompressed 24-bit BI_RGB BMP from an (h, w, 3) uint8 RGB
    array — bottom-up rows, BGR byte order, 4-byte row stride padding
    (the real on-disk layout quirks)."""
    h, w, c = img.shape
    if c != 3 or img.dtype != np.uint8:
        raise ValueError("BMP needs (h, w, 3) uint8")
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    rows = img[::-1, :, ::-1]  # bottom-up, RGB→BGR
    body = b"".join(rows[r].tobytes() + b"\x00" * pad for r in range(h))
    offset = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    return hdr + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse uncompressed 24-bit BI_RGB BMP → (h, w, 3) uint8 RGB —
    pure numpy. Handles bottom-up (positive height) and top-down
    (negative height) row order and the padded stride."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", payload[10:14])
    w, h_signed = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                        offset=offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up → top-down
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """Minimal RIFF/WAVE, PCM 16-bit mono."""
    data = samples.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF/WAVE PCM-16 mono → (int16 samples, sample_rate).
    Walks the chunk list (fmt / data) like any RIFF reader."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        (size,) = struct.unpack("<I", payload[i + 4:i + 8])
        body = payload[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            if fmt_tag != 1 or channels != 1:
                raise ValueError("only PCM mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        i += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, rate


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """FEATURE_DIM vector: rms, zero-crossing rate, peak, duration +
    8 coarse magnitude-spectrum bins (numpy rfft)."""
    f = np.zeros(FEATURE_DIM, dtype=np.float32)
    x = samples.astype(np.float32) / 32768.0
    if x.size == 0:
        return f
    f[0] = float(np.sqrt(np.mean(x * x)))
    f[1] = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    f[2] = float(np.abs(x).max())
    f[3] = x.size / rate
    spec = np.abs(np.fft.rfft(x))
    bins = np.array_split(spec, 8)
    f[4:12] = [float(b.mean()) if b.size else 0.0 for b in bins]
    return f


# ------------------------------------------------------------ synth

def synth_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: PPM images and
    WAV audio generated per row (seeded by media_id), plus 'video'
    rows with a stub codec. Generated in a mapInPandas kernel (byte
    assembly isn't a column expression) — still fully distributed."""
    base = spark.range(n_rows).withColumnRenamed("id", "media_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                rng = np.random.default_rng(int(mid) * 2654435761 + seed)
                kind = int(mid) % 3
                if kind == 0:
                    w, h = 8 + int(mid) % 9, 6 + int(mid) % 7
                    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    codec = ["ppm", "bmp", "png", "jpeg"][(int(mid) // 3) % 4]
                    payload = {"ppm": encode_ppm, "bmp": encode_bmp,
                               "png": encode_png,
                               "jpeg": encode_jpeg}[codec](img)
                    meta = {"width": w, "height": h, "duration_ms": 0,
                            "codec": codec}
                    rows.append((int(mid), "image", payload, meta))
                elif kind == 1:
                    n = 400 + int(mid) % 800
                    s = (rng.normal(0, 3000, n)).astype(np.int16)
                    meta = {"width": 0, "height": 0,
                            "duration_ms": int(n * 1000 / WAV_RATE),
                            "codec": "wav"}
                    rows.append((int(mid), "audio", encode_wav(s), meta))
                else:
                    fake = hashlib.md5(str(mid).encode()).digest() * 8
                    meta = {"width": 64, "height": 64, "duration_ms": 1000,
                            "codec": "h264-stub"}
                    rows.append((int(mid), "video", fake, meta))
            yield pd.DataFrame(rows, columns=["media_id", "media_type",
                                              "payload", "meta"])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


# ------------------------------------------------------------ kernels

def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB for compressed codecs — deterministic md5-derived feature
    vector in [0,1). Replace with PIL/torchvision/ffmpeg off-container."""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, numpy kernels
    per row. PPM/BMP/PNG/JPEG/WAV payloads are REALLY decoded;
    anything else (video) takes the marked stub path (decoded=False —
    see :func:`decode_rate`). At scale: repartition upstream so each
    task holds ~(batch_size × payload) bytes; payloads never hit the
    driver."""

    _img_decoders = {"ppm": decode_ppm, "bmp": decode_bmp,
                     "png": lambda b: decode_png(b)[:, :, :3],
                     "jpeg": decode_jpeg}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, decoded, codecs = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                codec = meta["codec"] if meta is not None else "unknown"
                codecs.append(codec)
                b = bytes(payload)
                # the try covers DECODE only: a corrupt/truncated
                # payload falls to the stub path, never a task failure
                # (struct.error is NOT a ValueError; KeyError = a jpeg
                # referencing an undefined table). Feature extraction
                # runs OUTSIDE it — a bug there should fail the job,
                # not masquerade as "payload corrupt".
                img = audio = None
                try:
                    if codec in _img_decoders:
                        img = _img_decoders[codec](b)
                    elif codec == "wav":
                        audio = decode_wav(b)
                except (ValueError, struct.error, IndexError, KeyError,
                        zlib.error):
                    pass
                if img is not None:
                    feats.append(image_features(img).tolist())
                    decoded.append(True)
                    continue
                if audio is not None:
                    feats.append(audio_features(*audio).tolist())
                    decoded.append(True)
                    continue
                feats.append(_fake_decode(b).tolist())
                decoded.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "codec": codecs,
                "decoded": decoded,
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "features": feats,
            })

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def decode_rate(features: DataFrame) -> DataFrame:
    """Per-codec decode coverage over an :func:`extract_features`
    output: (codec, n, n_decoded, decoded_rate_milli). PPM/BMP/PNG/
    JPEG/WAV decode for real; only video (h264) takes the marked
    ``_fake_decode`` stub (decoded=False) — this aggregation is the
    honest coverage report a pipeline gates on before trusting the
    feature column (e.g. require rate=1000 for image dedup; corrupt
    payloads of any codec also land in the stub bucket)."""
    return (
        features.groupBy("codec").agg(
            F.count("*").alias("n"),
            F.sum(F.col("decoded").cast("long")).alias("n_decoded"),
        )
        .withColumn(
            "decoded_rate_milli",
            F.floor(F.col("n_decoded") * 1000 / F.col("n")).cast("long"))
        .orderBy("codec")
    )


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("ts_ms", T.IntegerType()),
    T.StructField("rms_milli", T.LongType()),
])


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp (the
    decode itself is the stubbed kernel above). Demonstrates the
    explode-then-decode shape that keeps per-task memory bounded."""
    # duration 0 would make sequence(0, -1, step) throw — zero frames
    video = media.where((F.col("media_type") == "video")
                        & (F.col("meta.duration_ms") > 0))
    stamps = F.sequence(
        F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms)
    )
    return video.select(
        "media_id",
        F.explode(stamps).alias("ts_ms"),
        "payload",
    )


def audio_frame_sample(media: DataFrame, every_ms: int = 100) -> DataFrame:
    """REAL frame sampling over WAV audio: ONE decode per clip, all
    window RMS rows emitted from the decoded samples (the explode-
    payload-per-frame shape would ship and re-decode the clip once per
    window — O(frames × clip_bytes) for no reason)."""
    audio = media.where(F.col("meta.codec") == "wav").select(
        "media_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_mid, out_ts, out_rms = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    s, rate = decode_wav(bytes(payload))
                except (ValueError, struct.error, IndexError,
                        zlib.error):
                    continue  # corrupt payload → no frames, not a crash
                if s.size == 0:
                    continue
                win = max(1, every_ms * rate // 1000)
                starts = np.arange(0, s.size, win)
                x2 = (s.astype(np.float64) / 32768.0) ** 2
                sums = np.add.reduceat(x2, starts)
                sizes = np.minimum(starts + win, s.size) - starts
                rms = np.sqrt(sums / sizes)
                out_mid.extend([int(mid)] * starts.size)
                out_ts.extend((starts * 1000 // rate).tolist())
                out_rms.extend(np.round(rms * 1000).astype(int).tolist())
            yield pd.DataFrame({"media_id": out_mid, "ts_ms": out_ts,
                                "rms_milli": out_rms})

    return audio.mapInPandas(kernel, FRAME_SCHEMA)
