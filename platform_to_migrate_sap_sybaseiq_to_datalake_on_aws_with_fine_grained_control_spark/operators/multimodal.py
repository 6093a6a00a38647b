"""Multimodal (image/audio/video) column processing.

Media are opaque ``binary`` columns with typed metadata — the lakehouse
pattern for multimodal training data: payload bytes travel through
Spark untouched, per-item compute happens in Arrow-batched Pandas
functions over ``mapInPandas`` so the Python cost is per-batch, not
per-row, and the operator parallelizes per input partition (no
shuffle).

Codecs (stdlib-only, no Pillow/librosa/av in this environment):

* **PNG — real.** :func:`png_encode_gray` / :func:`png_decode_gray`
  implement 8-bit grayscale PNG with zlib-compressed IDAT, CRC-checked
  chunks, and all five scanline filters on decode (the encoder emits
  filter 0).  :func:`decode_image_meta` parses real IHDR headers and
  :func:`resize_images` does a full decode → nearest-neighbor resample
  → re-encode round trip.
* **WAV — real.** Mono 16-bit PCM via the stdlib ``wave`` module;
  :func:`audio_features` decodes frames and computes RMS / peak /
  zero-crossings on the samples.
* **Video — stand-in.** No stdlib video codec exists, so video assets
  use a minimal deterministic frame container (``FRAM`` magic +
  fixed-size frames); :func:`sample_frames` parses it.  Swapping in a
  libav decode changes one inner function (see
  :func:`real_decode_backend`).

Scale notes:

* media rows are wide (MBs); keep ``spark.sql.files.maxPartitionBytes``
  at default 128 MB so a partition holds tens of items, and NEVER
  ``collect()`` payloads — all kernels stream Arrow batches.
* metadata-only queries must not read payload bytes: store media as a
  separate parquet column so Parquet column pruning skips it
  (``select`` of meta columns never touches the blob pages).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------
# PNG codec (8-bit grayscale, stdlib-only)
# ---------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode_gray(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w) uint8`` array as an 8-bit grayscale PNG
    (color type 0, filter 0 per scanline, one zlib IDAT stream)."""
    h, w = pixels.shape
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0 (None)
        raw.extend(pixels[y].astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _iter_png_chunks(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        crc_bytes = payload[pos + 8 + length : pos + 12 + length]
        if len(data) < length or len(crc_bytes) < 4:
            # a payload cut mid-chunk would otherwise surface as
            # struct.error, which is NOT a ValueError and would escape
            # every corrupt-payload quarantine guard downstream
            raise ValueError("truncated PNG: chunk cut short")
        (crc,) = struct.unpack(">I", crc_bytes)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        yield tag, data
        pos += 12 + length
        if tag == b"IEND":
            return
    raise ValueError("truncated PNG: no IEND")


def png_parse_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Parse and CRC-check the IHDR: ``(width, height, bit_depth,
    color_type)``."""
    for tag, data in _iter_png_chunks(payload):
        if tag == b"IHDR":
            if len(data) < 10:
                raise ValueError("truncated PNG: short IHDR")
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            return w, h, depth, color
        break  # IHDR must come first
    raise ValueError("PNG missing IHDR")


def png_decode_gray(payload: bytes) -> np.ndarray:
    """Full decode of an 8-bit grayscale PNG to ``(h, w) uint8``.

    Handles all five scanline filters (None/Sub/Up/Average/Paeth) —
    Sub via cumulative sum, Up vectorized, Average/Paeth per-pixel
    (correctness path; our encoder emits filter 0 so the hot path is
    the memcpy).
    """
    w, h, depth, color = png_parse_meta(payload)
    if depth != 8 or color != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
    idat = b"".join(d for t, d in _iter_png_chunks(payload) if t == b"IDAT")
    raw = zlib.decompress(idat)
    if len(raw) != h * (w + 1):
        raise ValueError("PNG scanline data has wrong length")
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + w], dtype=np.uint8)
        pos += 1 + w
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: recon = cumsum mod 256
            cur = np.cumsum(line, dtype=np.uint64).astype(np.uint8)
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            cur = np.empty(w, dtype=np.uint8)
            left = 0
            for x in range(w):
                left = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
                cur[x] = left
        elif ftype == 4:  # Paeth
            cur = np.empty(w, dtype=np.uint8)
            for x in range(w):
                a = int(cur[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample (the deterministic baseline kernel —
    a real bilinear/Lanczos swap-in changes only this function)."""
    h, w = pixels.shape
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return pixels[np.ix_(ys, xs)]


# ---------------------------------------------------------------------
# WAV codec (mono PCM16, stdlib wave module)
# ---------------------------------------------------------------------


def wav_encode_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    try:
        wv_ctx = wave.open(io.BytesIO(payload), "rb")
    except (wave.Error, EOFError) as e:
        raise ValueError(f"corrupt WAV: {e}") from e
    with wv_ctx as wv:
        if wv.getnchannels() != 1 or wv.getsampwidth() != 2:
            raise ValueError("expected mono PCM16 WAV")
        rate = wv.getframerate()
        data = np.frombuffer(wv.readframes(wv.getnframes()), dtype="<i2")
    return data, rate


# ---------------------------------------------------------------------
# Frame container (video stand-in: FRAM magic | n_frames | frame_size)
# ---------------------------------------------------------------------

_FRAM_MAGIC = b"FRAM"


def fram_encode(frames: list[bytes]) -> bytes:
    size = len(frames[0]) if frames else 0
    return _FRAM_MAGIC + struct.pack(">HH", len(frames), size) + b"".join(frames)


def fram_decode(payload: bytes) -> list[bytes]:
    if payload[:4] != _FRAM_MAGIC:
        raise ValueError("not a FRAM container")
    if len(payload) < 8:
        raise ValueError("truncated FRAM header")
    n, size = struct.unpack(">HH", payload[4:8])
    body = payload[8:]
    return [body[i * size : (i + 1) * size] for i in range(n)]


def jpeg_parse_meta(payload: bytes) -> tuple[int, int, int]:
    """``(width, height, components)`` from a JPEG's SOF marker — a
    pure marker WALK (segment lengths are explicit), no pixel decode
    and no Pillow.  Closes the metadata half of the JPEG-bytes-in-a-
    binary-column gap (r7 VERDICT item 6): dims/format/md5 of JPEG
    payloads now decode everywhere; only PIXEL decode stays gated on
    Pillow (:func:`jpeg_decode_gray`).  Raises ``ValueError`` on
    corrupt streams (callers quarantine, never fail the batch)."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG (missing SOI)")
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker in (0xD9, 0xDA):
            break  # EOI / start-of-scan: a valid SOF precedes these
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seglen < 2 or i + 2 + seglen > n:
            raise ValueError("truncated JPEG segment")
        # SOF0-15 minus the non-frame C4/C8/CC (DHT/JPG/DAC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seglen < 8:
                raise ValueError("short SOF segment")
            h = int.from_bytes(payload[i + 5 : i + 7], "big")
            w = int.from_bytes(payload[i + 7 : i + 9], "big")
            return w, h, payload[i + 9]
        i += 2 + seglen
    raise ValueError("no SOF marker before SOS/EOI")


def media_meta(payload: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Sniff container magic → ``(format, width, height)``; dims only
    for images.  Unknown/corrupt bytes → all-None (a real pipeline
    routes those rows to a quarantine sink rather than failing the
    batch).  Pure-stdlib header parses: PNG IHDR, JPEG SOF walk, GIF
    logical-screen descriptor, BMP DIB header, WAV/FRAM sniff."""
    if payload is None or len(payload) < 12:
        return None, None, None
    try:
        if payload[:8] == _PNG_SIG:
            w, h, _, _ = png_parse_meta(payload)
            return "png", w, h
        if payload[:3] == b"\xff\xd8\xff":
            w, h, _ = jpeg_parse_meta(payload)
            return "jpeg", w, h
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return (
                "gif",
                int.from_bytes(payload[6:8], "little"),
                int.from_bytes(payload[8:10], "little"),
            )
        if payload[:2] == b"BM" and len(payload) >= 26:
            dib = int.from_bytes(payload[14:18], "little")
            if dib >= 40:
                w = int.from_bytes(payload[18:22], "little", signed=True)
                h = int.from_bytes(payload[22:26], "little", signed=True)
            elif dib == 12:  # BITMAPCOREHEADER
                w = int.from_bytes(payload[18:20], "little")
                h = int.from_bytes(payload[20:22], "little")
            else:
                return None, None, None
            return "bmp", abs(w), abs(h)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return "wav", None, None
        if payload[:4] == _FRAM_MAGIC:
            return "fram", None, None
    except ValueError:
        return None, None, None
    return None, None, None


# ---------------------------------------------------------------------
# Deterministic synthetic assets (pure function — shared by the Spark
# generator and the catalog oracle builders)
# ---------------------------------------------------------------------

#: schema of a multimodal asset table (payload + typed metadata).
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("source_uri", StringType(), True),
    ]
)


def synthetic_image_dims(i: int) -> tuple[int, int]:
    return 16 + (i * 7) % 64, 16 + (i * 13) % 64


def synthetic_image_pixels(i: int) -> np.ndarray:
    w, h = synthetic_image_dims(i)
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    return ((ys[:, None] * 5 + xs[None, :] * 3 + i) % 256).astype(np.uint8)


def synthetic_audio_samples(i: int) -> np.ndarray:
    n = 256 + (i * 37) % 512
    k = np.arange(n, dtype=np.int64)
    return (((k * (31 + i)) % 4001 - 2000) * 8).astype(np.int16)


def synthetic_video_frames(i: int) -> list[bytes]:
    n_frames = 4 + (i % 5) * 3
    return [hashlib.md5(f"frame:{i}:{f}".encode()).digest() for f in range(n_frames)]


def synthetic_asset_rows(n: int = 64) -> list[tuple]:
    """Deterministic asset rows cycling image (real PNG) / audio (real
    WAV) / video (FRAM container)."""
    rows = []
    for i in range(n):
        media = ["image", "audio", "video"][i % 3]
        if media == "image":
            payload = png_encode_gray(synthetic_image_pixels(i))
        elif media == "audio":
            payload = wav_encode_pcm16(synthetic_audio_samples(i))
        else:
            payload = fram_encode(synthetic_video_frames(i))
        rows.append((i, media, payload, len(payload), f"synth://assets/{i}"))
    return rows


def make_synthetic_assets(spark, n: int = 64) -> DataFrame:
    return spark.createDataFrame(synthetic_asset_rows(n), ASSET_SCHEMA)


# ---------------------------------------------------------------------
# Operators (Arrow-batched mapInPandas kernels)
# ---------------------------------------------------------------------

IMAGE_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload_md5", StringType(), True),
    ]
)


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Media metadata decode via Arrow-batched ``mapInPandas``: real
    PNG IHDR parse (CRC-checked) for images, container sniffing for
    WAV/FRAM, plus content md5.  Corrupt payloads yield null meta
    instead of failing the batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["payload"].map(media_meta)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "format": meta.map(lambda t: t[0]),
                    "width": meta.map(lambda t: t[1]),
                    "height": meta.map(lambda t: t[2]),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(batches, IMAGE_META_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def pseudo_feature(payload: bytes | None, dims: int = 16) -> list[float] | None:
    """Deterministic md5-seeded pseudo-embedding (the CLIP/wav2vec
    stand-in — schema and batch shape of a real extractor head; see
    :func:`real_decode_backend` for the swap-in point)."""
    if payload is None:
        return None
    h = hashlib.md5(payload).digest()
    return [round((h[d % len(h)] / 255.0) * 2 - 1, 6) for d in range(dims)]


def extract_features(df: DataFrame, dims: int = 16) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": pdf["payload"].map(lambda b: pseudo_feature(b, dims)),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_samples", IntegerType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", DoubleType(), True),
        StructField("zero_crossings", IntegerType(), True),
    ]
)


def audio_feature_values(samples: np.ndarray) -> tuple[int, float, float, int]:
    """RMS / peak / zero-crossings of PCM16 samples (float64 math,
    ``floor``-truncated to 6 dp — decimal-half-tie-safe across
    engines)."""
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.floor(np.sqrt(np.mean(x * x)) * 1e6) / 1e6)
    peak = float(np.floor(np.max(np.abs(x)) * 1e6) / 1e6)
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return int(samples.size), rms, peak, zc


def audio_features(df: DataFrame) -> DataFrame:
    """Real WAV decode (stdlib ``wave``) → per-asset RMS / peak /
    zero-crossing features, numpy-vectorized inside Arrow batches.
    Only decodable audio assets produce rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ns, rms, peak, zc = [], [], [], [], []
            for _, row in pdf.iterrows():
                if row["media_type"] != "audio" or row["payload"] is None:
                    continue
                try:
                    samples, _ = wav_decode_pcm16(bytes(row["payload"]))
                except (ValueError, wave.Error, EOFError):
                    continue
                if samples.size == 0:
                    continue
                n, r, p, z = audio_feature_values(samples)
                ids.append(row["asset_id"])
                ns.append(n)
                rms.append(r)
                peak.append(p)
                zc.append(z)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "n_samples": ns,
                    "rms": rms,
                    "peak": peak,
                    "zero_crossings": zc,
                }
            )

    return df.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def resize_image_bytes(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Pure resize kernel: PNG decode → nearest-neighbor → re-encode."""
    return png_encode_gray(
        resize_nearest(png_decode_gray(payload), target_w, target_h)
    )


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Real image resize: full PNG decode, nearest-neighbor resample,
    PNG re-encode — binary in / binary out through ``mapInPandas``.
    Only decodable PNG rows produce output."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for _, row in pdf.iterrows():
                b = row["payload"]
                if b is None:
                    continue
                try:
                    out = resize_image_bytes(bytes(b), target_w, target_h)
                except ValueError:
                    continue  # not a decodable PNG (audio/video/corrupt)
                ids.append(row["asset_id"])
                payloads.append(out)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "payload": payloads,
                    "width": [target_w] * len(ids),
                    "height": [target_h] * len(ids),
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("frame_md5", StringType(), True),
    ]
)


def sample_frames(df: DataFrame, every_nth: int = 4, max_frames: int = 8) -> DataFrame:
    """Video frame sampling over the FRAM container: emits every
    ``every_nth`` frame up to ``max_frames`` per asset — the 1→N
    mapInPandas fan-out shape a libav-based sampler has.  Only video
    assets produce frames."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for _, row in pdf.iterrows():
                if row["media_type"] != "video" or row["payload"] is None:
                    continue
                try:
                    frames = fram_decode(bytes(row["payload"]))
                except ValueError:
                    continue
                for k, f in enumerate(range(0, len(frames), every_nth)):
                    if k >= max_frames:
                        break
                    ids.append(row["asset_id"])
                    idxs.append(f)
                    hashes.append(hashlib.md5(frames[f]).hexdigest())
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_md5": hashes}
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("ahash", StringType(), True),
    ]
)


def image_ahash_value(payload: bytes) -> str:
    """Pure average-hash kernel: PNG decode → 8×8 nearest-neighbor
    downsample → threshold each cell at the integer mean (``>=``) →
    64 bits row-major, rendered as 16 hex chars.

    Integer mean (``sum // 64``) keeps the threshold exact — a float
    mean would make bits flip with summation order across BLAS
    builds.  Identical images always collide; near-identical images
    land within a small Hamming distance (group on equality for exact
    perceptual dedup, or band the 16 hex chars like SimHash for a
    wider net — see operators/dedup.py).
    """
    small = resize_nearest(png_decode_gray(payload), 8, 8).astype(np.int64)
    mean = int(small.sum()) // 64
    v = 0
    for bit in (small >= mean).flatten():
        v = (v << 1) | int(bit)
    return f"{v:016x}"


def image_ahash(df: DataFrame) -> DataFrame:
    """Perceptual fingerprints for every decodable PNG via
    Arrow-batched ``mapInPandas`` — the multimodal analog of the text
    SimHash path: downstream exact-dup grouping is a plain groupBy on
    ``ahash`` (map-side combined), never a pairwise image compare.
    Non-image / corrupt rows are dropped, mirroring ``resize_images``.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for _, row in pdf.iterrows():
                b = row["payload"]
                if b is None:
                    continue
                try:
                    h = image_ahash_value(bytes(b))
                except ValueError:
                    continue
                ids.append(row["asset_id"])
                hashes.append(h)
            yield pd.DataFrame({"asset_id": ids, "ahash": hashes})

    return df.mapInPandas(batches, AHASH_SCHEMA)


def write_jpeg_fixtures(spark, out_dir: str, n: int = 12) -> list[str]:
    """Encode the synthetic grayscale pixel fields as REAL baseline
    JPEGs via the JVM's ``javax.imageio`` (py4j, one bulk
    ``setDataElements`` per image — no per-pixel round trips).

    Driver-side by design: this is the fixture/ingest-test utility.
    The DISTRIBUTED leg is :func:`read_images_jvm` — executors decode
    with the same ImageIO through Spark's built-in image source."""
    from pathlib import Path

    jvm = spark._jvm
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    out = []
    for i in range(n):
        w, h = synthetic_image_dims(i)
        px = synthetic_image_pixels(i)
        bgr = np.repeat(px[:, :, None], 3, axis=2).tobytes()
        bi = jvm.java.awt.image.BufferedImage(
            w, h, jvm.java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        )
        bi.getRaster().setDataElements(0, 0, w, h, bgr)
        path = f"{out_dir}/img-{i:04d}.jpg"
        jvm.javax.imageio.ImageIO.write(bi, "jpg", jvm.java.io.File(path))
        out.append(path)
    return out


def read_images_jvm(df_or_spark, path: str):
    """Distributed REAL JPEG/PNG/GIF/BMP decode: Spark's built-in
    ``image`` data source (JVM ``javax.imageio`` on the EXECUTORS — no
    Python, no Pillow).  Returns one row per image file:
    ``(origin, height, width, n_channels, mode, data)`` with ``data``
    the decoded 8-bit BGR(A) pixel bytes.

    This closes the JPEG half of the codec boundary for the
    INGESTION path (files on the lake).  Decoding JPEG bytes already
    inside a binary COLUMN still needs a Python-side codec
    (:func:`real_decode_backend`) — the image source is file-based."""
    from pyspark.sql import functions as F

    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.read.format("image").load(path).select(
        F.col("image.origin").alias("origin"),
        F.col("image.height").alias("height"),
        F.col("image.width").alias("width"),
        F.col("image.nChannels").alias("n_channels"),
        F.col("image.mode").alias("mode"),
        F.col("image.data").alias("data"),
    )


# Pillow gate (mirrors the protobuf gate on transformWithStateInPandas):
# probed by actual import — r8 probe on 2026-08-15 found no PIL/librosa/
# av/cv2/soundfile in this container's Python, so jpeg PIXEL decode
# raises here and its tests skip; on a cluster image with Pillow the
# same code path lights up untouched.
try:  # pragma: no cover - exercised only where Pillow exists
    from PIL import Image as _PILImage  # type: ignore

    HAS_PILLOW = True
except ImportError:
    _PILImage = None
    HAS_PILLOW = False


def jpeg_decode_gray(payload: bytes) -> np.ndarray:
    """Grayscale pixel decode of JPEG bytes ALREADY IN a binary column
    — the Pillow-gated half of the JPEG gap (metadata half is closed
    dependency-free by :func:`jpeg_parse_meta`).  Returns a (h, w)
    uint8 array; raises ``NotImplementedError`` where Pillow is
    absent (this container: import probe failed 2026-08-15)."""
    if not HAS_PILLOW:
        raise NotImplementedError(
            "JPEG pixel decode needs Pillow in the Python workers; "
            "this environment's import probe failed. JPEG *metadata* "
            "(dims/format/md5) decodes without it via jpeg_parse_meta, "
            "and JPEG *files* decode JVM-side via read_images_jvm."
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


JPEG_PIXEL_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("pixels_md5", StringType(), True),
    ]
)


def decode_jpeg_pixels(df: DataFrame) -> DataFrame:
    """Arrow-batched JPEG pixel decode over a binary ``payload``
    column (Pillow-gated; see :func:`jpeg_decode_gray`).  Emits one
    row per decodable JPEG asset with dims, 6-dp floor-truncated mean
    luma, and the md5 of the grayscale pixel buffer — the same
    fingerprint-style outputs the PNG tier exposes, so a Pillow-
    equipped cluster gets feature parity without code changes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, lumas, md5s = [], [], [], [], []
            for _, row in pdf.iterrows():
                b = row["payload"]
                if b is None or bytes(b[:3]) != b"\xff\xd8\xff":
                    continue
                try:
                    px = jpeg_decode_gray(bytes(b))
                except (ValueError, OSError):
                    continue
                ids.append(row["asset_id"])
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                lumas.append(float(np.floor(px.mean() * 1e6) / 1e6))
                md5s.append(hashlib.md5(px.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "width": ws,
                    "height": hs,
                    "mean_luma": lumas,
                    "pixels_md5": md5s,
                }
            )

    return df.mapInPandas(batches, JPEG_PIXEL_SCHEMA)


def real_decode_backend(*_args, **_kwargs):  # pragma: no cover
    """Swap-in point for the codecs this environment cannot run in
    Python workers (MP3/FLAC via librosa, video via av — import probe
    re-run 2026-08-15: librosa/av/cv2/soundfile all absent).  The
    image tier is now fully covered: PNG via the stdlib codec, JPEG
    metadata via :func:`jpeg_parse_meta` (dependency-free), JPEG
    pixels via the Pillow-gated :func:`decode_jpeg_pixels`, JPEG
    FILES distributed via :func:`read_images_jvm` (Spark's image
    source — executor-side javax.imageio)."""
    raise NotImplementedError(
        "Python-side codecs available: PNG (zlib), WAV (wave), JPEG "
        "metadata (marker walk), JPEG pixels when Pillow is installed; "
        "JPEG files decode JVM-side via read_images_jvm; MP3 / video "
        "need librosa/av (absent here per the 2026-08-15 import probe)"
    )


def synthetic_perturbed_pixels(i: int) -> np.ndarray:
    """Deterministic near-duplicate of image ``i``'s pixel spec: every
    11th pixel (phase ``i % 11``) brightens by 60 — enough to flip a
    few aHash cells (Hamming mostly 1-3 vs the original on the
    catalog geometry, with a tail past the threshold so the near-dup
    entry exercises both accept and reject branches)."""
    px = synthetic_image_pixels(i).astype(np.int64)
    h, w = px.shape
    flat = px.reshape(-1).copy()
    idx = np.arange(flat.size)
    flat[idx % 11 == (i % 11)] += 60
    return np.clip(flat.reshape(h, w), 0, 255).astype(np.uint8)


def image_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "asset_id",
    hash_col: str = "ahash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs from perceptual hashes via Manku
    block banding — the multimodal twin of the text SimHash index
    (``operators/dedup.py``).

    The 64-bit aHash (16 hex chars) splits into 4 blocks of 16 bits;
    by pigeonhole any pair within Hamming ≤ 3 agrees on at least one
    whole block, so candidates come from 4 equi-self-joins on (block,
    16-bit key) — linear shuffle of ids, never a pairwise image or
    hash compare.  Verification is exact: per-block ``bit_count(a ^
    b)`` on 16-bit ints (no 64-bit signed-overflow trap in ``conv``),
    summed and filtered at ``max_hamming``.  Output ``(id_a, id_b,
    hamming)``, id_a < id_b.
    """
    from pyspark.sql import functions as F

    blocks = 4
    banded = hashes.select(
        F.col(id_col),
        F.col(hash_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.substring(hash_col, b * 4 + 1, 4).alias("key"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bk"),
    ).select(id_col, hash_col, F.col("bk.block"), F.col("bk.key"))
    a = banded.select(
        F.col(id_col).alias("id_a"),
        F.col(hash_col).alias("hash_a"),
        "block",
        "key",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"),
        F.col(hash_col).alias("hash_b"),
        "block",
        "key",
    )
    cand = (
        a.join(b, ["block", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "hash_a", "hash_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = None
    for blk in range(blocks):
        term = F.expr(
            f"bit_count(CAST(conv(substring(hash_a, {blk * 4 + 1}, 4), 16, 10) AS INT) "
            f"^ CAST(conv(substring(hash_b, {blk * 4 + 1}, 4), 16, 10) AS INT))"
        )
        ham = term if ham is None else ham + term
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def audio_peak_shingles(
    samples: np.ndarray, window: int = 256, shingle: int = 3
) -> list[str]:
    """Shazam-lite audio fingerprint: per non-overlapping ``window``
    of PCM samples take the dominant-frequency bin (argmax of the
    rFFT magnitude, DC excluded — argmax is amplitude-scale-invariant,
    so re-leveled audio fingerprints identically), then md5 each run
    of ``shingle`` consecutive peak bins.  The shingle token carries
    no absolute timestamp, so appended/trimmed-by-whole-windows edits
    keep most tokens (sample-level shifts do not — a production
    fingerprint uses anchor-pair constellations for that).  Distinct
    tokens per asset; deterministic: integer input, numpy rFFT, first
    argmax."""
    n = (len(samples) // window) * window
    if n == 0:
        return []
    mat = samples[:n].astype(np.float64).reshape(-1, window)
    mags = np.abs(np.fft.rfft(mat, axis=1))
    peaks = np.argmax(mags[:, 1:], axis=1) + 1
    out = set()
    for i in range(len(peaks) - shingle + 1):
        tok = ",".join(str(int(p)) for p in peaks[i : i + shingle])
        out.add(hashlib.md5(tok.encode()).hexdigest())
    return sorted(out)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("shingle_md5", StringType(), True),
    ]
)


def audio_fingerprints(
    df: DataFrame, window: int = 256, shingle: int = 3
) -> DataFrame:
    """Distinct peak-shingle fingerprints for every decodable WAV via
    Arrow-batched ``mapInPandas`` — the audio analog of the document
    shingle table: downstream near-dup detection is an equi-join on
    the token hash (linear shuffle), never a pairwise waveform
    compare."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, toks = [], []
            for _, row in pdf.iterrows():
                if row["media_type"] != "audio" or row["payload"] is None:
                    continue
                try:
                    samples, _rate = wav_decode_pcm16(bytes(row["payload"]))
                except ValueError:
                    continue
                for t in audio_peak_shingles(samples, window, shingle):
                    ids.append(row["asset_id"])
                    toks.append(t)
            yield pd.DataFrame({"asset_id": ids, "shingle_md5": toks})

    return df.mapInPandas(batches, AUDIO_FP_SCHEMA)


def _chirp_freq(tag: str) -> int:
    """md5-derived per-window dominant frequency (1..24) — collision-
    free enough that unrelated clips share no 3-window shingle."""
    return 1 + int(hashlib.md5(tag.encode()).hexdigest()[:4], 16) % 24


def synthetic_chirp_samples(i: int, window: int = 64) -> np.ndarray:
    """Deterministic 'chirp' clip for the audio-fingerprint entry: a
    square wave whose dominant frequency changes every ``window``
    samples (md5-scheduled), so each window contributes a distinct
    rFFT peak and the peak-shingle fingerprint actually varies —
    unlike :func:`synthetic_audio_samples`, whose single-period tone
    collapses to one token."""
    out = []
    for w in range(10 + i % 5):
        f = _chirp_freq(f"clip:{i}:{w}")
        k = np.arange(window)
        out.append(np.where((k * f) % window < window // 2, 8000, -8000))
    return np.concatenate(out).astype(np.int16)


def synthetic_chirp_variant(i: int, window: int = 64) -> np.ndarray:
    """Near-duplicate of chirp ``i``: amplitude halved (argmax peaks
    are scale-invariant, so every original window fingerprints
    identically) plus 3 appended new windows at lower level — the
    re-leveled + extended edit."""
    base = (synthetic_chirp_samples(i, window).astype(np.int64) // 2).astype(
        np.int16
    )
    ext = np.concatenate(
        [
            np.where(
                (np.arange(window) * _chirp_freq(f"ext:{i}:{w}")) % window
                < window // 2,
                4000,
                -4000,
            )
            for w in range(3)
        ]
    ).astype(np.int16)
    return np.concatenate([base, ext])
