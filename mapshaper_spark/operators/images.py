"""Multimodal (image) column plumbing.

Per BASELINE.json input_hint the primary table carries opaque image bytes
with typed metadata (w, h, fmt). This module makes the Spark-side plumbing
real — schemas, Arrow batch shapes, partitioning — with fully working
*stdlib-only* codecs (PNG: all five scanline filters, gray/palette/alpha
color types, Adam7 interlace, via zlib; binary PPM), so decode -> pixel ops
-> re-encode round-trips losslessly in tests without PIL. JPEG decode is the
real pure-numpy codec in operators/jpeg.py; the PSNR>=40dB acceptance check
is implemented and exercised on that lossy path.

All per-image work happens in mapInPandas over Arrow batches (one numpy
decode per row, vectorized pixel math) — never per-row Python UDFs.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# stdlib codecs
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload +
            struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor (RFC 2083 §6.6), vectorized over a scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply PNG filter `ftype` to a raw scanline (encoder side)."""
    left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
    if ftype == 0:
        return row
    if ftype == 1:
        return row - left
    if ftype == 2:
        return row - prev
    if ftype == 3:
        return row - (((left.astype(np.uint16) + prev) // 2).astype(np.uint8))
    upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
    return row - _paeth(left, prev, upleft)


def _unfilter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse a PNG scanline filter. Sub uses a per-lane cumsum; Average and
    Paeth carry a left dependency, so they walk the row in bpp-wide slices."""
    if ftype == 0:
        return row
    if ftype == 2:
        return row + prev
    if ftype == 1:
        lanes = row.reshape(-1, bpp).astype(np.uint64)
        return np.cumsum(lanes, axis=0).astype(np.uint8).reshape(-1)
    out = row.copy()
    n = len(row)
    if ftype == 3:
        out[:bpp] += prev[:bpp] // 2
        for i in range(bpp, n, bpp):
            left = out[i - bpp:i].astype(np.uint16)
            out[i:i + bpp] += ((left + prev[i:i + bpp]) // 2).astype(np.uint8)
        return out
    if ftype == 4:
        out[:bpp] += _paeth(np.zeros(bpp, np.uint8), prev[:bpp], np.zeros(bpp, np.uint8))
        for i in range(bpp, n, bpp):
            out[i:i + bpp] += _paeth(out[i - bpp:i], prev[i:i + bpp], prev[i - bpp:i])
        return out
    raise ValueError(f"bad PNG filter type {ftype}")


def encode_png(pixels: np.ndarray, adaptive: bool = False) -> bytes:
    """RGB8 (h, w, 3) -> PNG bytes (zlib level 6).

    ``adaptive=True`` picks the per-row filter (None/Sub/Up/Average/Paeth)
    by the standard minimum-sum-of-absolute-deltas heuristic, matching what
    mainstream encoders emit; the default stays filter-0 for byte-stable
    fixtures."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    flat = pixels.reshape(h, w * 3)
    if not adaptive:
        raw = np.concatenate([np.zeros((h, 1), dtype=np.uint8), flat],
                             axis=1).tobytes()
    else:
        parts = []
        prev = np.zeros(w * 3, np.uint8)
        for r in range(h):
            row = flat[r]
            best, best_f = None, 0
            for f in range(5):
                cand = _filter_row(f, row, prev, 3)
                score = int(np.abs(cand.astype(np.int8).astype(np.int16)).sum())
                if best is None or score < best[0]:
                    best, best_f = (score, cand), f
            parts.append(bytes([best_f]) + best[1].tobytes())
            prev = row
        raw = b"".join(parts)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) +
            _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


# (pass, y_start, y_step, x_start, x_step) per Adam7 pass, RFC 2083 §2.6
_ADAM7 = [(0, 8, 0, 8), (0, 8, 4, 8), (4, 8, 0, 4), (0, 4, 2, 4),
          (2, 4, 0, 2), (0, 2, 1, 2), (1, 2, 0, 1)]


def _unfilter_image(raw: np.ndarray, h: int, stride: int,
                    channels: int) -> np.ndarray:
    """Defilter h scanlines of ``stride`` bytes each (+1 filter byte);
    ``channels`` here is the filter's byte offset bpp."""
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(h):
        prev = _unfilter_row(int(raw[r, 0]), raw[r, 1:], prev, channels)
        out[r] = prev
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> RGB8 (h, w, 3).

    ALL legal bit depths (r5): 1/2/4 (MSB-first packed gray/palette;
    gray scales to full range), 8, and 16 (big-endian samples reduce to
    their high byte); color types 0 (gray), 2 (RGB), 3 (palette), 4
    (gray+alpha), 6 (RGBA); all five scanline filters (byte-level with
    bpp = ceil(channels*depth/8) per the spec); interlace 0 and 1
    (Adam7). Gray replicates to RGB; alpha is dropped (the engine's
    image tables carry opaque RGB footprints)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    plte = None
    ctype = interlace = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13])
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"bad PNG bit depth {depth}")
            if depth < 8 and ctype not in (0, 3):
                raise ValueError(
                    "sub-byte depths are only legal for gray/palette")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    # PNG filters act on bytes with bpp = ceil(channels*depth/8)
    bpp = max(1, channels * depth // 8)

    def row_bytes(width):
        return (width * channels * depth + 7) // 8

    def expand(flat2d, width):
        """(rows, row_bytes) filtered-out bytes -> (rows, width,
        channels) uint8 samples: split 16-bit big-endian pairs to their
        high byte, unpack sub-byte depths MSB-first (r5)."""
        rows = flat2d.shape[0]
        if depth == 8:
            return flat2d.reshape(rows, width, channels)
        if depth == 16:
            return flat2d.reshape(rows, width, channels, 2)[:, :, :, 0]
        bits = np.unpackbits(flat2d, axis=1)[:, :width * depth]
        vals = bits.reshape(rows, width, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        out = (vals * weights[None, None, :]).sum(axis=2).astype(np.uint8)
        if ctype == 0:  # gray: scale 0..2^d-1 to full 0..255
            out = (out.astype(np.uint16) * 255 //
                   ((1 << depth) - 1)).astype(np.uint8)
        return out[:, :, None]

    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if interlace == 0:
        img = expand(_unfilter_image(raw, h, row_bytes(w), bpp), w)
    elif interlace == 1:
        img = np.zeros((h, w, channels), np.uint8)
        off = 0
        for x0, xs, y0, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            size = ph * (row_bytes(pw) + 1)
            sub = _unfilter_image(raw[off:off + size], ph,
                                  row_bytes(pw), bpp)
            img[y0::ys, x0::xs] = expand(sub, pw)
            off += size
    else:
        raise NotImplementedError(f"PNG interlace method {interlace}")
    if ctype == 2:
        return img.copy()
    if ctype == 6:
        return img[:, :, :3].copy()
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[img[:, :, 0]]
    # gray / gray+alpha -> replicate luma
    return np.repeat(img[:, :, :1], 3, axis=2)


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    parts = data.split(b"\n", 3)
    if parts[0] != b"P6":
        raise ValueError("not a binary PPM")
    w, h = map(int, parts[1].split())
    return np.frombuffer(parts[3], dtype=np.uint8)[: h * w * 3].reshape(h, w, 3).copy()


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt in ("jpeg", "jpg", "jpeg_progressive", "jpeg_lossless",
               "jpeg_arith"):
        # real JPEG decode (pure numpy + stdlib, operators/jpeg.py) — both
        # baseline (SOF0/1) and progressive (SOF2: spectral selection +
        # successive approximation) streams, dispatched on the SOF marker;
        # the PSNR >= 40 dB lossy invariant is exercised on this path
        from mapshaper_spark.operators.jpeg import decode_jpeg
        return decode_jpeg(data)
    if fmt in ("webp", "webp_lossy"):
        # pure-numpy WebP (operators/webp.py): lossless VP8L, lossy VP8
        # intra frames (RFC 6386, operators/vp8.py), VP8X/ALPH wrappers —
        # one fmt tag, dispatch on the container's own chunk type
        from mapshaper_spark.operators.webp import decode_webp
        return decode_webp(data)
    if fmt == "gif":
        # full GIF87a/89a decode (operators/gif.py): variable-width LZW,
        # interlace, local/global palettes, transparency; first frame
        from mapshaper_spark.operators.gif import decode_gif
        return decode_gif(data)
    raise ValueError(f"unknown fmt {fmt}")


def synth_pixels(img_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pattern per (id, w, h) — FIXTURES.md §1 analog."""
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    return ((img_id * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """Average-hash: 8x8 block-mean luma > global mean -> 64 bits."""
    lum = pixels.astype(np.float64).mean(axis=2)
    h, w = lum.shape
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = lum[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).ravel()
    v = np.sum(bits.astype(np.uint64) << np.arange(64, dtype=np.uint64), dtype=np.uint64)
    return int(v.astype(np.int64))  # two's-complement wrap into long


# ---------------------------------------------------------------------------
# Spark-side operators (mapInPandas plumbing)
# ---------------------------------------------------------------------------

def encode_synthetic_bytes(df: DataFrame) -> DataFrame:
    """Fill the ``bytes`` column with deterministic encoded pixels (PNG for
    fmt=png, PPM for fmt=ppm) — used by the fixture generator."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapshaper_spark.operators.jpeg import (encode_jpeg,
                                                    encode_jpeg_progressive)
        for pdf in it:
            blobs = []
            for i, w, h, fmt in zip(pdf["id"], pdf["w"], pdf["h"], pdf["fmt"]):
                px = synth_pixels(int(i), int(w), int(h))
                if fmt == "png":
                    blobs.append(encode_png(px))
                elif fmt == "webp":
                    from mapshaper_spark.operators.webp import encode_webp
                    blobs.append(encode_webp(px, subtract_green=True))
                elif fmt == "webp_lossy":
                    from mapshaper_spark.operators.webp import \
                        encode_webp_lossy
                    blobs.append(encode_webp_lossy(px, quality=95))
                elif fmt == "gif":
                    # synth pixels have exactly 256 distinct colors, so the
                    # GIF palette holds them all — exact round-trip
                    from mapshaper_spark.operators.gif import encode_gif
                    blobs.append(encode_gif(px))
                elif fmt == "jpeg_progressive":
                    blobs.append(encode_jpeg_progressive(px, quality=95))
                elif fmt == "jpeg_lossless":
                    from mapshaper_spark.operators.jpeg import \
                        encode_jpeg_lossless
                    # predictor varies with the row id for coverage
                    blobs.append(encode_jpeg_lossless(
                        px, predictor=1 + int(i) % 7))
                elif fmt == "jpeg_arith":
                    from mapshaper_spark.operators.jpeg_arith import \
                        encode_jpeg_arith
                    blobs.append(encode_jpeg_arith(px, quality=95))
                elif fmt in ("jpeg", "jpg"):
                    blobs.append(encode_jpeg(px, quality=95))
                else:
                    blobs.append(encode_ppm(px))
            pdf = pdf.copy()
            pdf["bytes"] = blobs
            yield pdf

    schema = T.StructType(df.schema.fields + ([T.StructField("bytes", T.BinaryType())]
                                              if "bytes" not in df.columns else []))
    base = df if "bytes" in df.columns else df.withColumn("bytes", F.lit(None).cast("binary"))
    return base.mapInPandas(gen, schema=base.schema)


IMAGE_STATS_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("dec_w", T.IntegerType()),
    T.StructField("dec_h", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("ahash", T.LongType()),
])


def decode_stats(df: DataFrame) -> DataFrame:
    """Decode bytes -> per-image stats (shape check, channel means, ahash).
    The canonical 'feature extraction' stage: binary column in, typed stats
    out, one Arrow batch at a time."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("image_id", "dec_w", "dec_h",
                                    "mean_r", "mean_g", "mean_b", "ahash")}
            for img_id, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(blob), fmt)
                rows["image_id"].append(img_id)
                rows["dec_h"].append(px.shape[0])
                rows["dec_w"].append(px.shape[1])
                m = px.astype(np.float64).mean(axis=(0, 1))
                rows["mean_r"].append(round(float(m[0]), 6))
                rows["mean_g"].append(round(float(m[1]), 6))
                rows["mean_b"].append(round(float(m[2]), 6))
                rows["ahash"].append(phash64(px))
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes", "fmt").mapInPandas(gen, schema=IMAGE_STATS_SCHEMA)


def resize_nearest(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded as PPM (lossless round-trip)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for blob, fmt in zip(pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(blob), fmt)
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                blobs.append(encode_ppm(px[yi][:, xi]))
            out = pdf.copy()
            out["bytes"] = blobs
            out["fmt"] = "ppm"
            out["w"] = out_w
            out["h"] = out_h
            yield out

    return df.mapInPandas(gen, schema=df.schema)


# ---------------------------------------------------------------------------
# video / audio payload plumbing (real codecs: operators/media.py + jpeg.py)
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("frame_bytes", T.BinaryType()),
    T.StructField("fmt", T.StringType()),
])


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        media_id: str = "media_id", bytes_col: str = "bytes",
                        duration_ms: str = "duration_ms") -> DataFrame:
    """Frame sampling over an opaque video binary column: one output row per
    sampled timestamp, decoded and re-encoded as PPM.

    REAL path: fmt == 'mjpeg_avi' — a RIFF/AVI container with an MJPG
    stream (operators/media.py); frame timing comes from the avih
    microseconds-per-frame field (duration = n_frames * us/1000 when the
    duration column is null), each sampled timestamp maps to the frame
    on-screen at that instant (idx = ts*1000 // us_per_frame) and that
    frame's JPEG decodes through operators/jpeg.py.

    'rawgrid' remains the deterministic fake (frame k is
    synth_pixels(hash(media_id)+k, 16, 16)) for plumbing tests; compressed
    codecs this container cannot express (H.264, VP9...) raise
    NotImplementedError. The Spark plumbing — schema, Arrow batching, row
    explosion — is identical on every path."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapshaper_spark.operators.jpeg import decode_jpeg
        from mapshaper_spark.operators.media import parse_avi_mjpeg
        for pdf in it:
            out = {k.name: [] for k in VIDEO_FRAME_SCHEMA.fields}
            for mid, blob, dur, fmt in zip(pdf[media_id], pdf[bytes_col],
                                           pdf[duration_ms], pdf["fmt"]):
                if fmt == "rawgrid":
                    seed = sum(mid.encode()) if isinstance(mid, str) else int(mid)
                    for k, ts in enumerate(range(0, int(dur), every_ms)):
                        px = synth_pixels(seed + k, 16, 16)
                        out["media_id"].append(mid)
                        out["frame_idx"].append(k)
                        out["ts_ms"].append(ts)
                        out["frame_bytes"].append(encode_ppm(px))
                        out["fmt"].append("ppm")
                elif fmt == "gif_anim":
                    # animated GIF as a real video container: per-frame
                    # delays from the Graphic Control Extension drive the
                    # same timestamp -> on-screen-frame mapping as AVI
                    from mapshaper_spark.operators.gif import decode_gif_frames
                    gframes = decode_gif_frames(bytes(blob))
                    starts = []
                    t = 0
                    for d, _px in gframes:
                        starts.append(t)
                        t += max(d, 10)
                    total_ms = (dur if dur is not None and not pd.isna(dur)
                                else t)
                    for ts in range(0, int(total_ms), every_ms):
                        idx = max(0, int(np.searchsorted(
                            np.asarray(starts), ts, side="right")) - 1)
                        out["media_id"].append(mid)
                        out["frame_idx"].append(int(idx))
                        out["ts_ms"].append(ts)
                        out["frame_bytes"].append(encode_ppm(gframes[idx][1]))
                        out["fmt"].append("ppm")
                elif fmt == "mjpeg_avi":
                    us, frames = parse_avi_mjpeg(bytes(blob))
                    total_ms = (dur if dur is not None and not pd.isna(dur)
                                else len(frames) * us // 1000)
                    for ts in range(0, int(total_ms), every_ms):
                        idx = min(ts * 1000 // us, len(frames) - 1)
                        px = decode_jpeg(frames[idx])
                        out["media_id"].append(mid)
                        out["frame_idx"].append(int(idx))
                        out["ts_ms"].append(ts)
                        out["frame_bytes"].append(encode_ppm(px))
                        out["fmt"].append("ppm")
                else:
                    raise NotImplementedError(
                        f"video codec '{fmt}' requires an av library")
            yield pd.DataFrame(out)

    return (df.select(media_id, bytes_col, duration_ms, "fmt")
            .mapInPandas(gen, schema=VIDEO_FRAME_SCHEMA))


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.LongType()),
])


def extract_audio_features(df: DataFrame, media_id: str = "media_id",
                           bytes_col: str = "bytes") -> DataFrame:
    """Audio feature extraction over an opaque audio binary column: sample
    count, RMS, zero crossings.

    Real decodes: fmt == 'pcm16' (raw little-endian), fmt == 'wav' (RIFF
    container, operators/media.py — PCM16, G.711 mu-law/A-law, IMA ADPCM).
    Psychoacoustic codecs (MP3, AAC, Opus...) raise NotImplementedError —
    they genuinely need an audio library this container lacks."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapshaper_spark.operators.media import decode_wav
        for pdf in it:
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for mid, blob, fmt in zip(pdf[media_id], pdf[bytes_col], pdf["fmt"]):
                if fmt == "pcm16":
                    pcm = np.frombuffer(bytes(blob), dtype="<i2").astype(np.float64)
                elif fmt == "wav":
                    pcm = decode_wav(bytes(blob))[0].astype(np.float64)
                else:
                    raise NotImplementedError(
                        f"audio codec '{fmt}' requires an audio library")
                out["media_id"].append(mid)
                out["n_samples"].append(len(pcm))
                out["rms"].append(round(float(np.sqrt(np.mean(pcm ** 2))) if len(pcm) else 0.0, 6))
                out["zero_crossings"].append(int(np.sum(np.abs(np.diff(np.signbit(pcm)))))
                                             if len(pcm) > 1 else 0)
            yield pd.DataFrame(out)

    return (df.select(media_id, bytes_col, "fmt")
            .mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA))
