"""Test-only ctypes bridge to the system libwebp, used as the REFERENCE
codec for the pure-numpy VP8 implementation in operators/vp8.py.

This module is never imported by production code: the engine's codecs are
pure numpy.  Tests use libwebp (when present on the host) to produce real
lossy VP8 bitstreams and to independently decode ours, turning "lossy VP8"
from an unverifiable claim into two-way interop evidence.  All symbols are
from the public libwebp API (decode.h / encode.h).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB = None


def load():
    """Return the libwebp CDLL or None if not present."""
    global _LIB
    if _LIB is not None:
        return _LIB
    name = ctypes.util.find_library("webp") or "libwebp.so.7"
    try:
        _LIB = ctypes.CDLL(name)
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return load() is not None


def encode_rgb(rgb: np.ndarray, quality: float = 75.0) -> bytes:
    """WebPEncodeRGB: RGB (h, w, 3) uint8 -> lossy WebP bytes."""
    lib = load()
    h, w = rgb.shape[:2]
    buf = np.ascontiguousarray(rgb, dtype=np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    n = lib.WebPEncodeRGB(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(w), ctypes.c_int(h), ctypes.c_int(w * 3),
        ctypes.c_float(quality), ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeRGB failed")
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def encode_rgba(rgba: np.ndarray, quality: float = 75.0) -> bytes:
    """WebPEncodeRGBA: RGBA (h, w, 4) uint8 -> lossy WebP bytes
    (VP8X container with a VP8 chunk + losslessly-coded ALPH chunk)."""
    lib = load()
    h, w = rgba.shape[:2]
    buf = np.ascontiguousarray(rgba, dtype=np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    n = lib.WebPEncodeRGBA(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(w), ctypes.c_int(h), ctypes.c_int(w * 4),
        ctypes.c_float(quality), ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeRGBA failed")
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_rgba(data: bytes) -> np.ndarray:
    """WebPDecodeRGBA -> (h, w, 4) uint8."""
    lib = load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    p = lib.WebPDecodeRGBA(data, ctypes.c_size_t(len(data)),
                           ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise RuntimeError("WebPDecodeRGBA failed")
    arr = np.frombuffer(ctypes.string_at(p, w.value * h.value * 4),
                        dtype=np.uint8).reshape(h.value, w.value, 4).copy()
    lib.WebPFree(p)
    return arr


def decode_yuv(data: bytes):
    """WebPDecodeYUV -> (Y, U, V) uint8 planes (Y: h x w, U/V: 4:2:0).

    This is the spec-exact decoded signal (before any RGB conversion), so a
    conforming decoder must match it byte-for-byte.
    """
    lib = load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    p = lib.WebPDecodeYUV(data, ctypes.c_size_t(len(data)),
                          ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not p:
        raise RuntimeError("WebPDecodeYUV failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    ybuf = ctypes.string_at(p, stride.value * H)
    y = np.frombuffer(ybuf, dtype=np.uint8).reshape(H, stride.value)[:, :W]
    ubuf = ctypes.string_at(u, uv_stride.value * ch)
    uu = np.frombuffer(ubuf, dtype=np.uint8).reshape(ch, uv_stride.value)[:, :cw]
    vbuf = ctypes.string_at(v, uv_stride.value * ch)
    vv = np.frombuffer(vbuf, dtype=np.uint8).reshape(ch, uv_stride.value)[:, :cw]
    y, uu, vv = y.copy(), uu.copy(), vv.copy()
    lib.WebPFree(p)
    return y, uu, vv
