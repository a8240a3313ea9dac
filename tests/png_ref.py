"""Test-only ctypes bridge to the system libpng16, used as the REFERENCE
codec for the pure-numpy PNG implementation in operators/images.py.

Uses libpng's "simplified API" (png.h: png_image_begin_read_from_memory /
png_image_finish_read / png_image_write_to_memory) — plain struct in/out,
no callbacks, no setjmp — so the bridge stays robust across libpng16
patch versions.  Never imported by production code.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

PNG_IMAGE_VERSION = 1
PNG_FORMAT_GRAY = 0x00
PNG_FORMAT_RGB = 0x02          # PNG_FORMAT_FLAG_COLOR
PNG_FORMAT_RGBA = 0x03         # COLOR | ALPHA

_LIB = None


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    name = ctypes.util.find_library("png16") or "libpng16.so.16"
    try:
        _LIB = ctypes.CDLL(name)
        _LIB.png_image_begin_read_from_memory  # simplified API present?
    except (OSError, AttributeError):
        _LIB = None
    return _LIB


def available() -> bool:
    return load() is not None


def _channels(fmt: int) -> int:
    return {PNG_FORMAT_GRAY: 1, PNG_FORMAT_RGB: 3, PNG_FORMAT_RGBA: 4}[fmt]


def decode(data: bytes, fmt: int = PNG_FORMAT_RGB) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 via libpng (any input color
    type/bit depth/interlace; libpng converts to the requested format)."""
    lib = load()
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    if not lib.png_image_begin_read_from_memory(
            ctypes.byref(img), data, ctypes.c_size_t(len(data))):
        raise ValueError(f"libpng read: {img.message.decode()}")
    img.format = fmt
    ch = _channels(fmt)
    buf = np.empty((img.height, img.width, ch), dtype=np.uint8)
    if not lib.png_image_finish_read(
            ctypes.byref(img), None,
            buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(0), None):
        raise ValueError(f"libpng finish: {img.message.decode()}")
    return buf


def encode(pixels: np.ndarray) -> bytes:
    """(h, w[, channels]) uint8 -> PNG bytes via libpng."""
    if pixels.ndim == 2:
        fmt, ch = PNG_FORMAT_GRAY, 1
    elif pixels.shape[2] == 3:
        fmt, ch = PNG_FORMAT_RGB, 3
    else:
        fmt, ch = PNG_FORMAT_RGBA, 4
    lib = load()
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    img.width = pixels.shape[1]
    img.height = pixels.shape[0]
    img.format = fmt
    buf = np.ascontiguousarray(pixels, dtype=np.uint8)
    size = ctypes.c_size_t(0)
    # first call with NULL memory computes the required size
    lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), ctypes.c_int(0),
        buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(0), None)
    out = ctypes.create_string_buffer(size.value)
    img2 = _PngImage()
    img2.version = PNG_IMAGE_VERSION
    img2.width, img2.height, img2.format = img.width, img.height, fmt
    if not lib.png_image_write_to_memory(
            ctypes.byref(img2), out, ctypes.byref(size), ctypes.c_int(0),
            buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(0), None):
        raise ValueError(f"libpng write: {img2.message.decode()}")
    return out.raw[:size.value]
