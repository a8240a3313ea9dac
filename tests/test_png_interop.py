"""Two-way interop for the pure-numpy PNG codec (operators/images.py)
against the system libpng16 (tests/png_ref.py ctypes bridge).

PNG is lossless, so the bar in both directions is byte-exact pixels:
libpng must reproduce our encoder's payloads exactly, and our decoder
must reproduce libpng-authored files exactly (including color types and
filter choices our own encoder never emits).
"""

from __future__ import annotations

import numpy as np
import pytest

from mapshaper_spark.operators.images import (decode_png, encode_png,
                                              synth_pixels)

import png_ref

pytestmark = pytest.mark.skipif(
    not png_ref.available(), reason="system libpng16 not present")


def _images():
    rng = np.random.default_rng(21)
    out = {
        "synth_64x48": synth_pixels(5, 64, 48),
        "synth_33x17": synth_pixels(9, 33, 17),
        "noise_80x80": rng.integers(0, 256, (80, 80, 3), dtype=np.uint8),
        "flat_8x8": np.full((8, 8, 3), 99, np.uint8),
        "one_px": np.array([[[1, 2, 3]]], dtype=np.uint8),
    }
    yy, xx = np.mgrid[0:50, 0:70]
    out["gradient"] = np.stack([(xx * 3) % 256, (yy * 5) % 256,
                                (xx + yy) % 256], axis=2).astype(np.uint8)
    return out


class TestOurEncoderInLibpng:
    def test_byte_exact(self):
        for name, rgb in _images().items():
            ref = png_ref.decode(encode_png(rgb))
            assert ref.shape == rgb.shape, name
            assert (ref == rgb).all(), name


class TestLibpngFilesInOurDecoder:
    def test_rgb_byte_exact(self):
        for name, rgb in _images().items():
            ours = decode_png(png_ref.encode(rgb))
            assert ours.shape == rgb.shape, name
            assert (ours == rgb).all(), name

    def test_gray_byte_exact(self):
        g = synth_pixels(3, 40, 24)[:, :, 1]
        ours = decode_png(png_ref.encode(g))
        # gray expands to 3 identical channels in our RGB-out contract
        assert (ours == g[:, :, None]).all()

    def test_rgba_alpha_dropped(self):
        rng = np.random.default_rng(4)
        rgba = rng.integers(0, 256, (20, 30, 4), dtype=np.uint8)
        ours = decode_png(png_ref.encode(rgba))
        assert (ours == rgba[:, :, :3]).all()
