"""Two-way interop against the SYSTEM libjpeg62-turbo (tests/jpeg_ref.py
compiles a reference helper with the installed headers) — the same
evidence pattern as the libpng / libwebp interop suites.

Closes the r4 'progressive + DRI' codec boundary: real libjpeg streams
with restart intervals, progressive scan scripts (jpeg_simple_progression
— a DIFFERENT script than our encoder's, so the decoder is tested on
foreign scan layouts), and both sampling modes.
"""

from __future__ import annotations

import numpy as np
import pytest

import jpeg_ref as R
from mapshaper_spark.operators import jpeg as J

pytestmark = pytest.mark.skipif(
    not R.available(), reason="system gcc/libjpeg headers absent")


def _fixture(h=70, w=100, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (5, 7, 3)).astype(np.float64)
    return np.kron(base, np.ones((16, 16, 1)))[:h, :w].astype(np.uint8)


class TestDecodeRealLibjpegStreams:
    @pytest.mark.parametrize("progressive", [False, True])
    @pytest.mark.parametrize("restart", [0, 1, 3, 7])
    def test_444_exact_within_idct_rounding(self, progressive, restart):
        """4:4:4 (no upsampling ambiguity): our decode of a REAL libjpeg
        stream matches libjpeg's own decode to <=1 gray level (float vs
        fixed-point IDCT rounding)."""
        px = _fixture()
        data = R.encode(px, 90, progressive=progressive,
                        restart_interval=restart, samp444=True)
        mine = J.decode_jpeg(data).astype(int)
        ref = R.decode(data).astype(int)
        assert np.abs(mine - ref).max() <= 1

    @pytest.mark.parametrize("progressive", [False, True])
    def test_420_default_sampling(self, progressive):
        """libjpeg's default 4:2:0: our box upsampling differs from
        libjpeg's fancy (interpolating) upsampler only in the 1-2 px
        chroma seam band; away from chroma edges the decodes agree to
        <=1, and the luma channel-mean is preserved."""
        px = _fixture()
        data = R.encode(px, 90, progressive=progressive,
                        restart_interval=2, samp444=False)
        mine = J.decode_jpeg(data).astype(float)
        ref = R.decode(data).astype(float)
        # interior of each 16x16 tile (2 px margin) has constant chroma:
        # both upsamplers agree there
        mask = np.zeros(px.shape[:2], dtype=bool)
        mask[2:-2, 2:-2] = True
        for r0 in range(0, px.shape[0], 16):
            mask[max(r0 - 2, 0):r0 + 2, :] = False
        for c0 in range(0, px.shape[1], 16):
            mask[:, max(c0 - 2, 0):c0 + 2] = False
        assert np.abs(mine - ref)[mask].max() <= 1
        assert abs(mine.mean() - ref.mean()) < 1.0

    def test_progressive_dri_matches_no_dri(self):
        """Restart markers are pure framing: the same image encoded with
        and without DRI must decode identically (libjpeg encodes the same
        coefficients either way)."""
        px = _fixture(seed=11)
        a = R.encode(px, 85, progressive=True, restart_interval=0,
                     samp444=True)
        b = R.encode(px, 85, progressive=True, restart_interval=1,
                     samp444=True)
        assert np.array_equal(J.decode_jpeg(a), J.decode_jpeg(b))


class TestLibjpegDecodesOurStreams:
    def test_baseline_and_progressive_encoders(self):
        """Real libjpeg accepts our encoders' output (baseline with and
        without DRI, progressive) and decodes to the same pixels we do
        (4:4:4 both sides -> <=1 rounding)."""
        px = _fixture(seed=3)
        for blob in (J.encode_jpeg(px, 90),
                     J.encode_jpeg(px, 90, restart_interval=4),
                     J.encode_jpeg_progressive(px, 90)):
            ref = R.decode(blob).astype(int)
            mine = J.decode_jpeg(blob).astype(int)
            assert np.abs(mine - ref).max() <= 1


class TestLosslessSOF3:
    """r5: lossless JPEG (SOF3, T.81 Annex H process 14) closes the last
    JPEG-family boundary. libjpeg62 has no lossless support, so evidence
    is exact round-trips on worst-case noise across every predictor,
    restart handling, and point-transform semantics."""

    def test_all_predictors_bit_exact(self):
        rng = np.random.RandomState(3)
        px = rng.randint(0, 256, (23, 31, 3)).astype(np.uint8)
        for pred in range(1, 8):
            for rst in (0, 5):
                blob = J.encode_jpeg_lossless(px, predictor=pred,
                                              restart_interval=rst)
                assert blob[2:4] == b"\xff\xc3"
                assert np.array_equal(J.decode_jpeg(blob), px), (pred, rst)

    def test_point_transform(self):
        rng = np.random.RandomState(5)
        px = rng.randint(0, 256, (9, 14, 3)).astype(np.uint8)
        blob = J.encode_jpeg_lossless(px, predictor=4, point_transform=2)
        back = J.decode_jpeg(blob)
        # Pt=2 drops exactly the two low bits, deterministically
        assert np.array_equal(back, px & ~np.uint8(3))

    def test_in_corpus_dispatch(self):
        from mapshaper_spark.operators.images import decode_image
        rng = np.random.RandomState(9)
        px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        blob = J.encode_jpeg_lossless(px)
        assert np.array_equal(decode_image(blob, "jpeg"), px)


class TestArithmeticSOF9:
    """r5: sequential arithmetic-coded JPEG (QM coder, T.81 Annex F)
    against REAL libjpeg SOF9 streams — quality, sampling, and restart
    intervals all covered; statistics adaptation exercised by noise."""

    @pytest.mark.parametrize("restart", [0, 1, 2, 7])
    @pytest.mark.parametrize("quality", [90, 50])
    def test_444_matches_libjpeg(self, restart, quality):
        px = _fixture()
        data = R.encode(px, quality, restart_interval=restart,
                        samp444=True, arith=True)
        assert b"\xff\xc9" in data[:400]  # SOF9 really emitted
        mine = J.decode_jpeg(data).astype(int)
        ref = R.decode(data).astype(int)
        assert np.abs(mine - ref).max() <= 1

    def test_noise_adaptation(self):
        rng = np.random.RandomState(12)
        px = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
        data = R.encode(px, 85, samp444=True, arith=True)
        mine = J.decode_jpeg(data).astype(int)
        ref = R.decode(data).astype(int)
        # worst-case noise pushes float-vs-fixed IDCT rounding to ~3 on
        # a handful of samples; entropy errors would be wildly larger
        d = np.abs(mine - ref)
        assert d.max() <= 3 and (d > 2).mean() < 1e-3

    def test_420_default_sampling(self):
        px = _fixture(seed=5)
        data = R.encode(px, 90, samp444=False, arith=True)
        mine = J.decode_jpeg(data).astype(float)
        ref = R.decode(data).astype(float)
        # same chroma-seam caveat as the Huffman 4:2:0 test
        assert abs(mine.mean() - ref.mean()) < 1.0



class TestProgressiveArithmeticSOF10:
    """r5: progressive arithmetic JPEG (T.81 Annex G + QM coder) against
    real libjpeg SOF10 streams (jpeg_simple_progression scan script with
    DC/AC first + refinement passes)."""

    @pytest.mark.parametrize("restart", [0, 2])
    @pytest.mark.parametrize("quality", [90, 50])
    def test_444_matches_libjpeg(self, restart, quality):
        px = _fixture()
        data = R.encode(px, quality, progressive=True,
                        restart_interval=restart, samp444=True, arith=True)
        assert b"\xff\xca" in data[:400]  # SOF10 really emitted
        mine = J.decode_jpeg(data).astype(int)
        ref = R.decode(data).astype(int)
        assert np.abs(mine - ref).max() <= 1

    def test_noise(self):
        rng = np.random.RandomState(21)
        px = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
        data = R.encode(px, 85, progressive=True, samp444=True, arith=True)
        mine = J.decode_jpeg(data).astype(int)
        ref = R.decode(data).astype(int)
        d = np.abs(mine - ref)
        assert d.max() <= 3 and (d > 2).mean() < 1e-3


class TestArithmeticEncoder:
    """r5: the from-scratch QM ENCODER — real libjpeg decodes our SOF9
    streams identically to our own decoder (two-way interop), and the
    entropy layer is bit-faithful: our decode of our arith encode equals
    our decode of the Huffman encode of the same quantized coefficients
    BIT-EXACTLY."""

    @pytest.mark.parametrize("quality", [50, 90, 95])
    def test_libjpeg_decodes_our_streams(self, quality):
        from mapshaper_spark.operators.jpeg_arith import encode_jpeg_arith
        px = _fixture()
        blob = encode_jpeg_arith(px, quality)
        assert b"\xff\xc9" in blob[:200]
        mine = J.decode_jpeg(blob).astype(int)
        ref = R.decode(blob).astype(int)
        assert np.abs(mine - ref).max() <= 2

    def test_entropy_layer_lossless(self):
        from mapshaper_spark.operators.jpeg_arith import encode_jpeg_arith
        rng = np.random.RandomState(9)
        px = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
        a = J.decode_jpeg(encode_jpeg_arith(px, 85))
        b = J.decode_jpeg(J.encode_jpeg(px, 85))
        assert np.array_equal(a, b)  # same coefficients, same IDCT

    def test_beats_huffman_size(self):
        from mapshaper_spark.operators.jpeg_arith import encode_jpeg_arith
        px = _fixture()
        assert len(encode_jpeg_arith(px, 90)) < len(J.encode_jpeg(px, 90))


class TestRandomizedTorture:
    """Randomized cross-codec sweep (seeded, deterministic): odd
    dimensions down to 1x1, all four entropy processes, both samplings,
    restart intervals — every libjpeg stream must decode within IDCT
    rounding of libjpeg's own output, our arithmetic streams must
    round-trip through libjpeg, and lossless must stay bit-exact."""

    def test_sweep(self):
        from mapshaper_spark.operators.jpeg_arith import encode_jpeg_arith
        rng = np.random.RandomState(99)
        for trial in range(16):
            h = int(rng.randint(1, 90))
            w = int(rng.randint(1, 90))
            base = rng.randint(0, 255, (max(1, h // 8), max(1, w // 8), 3)
                               ).astype(np.float64)
            px = np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)
            q = int(rng.choice([35, 60, 90, 97]))
            s444 = bool(rng.randint(2))
            prog = bool(rng.randint(2))
            arith = bool(rng.randint(2))
            rst = int(rng.choice([0, 1, 3]))
            data = R.encode(px, q, progressive=prog, restart_interval=rst,
                            samp444=s444, arith=arith)
            mine = J.decode_jpeg(data).astype(int)
            ref = R.decode(data).astype(int)
            if s444:  # 4:2:0 differs only in the chroma upsampling seam
                assert np.abs(mine - ref).max() <= 3, \
                    (trial, h, w, q, prog, arith, rst)
            blob = encode_jpeg_arith(px, q)
            d2 = np.abs(J.decode_jpeg(blob).astype(int) -
                        R.decode(blob).astype(int)).max()
            assert d2 <= 3, (trial, h, w, q)
        for trial in range(6):
            h = int(rng.randint(1, 40))
            w = int(rng.randint(1, 40))
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            blob = J.encode_jpeg_lossless(
                px, predictor=1 + trial % 7,
                restart_interval=int(rng.choice([0, 3])))
            assert np.array_equal(J.decode_jpeg(blob), px), (trial, h, w)
