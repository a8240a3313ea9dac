"""Image payload plumbing tests: codecs, PSNR invariant, Spark decode path.

The per-row invariant from BASELINE.json input_hint: decoded-pixel allclose
(PSNR >= 40 dB for lossy formats) + caption equality. Lossless codecs here
must round-trip bit-exact (PSNR = inf); the lossy path is stubbed (no image
libs in this container) but the PSNR acceptance check itself is exercised.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapshaper_spark import layers as L
from mapshaper_spark.operators import images as IM


class TestCodecs:
    def test_png_roundtrip_bit_exact(self):
        px = IM.synth_pixels(17, 32, 16)
        assert (IM.decode_png(IM.encode_png(px)) == px).all()

    def test_ppm_roundtrip_bit_exact(self):
        px = IM.synth_pixels(3, 16, 64)
        assert (IM.decode_ppm(IM.encode_ppm(px)) == px).all()

    def test_lossless_psnr_is_inf(self):
        px = IM.synth_pixels(5, 16, 16)
        assert IM.psnr(px, IM.decode_png(IM.encode_png(px))) == float("inf")

    def test_psnr_threshold_check(self):
        px = IM.synth_pixels(5, 64, 64).astype(np.int16)
        noisy = np.clip(px + 2, 0, 255).astype(np.uint8)  # ~ +2 uniform error
        val = IM.psnr(px.astype(np.uint8), noisy)
        assert 40.0 <= val < float("inf")  # 20*log10(255/2) ~ 42 dB
        bad = np.clip(px + 40, 0, 255).astype(np.uint8)
        assert IM.psnr(px.astype(np.uint8), bad) < 40.0

    def test_png_adaptive_filters_roundtrip(self):
        # a smooth gradient makes the min-sum-abs heuristic pick Sub/Up/Paeth
        y, x = np.meshgrid(np.arange(40), np.arange(56), indexing="ij")
        px = np.stack([(x * 3) % 256, (y * 5) % 256, (x + y) % 256],
                      axis=2).astype(np.uint8)
        blob = IM.encode_png(px, adaptive=True)
        assert (IM.decode_png(blob) == px).all()
        # the adaptive encoder must actually have used a non-zero filter
        import struct as _s
        import zlib as _z
        pos, idat = 8, b""
        while pos < len(blob):
            (ln,) = _s.unpack(">I", blob[pos:pos + 4])
            if blob[pos + 4:pos + 8] == b"IDAT":
                idat += blob[pos + 8:pos + 8 + ln]
            pos += 12 + ln
        raw = np.frombuffer(_z.decompress(idat), np.uint8).reshape(40, 56 * 3 + 1)
        assert set(raw[:, 0].tolist()) - {0}

    def test_png_every_filter_type_decodes(self):
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
        flat = px.reshape(10, 36)
        for f in range(5):
            parts, prev = [], np.zeros(36, np.uint8)
            for r in range(10):
                parts.append(bytes([f]) + IM._filter_row(f, flat[r], prev, 3).tobytes())
                prev = flat[r]
            import struct as _s
            import zlib as _z
            ihdr = _s.pack(">IIBBBBB", 12, 10, 8, 2, 0, 0, 0)
            blob = (IM._PNG_SIG + IM._chunk(b"IHDR", ihdr) +
                    IM._chunk(b"IDAT", _z.compress(b"".join(parts))) +
                    IM._chunk(b"IEND", b""))
            assert (IM.decode_png(blob) == px).all(), f"filter {f}"

    @staticmethod
    def _png_raw(ctype, w, h, body, plte=None):
        import struct as _s
        import zlib as _z
        ihdr = _s.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        out = IM._PNG_SIG + IM._chunk(b"IHDR", ihdr)
        if plte is not None:
            out += IM._chunk(b"PLTE", plte.tobytes())
        return out + IM._chunk(b"IDAT", _z.compress(body)) + IM._chunk(b"IEND", b"")

    def test_png_gray_palette_alpha_color_types(self):
        rng = np.random.default_rng(11)
        gray = rng.integers(0, 256, (6, 5), dtype=np.uint8)
        body = b"".join(b"\x00" + gray[r].tobytes() for r in range(6))
        got = IM.decode_png(self._png_raw(0, 5, 6, body))
        assert (got == np.repeat(gray[:, :, None], 3, axis=2)).all()

        ga = rng.integers(0, 256, (4, 3, 2), dtype=np.uint8)
        body = b"".join(b"\x00" + ga[r].tobytes() for r in range(4))
        got = IM.decode_png(self._png_raw(4, 3, 4, body))
        assert (got == np.repeat(ga[:, :, :1], 3, axis=2)).all()

        rgba = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
        body = b"".join(b"\x00" + rgba[r].tobytes() for r in range(4))
        got = IM.decode_png(self._png_raw(6, 4, 4, body))
        assert (got == rgba[:, :, :3]).all()

        plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (5, 7), dtype=np.uint8)
        body = b"".join(b"\x00" + idx[r].tobytes() for r in range(5))
        got = IM.decode_png(self._png_raw(3, 7, 5, body, plte=plte))
        assert (got == plte[idx]).all()

    def test_png_adam7_interlace(self):
        import struct as _s
        import zlib as _z
        rng = np.random.default_rng(13)
        h, w = 9, 11  # non-multiples of 8 exercise partial passes
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        body = b""
        for x0, xs, y0, ys in IM._ADAM7:
            sub = px[y0::ys, x0::xs]
            if sub.size == 0:
                continue
            body += b"".join(b"\x00" + sub[r].tobytes() for r in range(sub.shape[0]))
        ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
        blob = (IM._PNG_SIG + IM._chunk(b"IHDR", ihdr) +
                IM._chunk(b"IDAT", _z.compress(body)) + IM._chunk(b"IEND", b""))
        assert (IM.decode_png(blob) == px).all()

    def test_webp_lossless_roundtrip(self):
        # lossless VP8L is a real codec now (operators/webp.py); only the
        # lossy VP8 stream remains NotImplemented
        from mapshaper_spark.operators import webp as W
        px = IM.synth_pixels(6, 20, 14)
        assert (IM.decode_image(W.encode_webp(px), "webp") == px).all()

    def test_truncated_jpeg_errors(self):
        with pytest.raises(ValueError):
            IM.decode_image(b"\xff\xd8\xff", "jpeg")

    def test_phash_deterministic(self):
        px = IM.synth_pixels(9, 32, 32)
        assert IM.phash64(px) == IM.phash64(px.copy())
        assert IM.phash64(px) != IM.phash64(IM.synth_pixels(10, 32, 32))


class TestSparkImageOps:
    def test_decode_stats_matches_driver_side(self, spark):
        df = L.synth_images(spark, 40, with_bytes=True)
        got = {r.image_id: r for r in IM.decode_stats(df).collect()}
        assert len(got) == 40
        meta = {r.image_id: r for r in df.select("image_id", "id", "w", "h").collect()}
        for image_id, r in got.items():
            m = meta[image_id]
            px = IM.synth_pixels(int(m.id), int(m.w), int(m.h))
            assert (r.dec_w, r.dec_h) == (m.w, m.h)
            assert r.mean_r == round(float(px[..., 0].mean()), 6)
            assert r.ahash == IM.phash64(px)

    def test_caption_equality_roundtrip(self, spark):
        # caption must survive the decode -> stats -> join pipeline unchanged
        df = L.synth_images(spark, 20, with_bytes=True)
        stats = IM.decode_stats(df)
        joined = df.join(stats, "image_id")
        rows = joined.select("image_id", "caption").collect()
        expect = {r.image_id: r.caption for r in df.select("image_id", "caption").collect()}
        assert {r.image_id: r.caption for r in rows} == expect

    def test_resize_nearest_shapes(self, spark):
        df = L.synth_images(spark, 10, with_bytes=True)
        out = IM.resize_nearest(df, 8, 8)
        for r in IM.decode_stats(out).collect():
            assert (r.dec_w, r.dec_h) == (8, 8)

    def test_footprint_determinism(self, spark):
        df = L.footprint_cols(L.synth_images(spark, 100))
        rows = df.select("phash", "lon", "lat").collect()
        for r in rows:
            assert r.lon == -120.0 + (r.phash % (1 << 20)) / float(1 << 20) * 60.0
            assert r.lat == 25.0 + ((r.phash >> 20) % (1 << 20)) / float(1 << 20) * 24.0
            assert -120 <= r.lon <= -60 and 25 <= r.lat <= 49


class TestJpegCodec:
    """Baseline JPEG (operators/jpeg.py): the lossy path of the
    PSNR>=40dB per-row invariant (BASELINE.json input_hint)."""

    def test_roundtrip_psnr_gate_q95(self):
        from mapshaper_spark.operators import jpeg as J
        from mapshaper_spark.operators.images import synth_pixels, psnr
        px = synth_pixels(7, 64, 48)
        back = J.decode_jpeg(J.encode_jpeg(px, quality=95))
        assert back.shape == px.shape
        assert psnr(px, back) >= 40.0  # the actual lossy acceptance gate

    def test_lower_quality_lossier(self):
        from mapshaper_spark.operators import jpeg as J
        from mapshaper_spark.operators.images import synth_pixels, psnr
        px = synth_pixels(3, 32, 32)
        p95 = psnr(px, J.decode_jpeg(J.encode_jpeg(px, quality=95)))
        p50 = psnr(px, J.decode_jpeg(J.encode_jpeg(px, quality=50)))
        assert p95 > p50
        s95 = len(J.encode_jpeg(px, quality=95))
        s50 = len(J.encode_jpeg(px, quality=50))
        assert s50 < s95

    def test_non_multiple_of_8_dims(self):
        from mapshaper_spark.operators import jpeg as J
        from mapshaper_spark.operators.images import synth_pixels
        px = synth_pixels(11, 33, 17)
        back = J.decode_jpeg(J.encode_jpeg(px, quality=95))
        assert back.shape == (17, 33, 3)

    def test_decode_stats_on_jpeg_rows(self, spark):
        from mapshaper_spark import layers as L
        from mapshaper_spark.operators import images as IM
        from pyspark.sql import functions as F
        imgs = L.synth_images(spark, 30)
        imgs = imgs.withColumn("fmt", F.lit("jpeg"))
        from mapshaper_spark.operators.images import encode_synthetic_bytes
        out = IM.decode_stats(encode_synthetic_bytes(imgs)).collect()
        assert len(out) == 30
        # decoded dims match metadata even through the lossy codec
        meta = {r.image_id: (r.w, r.h) for r in imgs.collect()}
        for r in out:
            assert (r.dec_w, r.dec_h) == meta[r.image_id]

    def test_bad_jpeg_errors(self):
        from mapshaper_spark.operators import jpeg as J
        import pytest as _pt
        with _pt.raises(ValueError):
            J.decode_jpeg(b"not a jpeg at all")


class TestProgressiveJpeg:
    """Progressive JPEG (SOF2): spectral selection + successive
    approximation, encoder (fixture source) + general decoder
    (operators/jpeg.py, T.81 Annex G)."""

    def test_roundtrip_psnr_gate_q95(self):
        from mapshaper_spark.operators import jpeg as J
        from mapshaper_spark.operators.images import synth_pixels, psnr
        px = synth_pixels(7, 64, 48)
        data = J.encode_jpeg_progressive(px, quality=95)
        back = J.decode_jpeg(data)
        assert back.shape == px.shape
        assert psnr(px, back) >= 40.0

    def test_is_actually_sof2(self):
        from mapshaper_spark.operators import jpeg as J
        from mapshaper_spark.operators.images import synth_pixels
        data = J.encode_jpeg_progressive(synth_pixels(1, 16, 16), quality=90)
        assert b"\xFF\xC2" in data      # SOF2 frame marker
        assert data.count(b"\xFF\xDA") == 9  # one SOS per scan in the script

    def test_identical_to_baseline_roundtrip(self):
        # both entropy paths carry the SAME quantized coefficients, so the
        # decoded pixels must match BIT-FOR-BIT — a strong cross-check of
        # the EOBn/refinement decode against the independent baseline path
        import numpy as np
        from mapshaper_spark.operators import jpeg as J
        from mapshaper_spark.operators.images import synth_pixels
        rng = np.random.RandomState(5)
        for q in (95, 75, 50):
            for seed, w, h in ((2, 40, 24), (9, 33, 17), (4, 8, 8)):
                px = synth_pixels(seed, w, h)
                noisy = np.clip(px.astype(int) +
                                rng.randint(-40, 40, px.shape), 0, 255) \
                    .astype(np.uint8)
                base = J.decode_jpeg(J.encode_jpeg(noisy, quality=q))
                prog = J.decode_jpeg(J.encode_jpeg_progressive(noisy, quality=q))
                assert np.array_equal(base, prog), (q, seed, w, h)

    def test_decode_stats_on_progressive_rows(self, spark):
        from mapshaper_spark import layers as L
        from mapshaper_spark.operators import images as IM
        from mapshaper_spark.operators.images import encode_synthetic_bytes
        from pyspark.sql import functions as F
        imgs = L.synth_images(spark, 20).withColumn(
            "fmt", F.lit("jpeg_progressive"))
        out = IM.decode_stats(encode_synthetic_bytes(imgs)).collect()
        assert len(out) == 20
        meta = {r.image_id: (r.w, r.h) for r in imgs.collect()}
        for r in out:
            assert (r.dec_w, r.dec_h) == meta[r.image_id]


class TestRestartIntervals:
    """DRI + RSTn markers (T.81 E.1.4): byte-aligned entropy restarts with
    DC predictor resets — common in real-world JPEGs."""

    def test_dri_roundtrip_identical_to_plain(self):
        import numpy as np
        from mapshaper_spark.operators import jpeg as J
        from mapshaper_spark.operators.images import synth_pixels
        for seed, w, h, ri in ((7, 64, 48, 3), (3, 33, 17, 1), (5, 80, 80, 7)):
            px = synth_pixels(seed, w, h)
            plain = J.decode_jpeg(J.encode_jpeg(px, quality=95))
            dri = J.decode_jpeg(J.encode_jpeg(px, quality=95,
                                              restart_interval=ri))
            assert np.array_equal(plain, dri), (seed, w, h, ri)

    def test_dri_emits_markers(self):
        from mapshaper_spark.operators import jpeg as J
        from mapshaper_spark.operators.images import synth_pixels
        data = J.encode_jpeg(synth_pixels(7, 64, 48), quality=95,
                             restart_interval=3)
        assert b"\xFF\xDD" in data
        n_rst = sum(data.count(bytes([0xFF, 0xD0 + k])) for k in range(8))
        assert n_rst == 48 // 3 - 1  # 48 MCUs, a restart between intervals


class TestPngSubByteDepths:
    """r5: PNG bit depths 1/2/4 (MSB-first packed gray + palette),
    byte-exact against the system libpng."""

    def _make(self, w, h, depth, ctype, rowvals, plte=None):
        import struct
        import zlib

        import numpy as np

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload +
                    struct.pack(">I",
                                zlib.crc32(tag + payload) & 0xffffffff))
        raw = b""
        for r in range(h):
            bits = []
            for v in rowvals[r]:
                bits += [int(b) for b in format(int(v), f"0{depth}b")]
            bits += [0] * (-len(bits) % 8)
            raw += b"\x00" + np.packbits(
                np.array(bits, np.uint8)).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
        return out + chunk(b"IDAT", zlib.compress(raw)) + \
            chunk(b"IEND", b"")

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_gray_and_palette_match_libpng(self, depth):
        import numpy as np

        import png_ref as PR
        from mapshaper_spark.operators.images import decode_png
        if not PR.available():
            pytest.skip("libpng unavailable")
        rng = np.random.RandomState(3)
        vals = rng.randint(0, 1 << depth, (9, 13))
        blob = self._make(13, 9, depth, 0, vals)
        assert np.array_equal(decode_png(blob), PR.decode(blob))
        plte = rng.randint(0, 256, (1 << depth, 3))
        blob = self._make(13, 9, depth, 3, vals, plte)
        assert np.array_equal(decode_png(blob), PR.decode(blob))
