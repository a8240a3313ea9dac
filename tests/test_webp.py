"""VP8L (lossless WebP) codec tests.

Encoder round-trips cover the literal path; the decoder-only machinery
(LZ77 backward references, 2-D distance map, color cache, predictor /
color / color-indexing transforms, meta prefix groups) is exercised by
hand-built bitstreams assembled with the module's own bit-writer and
prefix-code helpers — forward transforms are recomputed independently in
the tests, so an encode/decode convention slip cannot self-cancel."""

import numpy as np
import pytest

from mapshaper_spark.operators import images as IM
from mapshaper_spark.operators import webp as W


def _argb(px):
    a = np.full(px.shape[:2], 255, np.uint32)
    return ((a << 24) | (px[:, :, 0].astype(np.uint32) << 16) |
            (px[:, :, 1].astype(np.uint32) << 8) | px[:, :, 2])


class _StreamBuilder:
    """Minimal hand-rolled VP8L stream assembler for decoder-only paths."""

    def __init__(self, w, h):
        self.bw = W._BitWriter()
        self.bw.write(W._VP8L_MAGIC, 8)
        self.bw.write(w - 1, 14)
        self.bw.write(h - 1, 14)
        self.bw.write(0, 1)
        self.bw.write(0, 3)

    def end_transforms(self):
        self.bw.write(0, 1)
        return self

    def spatial_header(self, cache_bits=0, meta=False):
        if cache_bits:
            self.bw.write(1, 1)
            self.bw.write(cache_bits, 4)
        else:
            self.bw.write(0, 1)
        if meta is not False:
            self.bw.write(1, 1)
        else:
            self.bw.write(0, 1)
        return self

    def codes_for(self, green_syms, r_syms, b_syms, a_syms, d_syms,
                  cache_size=0):
        """Build the 5 prefix codes from the symbol streams; return emit fn."""
        def hist(syms, size):
            h = [0] * size
            for s in syms:
                h[s] += 1
            if not syms:
                h[0] = 1
            return h
        ga = 256 + 24 + cache_size
        tables = [
            W._write_prefix_code(self.bw, W._huffman_lengths(hist(green_syms, ga))),
            W._write_prefix_code(self.bw, W._huffman_lengths(hist(r_syms, 256))),
            W._write_prefix_code(self.bw, W._huffman_lengths(hist(b_syms, 256))),
            W._write_prefix_code(self.bw, W._huffman_lengths(hist(a_syms, 256))),
            W._write_prefix_code(self.bw, W._huffman_lengths(hist(d_syms, 40))),
        ]
        return tables

    def payload(self):
        return self.bw.getvalue()


def _emit(bw, table, sym):
    c, n = table[sym]
    bw.write_code(c, n)


def _emit_literal(bw, t, argb_px):
    a = (argb_px >> 24) & 0xFF
    r = (argb_px >> 16) & 0xFF
    g = (argb_px >> 8) & 0xFF
    b = argb_px & 0xFF
    _emit(bw, t[0], int(g))
    _emit(bw, t[1], int(r))
    _emit(bw, t[2], int(b))
    _emit(bw, t[3], int(a))


class TestContainer:
    def test_encoder_roundtrip_patterns(self):
        rng = np.random.default_rng(3)
        for px in (IM.synth_pixels(11, 40, 24),
                   rng.integers(0, 256, (15, 9, 3), dtype=np.uint8),
                   np.full((6, 6, 3), 77, np.uint8)):
            for sg in (False, True):
                assert (W.decode_webp(W.encode_webp(px, subtract_green=sg))
                        == px).all()

    def test_riff_container_shape(self):
        blob = W.encode_webp(IM.synth_pixels(1, 8, 8))
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
        assert blob[12:16] == b"VP8L"
        assert len(blob) % 2 == 0  # RIFF chunks are even-padded

    def test_lossy_vp8_dispatches(self):
        # a garbage VP8 chunk reaches the vp8 decoder (ValueError on the
        # missing keyframe start code), not a NotImplementedError: lossy
        # decode is wired in (real-stream interop lives in test_vp8.py)
        import struct
        payload = b"\x00" * 16
        blob = (b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP" +
                b"VP8 " + struct.pack("<I", len(payload)) + payload)
        with pytest.raises(ValueError):
            W.decode_webp(blob)

    def test_distance_map_is_spec_shaped(self):
        m = W._DIST_MAP
        assert len(m) == 120
        assert m[0] == (0, 1) and m[1] == (1, 0)          # nearest two
        assert m[2] == (1, 1) and m[3] == (-1, 1)
        assert (8, 7) in m and (-8, 1) not in m            # window bounds
        d2 = [dx * dx + dy * dy for dx, dy in m]
        assert d2 == sorted(d2)                            # distance-ordered


class TestDecoderOnlyPaths:
    def test_lz77_direct_distance_row_copy(self):
        # 4x2: row 0 = literals, row 1 = one backref (len 4, dist 4 direct)
        w, h = 4, 2
        pix = [0xFF000000 | (g << 8) for g in (10, 20, 30, 40)]
        sb = _StreamBuilder(w, h).end_transforms().spatial_header()
        greens = [10, 20, 30, 40, 256 + 3]   # length code 3 -> length 4
        # direct distance 4: dist_code = 124 -> prefix symbol for value 124:
        # value 124 -> code where offset... use _lz77 inverse: symbol 14
        # covers 113..128 (offset (2+0)<<6=128? compute below instead):
        dist_sym, extra_bits, extra_val = None, 0, 0
        for sym in range(40):
            if sym < 4:
                if sym + 1 == 124:
                    dist_sym = sym
                continue
            eb = (sym - 2) >> 1
            off = (2 + (sym & 1)) << eb
            if off + 1 <= 124 <= off + (1 << eb):
                dist_sym, extra_bits, extra_val = sym, eb, 124 - off - 1
                break
        t = sb.codes_for(greens, [0], [0], [255], [dist_sym])
        for p in pix:
            _emit_literal(sb.bw, t, p)
        _emit(sb.bw, t[0], 256 + 3)
        _emit(sb.bw, t[4], dist_sym)
        sb.bw.write(extra_val, extra_bits)
        got = W.decode_vp8l(sb.payload())
        exp = np.array([[(0, g, 0) for g in (10, 20, 30, 40)]] * 2, np.uint8)
        assert (got == exp).all()

    def test_lz77_mapped_distance_above(self):
        # dist_code 1 -> (0,1) -> distance w: copies the pixel above
        w, h = 3, 2
        sb = _StreamBuilder(w, h).end_transforms().spatial_header()
        greens = [5, 6, 7, 256 + 2]          # length code 2 -> length 3
        t = sb.codes_for(greens, [1], [2], [255], [0])  # dist sym 0 -> code 1
        for g, r, b in ((5, 1, 2), (6, 1, 2), (7, 1, 2)):
            _emit_literal(sb.bw, t, 0xFF000000 | (r << 16) | (g << 8) | b)
        _emit(sb.bw, t[0], 256 + 2)
        _emit(sb.bw, t[4], 0)
        got = W.decode_vp8l(sb.payload())
        assert (got[1] == got[0]).all()
        assert got[0, :, 1].tolist() == [5, 6, 7]

    def test_color_cache_hit(self):
        w, h = 2, 1
        cache_bits = 4
        px = 0xFF000000 | (9 << 16) | (200 << 8) | 30
        idx = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
        sb = _StreamBuilder(w, h).end_transforms() \
            .spatial_header(cache_bits=cache_bits)
        greens = [200, 256 + 24 + int(idx)]
        t = sb.codes_for(greens, [9], [30], [255], [0],
                         cache_size=1 << cache_bits)
        _emit_literal(sb.bw, t, px)
        _emit(sb.bw, t[0], 256 + 24 + int(idx))
        got = W.decode_vp8l(sb.payload())
        assert (got[0, 0] == got[0, 1]).all()
        assert got[0, 0].tolist() == [9, 200, 30]

    @staticmethod
    def _sub_image(bw, argb_vals, w, h):
        """Emit a literal-coded sub-resolution image (no meta, no cache)."""
        bw.write(0, 1)  # no cache
        # sub-images never read a meta bit (allow_meta=False)
        greens = [int((v >> 8) & 0xFF) for v in argb_vals]
        reds = [int((v >> 16) & 0xFF) for v in argb_vals]
        blues = [int(v & 0xFF) for v in argb_vals]
        alphas = [int((v >> 24) & 0xFF) for v in argb_vals]

        def hist(s, n):
            hh = [0] * n
            for x in s:
                hh[x] += 1
            return hh
        t = [W._write_prefix_code(bw, W._huffman_lengths(hist(greens, 280))),
             W._write_prefix_code(bw, W._huffman_lengths(hist(reds, 256))),
             W._write_prefix_code(bw, W._huffman_lengths(hist(blues, 256))),
             W._write_prefix_code(bw, W._huffman_lengths(hist(alphas, 256))),
             W._write_prefix_code(bw, W._huffman_lengths([1] + [0] * 39))]
        for v in argb_vals:
            _emit_literal(bw, t, int(v))

    def test_predictor_transform_mode_T(self):
        # one 32px block, predictor mode 2 (= top pixel)
        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
        orig = _argb(px)
        h, w = orig.shape
        # forward residuals under the spec's edge rules
        res = np.zeros_like(orig)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(orig[0, x - 1])
                elif x == 0:
                    pred = int(orig[y - 1, 0])
                else:
                    pred = int(orig[y - 1, x])  # mode 2
                cur = int(orig[y, x])
                out = 0
                for s in (0, 8, 16, 24):
                    out |= ((((cur >> s) & 0xFF) - ((pred >> s) & 0xFF)) & 0xFF) << s
                res[y, x] = out
        sb = _StreamBuilder(w, h)
        sb.bw.write(1, 1)       # transform present
        sb.bw.write(0, 2)       # PREDICTOR
        sb.bw.write(3, 3)       # size_bits = 5 -> 32px blocks -> 1x1 image
        self._sub_image(sb.bw, [0xFF000000 | (2 << 8)], 1, 1)
        sb.end_transforms().spatial_header()
        flat = res.ravel()
        greens = [int((v >> 8) & 0xFF) for v in flat]

        def hist(s, n):
            hh = [0] * n
            for x in s:
                hh[x] += 1
            return hh
        t = [W._write_prefix_code(sb.bw, W._huffman_lengths(hist(greens, 280))),
             W._write_prefix_code(sb.bw, W._huffman_lengths(
                 hist([int((v >> 16) & 0xFF) for v in flat], 256))),
             W._write_prefix_code(sb.bw, W._huffman_lengths(
                 hist([int(v & 0xFF) for v in flat], 256))),
             W._write_prefix_code(sb.bw, W._huffman_lengths(
                 hist([int((v >> 24) & 0xFF) for v in flat], 256))),
             W._write_prefix_code(sb.bw, W._huffman_lengths([1] + [0] * 39))]
        for v in flat:
            _emit_literal(sb.bw, t, int(v))
        got = W.decode_vp8l(sb.payload())
        assert (got == px).all()

    def test_color_indexing_with_bundling(self):
        # 3 colors -> 2-bit indices, 4 pixels packed per green byte
        palette = np.array([0xFF102030, 0xFFFF0000, 0xFF00FF00], np.uint32)
        idx = np.array([[0, 1, 2, 1, 0], [2, 2, 0, 1, 1]], np.uint8)
        h, w = idx.shape
        sb = _StreamBuilder(w, h)
        sb.bw.write(1, 1)       # transform present
        sb.bw.write(3, 2)       # COLOR_INDEXING
        sb.bw.write(2, 8)       # 3 colors - 1
        # palette image is component-wise delta-coded
        deltas = []
        prev = 0
        for v in palette.tolist():
            d = 0
            for s in (0, 8, 16, 24):
                d |= ((((v >> s) & 0xFF) - ((prev >> s) & 0xFF)) & 0xFF) << s
            deltas.append(d)
            prev = v
        self._sub_image(sb.bw, deltas, 3, 1)
        sb.end_transforms()
        # packed image: width ceil(5/4)=2, 2-bit indices LSB-first
        packed = np.zeros((h, 2), np.uint32)
        for y in range(h):
            for x in range(w):
                packed[y, x // 4] |= int(idx[y, x]) << (2 * (x % 4))
        flat = (0xFF000000 | (packed << 8)).ravel()
        self._sub_image_main(sb.bw, flat)
        got = W.decode_vp8l(sb.payload())
        exp_r = (palette[idx] >> 16) & 0xFF
        assert (got[:, :, 0] == exp_r.astype(np.uint8)).all()

    @staticmethod
    def _sub_image_main(bw, argb_vals):
        """Main-image literal coding (reads cache + meta bits)."""
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        greens = [int((v >> 8) & 0xFF) for v in argb_vals]

        def hist(s, n):
            hh = [0] * n
            for x in s:
                hh[x] += 1
            return hh
        t = [W._write_prefix_code(bw, W._huffman_lengths(hist(greens, 280))),
             W._write_prefix_code(bw, W._huffman_lengths(
                 hist([int((v >> 16) & 0xFF) for v in argb_vals], 256))),
             W._write_prefix_code(bw, W._huffman_lengths(
                 hist([int(v & 0xFF) for v in argb_vals], 256))),
             W._write_prefix_code(bw, W._huffman_lengths(
                 hist([int((v >> 24) & 0xFF) for v in argb_vals], 256))),
             W._write_prefix_code(bw, W._huffman_lengths([1] + [0] * 39))]
        for v in argb_vals:
            _emit_literal(bw, t, int(v))

    def test_color_transform_inverse(self):
        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
        orig = _argb(px)
        h, w = orig.shape
        g2r, g2b, r2b = 17, 250, 3   # arbitrary int8-coded multipliers
        cte = 0xFF000000 | (g2r << 16) | (g2b << 8) | r2b

        def delta(t, c):
            t8 = t - 256 if t >= 128 else t
            c8 = c - 256 if c >= 128 else c
            return (t8 * c8) >> 5
        res = np.zeros_like(orig)
        for y in range(h):
            for x in range(w):
                v = int(orig[y, x])
                a, r, g, b = (v >> 24) & 255, (v >> 16) & 255, (v >> 8) & 255, v & 255
                # forward: subtract the deltas (inverse adds them back)
                fr = (r - delta(g2r, g)) & 0xFF
                fb = (b - delta(g2b, g) - delta(r2b, (fr + delta(g2r, g)) & 0xFF)) & 0xFF
                res[y, x] = (a << 24) | (fr << 16) | (g << 8) | fb
        sb = _StreamBuilder(w, h)
        sb.bw.write(1, 1)
        sb.bw.write(1, 2)       # COLOR transform
        sb.bw.write(3, 3)       # 32px blocks -> 1x1 sub-image
        self._sub_image(sb.bw, [cte], 1, 1)
        sb.end_transforms()
        self._sub_image_main(sb.bw, res.ravel())
        got = W.decode_vp8l(sb.payload())
        assert (got == px).all()


class TestImagePipelineIntegration:
    def test_decode_image_dispatch(self):
        px = IM.synth_pixels(21, 20, 12)
        blob = W.encode_webp(px, subtract_green=True)
        assert (IM.decode_image(blob, "webp") == px).all()

    def test_psnr_inf_on_lossless_webp(self):
        px = IM.synth_pixels(4, 16, 16)
        assert IM.psnr(px, W.decode_webp(W.encode_webp(px))) == float("inf")

    def test_compression_actually_compresses(self):
        # subtract-green + Huffman beats raw on the synthetic gradient
        px = IM.synth_pixels(2, 64, 64)
        assert len(W.encode_webp(px, subtract_green=True)) < px.size
