"""Tests for operators/media.py: G.711, IMA ADPCM, WAV and AVI/MJPG
containers, and their Spark-side wiring in operators/images.py.

The reference pipeline carries media as opaque attributes; the decode
semantics verified here come from the public specs (ITU-T G.711 tables,
IMA ADPCM / WAV format 0x11, RIFF/AVI) — see operators/media.py header.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapshaper_spark.operators import gif as GIF
from mapshaper_spark.operators import images as IM
from mapshaper_spark.operators import media as M
from mapshaper_spark.operators.jpeg import encode_jpeg


def _snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    ref = ref.astype(np.float64)
    err = ref - out.astype(np.float64)
    return 10 * np.log10(np.sum(ref ** 2) / max(np.sum(err ** 2), 1e-12))


class TestG711:
    # Published G.711 table anchors (ITU-T G.711 / CCITT Blue Book).
    def test_ulaw_known_values(self):
        dec = M.ulaw_decode(np.array([0xFF, 0x00, 0x80, 0x7F], np.uint8))
        assert dec[0] == 0          # code 0xFF = +0
        assert dec[1] == -32124     # most negative
        assert dec[2] == 32124      # most positive
        assert dec[3] == 0          # "minus zero" alias

    def test_alaw_known_values(self):
        dec = M.alaw_decode(np.array([0x55, 0xD5, 0x2A, 0xAA], np.uint8))
        assert dec[0] == -8         # code 0x55 (all-toggle) = smallest neg
        assert dec[1] == 8
        assert dec[2] == -32256     # most negative
        assert dec[3] == 32256      # most positive

    def test_ulaw_roundtrip_all_codes(self):
        codes = np.arange(256, dtype=np.uint8)
        rt = M.ulaw_encode(M.ulaw_decode(codes))
        # 0x7F is "minus zero": decodes to 0, re-encodes as +0 = 0xFF.
        ok = (rt == codes) | ((codes == 0x7F) & (rt == 0xFF))
        assert ok.all()

    def test_alaw_roundtrip_all_codes(self):
        codes = np.arange(256, dtype=np.uint8)
        rt = M.alaw_encode(M.alaw_decode(codes))
        assert (rt == codes).all()

    def test_ulaw_encode_monotone_error_bound(self):
        x = np.arange(-32124, 32124, 7, dtype=np.int16)
        rt = M.ulaw_decode(M.ulaw_encode(x))
        # worst-case quantization error in the top segment is < 1024
        assert np.max(np.abs(rt.astype(np.int32) - x.astype(np.int32))) < 1024
        assert _snr_db(x, rt) > 30


class TestIMAADPCM:
    def test_roundtrip_snr(self):
        t = np.arange(4000)
        x = (8000 * np.sin(2 * np.pi * t / 127.0)).astype(np.int16)
        blob = M.ima_adpcm_encode_blocks(x)
        out = M.ima_adpcm_decode_blocks(blob, n_samples=len(x))
        assert len(out) == len(x)
        assert _snr_db(x, out) > 25

    def test_first_sample_verbatim(self):
        x = np.array([1234] + [0] * 600, dtype=np.int16)
        out = M.ima_adpcm_decode_blocks(M.ima_adpcm_encode_blocks(x),
                                        n_samples=len(x))
        assert out[0] == 1234
        # block 2's header also carries its first sample verbatim
        assert out[505] == 0


class TestWav:
    def test_pcm16_roundtrip_exact(self):
        x = ((np.arange(777) * 251) % 60001 - 30000).astype(np.int16)
        pcm, rate = M.decode_wav(M.encode_wav(x, rate=8000, codec="pcm16"))
        assert rate == 8000
        assert (pcm == x).all()

    @pytest.mark.parametrize("codec", ["ulaw", "alaw"])
    def test_g711_container_matches_raw_codec(self, codec):
        x = ((np.arange(500) * 997) % 50001 - 25000).astype(np.int16)
        pcm, rate = M.decode_wav(M.encode_wav(x, rate=16000, codec=codec))
        enc = M.ulaw_encode(x) if codec == "ulaw" else M.alaw_encode(x)
        dec = M.ulaw_decode(enc) if codec == "ulaw" else M.alaw_decode(enc)
        assert (pcm == dec).all()

    def test_ima_container_trims_to_fact(self):
        x = (3000 * np.sin(np.arange(1300) / 9.0)).astype(np.int16)
        pcm, _ = M.decode_wav(M.encode_wav(x, codec="ima_adpcm"))
        assert len(pcm) == 1300   # fact chunk trims the padded final block
        assert _snr_db(x, pcm) > 25

    def test_unknown_format_raises(self):
        import struct
        fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 8)  # MP3 tag
        body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt +
                b"data" + struct.pack("<I", 2) + b"\x00\x00")
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError):
            M.decode_wav(blob)


class TestAviMjpeg:
    def _frames(self, n=4):
        return [encode_jpeg(IM.synth_pixels(100 + k, 16, 16), quality=90)
                for k in range(n)]

    def test_container_roundtrip(self):
        frames = self._frames()
        us, out = M.parse_avi_mjpeg(M.encode_avi_mjpeg(frames, fps=10.0))
        assert us == 100_000
        assert len(out) == 4
        assert all(a == b for a, b in zip(out, frames))

    def test_decoded_frames_psnr(self):
        frames = self._frames(2)
        from mapshaper_spark.operators.jpeg import decode_jpeg
        _, out = M.parse_avi_mjpeg(M.encode_avi_mjpeg(frames))
        for k, blob in enumerate(out):
            assert IM.psnr(decode_jpeg(blob),
                           IM.synth_pixels(100 + k, 16, 16)) >= 40

    def test_odd_length_frame_padding(self):
        # RIFF pads odd chunk payloads; the parser must skip the pad byte
        frames = [b"\xff\xd8" + b"x" * 13 + b"\xff\xd9",   # odd length
                  b"\xff\xd8" + b"y" * 14 + b"\xff\xd9"]
        _, out = M.parse_avi_mjpeg(M.encode_avi_mjpeg(frames, fps=5.0))
        assert out == frames


class TestSparkMediaWiring:
    def test_audio_features_wav_all_codecs(self, spark):
        x = (6000 * np.sin(np.arange(800) / 11.0)).astype(np.int16)
        rows = [(f"w_{c}", bytearray(M.encode_wav(x, codec=c)), "wav")
                for c in ["pcm16", "ulaw", "alaw", "ima_adpcm"]]
        df = spark.createDataFrame(rows,
                                   "media_id string, bytes binary, fmt string")
        got = {r.media_id: r for r in IM.extract_audio_features(df).collect()}
        assert got["w_pcm16"].n_samples == 800
        assert got["w_pcm16"].rms == pytest.approx(
            float(np.sqrt(np.mean(x.astype(np.float64) ** 2))), abs=1e-4)
        # lossy codecs: same sample count, RMS within codec error
        for c in ["ulaw", "alaw", "ima_adpcm"]:
            assert got[f"w_{c}"].n_samples == 800
            assert got[f"w_{c}"].rms == pytest.approx(got["w_pcm16"].rms,
                                                      rel=0.02)

    def test_video_frames_mjpeg_avi(self, spark):
        frames = [encode_jpeg(IM.synth_pixels(7 + k, 16, 16), quality=90)
                  for k in range(5)]
        blob = bytearray(M.encode_avi_mjpeg(frames, fps=2.0))  # 500 ms/frame
        vids = spark.createDataFrame(
            [("mv1", blob, None, "mjpeg_avi")],
            "media_id string, bytes binary, duration_ms long, fmt string")
        out = IM.sample_video_frames(vids, every_ms=1000).collect()
        # duration = 5 frames * 500 ms = 2500 ms -> ts 0, 1000, 2000
        assert [(r.ts_ms, r.frame_idx) for r in out] == [(0, 0), (1000, 2),
                                                         (2000, 4)]
        px = IM.decode_ppm(bytes(out[1].frame_bytes))
        assert IM.psnr(px, IM.synth_pixels(7 + 2, 16, 16)) >= 40


class TestGif:
    """operators/gif.py: GIF is lossless on palette indices, so every
    round-trip below is bit-exact (quantize_666 applied first when the
    source exceeds 256 colors)."""

    def test_exact_roundtrip_paletted(self):
        rng = np.random.default_rng(7)
        px = (rng.integers(0, 5, (40, 64, 3)) * 60).astype(np.uint8)
        assert np.array_equal(GIF.decode_gif(GIF.encode_gif(px)), px)

    def test_synth_pattern_256_colors_exact(self):
        # synth_pixels yields exactly 256 distinct colors -> no quantization
        px = IM.synth_pixels(3, 97, 55)
        assert np.array_equal(GIF.decode_gif(GIF.encode_gif(px)), px)

    def test_interlace_roundtrip(self):
        px = IM.synth_pixels(5, 64, 33)
        assert np.array_equal(
            GIF.decode_gif(GIF.encode_gif(px, interlace=True)), px)
        tall = (np.random.default_rng(1).integers(0, 2, (513, 3, 3))
                * 255).astype(np.uint8)
        assert np.array_equal(
            GIF.decode_gif(GIF.encode_gif(tall, interlace=True)), tall)

    def test_truecolor_quantizes_to_666_cube(self):
        rng = np.random.default_rng(11)
        tc = rng.integers(0, 256, (60, 80, 3)).astype(np.uint8)
        assert len(np.unique(tc.reshape(-1, 3), axis=0)) > 256
        assert np.array_equal(GIF.decode_gif(GIF.encode_gif(tc)),
                              GIF.quantize_666(tc))

    def test_lzw_dictionary_cap(self):
        # enough entropy to overflow the 12-bit dictionary -> CLEAR resets
        rng = np.random.default_rng(13)
        big = GIF.quantize_666(rng.integers(0, 256, (300, 200, 3))
                               .astype(np.uint8))
        assert np.array_equal(GIF.decode_gif(GIF.encode_gif(big)), big)

    def test_animation_frames_and_delays(self):
        frames = [IM.synth_pixels(i, 32, 24) for i in range(1, 5)]
        blob = GIF.encode_gif(IM.synth_pixels(0, 32, 24), frames=frames,
                              delay_ms=120)
        out = GIF.decode_gif_frames(blob)
        assert len(out) == 5 and all(d == 120 for d, _ in out)
        for i, (_, f) in enumerate(out):
            assert np.array_equal(f, IM.synth_pixels(i, 32, 24))

    def test_not_a_gif_raises(self):
        with pytest.raises(ValueError):
            GIF.decode_gif(b"RIFFxxxxWEBP")


class TestSparkGifWiring:
    def test_decode_stats_gif_rows(self, spark):
        from mapshaper_spark.operators.images import encode_synthetic_bytes
        from mapshaper_spark import layers as L
        imgs = L.synth_images(spark, 30).withColumn("fmt", F.lit("gif"))
        meta = {r.image_id: (r.w, r.h) for r in imgs.collect()}
        stats = IM.decode_stats(encode_synthetic_bytes(imgs)).collect()
        assert len(stats) == 30
        # the GIF path is EXACT for the synth pattern (256 colors fit the
        # palette): decoded stats must match the raw pixels bit-for-bit
        for r in stats:
            w, h = meta[r.image_id]
            px = IM.synth_pixels(int(r.image_id[3:]), w, h)
            assert (r.dec_w, r.dec_h) == (w, h)
            assert r.ahash == IM.phash64(px)

    def test_video_frames_gif_anim(self, spark):
        frames = [IM.synth_pixels(20 + k, 16, 16) for k in range(1, 5)]
        blob = bytearray(GIF.encode_gif(IM.synth_pixels(20, 16, 16),
                                        frames=frames, delay_ms=500))
        vids = spark.createDataFrame(
            [("gv1", blob, None, "gif_anim")],
            "media_id string, bytes binary, duration_ms long, fmt string")
        out = IM.sample_video_frames(vids, every_ms=1000).collect()
        # 5 frames * 500 ms = 2500 ms -> ts 0, 1000, 2000 -> frames 0, 2, 4
        assert [(r.ts_ms, r.frame_idx) for r in out] == [(0, 0), (1000, 2),
                                                         (2000, 4)]
        px = IM.decode_ppm(bytes(out[2].frame_bytes))
        assert np.array_equal(px, IM.synth_pixels(20 + 4, 16, 16))


class TestGifProperties:
    """Property tests: GIF is LOSSLESS on palette indices, so any image
    whose colors fit a 256-slot palette must round-trip bit-exactly through
    every encoder configuration."""

    def test_random_paletted_roundtrip(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=30, deadline=None)
        @given(seed=st.integers(0, 10_000),
               w=st.integers(1, 70), h=st.integers(1, 70),
               n_colors=st.integers(1, 256),
               interlace=st.booleans())
        def check(seed, w, h, n_colors, interlace):
            rng = np.random.default_rng(seed)
            palette = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
            idx = rng.integers(0, n_colors, (h, w))
            px = palette[idx]
            blob = GIF.encode_gif(px, interlace=interlace)
            assert np.array_equal(GIF.decode_gif(blob), px)

        check()

    def test_random_animation_roundtrip(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=15, deadline=None)
        @given(seed=st.integers(0, 10_000), n_frames=st.integers(2, 6),
               delay=st.integers(1, 500))
        def check(seed, n_frames, delay):
            rng = np.random.default_rng(seed)
            palette = rng.integers(0, 256, (64, 3)).astype(np.uint8)
            frames = [palette[rng.integers(0, 64, (20, 30))]
                      for _ in range(n_frames)]
            blob = GIF.encode_gif(frames[0], frames=frames[1:],
                                  delay_ms=delay)
            out = GIF.decode_gif_frames(blob)
            assert len(out) == n_frames
            # encoder rounds delays down to centiseconds (the GIF unit)
            assert all(d == delay // 10 * 10 for d, _ in out)
            for f_exp, (_, f_got) in zip(frames, out):
                assert np.array_equal(f_got, f_exp)

        check()


class TestRound5Boundaries:
    """r5 closures: stereo WAV downmix, GIF disposal 3, 16-bit PNG."""

    def test_stereo_pcm16_downmix(self):
        import struct

        import numpy as np
        from mapshaper_spark.operators.media import decode_wav
        rng = np.random.RandomState(4)
        left = rng.randint(-3000, 3000, 64).astype(np.int16)
        right = rng.randint(-3000, 3000, 64).astype(np.int16)
        inter = np.empty(128, np.int16)
        inter[0::2], inter[1::2] = left, right
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
        payload = inter.astype("<i2").tobytes()
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
                b"data" + struct.pack("<I", len(payload)) + payload)
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        samples, rate = decode_wav(blob)
        assert rate == 8000 and len(samples) == 64
        want = np.round((left.astype(float) + right.astype(float)) / 2)
        assert np.array_equal(samples.astype(float), want)

    def test_gif_disposal_3_restores_previous(self):
        import struct

        import numpy as np
        from mapshaper_spark.operators.gif import (_lzw_encode,
                                                   decode_gif_frames)
        # hand-built 8x8 animation: frame 1 full red; frame 2 a 3x3 green
        # sub-rectangle at (2,2) with disposal 3; frame 3 a 1x1 patch at
        # (0,0). After frame 2 is disposed, frame 3's canvas must show
        # red again at (3,3) (GIF89a spec 23.c.iv restore-to-previous).
        pal = bytes([200, 0, 0,  0, 200, 0,  0, 0, 200,  0, 0, 0])
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", 8, 8, 0x91, 0, 0)  # GCT, 4 colors
        out += pal

        def gce(disposal):
            return b"\x21\xf9\x04" + bytes([disposal << 2]) + \
                struct.pack("<H", 5) + b"\x00\x00"

        def img(left, top, w, h, indices):
            # _lzw_encode returns sub-block-framed data incl. terminator
            blob = _lzw_encode(np.asarray(indices, np.uint8).ravel(), 2)
            return (b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0) +
                    bytes([2]) + blob)

        out += gce(1) + img(0, 0, 8, 8, np.zeros((8, 8), np.uint8))
        out += gce(3) + img(2, 2, 3, 3, np.full((3, 3), 1, np.uint8))
        out += gce(1) + img(0, 0, 1, 1, np.full((1, 1), 2, np.uint8))
        out += b"\x3b"
        frames = decode_gif_frames(bytes(out))
        assert len(frames) == 3
        assert tuple(frames[1][1][3, 3]) == (0, 200, 0)   # overlay shown
        assert tuple(frames[2][1][3, 3]) == (200, 0, 0)   # restored
        assert tuple(frames[2][1][0, 0]) == (0, 0, 200)   # frame 3 patch

    def test_png_16bit_high_byte(self):
        import struct
        import zlib

        import numpy as np
        from mapshaper_spark.operators.images import decode_png

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload +
                    struct.pack(">I", zlib.crc32(tag + payload) & 0xffffffff))

        rng = np.random.RandomState(2)
        px16 = rng.randint(0, 65536, (11, 13, 3)).astype(np.uint16)
        raw = b"".join(b"\x00" + px16[r].astype(">u2").tobytes()
                       for r in range(11))
        ihdr = struct.pack(">IIBBBBB", 13, 11, 16, 2, 0, 0, 0)
        blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
                chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        mine = decode_png(blob)
        # 16-bit big-endian samples reduce to their high byte (libpng's
        # simplified API instead gamma-maps 16-bit-as-linear to sRGB — a
        # different, documented convention)
        assert np.array_equal(mine, (px16 >> 8).astype(np.uint8))

    def test_stereo_ima_adpcm_round_trip(self):
        """r5: multichannel IMA-ADPCM (MS WAVE stereo block layout —
        per-channel 4-byte headers + alternating 4-byte data words,
        independent per-channel predictors). Block-layer round trip
        reconstructs both channels at ADPCM fidelity; the container path
        derives spb from block_align via the generalized MS formula and
        downmixes by channel mean."""
        import numpy as np
        from mapshaper_spark.operators.media import (
            decode_wav, encode_wav, ima_adpcm_decode_blocks_multi,
            ima_adpcm_encode_blocks_multi)
        rng = np.random.RandomState(5)
        t = np.arange(3000)
        left = (3000 * np.sin(t * 0.05) +
                rng.randint(-200, 200, 3000)).astype(np.int16)
        right = (2000 * np.cos(t * 0.031) +
                 rng.randint(-200, 200, 3000)).astype(np.int16)
        stereo = np.stack([left, right], axis=1)
        blob = ima_adpcm_encode_blocks_multi([left, right], 505)
        back = ima_adpcm_decode_blocks_multi(blob, 505, 2, 3000)
        err = (back.astype(float) - stereo.astype(float))
        snr = 10 * np.log10((stereo.astype(float) ** 2).mean() /
                            (err ** 2).mean())
        assert back.shape == (3000, 2) and snr > 30
        wav = encode_wav(stereo, 16000, "ima_adpcm")
        mono, rate = decode_wav(wav)
        assert rate == 16000 and len(mono) == 3000
        assert np.abs(mono.astype(float) -
                      np.round(back.astype(float).mean(axis=1))).max() == 0
