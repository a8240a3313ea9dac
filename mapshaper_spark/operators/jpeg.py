"""JPEG (ITU-T T.81) encoder/decoder family in pure numpy + stdlib —
baseline sequential (SOF0/1), progressive (SOF2), lossless (SOF3), and
the ARITHMETIC processes (SOF9 sequential both ways + SOF10
progressive decode, dispatched to operators/jpeg_arith.py).
No PIL / Python imaging libs in this container; the system libjpeg is
used ONLY as a test-time reference codec (tests/jpeg_ref.py).

Purpose: the input_hint's per-row invariant for lossy formats is
"decoded-pixel allclose (PSNR>=40dB)"; with only lossless codecs that gate
could never be exercised. This implements the real thing: 8x8 DCT,
quantization (quality-scaled Annex K tables), zigzag, DC-diff + AC
run-length, canonical Huffman (Annex K tables), JFIF markers, byte
stuffing. Encoder emits 4:4:4; decoder handles arbitrary sampling factors
(incl. 4:2:0) with box upsampling.

Used from operators/images.decode_image for fmt in ('jpeg', 'jpg').
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K quantization tables (luminance, chrominance)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64).reshape(8, 8)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# Annex K Huffman specs: (bits[1..16], values)
_HT_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_HT_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
_HT_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HT_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8x8 DCT-II orthonormal matrix
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = math_cos = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_C *= np.sqrt(2.0 / 8.0)
_C[0, :] *= 1.0 / np.sqrt(2.0)


def _build_codes(bits, values):
    """Canonical Huffman: value -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits, values):
    """(code, length) -> value lookup dict."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _scale_quant(q, quality):
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.floor((q * s + 50) / 100)
    return np.clip(t, 1, 255)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v):
    """(category, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = int(a).bit_length()
    bits = v if v > 0 else (v + (1 << cat) - 1)
    return cat, bits


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                restart_interval: int = 0) -> bytes:
    """RGB8 (h, w, 3) -> baseline JFIF bytes (4:4:4, two quant tables,
    four Annex K Huffman tables). ``restart_interval`` > 0 emits a DRI
    segment and byte-aligned RSTn markers every that many MCUs (DC
    predictors reset, T.81 E.1.4) — used to fixture the decoder's
    restart path."""
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128

    ql = _scale_quant(_QL, quality)
    qc = _scale_quant(_QC, quality)
    dc_l = _build_codes(*_HT_DC_L)
    dc_c = _build_codes(*_HT_DC_C)
    ac_l = _build_codes(*_HT_AC_L)
    ac_c = _build_codes(*_HT_AC_C)

    bw = _BitWriter()
    pred = [0, 0, 0]
    bh = (h + 7) // 8
    bwidth = (w + 7) // 8

    def pad(plane):
        return np.pad(plane, ((0, bh * 8 - h), (0, bwidth * 8 - w)), mode="edge")

    planes = [pad(y), pad(cb), pad(cr)]
    mcu_i = 0
    n_rst = 0
    for by in range(bh):
        for bx in range(bwidth):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
                pred = [0, 0, 0]
            mcu_i += 1
            for ci, plane in enumerate(planes):
                block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = _C @ block @ _C.T
                q = ql if ci == 0 else qc
                qv = np.round(coef / q).astype(np.int64)
                zz = qv.ravel()[_ZZ]
                dct = dc_l if ci == 0 else dc_c
                act = ac_l if ci == 0 else ac_c
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                cat, bits = _magnitude(diff)
                code, ln = dct[cat]
                bw.write(code, ln)
                if cat:
                    bw.write(bits, cat)
                run = 0
                last_nz = np.nonzero(zz[1:])[0]
                last = last_nz[-1] + 1 if len(last_nz) else 0
                for i in range(1, last + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    cat, bits = _magnitude(v)
                    code, ln = act[(run << 4) | cat]
                    bw.write(code, ln)
                    bw.write(bits, cat)
                    run = 0
                if last < 63:
                    code, ln = act[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, ql), (1, qc)):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + \
            bytes(int(v) for v in q.ravel()[_ZZ])
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, (hs, vs), tq in ((1, (1, 1), 0), (2, (1, 1), 1), (3, (1, 1), 1)):
        out += struct.pack("BBB", cid, (hs << 4) | vs, tq)
    for tclass, tid, (bits, values) in ((0, 0, _HT_DC_L), (0, 1, _HT_DC_C),
                                        (1, 0, _HT_AC_L), (1, 1, _HT_AC_C)):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values),
                                         (tclass << 4) | tid) + \
            bytes(bits) + bytes(values)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid, (td, ta) in ((1, (0, 0)), (2, (1, 1)), (3, (1, 1))):
        out += struct.pack("BB", cid, (td << 4) | ta)
    out += b"\x00\x3F\x00"
    out += bw.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader: unstuffs FF00 once up front and exposes
    the stream as a numpy bit array — read_bits is a slice fold instead of
    per-bit method calls (the decoder hot loop)."""

    def __init__(self, data):
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        # drop the 0x00 after each 0xFF (byte stuffing); stop at a marker
        keep = np.ones(len(arr), dtype=bool)
        ff = np.nonzero(arr == 0xFF)[0]
        end = len(arr)
        for i in ff:
            if i + 1 < len(arr):
                nxt = arr[i + 1]
                if nxt == 0x00:
                    keep[i + 1] = False
                elif i < end:
                    end = i  # first real marker terminates entropy data
        keep[end:] = False
        self.bits = np.unpackbits(arr[keep])
        self.pos = 0
        self.consumed = int(end)  # input bytes up to the terminating marker

    def read_bit(self):
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n):
        if n == 0:
            return 0
        p = self.pos
        self.pos = p + n
        v = 0
        for b in self.bits[p:p + n]:
            v = (v << 1) | int(b)
        return v


def _extend(v, cat):
    if cat == 0:
        return 0
    if v < (1 << (cat - 1)):
        return v - (1 << cat) + 1
    return v


def _split_restart_segments(data: bytes) -> list:
    """Split an entropy stream at RSTn (FFD0-FFD7) markers; stops at the
    first non-restart marker. Stuffed FF00 bytes pass through (each
    returned chunk is unstuffed by its own _BitReader)."""
    arr = bytes(data)
    out = []
    start = 0
    i = 0
    n = len(arr)
    while i + 1 < n:
        if arr[i] == 0xFF:
            nxt = arr[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                out.append(arr[start:i])
                i += 2
                start = i
                continue
            break  # real marker: end of scan
        i += 1
    out.append(arr[start:])
    return out


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> RGB8 (h, w, 3). Handles arbitrary sampling
    factors with box upsampling; restart markers unsupported (we don't
    emit them)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt = {}
    huff = {}
    comps = None
    h = w = None
    scan = None
    restart_interval = 0
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if pos + 2 > len(data) and marker not in (0xD8, 0xD9):
            raise ValueError("truncated JPEG")
        if marker in (0xD8, 0xD9):
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                pq_tq = seg[off]
                tid = pq_tq & 0x0F
                if pq_tq >> 4:
                    vals = np.frombuffer(seg[off + 1:off + 129], dtype=">u2")
                    off += 129
                else:
                    vals = np.frombuffer(seg[off + 1:off + 65], dtype=np.uint8)
                    off += 65
                tab = np.zeros(64)
                tab[_ZZ] = vals
                qt[tid] = tab.reshape(8, 8)
        elif marker == 0xC0 or marker == 0xC1:
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack("BBB", seg[6 + 3 * i:9 + 3 * i])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker == 0xC2:
            return _decode_progressive(data)
        elif marker == 0xC3:
            return _decode_lossless(data)
        elif marker == 0xC9:
            from mapshaper_spark.operators.jpeg_arith import \
                decode_jpeg_arith
            return decode_jpeg_arith(data)
        elif marker == 0xCA:
            from mapshaper_spark.operators.jpeg_arith import \
                decode_jpeg_arith_progressive
            return decode_jpeg_arith_progressive(data)
        elif marker == 0xCB:
            raise NotImplementedError(
                "lossless ARITHMETIC JPEG (SOF11) unsupported "
                "(sequential SOF9 + progressive SOF10 arithmetic are)")
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1:off + 17])
                nvals = sum(bits)
                values = list(seg[off + 17:off + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _build_decoder(bits, values)
                off += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = struct.unpack("BB", seg[1 + 2 * i:3 + 2 * i])
                scan.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            pos += seglen
            break
        pos += seglen

    if comps is None or scan is None:
        raise ValueError("missing SOF/SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # restart intervals (DRI + RSTn): entropy data splits into byte-aligned
    # segments of `restart_interval` MCUs each; DC predictors reset at each
    segments = _split_restart_segments(data[pos:]) if restart_interval \
        else [data[pos:]]
    readers = [_BitReader(s) for s in segments]
    seg_i = 0
    br = readers[0]

    def read_code(table):
        bits = br.bits
        p = br.pos
        code = 0
        get = table.get
        for length in range(1, 17):
            code = (code << 1) | int(bits[p])
            p += 1
            v = get((length, code))
            if v is not None:
                br.pos = p
                return v
        raise ValueError("bad huffman code")

    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    pred = [0] * len(comps)
    # entropy-decode all blocks first (inherently serial), then run ONE
    # batched IDCT per component — per-block 8x8 matmuls drown in numpy
    # call overhead otherwise
    blocks: list[list] = [[] for _ in comps]   # (y0, x0, zz64)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                seg_i += 1          # byte-aligned restart: fresh reader,
                br = readers[seg_i]  # DC predictors reset (T.81 E.1.4)
                pred = [0] * len(comps)
            mcu_i += 1
            for ci, c in enumerate(comps):
                sc = next(s for s in scan if s["cs"] == c["id"])
                dct = huff[(0, sc["td"])]
                act = huff[(1, sc["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = [0.0] * 64
                        cat = read_code(dct)
                        diff = _extend(br.read_bits(cat), cat) if cat else 0
                        pred[ci] += diff
                        zz[0] = float(pred[ci])
                        k = 1
                        while k < 64:
                            rs = read_code(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = float(_extend(br.read_bits(s), s))
                            k += 1
                        blocks[ci].append(((my * c["v"] + by) * 8,
                                           (mx * c["h"] + bx) * 8, zz))
    for ci, c in enumerate(comps):
        if not blocks[ci]:
            continue
        zzs = np.array([b[2] for b in blocks[ci]])        # (n, 64) zigzag
        coefs = np.zeros_like(zzs)
        coefs[:, _ZZ] = zzs
        coefs = coefs.reshape(-1, 8, 8) * qt[c["tq"]][None, :, :]
        px = np.einsum("ij,njk,kl->nil", _C.T, coefs, _C) + 128.0
        plane = planes[ci]
        for (y0, x0, _), blk in zip(blocks[ci], px):
            plane[y0:y0 + 8, x0:x0 + 8] = blk

    # upsample to full resolution
    full = []
    for c, plane in zip(comps, planes):
        ry = vmax // c["v"]
        rx = hmax // c["h"]
        up = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(up[:h, :w])
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        rgb = np.stack([r, g, b], axis=2)
    else:
        rgb = np.stack([full[0]] * 3, axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

# ---------------------------------------------------------------------------
# progressive JPEG (SOF2, spectral selection + successive approximation)
# ---------------------------------------------------------------------------
# Encoder exists to make real progressive fixtures; the decoder handles the
# general SOF2 stream (EOBn runs, ZRL, AC/DC refinement per T.81 Annex G).
# Point transforms follow the spec/libjpeg convention: DC uses an ARITHMETIC
# shift, AC uses a sign-magnitude (toward-zero) shift.

_PROG_SCANS = (
    # (comp indices, Ss, Se, Ah, Al)
    ((0, 1, 2), 0, 0, 0, 1),   # DC first, Al=1
    ((0,), 1, 5, 0, 1),        # AC Y low band
    ((1,), 1, 63, 0, 1),       # AC Cb full band
    ((2,), 1, 63, 0, 1),       # AC Cr full band
    ((0,), 6, 63, 0, 1),       # AC Y high band
    ((0, 1, 2), 0, 0, 1, 0),   # DC refinement (raw bits)
    ((0,), 1, 63, 1, 0),       # AC Y refinement
    ((1,), 1, 63, 1, 0),       # AC Cb refinement
    ((2,), 1, 63, 1, 0),       # AC Cr refinement
)


def _quantized_blocks(pixels: np.ndarray, quality: int):
    """Shared front half of the encoders: YCbCr 4:4:4 -> per-component
    (bh, bw, 64) zigzag-ordered quantized coefficient arrays."""
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = (-0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
          + 0.5 * rgb[:, :, 2] + 128)
    cr = (0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
          - 0.081312 * rgb[:, :, 2] + 128)
    ql = _scale_quant(_QL, quality)
    qc = _scale_quant(_QC, quality)
    bh = (h + 7) // 8
    bw = (w + 7) // 8

    def pad(plane):
        return np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")

    out = []
    for ci, plane in enumerate((pad(y), pad(cb), pad(cr))):
        q = ql if ci == 0 else qc
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        coefs = np.einsum("ij,abjk,kl->abil", _C, blocks, _C.T)
        qv = np.round(coefs / q[None, None]).astype(np.int64)
        out.append(qv.reshape(bh, bw, 64)[:, :, _ZZ_INV_FLAT])
    return out, ql, qc, h, w, bh, bw


# zigzag reorder helper: qv[..., i*8+j] natural -> zigzag order
_ZZ_INV_FLAT = np.asarray(_ZZ)


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90) -> bytes:
    """RGB8 (h, w, 3) -> PROGRESSIVE JFIF bytes (SOF2, 4:4:4): the standard
    spectral-selection + successive-approximation progression (DC Al=1 ->
    AC bands Al=1 -> DC/AC refinement scans). Same quantized coefficients
    as encode_jpeg at the same quality, so the decoded pixels must be
    bit-identical to the baseline round trip."""
    comps_zz, ql, qc, h, w, bh, bw = _quantized_blocks(pixels, quality)
    dc_tabs = (_build_codes(*_HT_DC_L), _build_codes(*_HT_DC_C),
               _build_codes(*_HT_DC_C))
    ac_tabs = (_build_codes(*_HT_AC_L), _build_codes(*_HT_AC_C),
               _build_codes(*_HT_AC_C))

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, ql), (1, qc)):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + \
            bytes(int(v) for v in q.ravel()[_ZZ])
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack("BBB", cid, 0x11, tq)
    for tclass, tid, (bits, values) in ((0, 0, _HT_DC_L), (0, 1, _HT_DC_C),
                                        (1, 0, _HT_AC_L), (1, 1, _HT_AC_C)):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values),
                                         (tclass << 4) | tid) + \
            bytes(bits) + bytes(values)

    for comp_ids, ss, se, ah, al in _PROG_SCANS:
        bwr = _BitWriter()
        if ss == 0:  # DC scan (interleaved over all comps; 4:4:4 -> 1 block/MCU)
            if ah == 0:
                pred = [0] * 3
                for by in range(bh):
                    for bx in range(bw):
                        for ci in comp_ids:
                            v = int(comps_zz[ci][by, bx, 0]) >> al
                            diff = v - pred[ci]
                            pred[ci] = v
                            cat, bits_ = _magnitude(diff)
                            code, ln = dc_tabs[ci][cat]
                            bwr.write(code, ln)
                            if cat:
                                bwr.write(bits_, cat)
            else:  # DC refinement: one raw bit per block per comp
                for by in range(bh):
                    for bx in range(bw):
                        for ci in comp_ids:
                            bwr.write((int(comps_zz[ci][by, bx, 0]) >> al) & 1, 1)
        else:  # AC scan: single component, non-interleaved
            ci = comp_ids[0]
            act = ac_tabs[ci]
            for by in range(bh):
                for bx in range(bw):
                    zz = comps_zz[ci][by, bx]
                    if ah == 0:
                        # first AC scan: baseline-style RLE on the
                        # point-transformed band, plain EOB (EOBRUN=1)
                        band = []
                        for k in range(ss, se + 1):
                            v = int(zz[k])
                            band.append(-((-v) >> al) if v < 0 else v >> al)
                        nz = [i for i, v in enumerate(band) if v]
                        last = nz[-1] if nz else -1
                        run = 0
                        for i in range(last + 1):
                            v = band[i]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act[0xF0]
                                bwr.write(code, ln)
                                run -= 16
                            cat, bits_ = _magnitude(v)
                            code, ln = act[(run << 4) | cat]
                            bwr.write(code, ln)
                            bwr.write(bits_, cat)
                            run = 0
                        if last < se - ss:
                            code, ln = act[0x00]
                            bwr.write(code, ln)
                    else:
                        # AC refinement (T.81 G.1.2.3 / libjpeg
                        # encode_mcu_AC_refine), EOBRUN flushed per block
                        absv = []
                        eob = -1
                        for i, k in enumerate(range(ss, se + 1)):
                            t = abs(int(zz[k])) >> al
                            absv.append(t)
                            if t == 1:
                                eob = i
                        r = 0
                        br_bits: list = []
                        for i, k in enumerate(range(ss, se + 1)):
                            t = absv[i]
                            if t == 0:
                                r += 1
                                continue
                            while r > 15 and i <= eob:
                                code, ln = act[0xF0]
                                bwr.write(code, ln)
                                r -= 16
                                for b in br_bits:
                                    bwr.write(b, 1)
                                br_bits = []
                            if t > 1:
                                br_bits.append(t & 1)
                                continue
                            code, ln = act[(r << 4) | 1]
                            bwr.write(code, ln)
                            r = 0
                            bwr.write(0 if int(zz[k]) < 0 else 1, 1)
                            for b in br_bits:
                                bwr.write(b, 1)
                            br_bits = []
                        if r > 0 or br_bits:
                            code, ln = act[0x00]  # EOB (run of 1)
                            bwr.write(code, ln)
                            for b in br_bits:
                                bwr.write(b, 1)
        bwr.flush()
        ns = len(comp_ids)
        out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_ids:
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            out += struct.pack("BB", ci + 1, (td << 4) | ta)
        out += struct.pack("BBB", ss, se, (ah << 4) | al)
        out += bwr.buf
    out += b"\xFF\xD9"
    return bytes(out)


def _decode_progressive(data: bytes) -> np.ndarray:
    """Progressive JFIF (SOF2) -> RGB8 (h, w, 3): general spectral-selection
    + successive-approximation decode (T.81 Annex G.2 / libjpeg
    decode_mcu_* semantics), incl. EOBn runs, ZRL in refinement scans, and
    DHT/DQT redefinition between scans. Coefficients accumulate per scan;
    one batched dequantize+IDCT at the end (same tail as baseline)."""
    pos = 2
    qt = {}
    huff = {}
    comps = None
    h = w = None
    coef = None
    hmax = vmax = 1
    mcux = mcuy = 0
    restart_interval = 0

    def comp_geometry(c):
        # non-interleaved scans iterate the component's OWN block grid
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        return -(-cw // 8), -(-ch // 8)

    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8,):
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:
            off = 0
            while off < len(seg):
                pq_tq = seg[off]
                tid = pq_tq & 0x0F
                if pq_tq >> 4:
                    vals = np.frombuffer(seg[off + 1:off + 129], dtype=">u2")
                    off += 129
                else:
                    vals = np.frombuffer(seg[off + 1:off + 65], dtype=np.uint8)
                    off += 65
                tab = np.zeros(64)
                tab[_ZZ] = vals
                qt[tid] = tab.reshape(8, 8)
        elif marker == 0xC2:
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack("BBB", seg[6 + 3 * i:9 + 3 * i])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coef = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                    for c in comps]
            pred_dc = [0] * nc
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1:off + 17])
                nvals = sum(bits)
                values = list(seg[off + 17:off + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _build_decoder(bits, values)
                off += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tdta = struct.unpack("BB", seg[1 + 2 * i:3 + 2 * i])
                ci = next(j for j, c in enumerate(comps) if c["id"] == cs)
                scomps.append((ci, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = struct.unpack("BBB", seg[1 + 2 * ns:4 + 2 * ns])
            ah, al = ahal >> 4, ahal & 0x0F
            pos += seglen
            # progressive + DRI (closed r5): the scan's entropy data
            # splits at RSTn markers into byte-aligned segments of
            # restart_interval MCUs (interleaved) / blocks
            # (non-interleaved, T.81 E.1.4); predictors and EOB runs
            # reset at each boundary
            if restart_interval:
                segments = _split_restart_segments(data[pos:])
                readers = [_BitReader(s) for s in segments]
                for s in segments[:-1]:
                    pos += len(s) + 2      # entropy bytes + RSTn marker
                pos += readers[-1].consumed
            else:
                readers = [_BitReader(data[pos:])]
                pos += readers[0].consumed
            _decode_prog_scan(readers, restart_interval, coef, comps,
                              scomps, ss, se, ah, al, huff, pred_dc,
                              mcux, mcuy, comp_geometry)
            continue
        pos += seglen

    if coef is None:
        raise ValueError("missing SOF2/SOS")
    # dequantize + IDCT + upsample (baseline tail)
    planes = []
    for ci, c in enumerate(comps):
        nby, nbx = coef[ci].shape[0], coef[ci].shape[1]
        zzs = coef[ci].reshape(-1, 64).astype(np.float64)
        coefs = np.zeros_like(zzs)
        coefs[:, _ZZ] = zzs
        coefs = coefs.reshape(-1, 8, 8) * qt[c["tq"]][None, :, :]
        px = np.einsum("ij,njk,kl->nil", _C.T, coefs, _C) + 128.0
        px = px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(nby * 8, nbx * 8)
        planes.append(px)
    full = []
    for c, plane in zip(comps, planes):
        ry = vmax // c["v"]
        rx = hmax // c["h"]
        up = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(up[:h, :w])
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        rgb = np.stack([r, g, b], axis=2)
    else:
        rgb = np.stack([full[0]] * 3, axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_prog_scan(readers, restart_interval, coef, comps, scomps,
                      ss, se, ah, al, huff, pred_dc, mcux, mcuy,
                      comp_geometry):
    br = readers[0]
    seg_i = 0
    unit = 0          # restart unit counter: MCUs (interleaved) / blocks
    eobrun_box = [0]  # shared so a restart can reset the AC EOB run

    def maybe_restart():
        # T.81 E.1.4: every restart_interval units, entropy decoding
        # restarts byte-aligned in the next RST segment; DC predictors
        # and the EOB run reset
        nonlocal br, seg_i, unit
        if restart_interval and unit and unit % restart_interval == 0:
            seg_i += 1
            br = readers[seg_i]
            for i in range(len(pred_dc)):
                pred_dc[i] = 0
            eobrun_box[0] = 0
        unit += 1

    def read_code(table):
        bits = br.bits
        p = br.pos
        code = 0
        get = table.get
        for length in range(1, 17):
            code = (code << 1) | int(bits[p])
            p += 1
            v = get((length, code))
            if v is not None:
                br.pos = p
                return v
        raise ValueError("bad huffman code")

    if ss == 0:  # DC scan
        if ah == 0:
            for ci, _td, _ta in scomps:
                pred_dc[ci] = 0
        if len(scomps) > 1:  # interleaved MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci, td, _ta in scomps:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                gy, gx = my * c["v"] + by, mx * c["h"] + bx
                                if ah == 0:
                                    cat = read_code(huff[(0, td)])
                                    diff = _extend(br.read_bits(cat), cat) if cat else 0
                                    pred_dc[ci] += diff
                                    coef[ci][gy, gx, 0] = pred_dc[ci] << al
                                else:
                                    if br.read_bit():
                                        coef[ci][gy, gx, 0] |= (1 << al)
        else:
            ci, td, _ta = scomps[0]
            nbx, nby = comp_geometry(comps[ci])
            for gy in range(nby):
                for gx in range(nbx):
                    maybe_restart()
                    if ah == 0:
                        cat = read_code(huff[(0, td)])
                        diff = _extend(br.read_bits(cat), cat) if cat else 0
                        pred_dc[ci] += diff
                        coef[ci][gy, gx, 0] = pred_dc[ci] << al
                    else:
                        if br.read_bit():
                            coef[ci][gy, gx, 0] |= (1 << al)
        return

    # AC scan: always one component, non-interleaved
    ci, _td, ta = scomps[0]
    act = huff[(1, ta)]
    nbx, nby = comp_geometry(comps[ci])
    p1 = 1 << al
    m1 = -(1 << al)
    for gy in range(nby):
        for gx in range(nbx):
            maybe_restart()
            blk = coef[ci][gy, gx]
            if ah == 0:  # first scan for these bits
                if eobrun_box[0] > 0:
                    eobrun_box[0] -= 1
                    continue
                k = ss
                while k <= se:
                    rs = read_code(act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun_box[0] = (1 << r) - 1
                        if r:
                            eobrun_box[0] += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow")
                    blk[k] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:  # refinement (G.2 / libjpeg decode_mcu_AC_refine)
                k = ss
                if eobrun_box[0] == 0:
                    while k <= se:
                        rs = read_code(act)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r < 15:
                                eobrun_box[0] = (1 << r)
                                if r:
                                    eobrun_box[0] += br.read_bits(r)
                                break
                            # r == 15: skip 16 zero-history coefficients
                        else:
                            newval = p1 if br.read_bit() else m1
                        while k <= se:
                            v = int(blk[k])
                            if v != 0:
                                if br.read_bit():
                                    if (v & p1) == 0:
                                        blk[k] = v + (p1 if v >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun_box[0] > 0:
                    while k <= se:
                        v = int(blk[k])
                        if v != 0 and br.read_bit():
                            if (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else m1)
                        k += 1
                    eobrun_box[0] -= 1


# ---------------------------------------------------------------------------
# lossless JPEG (SOF3, T.81 Annex H) — predictive, Huffman-coded
# ---------------------------------------------------------------------------
# Closes the r4 codec boundary: medical/raw pipelines (DICOM, DNG) still
# emit process-14 lossless JPEG. Decoder handles predictors 1-7, point
# transform, 2-16 bit precision, interleaved 1x1 components, and restart
# intervals (prediction resets per segment, H.2.1); the encoder emits
# 8-bit RGB (no color transform — lossless JPEG defines none) with the
# Annex K DC tables (8-bit diffs need categories 0-8 only).


def _lossless_predict(grid, ci, y, x, predictor, P, Pt):
    if y == 0 and x == 0:
        return 1 << (P - Pt - 1)
    if y == 0:
        return int(grid[ci][y, x - 1])
    if x == 0:
        return int(grid[ci][y - 1, x])
    a = int(grid[ci][y, x - 1])
    b = int(grid[ci][y - 1, x])
    c = int(grid[ci][y - 1, x - 1])
    if predictor == 1:
        return a
    if predictor == 2:
        return b
    if predictor == 3:
        return c
    if predictor == 4:
        return a + b - c
    if predictor == 5:
        return a + ((b - c) >> 1)
    if predictor == 6:
        return b + ((a - c) >> 1)
    if predictor == 7:
        return (a + b) >> 1
    raise ValueError(f"bad lossless predictor {predictor}")


def _decode_lossless(data: bytes) -> np.ndarray:
    pos = 2
    huff = {}
    comps = None
    h = w = None
    P = 8
    restart_interval = 0
    scomps = None
    predictor = 1
    Pt = 0
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9):
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xC3:
            P, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, hv, _tq = struct.unpack("BBB", seg[6 + 3 * i:9 + 3 * i])
                if hv != 0x11:
                    raise NotImplementedError(
                        "lossless JPEG with subsampled components "
                        "unsupported (virtually unused: lossless has no "
                        "frequency domain to subsample in)")
                comps.append({"id": cid})
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1:off + 17])
                nvals = sum(bits)
                values = list(seg[off + 17:off + 17 + nvals])
                huff[(tc_th >> 4, tc_th & 0x0F)] = _build_decoder(bits, values)
                off += 17 + nvals
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tdta = struct.unpack("BB", seg[1 + 2 * i:3 + 2 * i])
                ci = next(j for j, c in enumerate(comps) if c["id"] == cs)
                scomps.append((ci, tdta >> 4))
            predictor, _se, ahal = struct.unpack("BBB",
                                                 seg[1 + 2 * ns:4 + 2 * ns])
            Pt = ahal & 0x0F
            pos += seglen
            break
        pos += seglen
    if comps is None or scomps is None:
        raise ValueError("missing SOF3/SOS")

    segments = _split_restart_segments(data[pos:]) if restart_interval \
        else [data[pos:]]
    readers = [_BitReader(s) for s in segments]
    seg_i = 0
    br = readers[0]

    def read_code(table):
        bits = br.bits
        p = br.pos
        code = 0
        get = table.get
        for length in range(1, 17):
            code = (code << 1) | int(bits[p])
            p += 1
            v = get((length, code))
            if v is not None:
                br.pos = p
                return v
        raise ValueError("bad huffman code")

    grid = [np.zeros((h, w), dtype=np.int64) for _ in comps]
    mask = (1 << 16) - 1
    mcu_i = 0
    seg_start = (0, 0)  # restart resets prediction as at scan start
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                seg_i += 1
                br = readers[seg_i]
                seg_start = (y, x)
            mcu_i += 1
            for ci, td in scomps:
                cat = read_code(huff[(0, td)])
                if cat == 16:
                    diff = 32768
                else:
                    diff = _extend(br.read_bits(cat), cat) if cat else 0
                # H.2.1: only the FIRST sample after a restart (or of the
                # scan) takes the default prediction; every other sample
                # predicts from reconstructed neighbours, which are
                # available regardless of segment boundaries
                if (y, x) == seg_start:
                    px = 1 << (P - Pt - 1)
                else:
                    px = _lossless_predict(grid, ci, y, x, predictor, P, Pt)
                grid[ci][y, x] = (px + diff) & mask
    out = [(g << Pt) for g in grid]
    if P <= 8:
        planes = [np.clip(g, 0, 255).astype(np.uint8) for g in out]
    else:
        planes = [np.clip(g >> (P - 8), 0, 255).astype(np.uint8) for g in out]
    if len(planes) == 3:
        # lossless JPEG defines no color transform; 3 components = RGB
        return np.stack(planes, axis=2)
    return np.stack([planes[0]] * 3, axis=2)


def encode_jpeg_lossless(pixels: np.ndarray, predictor: int = 1,
                         point_transform: int = 0,
                         restart_interval: int = 0) -> bytes:
    """RGB8 (h, w, 3) -> lossless JPEG (SOF3, process 14): predictive
    coding per T.81 Annex H with the chosen predictor (1-7), interleaved
    RGB at 1x1 sampling, Annex K DC Huffman tables (8-bit differences
    use categories 0-9). decode_jpeg(encode_jpeg_lossless(px)) == px
    bit-exactly (point_transform=0)."""
    h, w, _ = pixels.shape
    P, Pt = 8, point_transform
    samples = [pixels[:, :, c].astype(np.int64) >> Pt for c in range(3)]
    codes = _build_codes(*_HT_DC_L)
    bw = _BitWriter()
    grid = [np.zeros((h, w), dtype=np.int64) for _ in range(3)]
    mask = (1 << 16) - 1
    mcu_i = 0
    n_rst = 0
    seg_start = (0, 0)
    out_chunks = []
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                out_chunks.append(bytes(bw.buf))
                out_chunks.append(bytes([0xFF, 0xD0 + (n_rst % 8)]))
                n_rst += 1
                bw = _BitWriter()
                seg_start = (y, x)
            mcu_i += 1
            for ci in range(3):
                v = int(samples[ci][y, x])
                if (y, x) == seg_start:
                    px = 1 << (P - Pt - 1)
                else:
                    px = _lossless_predict(grid, ci, y, x, predictor, P, Pt)
                diff = (v - px) & mask
                if diff >= 32768:
                    diff -= 65536  # smallest-magnitude representative
                cat, bits_ = _magnitude(diff)
                code, ln = codes[cat]
                bw.write(code, ln)
                if cat:
                    bw.write(bits_, cat)
                grid[ci][y, x] = v
    bw.flush()
    out_chunks.append(bytes(bw.buf))

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xC3" + struct.pack(">HBHHB", 17, P, h, w, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0)
    bits, values = _HT_DC_L
    out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values), 0x00) + \
        bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * 3, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BB", cid, 0x00)
    out += struct.pack("BBB", predictor, 0, Pt)
    for chunk in out_chunks:
        out += chunk
    out += b"\xFF\xD9"
    return bytes(out)
