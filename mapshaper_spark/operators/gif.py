"""GIF87a/89a codec in pure numpy + stdlib — the last common raster format
for the decode-stats path (the reference delegates raster work entirely;
this engine's input table carries opaque image bytes, SURVEY §1.4).

Decode: full spec — variable-width LZW (code growth, CLEAR/EOI, deferred
clear), sub-block stream, global + local color tables, the 4-pass
interlace row order, multi-frame composition honoring Graphic Control
disposal methods 0/1 (keep) and 2 (restore to background) with
transparency, frame delays. Disposal 3 (restore previous) raises
NotImplementedError — honest boundary, no real-world encoder emits it for
the fixtures we synthesize.

Encode (fixture generator): palette from the image's unique colors when
<= 256, else 6x6x6 color-cube quantization; real LZW with dictionary
growth and 12-bit cap + CLEAR resets. GIF is lossless ON the palette
indices, so decode(encode(px)) == quantize(px) bit-exactly — that is the
round-trip invariant the tests pin.

Spec: CompuServe GIF89a (public), W3C note on the interlace pass order.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, CLEAR + EOI codes)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW: codes start at min_code_size+1 bits; CLEAR resets the
    dictionary; width grows when the next insert would overflow, capped at
    12 bits (after which the encoder must CLEAR or keep emitting)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader over the concatenated sub-block payload (LSB first)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little")
    pos = 0
    nbits = len(bits)

    def reset_dict():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset_dict()
    prev: bytes | None = None
    while pos + width <= nbits and n_out < n_pixels:
        code = int(np.dot(bits[pos:pos + width],
                          1 << np.arange(width, dtype=np.uint32)))
        pos += width
        if code == clear:
            table, width = reset_dict()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream (code {code} > {len(table)})")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        prev = entry
        # width grows when the NEXT code could reference the new entry;
        # at 4096 entries the width stays 12 until a CLEAR (deferred clear)
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError(f"LZW underrun: {n_out}/{n_pixels} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real LZW with dict growth and the 12-bit cap + CLEAR reset."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []  # (value, width) flattened below

    def emit(code: int, width: int):
        for b in range(width):
            out_bits.append((code >> b) & 1)

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for px in indices.tobytes():
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    padded = out_bits + [0] * (-len(out_bits) % 8)
    payload = np.packbits(np.array(padded, dtype=np.uint8),
                          bitorder="little").tobytes()
    # sub-block framing (<= 255 bytes per block, 0 terminator)
    blocks = b"".join(bytes([len(payload[i:i + 255])]) + payload[i:i + 255]
                      for i in range(0, len(payload), 255))
    return blocks + b"\x00"


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray, h: int) -> np.ndarray:
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES if start < h])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Full animation decode: [(delay_ms, rgb_frame (H, W, 3))] composed on
    the logical-screen canvas per the GIF89a disposal rules."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    W, H, packed, bg_idx, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    bg_rgb = gct[bg_idx] if gct is not None and bg_idx < len(gct) \
        else np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (H, W, 3)).copy()
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = data[pos]
                flags, delay_cs, tidx = struct.unpack(
                    "<BHB", data[pos + 1:pos + 5])
                pos += 1 + size + 1  # size byte + payload + terminator
                delay_ms = delay_cs * 10
                transparent = tidx if flags & 1 else None
                disposal = (flags >> 2) & 0x07
            else:  # skip any other extension's sub-blocks
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(data[pos:pos + 3 * n],
                                  dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame with no color table")
        min_code_size = data[pos]
        pos += 1
        payload = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            payload += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(payload), min_code_size, w * h).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx, h)

        prev_region = canvas[top:top + h, left:left + w].copy()
        rgb = table[np.minimum(idx, len(table) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region = np.where(mask, rgb, canvas[top:top + h, left:left + w])
        else:
            region = rgb
        canvas[top:top + h, left:left + w] = region
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore region to background color
            canvas[top:top + h, left:left + w] = bg_rgb
        elif disposal == 3:  # restore to previous contents (GIF89a
            canvas[top:top + h, left:left + w] = prev_region  # 23.c.iv)
        del prev_region
        delay_ms = 0
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF stream with no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First (or only) frame as (H, W, 3) uint8."""
    return decode_gif_frames(data)[0][1]


def quantize_666(pixels: np.ndarray) -> np.ndarray:
    """6x6x6 color-cube quantization (the classic web-safe cube): each
    channel maps to the nearest of 6 levels {0, 51, ..., 255}."""
    return (np.round(pixels.astype(np.float64) / 51.0) * 51.0).astype(np.uint8)


def _rgb24(a: np.ndarray) -> np.ndarray:
    a = a.astype(np.int64)
    return (a[..., 0] << 16) | (a[..., 1] << 8) | a[..., 2]


def encode_gif(pixels: np.ndarray, frames: list[np.ndarray] | None = None,
               delay_ms: int = 100, interlace: bool = False) -> bytes:
    """Single- or multi-frame GIF89a. Images with > 256 distinct colors are
    6x6x6-quantized first (use quantize_666 on the reference side of a
    round-trip comparison). All frames of an animation share one palette
    built over their union."""
    all_frames = [pixels] + list(frames or [])
    h, w, _ = pixels.shape
    union = np.concatenate([f.reshape(-1, 3) for f in all_frames])
    if len(np.unique(union, axis=0)) > 256:
        all_frames = [quantize_666(f) for f in all_frames]
        union = np.concatenate([f.reshape(-1, 3) for f in all_frames])
    colors = np.unique(union, axis=0)
    pal24 = _rgb24(colors)  # np.unique rows are lex-sorted => pal24 ascending
    gct_bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_slots = 1 << gct_bits
    table = np.zeros((n_slots, 3), dtype=np.uint8)
    table[:len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 7), 0, 0)
    out += table.tobytes()
    if len(all_frames) > 1:
        # NETSCAPE2.0 loop extension (loop forever)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in all_frames:
        if len(all_frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", 0x04, delay_ms // 10, 0) + b"\x00"
        fh, fw, _ = f.shape
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, fw, fh,
                                     0x40 if interlace else 0)
        idx = np.searchsorted(pal24, _rgb24(f)).astype(np.uint8)
        if interlace:
            order = np.concatenate([np.arange(s, fh, st)
                                    for s, st in _INTERLACE_PASSES if s < fh])
            idx = idx[order]
        min_code_size = max(2, gct_bits)
        out += bytes([min_code_size])
        out += _lzw_encode(idx.ravel(), min_code_size)
    out += b"\x3b"
    return bytes(out)
