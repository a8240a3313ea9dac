"""Test-only bridge to the system libjpeg62-turbo, used as the REFERENCE
codec for JPEG interop tests (the engine's own codec is pure numpy —
operators/jpeg.py). Compiles a tiny C helper with the system gcc on
first use (cached per session); skips cleanly when gcc or jpeglib.h is
absent.

Why a compiled helper instead of ctypes: libjpeg's classic API needs the
exact jpeg_compress_struct layout and a setjmp error manager — both are
ABI-fragile from ctypes, while a 60-line C program against the installed
headers is exact by construction.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np

_HELPER_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_ppm(const char *path, int *w, int *h) {
    FILE *f = fopen(path, "rb");
    char magic[3] = {0};
    int maxv;
    if (!f) return NULL;
    if (fscanf(f, "%2s %d %d %d", magic, w, h, &maxv) != 4 ||
        strcmp(magic, "P6")) { fclose(f); return NULL; }
    fgetc(f);
    unsigned char *buf = malloc((size_t)(*w) * (*h) * 3);
    if (fread(buf, 1, (size_t)(*w) * (*h) * 3, f) !=
        (size_t)(*w) * (*h) * 3) { fclose(f); free(buf); return NULL; }
    fclose(f);
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 4) return 2;
    if (!strcmp(argv[1], "enc")) {
        /* enc in.ppm out.jpg quality progressive restart_interval */
        int w, h;
        unsigned char *rgb = read_ppm(argv[2], &w, &h);
        if (!rgb) return 3;
        struct jpeg_compress_struct c;
        struct jpeg_error_mgr err;
        c.err = jpeg_std_error(&err);
        jpeg_create_compress(&c);
        FILE *out = fopen(argv[3], "wb");
        jpeg_stdio_dest(&c, out);
        c.image_width = w; c.image_height = h;
        c.input_components = 3; c.in_color_space = JCS_RGB;
        jpeg_set_defaults(&c);
        jpeg_set_quality(&c, atoi(argv[4]), TRUE);
        if (argc > 5 && atoi(argv[5])) jpeg_simple_progression(&c);
        if (argc > 6) c.restart_interval = (unsigned)atoi(argv[6]);
        if (argc > 8 && atoi(argv[8])) c.arith_code = TRUE;
        if (argc > 7 && atoi(argv[7])) {   /* force 4:4:4 */
            int i;
            for (i = 0; i < 3; i++) {
                c.comp_info[i].h_samp_factor = 1;
                c.comp_info[i].v_samp_factor = 1;
            }
        }
        jpeg_start_compress(&c, TRUE);
        while (c.next_scanline < c.image_height) {
            JSAMPROW row = rgb + (size_t)c.next_scanline * w * 3;
            jpeg_write_scanlines(&c, &row, 1);
        }
        jpeg_finish_compress(&c);
        fclose(out);
        jpeg_destroy_compress(&c);
        return 0;
    }
    if (!strcmp(argv[1], "dec")) {
        /* dec in.jpg out.ppm */
        struct jpeg_decompress_struct d;
        struct jpeg_error_mgr err;
        d.err = jpeg_std_error(&err);
        jpeg_create_decompress(&d);
        FILE *in = fopen(argv[2], "rb");
        if (!in) return 3;
        jpeg_stdio_src(&d, in);
        jpeg_read_header(&d, TRUE);
        d.out_color_space = JCS_RGB;
        jpeg_start_decompress(&d);
        FILE *out = fopen(argv[3], "wb");
        fprintf(out, "P6\n%d %d\n255\n", d.output_width, d.output_height);
        unsigned char *row = malloc((size_t)d.output_width * 3);
        while (d.output_scanline < d.output_height) {
            JSAMPROW r = row;
            jpeg_read_scanlines(&d, &r, 1);
            fwrite(row, 1, (size_t)d.output_width * 3, out);
        }
        free(row);
        fclose(out);
        jpeg_finish_decompress(&d);
        jpeg_destroy_decompress(&d);
        fclose(in);
        return 0;
    }
    return 2;
}
"""

_helper_path: str | None = None


def available() -> bool:
    return (shutil.which("gcc") is not None and
            os.path.exists("/usr/include/jpeglib.h"))


def _helper() -> str:
    global _helper_path
    if _helper_path is None:
        d = tempfile.mkdtemp(prefix="jpegref")
        src = os.path.join(d, "jpegref.c")
        exe = os.path.join(d, "jpegref")
        with open(src, "w") as f:
            f.write(_HELPER_SRC)
        subprocess.run(["gcc", "-O2", "-o", exe, src, "-ljpeg"],
                       check=True, capture_output=True)
        _helper_path = exe
    return _helper_path


def _write_ppm(path: str, pixels: np.ndarray) -> None:
    h, w, _ = pixels.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(pixels.astype(np.uint8).tobytes())


def _read_ppm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        assert f.readline().strip() == b"255"
        return np.frombuffer(f.read(w * h * 3),
                             dtype=np.uint8).reshape(h, w, 3)


def encode(pixels: np.ndarray, quality: int = 90,
           progressive: bool = False, restart_interval: int = 0,
           samp444: bool = False, arith: bool = False) -> bytes:
    """RGB8 array -> real libjpeg-encoded bytes. ``samp444`` disables
    chroma subsampling so decoder comparisons carry no
    upsampling-filter ambiguity (libjpeg default is 4:2:0 h2v2)."""
    d = tempfile.mkdtemp(prefix="jref")
    ppm, jpg = os.path.join(d, "i.ppm"), os.path.join(d, "o.jpg")
    _write_ppm(ppm, pixels)
    subprocess.run([_helper(), "enc", ppm, jpg, str(quality),
                    "1" if progressive else "0", str(restart_interval),
                    "1" if samp444 else "0", "1" if arith else "0"],
                   check=True, capture_output=True)
    with open(jpg, "rb") as f:
        return f.read()


def decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> RGB8 array via real libjpeg."""
    d = tempfile.mkdtemp(prefix="jref")
    jpg, ppm = os.path.join(d, "i.jpg"), os.path.join(d, "o.ppm")
    with open(jpg, "wb") as f:
        f.write(data)
    subprocess.run([_helper(), "dec", jpg, ppm],
                   check=True, capture_output=True)
    return _read_ppm(ppm)
