"""Cross-implementation interop for the arithmetic JPEG codec: the
SYSTEM libjpeg-turbo (libjpeg62 ABI, which ships the reference
jdarith/jcarith QM coder) decodes OUR arithmetic streams, and OUR
decoder reads arithmetic streams the system library ENCODED — both
directions, sequential and progressive.

This upgrades the coder's evidence from self-roundtrip (which a
consistently-wrong encoder/decoder pair could pass) to agreement with
an independent implementation of ITU-T T.81 Annexes D/E/F.  Pixel
comparison is tolerance-based (libjpeg's integer IDCT vs our exact
float DCT differ by a couple of LSBs); a QM state-machine divergence
would desynchronize the entropy stream and produce garbage or a hard
library error, not a ±2 drift.

The library is driven over ctypes in a SUBPROCESS (libjpeg's default
error manager exit()s the process on failure — isolation keeps pytest
alive and makes a C-side rejection a loud test failure).  Skips if the
shared library is absent.
"""

from __future__ import annotations

import base64
import os
import subprocess
import sys

import numpy as np
import pytest

from syslog_handler_with_clickhouse_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_arith,
    encode_jpeg_arith_progressive,
)

_LIB = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_LIB), reason="system libjpeg62 not present"
)

# Runs in a subprocess: mode 'decode' reads a JPEG on stdin and prints
# w h c + base64 pixels; mode 'encode' reads w h c quality rst prog +
# base64 pixels and prints the base64 JPEG encoded with arith_code=TRUE.
# Offsets are the libjpeg62 LP64 ABI (jpeg_common_fields 40 bytes; the
# struct sizes are probed from the library's own mismatch message).
_HELPER = r"""
import base64, ctypes, re, subprocess, sys

LIB = "%s"
lj = ctypes.CDLL(LIB)
lj.jpeg_std_error.restype = ctypes.c_void_p


def probe_size(create):
    # deliberately wrong size; std error prints 'library thinks size is N'
    code = (
        "import ctypes;lj=ctypes.CDLL('" + LIB + "');"
        "lj.jpeg_std_error.restype=ctypes.c_void_p;"
        "e=ctypes.create_string_buffer(1024);p=lj.jpeg_std_error(e);"
        "c=ctypes.create_string_buffer(4096);"
        "ctypes.cast(c,ctypes.POINTER(ctypes.c_void_p))[0]=p;"
        "lj." + create + "(c,62,1)"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    m = re.search(r"size is (\d+)", r.stderr)
    assert m, r.stderr
    return int(m.group(1))


def mk(create, size):
    err = ctypes.create_string_buffer(1024)
    eptr = lj.jpeg_std_error(err)
    cinfo = ctypes.create_string_buffer(size)
    ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = eptr
    getattr(lj, create)(cinfo, 62, size)
    cinfo._err_keepalive = err  # cinfo->err must outlive the struct
    return cinfo


def u32(buf, off, val=None):
    p = ctypes.cast(ctypes.byref(buf, off), ctypes.POINTER(ctypes.c_uint))
    if val is None:
        return p[0]
    p[0] = val


def decode(data):
    size = probe_size("jpeg_CreateDecompress")
    cinfo = mk("jpeg_CreateDecompress", size)
    src = ctypes.create_string_buffer(data, len(data))
    lj.jpeg_mem_src(cinfo, src, ctypes.c_ulong(len(data)))
    lj.jpeg_read_header(cinfo, 1)
    # replicated (non-fancy) chroma upsampling, matching our decoder --
    # do_fancy_upsampling boolean at 100 (62 LP64 ABI)
    ctypes.cast(ctypes.byref(cinfo, 100), ctypes.POINTER(ctypes.c_int))[0] = 0
    lj.jpeg_start_decompress(cinfo)
    # output dims: scan the struct for the (width, height) pair we know
    # from the SOF we just parsed is implausible to fake -- instead the
    # caller passes dims; simpler: image_width/height at 48/52 (62 ABI)
    w, h = u32(cinfo, 48), u32(cinfo, 52)
    # output_components: after start_decompress, out_color_components /
    # output_components sit at 144/148 in the 62 LP64 layout
    c = ctypes.cast(ctypes.byref(cinfo, 148), ctypes.POINTER(ctypes.c_int))[0]
    assert c in (1, 3), c
    row = ctypes.create_string_buffer(w * c)
    rowp = (ctypes.c_void_p * 1)(ctypes.addressof(row))
    out = bytearray()
    for _ in range(h):
        n = lj.jpeg_read_scanlines(cinfo, rowp, 1)
        assert n == 1
        out += row.raw[: w * c]
    lj.jpeg_finish_decompress(cinfo)
    lj.jpeg_destroy_decompress(cinfo)
    return w, h, c, bytes(out)


def encode(w, h, c, quality, rst, prog, px):
    size = probe_size("jpeg_CreateCompress")
    cinfo = mk("jpeg_CreateCompress", size)
    outbuf = ctypes.c_void_p(0)
    outsize = ctypes.c_ulong(0)
    lj.jpeg_mem_dest(cinfo, ctypes.byref(outbuf), ctypes.byref(outsize))
    u32(cinfo, 48, w)   # image_width
    u32(cinfo, 52, h)   # image_height
    ctypes.cast(ctypes.byref(cinfo, 56), ctypes.POINTER(ctypes.c_int))[0] = c
    ctypes.cast(ctypes.byref(cinfo, 60), ctypes.POINTER(ctypes.c_int))[0] = (
        1 if c == 1 else 2  # JCS_GRAYSCALE / JCS_RGB
    )
    lj.jpeg_set_defaults(cinfo)
    lj.jpeg_set_quality(cinfo, quality, 1)
    # boolean arith_code at 260 (62 LP64 ABI)
    ctypes.cast(ctypes.byref(cinfo, 260), ctypes.POINTER(ctypes.c_int))[0] = 1
    if rst:
        u32(cinfo, 280, rst)  # restart_interval
    if prog:
        lj.jpeg_simple_progression(cinfo)
    lj.jpeg_start_compress(cinfo, 1)
    stride = w * c
    for y in range(h):
        row = ctypes.create_string_buffer(px[y * stride : (y + 1) * stride], stride)
        rowp = (ctypes.c_void_p * 1)(ctypes.addressof(row))
        n = lj.jpeg_write_scanlines(cinfo, rowp, 1)
        assert n == 1
    lj.jpeg_finish_compress(cinfo)
    data = ctypes.string_at(outbuf, outsize.value)
    lj.jpeg_destroy_compress(cinfo)
    return data


mode = sys.argv[1]
if mode == "decode":
    data = base64.b64decode(sys.stdin.read())
    w, h, c, px = decode(data)
    print(w, h, c)
    print(base64.b64encode(px).decode())
else:
    w, h, c, quality, rst, prog = (int(x) for x in sys.argv[2:8])
    px = base64.b64decode(sys.stdin.read())
    data = encode(w, h, c, quality, rst, prog, px)
    print(base64.b64encode(data).decode())
""" % _LIB


def _sys_decode(jpeg: bytes):
    r = subprocess.run(
        [sys.executable, "-c", _HELPER, "decode"],
        input=base64.b64encode(jpeg).decode(),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, f"system libjpeg rejected the stream: {r.stderr}"
    dims, px64 = r.stdout.split("\n")[:2]
    w, h, c = (int(x) for x in dims.split())
    return w, h, c, base64.b64decode(px64)


def _sys_encode(w, h, c, quality, rst, prog, px: bytes) -> bytes:
    r = subprocess.run(
        [sys.executable, "-c", _HELPER, "encode",
         str(w), str(h), str(c), str(quality), str(rst), str(int(prog))],
        input=base64.b64encode(px).decode(),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, f"system libjpeg encode failed: {r.stderr}"
    return base64.b64decode(r.stdout.strip())


def _gray(w, h):
    return bytes((40 + 2 * x + 3 * y) % 256 for y in range(h) for x in range(w))


def _rgb(w, h):
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf += bytes(
                (
                    (40 + 2 * x + y) % 256,
                    (200 - x - 2 * y) % 256,
                    (30 + x + 3 * y) % 256,
                )
            )
    return bytes(buf)


def _close(a: bytes, b: bytes, tol: int):
    xa = np.frombuffer(a, dtype=np.uint8).astype(np.int16)
    xb = np.frombuffer(b, dtype=np.uint8).astype(np.int16)
    d = np.abs(xa - xb)
    assert d.max() <= tol, f"max pixel diff {d.max()} > {tol}"
    assert d.mean() <= 1.0, f"mean pixel diff {d.mean():.2f} > 1.0"


# ------------------------------------------------------------------ #
# direction 1: system libjpeg decodes OUR arithmetic streams
# ------------------------------------------------------------------ #


@pytest.mark.parametrize(
    "mode,c,rst",
    [("seq", 1, 0), ("seq", 1, 2), ("seq", 3, 0), ("seq", 3, 3),
     ("prog", 1, 0), ("prog", 3, 0), ("prog_sa", 1, 2), ("prog_sa", 3, 0)],
)
def test_system_libjpeg_decodes_our_arith(mode, c, rst):
    w, h = 33, 25
    px = _gray(w, h) if c == 1 else _rgb(w, h)
    if mode == "seq":
        blob = encode_jpeg_arith(px, w, h, c, quality=90, restart_interval=rst)
    else:
        blob = encode_jpeg_arith_progressive(
            px, w, h, c, quality=90, successive=(mode == "prog_sa"),
            restart_interval=rst,
        )
    sw, sh, sc, spx = _sys_decode(blob)
    assert (sw, sh, sc) == (w, h, c)
    ours = decode_jpeg_pixels(blob)
    assert (ours[0], ours[1], ours[2]) == (w, h, c)
    # entropy layers agree -> only IDCT/color-convert rounding differs
    # (libjpeg integer IDCT +-2 vs our float DCT; integer YCbCr adds
    # one more step on color; a QM desync would be 100+, not 4)
    _close(spx, ours[3], tol=3 if c == 1 else 4)


def test_system_libjpeg_decodes_our_dac_conditioning():
    w, h = 29, 21
    px = _gray(w, h)
    blob = encode_jpeg_arith(px, w, h, 1, quality=95, dc_cond=(1, 2), ac_kx=3)
    sw, sh, sc, spx = _sys_decode(blob)
    assert (sw, sh, sc) == (w, h, 1)
    _close(spx, decode_jpeg_pixels(blob)[3], tol=3)


# ------------------------------------------------------------------ #
# direction 2: OUR decoder reads system-libjpeg arithmetic streams
# ------------------------------------------------------------------ #


@pytest.mark.parametrize(
    "c,quality,rst,prog",
    [(1, 90, 0, False), (1, 90, 2, False), (3, 85, 0, False),
     (3, 85, 4, False), (1, 90, 0, True), (3, 85, 0, True)],
)
def test_our_decoder_reads_system_arith(c, quality, rst, prog):
    w, h = 33, 25
    px = _gray(w, h) if c == 1 else _rgb(w, h)
    blob = _sys_encode(w, h, c, quality, rst, prog, px)
    # sanity: it really is an arithmetic frame (SOF9 or SOF10)
    assert (b"\xff\xc9" in blob) or (b"\xff\xca" in blob)
    ow, oh, oc, opx = decode_jpeg_pixels(blob)
    assert (ow, oh, oc) == (w, h, c)
    sw, sh, sc, spx = _sys_decode(blob)
    assert (sw, sh, sc) == (w, h, c)
    _close(opx, spx, tol=3 if c == 1 else 4)
