"""Cross-implementation interop for the PNG codec against the SYSTEM
libpng16 (round 13), via its simplified ``png_image`` API — at 8 bits
the conversions are identity, so comparisons are BIT-EXACT.

Direction 1: libpng reads files our encoders produced — every filter
type, Adam7, palette, sub-byte depths (libpng's low-bit-gray expansion
is the same 255/85/17 replication our decoder uses), gray+alpha and
RGBA.  Direction 2: libpng WRITES 8-bit gray/GA/RGB/RGBA files and our
decoder must reproduce the buffer exactly.

16-bit files are excluded here by design: the simplified API treats
16-bit data as linear light and gamma-encodes on 8-bit conversion,
which is a COLOR-MANAGEMENT policy, not the bit-preserving high-byte
view our decoder (and PNG's own sBIT-free semantics) exposes; the
16-bit path keeps its closed-form and roundtrip pins.

The simplified API reports errors by return value (no longjmp into the
caller), but the driver still runs in a subprocess so any C-side abort
is a loud failure, not a dead pytest.
"""

from __future__ import annotations

import base64
import os
import subprocess
import sys

import pytest

from syslog_handler_with_clickhouse_spark.operators.multimodal import (
    decode_png_pixels,
    encode_png,
    encode_png_palette,
    encode_png_subbyte,
)

LIB = "/usr/lib/x86_64-linux-gnu/libpng16.so.16"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LIB), reason="system libpng16 not present"
)

# png_image struct (libpng16): opaque ptr + 7 u32 + char[64]; version 1.
# Formats: bit0 alpha, bit1 color, bit3 colormap.
_HELPER = r"""
import base64, ctypes, sys

lp = ctypes.CDLL("%s")

class PngImage(ctypes.Structure):
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

mode = sys.argv[1]
if mode == "read":
    data = base64.b64decode(sys.stdin.buffer.read())
    img = PngImage()
    img.version = 1
    ok = lp.png_image_begin_read_from_memory(
        ctypes.byref(img), data, ctypes.c_size_t(len(data)))
    assert ok, img.message
    fmt = img.format
    if fmt & 8:          # colormapped: ask for the RGB expansion
        fmt = 2
    fmt &= 3             # force 8-bit sRGB family
    img.format = fmt
    comps = 1 + (fmt & 1) + 2 * ((fmt >> 1) & 1)
    buf = ctypes.create_string_buffer(img.width * img.height * comps)
    ok = lp.png_image_finish_read(
        ctypes.byref(img), None, buf, ctypes.c_int(0), None)
    assert ok, img.message
    print(img.width, img.height, comps)
    print(base64.b64encode(buf.raw).decode())
else:
    w, h, comps = (int(x) for x in sys.argv[2:5])
    px = base64.b64decode(sys.stdin.buffer.read())
    img = PngImage()
    img.version = 1
    img.width = w
    img.height = h
    img.format = {1: 0, 2: 1, 3: 2, 4: 3}[comps]
    size = ctypes.c_size_t(0)
    ok = lp.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), ctypes.c_int(0),
        px, ctypes.c_int(0), None)
    assert ok, img.message
    out = ctypes.create_string_buffer(size.value)
    ok = lp.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), ctypes.c_int(0),
        px, ctypes.c_int(0), None)
    assert ok, img.message
    print(base64.b64encode(out.raw[: size.value]).decode())
""" % LIB


def _lib_read(png: bytes):
    r = subprocess.run(
        [sys.executable, "-c", _HELPER, "read"],
        input=base64.b64encode(png), capture_output=True, timeout=120,
    )
    assert r.returncode == 0, f"libpng read failed: {r.stderr!r}"
    lines = r.stdout.decode().split("\n")
    w, h, c = (int(x) for x in lines[0].split())
    return w, h, c, base64.b64decode(lines[1])


def _lib_write(w, h, comps, px: bytes) -> bytes:
    r = subprocess.run(
        [sys.executable, "-c", _HELPER, "write", str(w), str(h), str(comps)],
        input=base64.b64encode(px), capture_output=True, timeout=120,
    )
    assert r.returncode == 0, f"libpng write failed: {r.stderr!r}"
    return base64.b64decode(r.stdout.strip())


def _gray8(w, h):
    return bytes((40 + 5 * i) % 256 for i in range(w * h))


# ------------------------------------------------------------------ #
# direction 1: system libpng reads OUR files — bit-exact
# ------------------------------------------------------------------ #


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_libpng_reads_our_filtered(interlace, ch):
    w, h = 19, 11
    px = bytes((30 + 7 * i) % 256 for i in range(w * h * ch))
    # cycle all five filter types across rows
    blob = encode_png(
        px, w, h, ch, filters=[i % 5 for i in range(h * 8)],
        interlace=interlace,
    )
    lw, lh, lc, lpx = _lib_read(blob)
    assert (lw, lh, lc) == (w, h, ch)
    assert lpx == px


@pytest.mark.parametrize("interlace", [False, True])
def test_libpng_reads_our_palette(interlace):
    import random

    w, h = 19, 11
    rng = random.Random(3)
    pal = bytes(rng.randrange(256) for _ in range(3 * 256))
    idx = bytes(rng.randrange(256) for _ in range(w * h))
    blob = encode_png_palette(idx, w, h, pal, interlace=interlace)
    lw, lh, lc, lpx = _lib_read(blob)
    assert (lw, lh, lc) == (w, h, 3)
    exp = b"".join(pal[3 * i : 3 * i + 3] for i in idx)
    assert lpx == exp
    assert decode_png_pixels(blob) == (w, h, 3, exp)


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_libpng_reads_our_subbyte_gray(depth, interlace):
    import random

    w, h = 19, 11
    rng = random.Random(depth)
    samples = [rng.randrange(1 << depth) for _ in range(w * h)]
    blob = encode_png_subbyte(samples, w, h, depth, interlace=interlace)
    lw, lh, lc, lpx = _lib_read(blob)
    assert (lw, lh, lc) == (w, h, 1)
    scale = 255 // ((1 << depth) - 1)
    exp = bytes(v * scale for v in samples)
    assert lpx == exp  # libpng's low-bit expansion == our 255/85/17
    assert decode_png_pixels(blob) == (w, h, 1, exp)


# ------------------------------------------------------------------ #
# direction 2: OUR decoder reads libpng-written files — bit-exact
# ------------------------------------------------------------------ #


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_our_decoder_reads_libpng(ch):
    w, h = 19, 11
    px = bytes((30 + 7 * i) % 256 for i in range(w * h * ch))
    blob = _lib_write(w, h, ch, px)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_png_pixels(blob) == (w, h, ch, px)
