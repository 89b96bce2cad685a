"""Cross-implementation interop for the GIF codec against the SYSTEM
giflib (round 13): giflib reads files our encoders produced — static,
interlaced, and multi-frame animations with local color tables — and
the index rasters must match BIT-EXACTLY (GIF is lossless).

Driven over ctypes with a memory-read callback (``DGifOpen`` +
``DGifSlurp``); GifFileType/SavedImage fields at their LP64 offsets.
giflib reports errors by return value, but the driver runs in a
subprocess so a C-side crash on a stream we mis-built is a loud test
failure.  Skips when the shared library is absent.
"""

from __future__ import annotations

import base64
import os
import subprocess
import sys

import pytest

from syslog_handler_with_clickhouse_spark.operators.multimodal import (
    decode_gif_pixels,
    encode_gif,
    encode_gif_animation,
)

LIB = "/usr/lib/x86_64-linux-gnu/libgif.so.7"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LIB), reason="system giflib not present"
)

# GifFileType (giflib 5, LP64): SWidth 0, SHeight 4, SColorRes 8,
# SBackGroundColor 12, AspectByte 16(+pad), SColorMap 24,
# ImageCount 32(+pad), Image (GifImageDesc inline) 40..., SavedImages
# ptr after the inline Image...  Rather than walking the whole layout,
# the helper slurps and then uses DGifSavedCopy... no — it reads
# SavedImages directly: ImageCount at 32; the inline Image struct is
# {Left,Top,Width,Height,Interlace,ColorMap*} = 4*4+4+pad+8 = 32 bytes
# at offset 40; SavedImages pointer at 72.  SavedImage =
# {GifImageDesc (32), RasterBits* (32), ExtensionBlockCount (40),
# ExtensionBlocks* (48)} = 56 bytes.
_HELPER = r"""
import base64, ctypes, sys

lg = ctypes.CDLL("%s")

READ_FN = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p,
                           ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int)

data = base64.b64decode(sys.stdin.buffer.read())
pos = [0]

def read_cb(_gif, buf, count):
    n = min(count, len(data) - pos[0])
    for i in range(n):
        buf[i] = data[pos[0] + i]
    pos[0] += n
    return n

cb = READ_FN(read_cb)
err = ctypes.c_int(0)
lg.DGifOpen.restype = ctypes.c_void_p
gif = lg.DGifOpen(None, cb, ctypes.byref(err))
assert gif, ("DGifOpen failed", err.value)
ok = lg.DGifSlurp(ctypes.c_void_p(gif))
assert ok == 1, "DGifSlurp failed"

def i32(addr):
    return ctypes.cast(addr, ctypes.POINTER(ctypes.c_int))[0]

def ptr(addr):
    return ctypes.cast(addr, ctypes.POINTER(ctypes.c_void_p))[0]

sw, sh = i32(gif), i32(gif + 4)
image_count = i32(gif + 32)
saved = ptr(gif + 72)
assert saved, "no SavedImages"
print(sw, sh, image_count)
for fi in range(image_count):
    base = saved + fi * 56
    left, top, w, h, inter = (i32(base), i32(base + 4), i32(base + 8),
                              i32(base + 12), i32(base + 16))
    raster = ptr(base + 32)
    assert raster, "no RasterBits"
    px = ctypes.string_at(raster, w * h)
    print(left, top, w, h, inter)
    print(base64.b64encode(px).decode())
""" % LIB


def _lib_read(gif: bytes):
    r = subprocess.run(
        [sys.executable, "-c", _HELPER],
        input=base64.b64encode(gif), capture_output=True, timeout=120,
    )
    assert r.returncode == 0, f"giflib read failed: {r.stderr!r}"
    lines = r.stdout.decode().strip().split("\n")
    sw, sh, n = (int(x) for x in lines[0].split())
    frames = []
    for fi in range(n):
        meta = tuple(int(x) for x in lines[1 + 2 * fi].split())
        px = base64.b64decode(lines[2 + 2 * fi])
        frames.append((meta, px))
    return sw, sh, frames


@pytest.mark.parametrize("interlace", [False, True])
def test_giflib_reads_our_static(interlace):
    import random

    w, h = 23, 14
    rng = random.Random(9)
    pal = bytes(rng.randrange(256) for _ in range(3 * 64))
    idx = bytes(rng.randrange(64) for _ in range(w * h))
    blob = encode_gif(idx, w, h, pal, interlace=interlace)
    sw, sh, frames = _lib_read(blob)
    assert (sw, sh) == (w, h)
    (meta, px), = frames
    left, top, fw, fh, inter = meta
    assert (left, top, fw, fh) == (0, 0, w, h)
    assert inter == (1 if interlace else 0)
    # giflib stores the raster DE-INTERLACED after DGifSlurp — same
    # row order our decoder produces, so indices compare directly
    assert px == idx
    # and our decoder agrees with the palette expansion
    exp = b"".join(pal[3 * i : 3 * i + 3] for i in idx)
    assert decode_gif_pixels(blob) == (w, h, 3, exp)


def test_giflib_reads_our_animation():
    import random

    rng = random.Random(4)
    sw, sh = 20, 12
    pal = bytes(rng.randrange(256) for _ in range(3 * 16))
    frames = []
    for k in range(3):
        fw, fh = 8 + k, 5 + k
        frames.append(
            dict(
                left=k, top=k, w=fw, h=fh,
                indices=bytes(rng.randrange(16) for _ in range(fw * fh)),
                delay=4 + k, disposal=1, transparent=None,
            )
        )
    blob = encode_gif_animation(sw, sh, pal, frames)
    gw, gh, got = _lib_read(blob)
    assert (gw, gh) == (sw, sh)
    assert len(got) == 3
    for k, ((left, top, fw, fh, _inter), px) in enumerate(got):
        f = frames[k]
        assert (left, top, fw, fh) == (f["left"], f["top"], f["w"], f["h"])
        assert px == f["indices"]
