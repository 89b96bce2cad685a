"""Cross-implementation interop for the TIFF codec against the SYSTEM
libtiff (round 13): TIFF is lossless, so both directions compare
BIT-EXACTLY — no tolerance.

Direction 1: libtiff reads files our ``encode_tiff`` produced (strip
and tiled, 8- and 16-bit, both byte orders, every compression we
emit, predictor, planar, WhiteIsZero) through ``TIFFReadRGBAImage``,
whose 16-bit handling is the same high-byte view our decoder uses.
Direction 2: libtiff WRITES files (``TIFFSetField`` +
``TIFFWriteScanline`` / ``TIFFWriteTile``) and our
``decode_tiff_pixels`` must reproduce the source samples exactly —
including the round-13 tiled 16-bit path.

libtiff reports errors by return value (no exit()/longjmp into us),
but the driver still runs in a subprocess so a crash on a stream we
mis-built is a loud test failure, not a dead pytest.  Skips when the
shared library is absent.
"""

from __future__ import annotations

import base64
import os
import subprocess
import sys

import pytest

from syslog_handler_with_clickhouse_spark.operators.multimodal import (
    decode_tiff_pixels,
    encode_tiff,
)

LIB = "/usr/lib/x86_64-linux-gnu/libtiff.so.6"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LIB), reason="system libtiff not present"
)

# Subprocess driver.  mode 'read': argv tiff-path; prints w h + base64
# RGBA (TIFFReadRGBAImage order: bottom-up, R,G,B,A per pixel).
# mode 'write': argv out-path w h spp bits compression predictor
# tile_w tile_h photometric; samples (native-endian u8/u16) on stdin;
# prints 'ok'.
_HELPER = r"""
import base64, ctypes, sys

lt = ctypes.CDLL("%s")
lt.TIFFOpen.restype = ctypes.c_void_p
lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]

TAG = dict(width=256, length=257, bits=258, compression=259, photometric=262,
           spp=277, rps=278, planar=284, predictor=317,
           tile_w=322, tile_h=323)

mode = sys.argv[1]
if mode == "readtiles":
    # raw codec-layer read: TIFFReadEncodedTile per tile, bytes as
    # stored (post-decompression, post-predictor), no RGBA conversion
    tif = lt.TIFFOpen(sys.argv[2].encode(), b"r")
    assert tif, "TIFFOpen failed"
    t = ctypes.c_void_p(tif)
    n_tiles = int(sys.argv[3])
    tile_bytes = int(sys.argv[4])
    out = []
    for ti in range(n_tiles):
        buf = ctypes.create_string_buffer(tile_bytes)
        r = lt.TIFFReadEncodedTile(t, ctypes.c_uint32(ti), buf,
                                   ctypes.c_ssize_t(tile_bytes))
        assert r == tile_bytes, ("short tile", ti, r)
        out.append(buf.raw)
    lt.TIFFClose(t)
    print(base64.b64encode(b"".join(out)).decode())
elif mode == "writepycc":
    # separated-YCbCr JPEG tiles: stdin = Y plane (w*h) + Cb + Cr
    # (ceil(w/hs)*ceil(h/vs) each); chroma tile input buffers use
    # libtiff's tile row stride (tw bytes/row, first ceil(tw/hs)
    # meaningful) — probed from its write expectations
    (out, w, h, tw, th, hs, vs) = (
        sys.argv[2], *(int(x) for x in sys.argv[3:9]))
    data = base64.b64decode(sys.stdin.buffer.read())
    cw, ch = -(-w // hs), -(-h // vs)
    ctw, cth = -(-tw // hs), -(-th // vs)
    planes = [
        (data[: w * h], w, h, tw, th, tw * th),
        (data[w * h : w * h + cw * ch], cw, ch, ctw, cth, tw * cth),
        (data[w * h + cw * ch :], cw, ch, ctw, cth, tw * cth),
    ]
    tif = lt.TIFFOpen(out.encode(), b"w")
    assert tif, "TIFFOpen(w) failed"
    t = ctypes.c_void_p(tif)

    def seti(tag, *vals):
        assert lt.TIFFSetField(t, ctypes.c_uint32(tag),
                               *[ctypes.c_int(v) for v in vals])

    seti(TAG["width"], w)
    seti(TAG["length"], h)
    seti(TAG["bits"], 8)
    seti(TAG["spp"], 3)
    seti(TAG["photometric"], 6)
    seti(TAG["planar"], 2)
    seti(TAG["compression"], 7)
    seti(530, hs, vs)
    seti(TAG["tile_w"], tw)
    seti(TAG["tile_h"], th)
    seti(65537, 95)  # JPEGQUALITY pseudo-tag
    lt.TIFFWriteEncodedTile.restype = ctypes.c_ssize_t
    ta = (w + tw - 1) // tw
    td = (h + th - 1) // th
    ti = 0
    for pl, pw, ph, ptw, pth, nbytes in planes:
        stride = nbytes // pth
        for gy in range(td):
            for gx in range(ta):
                buf = bytearray(nbytes)
                for r in range(pth):
                    sy = min(gy * pth + r, ph - 1)
                    for c in range(ptw):
                        sx = min(gx * ptw + c, pw - 1)
                        buf[r * stride + c] = pl[sy * pw + sx]
                cb = ctypes.create_string_buffer(bytes(buf), nbytes)
                r = lt.TIFFWriteEncodedTile(t, ctypes.c_uint32(ti), cb,
                                            ctypes.c_ssize_t(nbytes))
                assert r == nbytes, ("WriteEncodedTile", ti, r)
                ti += 1
    lt.TIFFClose(t)
    print("ok")
elif mode == "read":
    tif = lt.TIFFOpen(sys.argv[2].encode(), b"r")
    assert tif, "TIFFOpen failed"
    w = ctypes.c_uint32(0)
    h = ctypes.c_uint32(0)
    assert lt.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(256),
                           ctypes.byref(w))
    assert lt.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(257),
                           ctypes.byref(h))
    n = w.value * h.value
    raster = (ctypes.c_uint32 * n)()
    ok = lt.TIFFReadRGBAImage(ctypes.c_void_p(tif), w, h, raster, 0)
    assert ok, "TIFFReadRGBAImage failed"
    lt.TIFFClose(ctypes.c_void_p(tif))
    print(w.value, h.value)
    print(base64.b64encode(bytes(raster)).decode())
else:
    (out, w, h, spp, bits, comp, pred, tw, th, photo) = (
        sys.argv[2], *(int(x) for x in sys.argv[3:12]))
    planar = int(sys.argv[12]) if len(sys.argv) > 12 else 1
    data = base64.b64decode(sys.stdin.buffer.read())
    tif = lt.TIFFOpen(out.encode(), b"w")
    assert tif, "TIFFOpen(w) failed"
    t = ctypes.c_void_p(tif)

    def seti(tag, val):
        assert lt.TIFFSetField(t, ctypes.c_uint32(tag), ctypes.c_int(val))

    seti(TAG["width"], w)
    seti(TAG["length"], h)
    seti(TAG["bits"], bits)
    seti(TAG["spp"], spp)
    seti(TAG["photometric"], photo)
    seti(TAG["planar"], planar)
    seti(TAG["compression"], comp)
    if comp == 7:
        seti(65537, 90)       # JPEGQUALITY pseudo-tag
        if spp == 3:
            seti(65538, 1)    # JPEGCOLORMODE_RGB: RGB scanlines in
    if pred:
        seti(TAG["predictor"], 2)
    sb = bits // 8
    if tw and planar == 2:
        seti(TAG["tile_w"], tw)
        seti(TAG["tile_h"], th)
        ta = (w + tw - 1) // tw
        td = (h + th - 1) // th
        tile_bytes = tw * th * sb
        for c in range(spp):
            for ty in range(td):
                for tx in range(ta):
                    buf = bytearray(tile_bytes)
                    y0, x0 = ty * th, tx * tw
                    rows = min(th, h - y0)
                    cols = min(tw, w - x0)
                    for r in range(rows):
                        for cc in range(cols):
                            src = (((y0 + r) * w + x0 + cc) * spp + c) * sb
                            dst = (r * tw + cc) * sb
                            buf[dst : dst + sb] = data[src : src + sb]
                    cb = ctypes.create_string_buffer(bytes(buf), tile_bytes)
                    r = lt.TIFFWriteTile(t, cb, ctypes.c_uint32(x0),
                                         ctypes.c_uint32(y0),
                                         ctypes.c_uint32(0),
                                         ctypes.c_ushort(c))
                    assert r > 0, "TIFFWriteTile(planar) failed"
    elif tw:
        seti(TAG["tile_w"], tw)
        seti(TAG["tile_h"], th)
        ta = (w + tw - 1) // tw
        td = (h + th - 1) // th
        tile_bytes = tw * th * spp * sb
        for ty in range(td):
            for tx in range(ta):
                buf = bytearray(tile_bytes)
                y0, x0 = ty * th, tx * tw
                rows = min(th, h - y0)
                cols = min(tw, w - x0)
                for r in range(rows):
                    src = ((y0 + r) * w + x0) * spp * sb
                    dst = r * tw * spp * sb
                    buf[dst : dst + cols * spp * sb] = data[
                        src : src + cols * spp * sb]
                cb = ctypes.create_string_buffer(bytes(buf), tile_bytes)
                r = lt.TIFFWriteTile(t, cb, ctypes.c_uint32(x0),
                                     ctypes.c_uint32(y0), ctypes.c_uint32(0),
                                     ctypes.c_ushort(0))
                assert r > 0, "TIFFWriteTile failed"
    else:
        seti(TAG["rps"], 16 if comp == 7 else 5)
        stride = w * spp * sb
        for y in range(h):
            row = ctypes.create_string_buffer(
                data[y * stride : (y + 1) * stride], stride)
            r = lt.TIFFWriteScanline(t, row, ctypes.c_uint32(y),
                                     ctypes.c_ushort(0))
            assert r == 1, "TIFFWriteScanline failed"
    lt.TIFFClose(t)
    print("ok")
""" % LIB


def _lib_read_rgba(tiff_bytes: bytes):
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        f.write(tiff_bytes)
        path = f.name
    try:
        r = subprocess.run(
            [sys.executable, "-c", _HELPER, "read", path],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, f"libtiff read failed: {r.stderr}"
        dims, px64 = r.stdout.split("\n")[:2]
        w, h = (int(x) for x in dims.split())
        return w, h, base64.b64decode(px64)
    finally:
        os.unlink(path)


def _lib_read_tiles(tiff_bytes: bytes, n_tiles: int, tile_bytes: int):
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        f.write(tiff_bytes)
        path = f.name
    try:
        r = subprocess.run(
            [sys.executable, "-c", _HELPER, "readtiles", path,
             str(n_tiles), str(tile_bytes)],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, f"libtiff tile read failed: {r.stderr}"
        return base64.b64decode(r.stdout.strip())
    finally:
        os.unlink(path)


def _lib_write(w, h, spp, bits, comp, pred, tile, photo, samples: bytes,
               planar: int = 1):
    import tempfile

    path = tempfile.mktemp(suffix=".tif")
    tw, th = tile if tile else (0, 0)
    try:
        r = subprocess.run(
            [sys.executable, "-c", _HELPER, "write", path,
             str(w), str(h), str(spp), str(bits), str(comp),
             str(int(pred)), str(tw), str(th), str(photo), str(planar)],
            input=base64.b64encode(samples),
            capture_output=True, timeout=120,
        )
        assert r.returncode == 0, f"libtiff write failed: {r.stderr!r}"
        return open(path, "rb").read()
    finally:
        if os.path.exists(path):
            os.unlink(path)


def _rgba_to_ours(w, h, rgba: bytes, channels: int) -> bytes:
    """TIFFReadRGBAImage raster (bottom-up ABGR-in-uint32, i.e. R,G,B,A
    byte order on little-endian) -> our top-down gray/RGB bytes."""
    out = bytearray()
    for y in range(h - 1, -1, -1):
        row = rgba[y * w * 4 : (y + 1) * w * 4]
        for x in range(w):
            r, g, b = row[4 * x], row[4 * x + 1], row[4 * x + 2]
            out += bytes([r] if channels == 1 else [r, g, b])
    return bytes(out)


def _gray8(w, h):
    return bytes((40 + 5 * i) % 256 for i in range(w * h))


def _rgb8(w, h):
    return bytes((30 + 7 * i) % 256 for i in range(w * h * 3))


# ------------------------------------------------------------------ #
# direction 1: system libtiff reads OUR files — bit-exact
# ------------------------------------------------------------------ #


@pytest.mark.parametrize("endian", ["<", ">"])
@pytest.mark.parametrize(
    "comp,pred",
    [({}, False), ({"lzw": True}, True), ({"packbits": True}, False),
     ({"deflate": True}, True)],
)
@pytest.mark.parametrize("ch", [1, 3])
def test_libtiff_reads_our_8bit_strips(endian, comp, pred, ch):
    w, h = 21, 13
    px = _gray8(w, h) if ch == 1 else _rgb8(w, h)
    blob = encode_tiff(
        px, w, h, ch, endian=endian, predictor=pred,
        rows_per_strip=5, **comp,
    )
    lw, lh, rgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    assert _rgba_to_ours(w, h, rgba, ch) == px


@pytest.mark.parametrize("endian", ["<", ">"])
def test_libtiff_reads_our_16bit_strips(endian):
    w, h = 21, 13
    samples = [((40 + 5 * i) % 256) * 256 + (i % 256) for i in range(w * h)]
    blob = encode_tiff(
        samples, w, h, 1, endian=endian, predictor=True, lzw=True,
        bits=16, rows_per_strip=5,
    )
    lw, lh, rgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    # RGBA's 16-bit path takes the high byte — our decode convention
    exp = bytes((40 + 5 * i) % 256 for i in range(w * h))
    assert _rgba_to_ours(w, h, rgba, 1) == exp
    assert decode_tiff_pixels(blob)[3] == exp


@pytest.mark.parametrize("endian", ["<", ">"])
def test_libtiff_reads_our_16bit_tiles_raw(endian):
    """Tiled 16-bit, direction 1 via TIFFReadEncodedTile (the codec
    layer, bit-exact).  Deliberately NOT via TIFFReadRGBAImage: its
    16-bit grayscale converter corrupts the right-edge tile rows — it
    does so on libtiff's OWN tiled-16 output too (verified while
    building this suite; our decoder reads that same libtiff file
    exactly), so the RGBA path would test the library's bug, not our
    layout."""
    import struct as _s

    w, h = 21, 13
    samples = [((40 + 5 * i) % 256) * 256 + (i % 256) for i in range(w * h)]
    blob = encode_tiff(
        samples, w, h, 1, endian=endian, predictor=True, lzw=True,
        bits=16, tile=(16, 16),
    )
    tiles = _lib_read_tiles(blob, n_tiles=2, tile_bytes=16 * 16 * 2)
    # expected tile contents: full-size zero-padded edge tiles;
    # TIFFReadEncodedTile returns post-codec samples byte-swapped to
    # HOST order (x86: little-endian), predictor already undone
    for ti, x0 in enumerate((0, 16)):
        exp_tile = []
        for r in range(16):
            for cx in range(16):
                x, y = x0 + cx, r
                exp_tile.append(
                    samples[y * w + x] if (x < w and y < h) else 0
                )
        got = tiles[ti * 512 : (ti + 1) * 512]
        assert got == _s.pack("<256H", *exp_tile), (endian, ti)
    exp = bytes((40 + 5 * i) % 256 for i in range(w * h))
    assert decode_tiff_pixels(blob)[3] == exp


def test_libtiff_reads_our_planar_and_whitezero():
    w, h = 21, 13
    rgb = _rgb8(w, h)
    blob = encode_tiff(rgb, w, h, 3, planar=True, lzw=True, predictor=True)
    lw, lh, rgba = _lib_read_rgba(blob)
    assert _rgba_to_ours(w, h, rgba, 3) == rgb
    g = _gray8(w, h)
    wiz = encode_tiff(g, w, h, 1, white_is_zero=True)
    lw, lh, rgba = _lib_read_rgba(wiz)
    # RGBA inverts WhiteIsZero, same as our decoder
    assert _rgba_to_ours(w, h, rgba, 1) == g


def test_libtiff_reads_our_8bit_tiled():
    w, h = 21, 13
    for comp in ({}, {"lzw": True}, {"deflate": True}):
        for ch in (1, 3):
            px = _gray8(w, h) if ch == 1 else _rgb8(w, h)
            blob = encode_tiff(px, w, h, ch, tile=(16, 16),
                               predictor="lzw" in comp, **comp)
            lw, lh, rgba = _lib_read_rgba(blob)
            assert _rgba_to_ours(w, h, rgba, ch) == px


# ------------------------------------------------------------------ #
# direction 2: OUR decoder reads libtiff-written files — bit-exact
# ------------------------------------------------------------------ #


@pytest.mark.parametrize(
    "comp,pred",
    [(1, False), (5, True), (32773, False), (8, True)],
)
@pytest.mark.parametrize("ch", [1, 3])
def test_our_decoder_reads_libtiff_8bit_strips(comp, pred, ch):
    w, h = 21, 13
    px = _gray8(w, h) if ch == 1 else _rgb8(w, h)
    photo = 1 if ch == 1 else 2
    blob = _lib_write(w, h, ch, 8, comp, pred, None, photo, px)
    assert decode_tiff_pixels(blob) == (w, h, ch, px)


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("comp,pred", [(5, True), (8, False)])
def test_our_decoder_reads_libtiff_16bit(tiled, comp, pred):
    import struct as _s

    w, h = 21, 13
    vals = [((40 + 5 * i) % 256) * 256 + (i % 256) for i in range(w * h)]
    samples = _s.pack("<" + "H" * len(vals), *vals)  # x86 native order
    blob = _lib_write(
        w, h, 1, 16, comp, pred, (16, 16) if tiled else None, 1, samples
    )
    exp = bytes((40 + 5 * i) % 256 for i in range(w * h))
    assert decode_tiff_pixels(blob) == (w, h, 1, exp)


def test_our_decoder_reads_libtiff_8bit_tiled():
    w, h = 21, 13
    for comp, pred in ((1, False), (5, True), (8, False)):
        for ch in (1, 3):
            px = _gray8(w, h) if ch == 1 else _rgb8(w, h)
            photo = 1 if ch == 1 else 2
            blob = _lib_write(w, h, ch, 8, comp, pred, (16, 16), photo, px)
            assert decode_tiff_pixels(blob) == (w, h, ch, px)


# ------------------------------------------------------------------ #
# JPEG-in-TIFF (Compression 7, round 13)
# ------------------------------------------------------------------ #


def _close(a: bytes, b: bytes, tol: int, mean_tol: float = 1.0):
    import numpy as np

    xa = np.frombuffer(a, dtype=np.uint8).astype(np.int16)
    xb = np.frombuffer(b, dtype=np.uint8).astype(np.int16)
    d = np.abs(xa - xb)
    assert d.max() <= tol, f"max pixel diff {d.max()} > {tol}"
    assert d.mean() <= mean_tol, (
        f"mean pixel diff {d.mean():.2f} > {mean_tol}")


@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("shared", [False, True])
def test_libtiff_reads_our_jpeg_in_tiff(ch, shared):
    """Direction 1: libtiff's JPEG codec (its libjpeg) decodes our
    compression-7 strips, both self-contained and shared-JPEGTables
    forms; 4:4:4 fixtures so only IDCT rounding differs."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_tiff_jpeg,
    )

    w, h = 21, 19
    if ch == 1:
        px = bytes((40 + 2 * (i % w) + 3 * (i // w)) for i in range(w * h))
    else:
        buf = bytearray()
        for y in range(h):
            for x in range(w):
                buf += bytes((40 + 2 * x + y, 200 - x - 2 * y,
                              30 + x + 3 * y))
        px = bytes(buf)
    blob = encode_tiff_jpeg(px, w, h, ch, quality=90, rows_per_strip=8,
                            shared_tables=shared)
    lw, lh, rgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    ours = decode_tiff_pixels(blob)
    assert (ours[0], ours[1], ours[2]) == (w, h, ch)
    _close(_rgba_to_ours(w, h, rgba, ch), ours[3], tol=3 if ch == 1 else 4)


@pytest.mark.parametrize("ch", [1, 3])
def test_our_decoder_reads_libtiff_jpeg_in_tiff(ch):
    """Direction 2: libtiff WRITES compression-7 (JPEGTables +
    abbreviated strips, photometric YCbCr for color) and our decoder
    must agree with libtiff's own read of the same lossy file."""
    w, h = 21, 19
    if ch == 1:
        px = bytes((40 + 2 * (i % w) + 3 * (i // w)) for i in range(w * h))
    else:
        buf = bytearray()
        for y in range(h):
            for x in range(w):
                buf += bytes((40 + 2 * x + y, 200 - x - 2 * y,
                              30 + x + 3 * y))
        px = bytes(buf)
    photo = 1 if ch == 1 else 6
    blob = _lib_write(w, h, ch, 8, 7, False, None, photo, px)
    ow, oh, oc, opx = decode_tiff_pixels(blob)
    assert (ow, oh, oc) == (w, h, ch)
    lw, lh, rgba = _lib_read_rgba(blob)
    _close(opx, _rgba_to_ours(w, h, rgba, ch), tol=3 if ch == 1 else 4)


@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("shared", [False, True])
def test_libtiff_reads_our_tiled_jpeg_in_tiff(ch, shared):
    """Round 14 direction 1: libtiff decodes OUR tiled compression-7
    files (tags 322-325, full-size padded edge tiles), self-contained
    and shared-JPEGTables forms."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff_jpeg,
    )

    w, h = 37, 29
    if ch == 1:
        px = bytes((40 + 2 * (i % w) + 3 * (i // w)) % 256
                   for i in range(w * h))
    else:
        buf = bytearray()
        for y in range(h):
            for x in range(w):
                buf += bytes(((40 + 2 * x + y) % 256,
                              (200 - x - 2 * y) % 256,
                              (30 + x + 3 * y) % 256))
        px = bytes(buf)
    blob = encode_tiff_jpeg(px, w, h, ch, quality=90, tile=(16, 16),
                            shared_tables=shared)
    lw, lh, rgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    ours = decode_tiff_pixels(blob)
    assert (ours[0], ours[1], ours[2]) == (w, h, ch)
    _close(_rgba_to_ours(w, h, rgba, ch), ours[3], tol=3 if ch == 1 else 4)


def test_libtiff_reads_our_rgb_photometric_jpeg_in_tiff():
    """Round 14 direction 1: libtiff decodes OUR photometric-2 file
    ('R','G','B'-component streams, no color transform) — its libjpeg
    recognizes the component ids exactly as ours does."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff_jpeg,
    )

    w, h = 21, 19
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf += bytes(((40 + 2 * x + y) % 256, (200 - x - 2 * y) % 256,
                          (30 + x + 3 * y) % 256))
    px = bytes(buf)
    blob = encode_tiff_jpeg(px, w, h, 3, quality=95, photometric_rgb=True)
    lw, lh, rgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    ours = decode_tiff_pixels(blob)
    _close(_rgba_to_ours(w, h, rgba, 3), ours[3], tol=2)
    # and the RGB path really skipped the chroma matrix
    _close(px, ours[3], tol=1)


@pytest.mark.parametrize("photo,ch,tol", [(1, 1, 3), (6, 3, 12), (2, 3, 2)])
def test_our_decoder_reads_libtiff_tiled_jpeg_in_tiff(photo, ch, tol):
    """Round 14 direction 2: libtiff WRITES tiled compression-7 files
    (16x16 tiles; photometric gray / YCbCr / RGB) and our decoder must
    agree with libtiff's own read of the same lossy file.  The YCbCr
    tolerance is wider: libtiff's tiles are 4:2:0 (YCBCRSUBSAMPLING
    default 2,2) and libjpeg applies FANCY (triangular) chroma
    upsampling while ours replicates — a bounded filter difference,
    not a decode defect (the mean-diff <= 1.0 bound still holds)."""
    w, h = 37, 29
    if ch == 1:
        px = bytes((40 + 2 * (i % w) + 3 * (i // w)) % 256
                   for i in range(w * h))
    else:
        buf = bytearray()
        for y in range(h):
            for x in range(w):
                buf += bytes(((40 + 2 * x + y) % 256,
                              (200 - x - 2 * y) % 256,
                              (30 + x + 3 * y) % 256))
        px = bytes(buf)
    blob = _lib_write(w, h, ch, 8, 7, False, (16, 16), photo, px)
    lw, lh, rgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    ours = decode_tiff_pixels(blob)
    assert (ours[0], ours[1], ours[2]) == (w, h, ch)
    # mean 1.5: the replication-vs-fancy chroma difference shifts
    # every 4:2:0 pixel on a gradient by ~1, not just the edges
    _close(_rgba_to_ours(w, h, rgba, ch), ours[3], tol=tol,
           mean_tol=1.5 if photo == 6 else 1.0)


def test_our_decoder_reads_libtiff_rgb_photometric_strips():
    """Round 14 direction 2: libtiff writes photometric-2 strips
    (JPEGCOLORMODE off — raw RGB through its libjpeg) and our decoder
    agrees with libtiff's read."""
    w, h = 21, 19
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf += bytes(((40 + 2 * x + y) % 256, (200 - x - 2 * y) % 256,
                          (30 + x + 3 * y) % 256))
    px = bytes(buf)
    blob = _lib_write(w, h, 3, 8, 7, False, None, 2, px)
    lw, lh, rgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    ours = decode_tiff_pixels(blob)
    assert (ours[0], ours[1], ours[2]) == (w, h, 3)
    _close(_rgba_to_ours(w, h, rgba, 3), ours[3], tol=2)


def test_our_decoder_reads_libtiff_tiled_planar():
    """Round 14: libtiff writes PLANARCONFIG_SEPARATE tiles
    (plane-major, single-sample) and our decoder must reproduce the
    pixels bit-exactly (lossless codecs)."""
    w, h = 21, 13
    px = _rgb8(w, h)
    for comp, pred in ((1, False), (5, True), (8, False)):
        blob = _lib_write(w, h, 3, 8, comp, pred, (16, 16), 2, px,
                          planar=2)
        assert decode_tiff_pixels(blob) == (w, h, 3, px), (comp, pred)


def test_libtiff_reads_our_tiled_planar():
    """Round 14 direction 1: libtiff decodes OUR planar tiles —
    bit-exact via TIFFReadRGBAImage."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_tiff,
    )

    w, h = 21, 13
    px = _rgb8(w, h)
    for kwargs in (dict(), dict(lzw=True, predictor=True),
                   dict(deflate=True)):
        blob = encode_tiff(px, w, h, 3, planar=True, tile=(16, 16),
                           **kwargs)
        lw, lh, rgba = _lib_read_rgba(blob)
        assert (lw, lh) == (w, h)
        assert _rgba_to_ours(w, h, rgba, 3) == px, kwargs


def test_our_decoder_reads_libtiff_tiled_planar_jpeg():
    """Round 15 direction 2: libtiff WRITES tiled PLANARCONFIG_SEPARATE
    compression-7 (photometric-2 RGB — each plane's tiles are
    single-component JPEG streams, plane-major) and our decoder must
    agree with libtiff's own read of the same lossy file."""
    w, h = 37, 29
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf += bytes(((40 + 2 * x + y) % 256, (200 - x - 2 * y) % 256,
                          (30 + x + 3 * y) % 256))
    px = bytes(buf)
    blob = _lib_write(w, h, 3, 8, 7, False, (16, 16), 2, px, planar=2)
    ow, oh, oc, opx = decode_tiff_pixels(blob)
    assert (ow, oh, oc) == (w, h, 3)
    lw, lh, rgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    _close(opx, _rgba_to_ours(w, h, rgba, 3), tol=2)


@pytest.mark.parametrize("shared", [False, True])
def test_libtiff_reads_our_tiled_planar_jpeg(shared):
    """Round 15 direction 1: libtiff decodes OUR planar-tiled
    compression-7 files (single-component streams per plane,
    self-contained and shared-JPEGTables forms) and agrees with our
    decode AND the source."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_tiff_jpeg,
    )

    w, h = 37, 29
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf += bytes(((40 + 2 * x + y) % 256, (200 - x - 2 * y) % 256,
                          (30 + x + 3 * y) % 256))
    px = bytes(buf)
    blob = encode_tiff_jpeg(px, w, h, 3, quality=95, photometric_rgb=True,
                            tile=(16, 16), planar=True,
                            shared_tables=shared)
    lw, lh, rgba = _lib_read_rgba(blob)
    assert (lw, lh) == (w, h)
    lib = _rgba_to_ours(w, h, rgba, 3)
    ours = decode_tiff_pixels(blob)
    assert (ours[0], ours[1], ours[2]) == (w, h, 3)
    _close(lib, ours[3], tol=2)
    _close(px, ours[3], tol=2)


def _lib_write_planar_ycbcr(w, h, tw, th, hs, vs, planes: bytes) -> bytes:
    import tempfile

    path = tempfile.mktemp(suffix=".tif")
    try:
        r = subprocess.run(
            [sys.executable, "-c", _HELPER, "writepycc", path,
             str(w), str(h), str(tw), str(th), str(hs), str(vs)],
            input=base64.b64encode(planes),
            capture_output=True, timeout=120,
        )
        assert r.returncode == 0, f"libtiff pycc write failed: {r.stderr!r}"
        return open(path, "rb").read()
    finally:
        if os.path.exists(path):
            os.unlink(path)


def _ycc_planes(px: bytes, w, h, hs, vs):
    """RGB bytes -> (Y plane, box-downsampled Cb/Cr planes, expected
    RGB reconstruction) under the repo's own conventions — the shared
    fixture both separated-YCbCr interop directions compare against."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.jpeg import (
        rgb_to_ycbcr, ycbcr_to_rgb,
    )

    rgb = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(np.float64)
    ycc = np.clip(np.round(rgb_to_ycbcr(rgb)), 0, 255).astype(np.uint8)
    cw, ch = -(-w // hs), -(-h // vs)
    chroma = []
    for cc in (1, 2):
        p = np.pad(ycc[..., cc].astype(np.float64),
                   ((0, ch * vs - h), (0, cw * hs - w)), mode="edge")
        d = p.reshape(ch, vs, cw, hs).mean(axis=(1, 3))
        chroma.append(np.clip(np.round(d), 0, 255).astype(np.uint8))
    up = [ycc[..., 0].astype(np.float64)]
    for cp in chroma:
        up.append(np.repeat(np.repeat(cp.astype(np.float64), vs, axis=0),
                            hs, axis=1)[:h, :w])
    expect = np.clip(np.round(ycbcr_to_rgb(np.stack(up, axis=-1))),
                     0, 255).astype(np.uint8).tobytes()
    return ycc[..., 0].tobytes(), chroma[0].tobytes(), chroma[1].tobytes(), \
        (cw, ch), expect


def test_our_decoder_reads_libtiff_separated_ycbcr_jpeg():
    """Round 16 direction 2 (the r15 'loud until a real producer'
    guard): libtiff WRITES tiled separated-YCbCr compression-7 files —
    full-grid plane-major numbering, chroma planes at ceil(w/hs) ×
    ceil(h/vs) in ceil(tw/hs) × ceil(th/vs) single-component streams
    (its RGBA reader refuses the layout, so ground truth is the source
    planes themselves through the shared reconstruction fixture;
    libtiff's JPEG codec is the independent encoder)."""
    w, h = 37, 29
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf += bytes(((40 + 2 * x + y) % 256, (200 - x - 2 * y) % 256,
                          (30 + x + 3 * y) % 256))
    px = bytes(buf)
    for hs, vs in ((2, 2), (1, 1), (2, 1)):
        yp, cb, cr, _cdims, expect = _ycc_planes(px, w, h, hs, vs)
        blob = _lib_write_planar_ycbcr(w, h, 16, 16, hs, vs, yp + cb + cr)
        ow, oh, oc, opx = decode_tiff_pixels(blob)
        assert (ow, oh, oc) == (w, h, 3)
        # only libtiff's libjpeg loss separates the two reconstructions
        _close(expect, opx, tol=4)


@pytest.mark.parametrize("shared", [False, True])
def test_libtiff_reads_our_separated_ycbcr_jpeg(shared):
    """Round 16 direction 1: libtiff's codec layer (TIFFReadEncodedTile
    — its libjpeg) decodes every tile of OUR separated-YCbCr files:
    6 luma tiles at 16×16 and 12 chroma tiles at 8×8 (returned at the
    full-tile stride with zero pad, as its codec emits them)."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_tiff_jpeg,
    )

    w, h, tw, th, hs, vs = 37, 29, 16, 16, 2, 2
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf += bytes(((40 + 2 * x + y) % 256, (200 - x - 2 * y) % 256,
                          (30 + x + 3 * y) % 256))
    px = bytes(buf)
    blob = encode_tiff_jpeg(px, w, h, 3, quality=95, tile=(tw, th),
                            planar=True, shared_tables=shared)
    yp, cb, cr, (cw, ch), _expect = _ycc_planes(px, w, h, hs, vs)
    ta, td = -(-w // tw), -(-h // th)
    raw = _lib_read_tiles(blob, 3 * ta * td, tw * th)
    ctw, cth = tw // hs, th // vs
    for pi, (pl, pw, ph, ptw, pth) in enumerate([
        (yp, w, h, tw, th), (cb, cw, ch, ctw, cth),
        (cr, cw, ch, ctw, cth),
    ]):
        for gy in range(td):
            for gx in range(ta):
                tile = raw[(pi * ta * td + gy * ta + gx) * tw * th :]
                got, want = [], []
                for r in range(min(pth, ph - gy * pth)):
                    for c in range(min(ptw, pw - gx * ptw)):
                        # libtiff returns tile rows at the FULL tile
                        # stride (tw) for every plane
                        got.append(tile[r * tw + c])
                        want.append(
                            pl[(gy * pth + r) * pw + gx * ptw + c]
                        )
                d = np.abs(np.array(got, np.int16) -
                           np.array(want, np.int16))
                assert d.max() <= 4 and d.mean() <= 1.5, (
                    pi, gy, gx, d.max(), d.mean(),
                )
