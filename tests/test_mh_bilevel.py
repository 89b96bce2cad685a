"""T.4 Modified-Huffman bilevel codecs (round 16): TIFF compression 2
(COMPRESSION_CCITTRLE) + 1-bit TIFF strips, and the OS/2 2.x
Huffman-1D BMP (compression 3 under the v2 short header) — all three
share the `_MH_*` code tables, which the libtiff interop below
verifies against a real implementation in BOTH directions."""

from __future__ import annotations

import base64
import os
import random
import subprocess
import sys
import tempfile

import pytest

from syslog_handler_with_clickhouse_spark.operators.multimodal import (
    _MH_DEC,
    _mh_decode_row,
    _mh_encode_row,
    decode_bmp_pixels,
    decode_tiff_pixels,
    encode_bmp_huffman1d,
    encode_tiff_bilevel,
)

LIBTIFF = "/usr/lib/x86_64-linux-gnu/libtiff.so.6"


def _bits(w, h, seed, p=3):
    rng = random.Random(seed)
    return [1 if rng.randrange(p) == 0 else 0 for _ in range(w * h)]


def test_mh_tables_prefix_free():
    """A transcription error in the published T.4 constants usually
    breaks prefix-freeness — every (color, code) set must be a prefix
    code over its 104 entries (64 terminating + 27 makeup + 13 ext)."""
    for color, d in _MH_DEC.items():
        assert len(d) == 104, color
        codes = sorted(d)
        for c in codes:
            assert not any(
                c2 != c and c2.startswith(c) for c2 in codes
            ), (color, c)


def test_mh_row_roundtrip_sweep():
    """Every terminating length, the makeup boundaries, the extended
    range and >2560 chaining — plus rows that START black (leading
    zero-length white run)."""
    for runs in (
        [5, 3, 7],
        [0, 10, 2],              # leading black run
        [63, 64, 65, 1],
        [1727, 1, 1728, 1],
        [1792, 2560, 1],
        [2624, 3000, 40],        # chained 2560-makeups
        [0, 1],
        [1],
    ):
        row = []
        color = 0
        for r in runs:
            row.extend([color] * r)
            color = 1 - color
        w = len(row)
        if w == 0:
            continue
        out: list = []
        _mh_encode_row(row, out)
        bits = "".join(out)
        data = bytes(
            int(bits[i : i + 8].ljust(8, "0"), 2)
            for i in range(0, len(bits), 8)
        )
        dec, _ = _mh_decode_row(data, 0, w)
        assert dec == row, runs


@pytest.mark.parametrize("compression", [1, 2])
@pytest.mark.parametrize("photometric", [0, 1])
def test_tiff_bilevel_roundtrip(compression, photometric):
    w, h = 43, 19
    s = _bits(w, h, compression * 10 + photometric)
    for endian in ("<", ">"):
        for rps in (None, 4):
            t = encode_tiff_bilevel(
                s, w, h, compression=compression,
                photometric=photometric, endian=endian,
                rows_per_strip=rps,
            )
            want = bytes(
                (255 * v if photometric == 1 else 255 - 255 * v)
                for v in s
            )
            assert decode_tiff_pixels(t) == (w, h, 1, want)


def test_bmp_huffman1d_roundtrip():
    for (w, h, seed) in ((40, 17, 1), (7, 3, 2), (1, 1, 3), (130, 9, 4),
                         (64, 64, 5)):
        s = _bits(w, h, seed)
        bmp = encode_bmp_huffman1d(s, w, h)
        want = bytes(
            c for v in s for c in ((0, 0, 0) if v else (255, 255, 255))
        )
        assert decode_bmp_pixels(bmp) == (w, h, 3, want), (w, h)


def test_bmp_huffman1d_requires_1bpp():
    bmp = bytearray(encode_bmp_huffman1d(_bits(8, 4, 6), 8, 4))
    bmp[28] = 8  # relabel bpp
    with pytest.raises(ValueError, match="requires 1-bit"):
        decode_bmp_pixels(bytes(bmp))


# ------------------------------------------------------------------ #
# libtiff interop — the cross-implementation verification of the MH
# tables (and of the CCITTRLE row convention) in both directions
# ------------------------------------------------------------------ #

_BILEVEL_HELPER = r"""
import base64, ctypes, sys

lt = ctypes.CDLL("%s")
lt.TIFFOpen.restype = ctypes.c_void_p
lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]

mode = sys.argv[1]
if mode == "write":
    out, w, h, comp, photo = sys.argv[2], *(int(x) for x in sys.argv[3:7])
    data = base64.b64decode(sys.stdin.buffer.read())  # packed rows
    tif = lt.TIFFOpen(out.encode(), b"w")
    assert tif, "TIFFOpen(w) failed"
    t = ctypes.c_void_p(tif)

    def seti(tag, val):
        assert lt.TIFFSetField(t, ctypes.c_uint32(tag), ctypes.c_int(val))

    seti(256, w); seti(257, h); seti(258, 1); seti(277, 1)
    seti(262, photo); seti(259, comp); seti(278, h)
    rb = (w + 7) // 8
    for y in range(h):
        row = ctypes.create_string_buffer(data[y*rb:(y+1)*rb], rb)
        r = lt.TIFFWriteScanline(t, row, ctypes.c_uint32(y), 0)
        assert r == 1, ("scanline", y, r)
    lt.TIFFClose(t)
"""


def _libtiff_write_bilevel(w, h, samples, comp=2, photo=0):
    rb = (w + 7) // 8
    packed = bytearray(h * rb)
    for y in range(h):
        for x in range(w):
            if samples[y * w + x]:
                packed[y * rb + (x >> 3)] |= 0x80 >> (x & 7)
    path = tempfile.mktemp(suffix=".tif")
    try:
        r = subprocess.run(
            [sys.executable, "-c", _BILEVEL_HELPER % LIBTIFF, "write",
             path, str(w), str(h), str(comp), str(photo)],
            input=base64.b64encode(bytes(packed)),
            capture_output=True, timeout=120,
        )
        assert r.returncode == 0, f"libtiff write failed: {r.stderr!r}"
        return open(path, "rb").read()
    finally:
        if os.path.exists(path):
            os.unlink(path)


@pytest.mark.skipif(not os.path.exists(LIBTIFF),
                    reason="system libtiff not present")
@pytest.mark.parametrize("photometric", [0, 1])
def test_libtiff_reads_our_ccittrle(photometric):
    from tests.test_tiff_interop import _lib_read_rgba, _rgba_to_ours

    w, h = 61, 23
    s = _bits(w, h, 41 + photometric)
    t = encode_tiff_bilevel(s, w, h, compression=2,
                            photometric=photometric)
    W, H, rgba = _lib_read_rgba(t)
    assert (W, H) == (w, h)
    want = bytes(
        (255 * v if photometric == 1 else 255 - 255 * v) for v in s
    )
    assert _rgba_to_ours(w, h, rgba, 1) == want


@pytest.mark.skipif(not os.path.exists(LIBTIFF),
                    reason="system libtiff not present")
@pytest.mark.parametrize("comp", [1, 2])
def test_our_decoder_reads_libtiff_bilevel(comp):
    """Direction 2: libtiff WRITES the CCITTRLE (and uncompressed
    1-bit) file; our decoder must reproduce the samples exactly —
    this is the cross-implementation pin on the MH code tables."""
    w, h = 53, 21
    s = _bits(w, h, 77 + comp)
    t = _libtiff_write_bilevel(w, h, s, comp=comp, photo=0)
    want = bytes(255 - 255 * v for v in s)
    assert decode_tiff_pixels(t) == (w, h, 1, want)
