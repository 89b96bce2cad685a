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

from _libjpeg_harness import available, sys_decode, sys_encode

pytestmark = pytest.mark.skipif(
    not available(), reason="system libjpeg62 not present"
)

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
    sw, sh, sc, spx = sys_decode(blob)
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
    sw, sh, sc, spx = sys_decode(blob)
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
    blob = sys_encode(w, h, c, quality, rst, prog, px, arith=True)
    # sanity: it really is an arithmetic frame (SOF9 or SOF10)
    assert (b"\xff\xc9" in blob) or (b"\xff\xca" in blob)
    ow, oh, oc, opx = decode_jpeg_pixels(blob)
    assert (ow, oh, oc) == (w, h, c)
    sw, sh, sc, spx = sys_decode(blob)
    assert (sw, sh, sc) == (w, h, c)
    _close(opx, spx, tol=3 if c == 1 else 4)
