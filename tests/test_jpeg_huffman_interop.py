"""Cross-implementation interop for the HUFFMAN JPEG family
(round 13): the same system-libjpeg harness the arithmetic tests use,
now pinning the original baseline (SOF0) and progressive (SOF2)
encoders/decoders against an independent T.81 implementation — until
this round those were verified by self-roundtrip + closed-form
oracles only.

Direction 1: libjpeg decodes our baseline and progressive streams
(4:4:4 and 4:2:0, restart markers, the successive-approximation
script).  Direction 2: our decoder reads libjpeg-encoded Huffman
streams — default Annex K tables AND per-image optimized tables
(optimize_coding), sequential and its standard multi-band progressive
script, with restarts.  Tolerances as in the arithmetic suite:
integer-vs-float IDCT and integer YCbCr rounding only.
"""

from __future__ import annotations

import numpy as np
import pytest

from syslog_handler_with_clickhouse_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg,
    encode_jpeg_progressive,
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


@pytest.mark.parametrize(
    "mode,c,sub,rst",
    [("base", 1, False, 0), ("base", 1, False, 2),
     ("base", 3, False, 0), ("base", 3, True, 3),
     ("prog", 1, False, 0), ("prog", 3, True, 0),
     ("prog_sa", 1, False, 2), ("prog_sa", 3, False, 0)],
)
def test_system_libjpeg_decodes_our_huffman(mode, c, sub, rst):
    w, h = 33, 25
    px = _gray(w, h) if c == 1 else _rgb(w, h)
    if mode == "base":
        blob = encode_jpeg(
            px, w, h, c, quality=90, subsample=sub, restart_interval=rst
        )
    else:
        blob = encode_jpeg_progressive(
            px, w, h, c, quality=90, successive=(mode == "prog_sa"),
            subsample=sub, restart_interval=rst,
        )
    sw, sh, sc, spx = sys_decode(blob)
    assert (sw, sh, sc) == (w, h, c)
    ours = decode_jpeg_pixels(blob)
    assert (ours[0], ours[1], ours[2]) == (w, h, c)
    _close(spx, ours[3], tol=3 if c == 1 else 4)


@pytest.mark.parametrize(
    "c,quality,rst,prog,opt",
    [(1, 90, 0, False, False), (1, 90, 2, False, True),
     (3, 85, 0, False, False), (3, 85, 4, False, True),
     (1, 90, 0, True, False), (3, 85, 0, True, True)],
)
def test_our_decoder_reads_system_huffman(c, quality, rst, prog, opt):
    w, h = 33, 25
    px = _gray(w, h) if c == 1 else _rgb(w, h)
    blob = sys_encode(
        w, h, c, quality, rst, prog, px, arith=False, opt=opt
    )
    assert (b"\xff\xc0" in blob) or (b"\xff\xc2" in blob)
    assert b"\xff\xc4" in blob  # really Huffman (DHT present)
    ow, oh, oc, opx = decode_jpeg_pixels(blob)
    assert (ow, oh, oc) == (w, h, c)
    sw, sh, sc, spx = sys_decode(blob)
    assert (sw, sh, sc) == (w, h, c)
    _close(opx, spx, tol=3 if c == 1 else 4)
