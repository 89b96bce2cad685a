"""Lossless-ARITHMETIC JPEG (SOF11) — round 16, closing the last
lossless-family guard.

Verification posture (and why it differs from the SOF9/SOF10 interop
lane): libjpeg-turbo implements lossless Huffman (SOF3) and DCT
arithmetic (SOF9/10) but ERREXITs on their combination, so NO
cross-implementation SOF11 stream exists in this container — pinned by
the refusal probe below.  Correctness therefore rests on (a) exact
roundtrips over every predictor / precision / restart / point-transform
/ conditioning variant, (b) decoded-pixel equality with the SOF3
Huffman path (both entropy layers are lossless over the SAME
predictions, so decode(SOF11) must equal decode(SOF3) BIT-EXACTLY for
any input), and (c) seeded-noise stress through the deep magnitude
chains (differences to ±32768, the X15 category)."""

from __future__ import annotations

import random

import pytest

from syslog_handler_with_clickhouse_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_lossless,
    encode_jpeg_lossless_arith,
)


def _img(w, h, c=1, precision=8, seed=7):
    rng = random.Random(seed)
    mx = (1 << precision) - 1
    base = [
        min(mx, (x * 3 + y * 5 + ch) % (mx + 1))
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    ]
    # salt with full-range noise so magnitude categories go deep
    for i in range(0, len(base), 3):
        base[i] = rng.randint(0, mx)
    return base


def _decode_ll(samples, w, h, c, **kw):
    return decode_jpeg_pixels(
        encode_jpeg_lossless(samples, w, h, c, **kw)
    )


def _decode_lla(samples, w, h, c, **kw):
    return decode_jpeg_pixels(
        encode_jpeg_lossless_arith(samples, w, h, c, **kw)
    )


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_all_predictors(predictor):
    w, h = 13, 9
    img = _img(w, h)
    got = _decode_lla(img, w, h, 1, predictor=predictor)
    assert got == (w, h, 1, bytes(img))


def test_roundtrip_color_and_sof3_equality():
    w, h = 11, 7
    img = _img(w, h, c=3, seed=11)
    for predictor in (1, 4, 7):
        a = _decode_lla(img, w, h, 3, predictor=predictor)
        b = _decode_ll(img, w, h, 3, predictor=predictor)
        assert a == b == (w, h, 3, bytes(img))


@pytest.mark.parametrize("precision", [4, 12, 16])
def test_roundtrip_deep_precisions_match_sof3(precision):
    w, h = 10, 6
    img = _img(w, h, precision=precision, seed=precision)
    for predictor in (1, 5):
        a = _decode_lla(img, w, h, 1, predictor=predictor,
                        precision=precision)
        b = _decode_ll(img, w, h, 1, predictor=predictor,
                       precision=precision)
        assert a == b
        assert a[:3] == (w, h, 1)


def test_point_transform_matches_sof3():
    w, h = 9, 9
    img = _img(w, h, seed=3)
    a = _decode_lla(img, w, h, 1, point_transform=2)
    b = _decode_ll(img, w, h, 1, point_transform=2)
    assert a == b


@pytest.mark.parametrize("rst", [5, 9, 13])  # row-aligned and not
def test_restart_intervals_roundtrip(rst):
    w, h = 9, 8
    img = _img(w, h, seed=rst)
    got = _decode_lla(img, w, h, 1, predictor=4, restart_interval=rst)
    assert got == (w, h, 1, bytes(img))


def test_nondefault_conditioning_roundtrip():
    w, h = 12, 8
    img = _img(w, h, seed=5)
    for dc_cond in ((0, 0), (2, 5), (0, 15)):
        got = _decode_lla(img, w, h, 1, dc_cond=dc_cond)
        assert got == (w, h, 1, bytes(img))


def test_extreme_differences_hit_x15():
    """Alternating 0 / 65535 at 16-bit precision drives mod-2^16
    differences of ±32767/32768 through the deepest magnitude chain,
    including the no-extra-bits -32768 representative."""
    w, h = 8, 4
    img = [(0 if (x + y) % 2 == 0 else 65535) for y in range(h)
           for x in range(w)]
    # plus one exact +32768 step: 0 -> 32768 (signed -32768 mod 2^16)
    img[1] = 32768
    a = _decode_lla(img, w, h, 1, precision=16)
    b = _decode_ll(img, w, h, 1, precision=16)
    assert a == b


def test_seeded_noise_stress_matches_sof3():
    rng = random.Random(42)
    for trial in range(4):
        w = rng.randint(1, 24)
        h = rng.randint(1, 16)
        c = rng.choice([1, 3])
        prec = rng.choice([8, 12, 16])
        img = [rng.randint(0, (1 << prec) - 1) for _ in range(w * h * c)]
        kw = dict(
            predictor=rng.randint(1, 7),
            precision=prec,
            restart_interval=rng.choice([0, 7]),
        )
        a = decode_jpeg_pixels(
            encode_jpeg_lossless_arith(img, w, h, c, **kw)
        )
        b = decode_jpeg_pixels(encode_jpeg_lossless(img, w, h, c, **kw))
        assert a == b, (trial, w, h, c, kw)


def test_corrupt_stream_raises():
    w, h = 8, 8
    img = _img(w, h)
    b = bytearray(encode_jpeg_lossless_arith(img, w, h, 1))
    sos = bytes(b).find(b"\xff\xda")
    assert sos > 0
    # truncate the entropy data mid-stream: the zero-fed tail decodes
    # to SOMETHING; corrupting the scan header's predictor stays loud
    b2 = bytearray(b)
    b2[sos + 4 + 1 + 2] = 0  # predictor byte (ns=1) -> 0
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg_pixels(bytes(b2))


def test_system_libjpeg_rejects_sof11():
    """The refusal pin for the verification posture in the module
    docstring: the system libjpeg-turbo must REJECT a (valid) SOF11
    stream — if this ever starts passing, the interop lane should be
    extended to cover SOF11 like SOF9/SOF10."""
    import base64
    import subprocess
    import sys

    from tests import _libjpeg_harness as hj

    if not hj.available():  # pragma: no cover - env-gated
        pytest.skip("system libjpeg not present")
    img = _img(8, 8)
    stream = encode_jpeg_lossless_arith(img, 8, 8, 1)
    r = subprocess.run(
        [sys.executable, "-c", hj._HELPER, "decode"],
        input=base64.b64encode(stream).decode(),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode != 0, (
        "system libjpeg now decodes SOF11 — add it to the interop lane"
    )
