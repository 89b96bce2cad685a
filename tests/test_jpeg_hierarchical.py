"""Hierarchical lossless JPEG (Annex J: DHP/EXP + SOF7/SOF15
differential frames over an SOF3/SOF11 base) — round 16.

Verification posture (the SOF11 one, stated in operators/jpeg.py):
libjpeg-turbo has NO Annex-J support at all (refusal-pinned below), so
no cross-implementation stream exists; correctness rests on exact
roundtrips across levels/dims/entropy-layers/restarts/precisions, the
ceil-pyramid odd-dimension trim, and structural checks that the
streams really are multi-frame pyramids (marker census)."""

from __future__ import annotations

import random

import pytest

from syslog_handler_with_clickhouse_spark.operators.jpeg import (
    _exp_upsample,
    decode_jpeg_pixels,
    encode_jpeg_hierarchical,
)


def _img(w, h, c=1, precision=8, seed=7):
    rng = random.Random(seed)
    return [rng.randint(0, (1 << precision) - 1) for _ in range(w * h * c)]


def _markers(b: bytes) -> list[int]:
    out, i = [], 0
    while i < len(b) - 1:
        if b[i] == 0xFF and b[i + 1] not in (0x00,) and not (
            0xD0 <= b[i + 1] <= 0xD7
        ):
            out.append(b[i + 1])
        i += 1
    return out


@pytest.mark.parametrize("levels", [1, 2, 3, 4])
def test_roundtrip_levels(levels):
    w, h = 21, 17  # odd dims at every pyramid level
    img = _img(w, h, seed=levels)
    got = decode_jpeg_pixels(
        encode_jpeg_hierarchical(img, w, h, 1, levels=levels)
    )
    assert got == (w, h, 1, bytes(img))


@pytest.mark.parametrize("arith", [False, True])
def test_roundtrip_color_both_entropy_layers(arith):
    w, h = 13, 9
    img = _img(w, h, c=3, seed=3)
    b = encode_jpeg_hierarchical(img, w, h, 3, levels=3, arith=arith)
    assert decode_jpeg_pixels(b) == (w, h, 3, bytes(img))
    ms = _markers(b)
    assert ms.count(0xDE) == 1  # one DHP
    assert ms.count(0xDF) == 2  # one EXP per differential frame
    if arith:
        assert ms.count(0xCB) == 1 and ms.count(0xCF) == 2
    else:
        assert ms.count(0xC3) == 1 and ms.count(0xC7) == 2


def test_roundtrip_restarts_and_precisions():
    for prec in (8, 12, 16):
        w, h = 14, 10
        img = _img(w, h, precision=prec, seed=prec)
        shift = max(0, prec - 8)
        want = bytes((v >> shift) & 0xFF for v in img)
        for arith in (False, True):
            got = decode_jpeg_pixels(
                encode_jpeg_hierarchical(
                    img, w, h, 1, levels=3, precision=prec,
                    restart_interval=7, arith=arith,
                )
            )
            assert got == (w, h, 1, want), (prec, arith)


def test_degenerate_dims():
    for (w, h) in ((1, 1), (7, 1), (1, 6), (2, 2)):
        img = _img(w, h, seed=w * 10 + h)
        got = decode_jpeg_pixels(
            encode_jpeg_hierarchical(img, w, h, 1, levels=3)
        )
        assert got == (w, h, 1, bytes(img))


def test_exp_upsample_filter_exact():
    # J.1.1.2: even outputs copy, odd outputs (a + b + 1) >> 1, edge
    # repeats the last sample
    plane = [[0, 10], [20, 30]]
    assert _exp_upsample(plane, 1, 0) == [[0, 5, 10, 10], [20, 25, 30, 30]]
    assert _exp_upsample(plane, 0, 1) == [[0, 10], [10, 20], [20, 30],
                                          [20, 30]]
    both = _exp_upsample(plane, 1, 1)
    assert both[0] == [0, 5, 10, 10]
    assert both[1] == [10, 15, 20, 20]  # rounded midpoints
    assert len(both) == 4 and all(len(r) == 4 for r in both)


def test_seeded_noise_stress():
    rng = random.Random(99)
    for trial in range(4):
        w = rng.randint(1, 24)
        h = rng.randint(1, 20)
        c = rng.choice([1, 3])
        prec = rng.choice([8, 12, 16])
        levels = rng.randint(1, 4)
        arith = rng.choice([False, True])
        img = [rng.randint(0, (1 << prec) - 1) for _ in range(w * h * c)]
        shift = max(0, prec - 8)
        want = bytes((v >> shift) & 0xFF for v in img)
        got = decode_jpeg_pixels(
            encode_jpeg_hierarchical(
                img, w, h, c, levels=levels, precision=prec, arith=arith,
                predictor=rng.randint(1, 7),
            )
        )
        assert got == (w, h, c, want), (trial, w, h, c, prec, levels, arith)


def test_differential_frame_outside_dhp_rejected():
    # a flat SOF3 stream relabeled SOF7: a differential frame with no
    # DHP supplies no reference to difference against — refused loudly
    from syslog_handler_with_clickhouse_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    b = bytearray(encode_jpeg_lossless(_img(8, 8), 8, 8, 1))
    i = bytes(b).find(b"\xff\xc3")
    assert i > 0
    for marker in (0xC7, 0xCF):
        b[i + 1] = marker
        with pytest.raises(ValueError, match="outside a hierarchical"):
            decode_jpeg_pixels(bytes(b))


def test_relabelled_differential_frames_are_corrupt_not_unsupported():
    """Round 16 closed the SOF6/SOF14 guard: every differential DCT
    frame kind (sequential SOF5/SOF13 AND progressive SOF6/SOF14) is
    now supported, so relabelling the lossless BASE frame as one is
    structurally corrupt — a differential frame before any reference —
    not a NotImplementedError."""
    b = bytearray(encode_jpeg_hierarchical(_img(8, 8), 8, 8, 1, levels=2))
    i = bytes(b).find(b"\xff\xc3")
    assert i > 0
    for marker in (0xC5, 0xCD, 0xC6, 0xCE):
        b[i + 1] = marker
        with pytest.raises(ValueError, match="before any reference"):
            decode_jpeg_pixels(bytes(b))


@pytest.mark.parametrize("arith", [False, True])
def test_dct_pyramid_exact_with_lossless_final(arith):
    """The classic Annex-J progression: lossy DCT base (SOF0/SOF9) +
    lossy DCT differential middles (SOF5/SOF13) + a LOSSLESS final
    differential — the encoder closes the loop through the decoder's
    own reconstruction, so the overall decode is bit-exact even though
    the intermediate frames are lossy, in BOTH entropy layers."""
    rng = random.Random(31)
    for (w, h, c, levels, q, dct_base, rst) in [
        (16, 16, 1, 3, 85, False, 0),
        (21, 17, 1, 4, 50, True, 0),
        (13, 9, 3, 3, 85, True, 5),
        (24, 24, 1, 2, 85, True, 0),  # DCT base + lossless final only
    ]:
        img = [
            min(255, (x * 3 + y * 5 + ch * 7 + rng.randint(0, 9)) % 256)
            for y in range(h) for x in range(w) for ch in range(c)
        ]
        b = encode_jpeg_hierarchical(
            img, w, h, c, levels=levels, dct_quality=q,
            dct_base=dct_base, restart_interval=rst, arith=arith,
        )
        assert decode_jpeg_pixels(b) == (w, h, c, bytes(img)), (
            w, h, c, levels, q, dct_base, rst, arith,
        )
        ms = _markers(b)
        base_m, diff_m, final_m = (
            (0xC9, 0xCD, 0xCF) if arith else (0xC0, 0xC5, 0xC7)
        )
        if dct_base:
            assert ms.count(base_m) == 1  # non-differential DCT base
        if levels > 2:
            assert ms.count(diff_m) == levels - 2  # DCT differentials
        assert ms.count(final_m) == 1  # exactly one lossless final
        assert ms.count(0xDB) == 1  # one DQT


def test_dct_pyramid_intermediate_frames_really_lossy():
    """The middle DCT frames must actually quantize (otherwise the
    'lossy progression' is vacuous): at a harsh quality the residual
    the final lossless frame carries is nonzero — pinned by comparing
    stream composition, then exactness anyway."""
    rng = random.Random(77)
    w, h = 24, 24
    img = [rng.randint(0, 255) for _ in range(w * h)]  # noise: worst case
    b_lossy = encode_jpeg_hierarchical(img, w, h, 1, levels=3,
                                       dct_quality=10, dct_base=True)
    b_lossless = encode_jpeg_hierarchical(img, w, h, 1, levels=3)
    # both decode exactly...
    assert decode_jpeg_pixels(b_lossy) == (w, h, 1, bytes(img))
    assert decode_jpeg_pixels(b_lossless) == (w, h, 1, bytes(img))
    # ...but the lossy pyramid's early frames are DCT-coded
    assert 0xC0 in _markers(b_lossy) and 0xC5 in _markers(b_lossy)


def test_truncated_pyramid_rejected():
    """A stream whose frames stop below the DHP's declared resolution
    must be refused, not silently returned small."""
    import struct

    b = bytearray(encode_jpeg_hierarchical(_img(8, 8), 8, 8, 1, levels=2))
    dhp = bytes(b).find(b"\xff\xde")
    # declare a larger full resolution than the frames reach
    struct.pack_into(">H", b, dhp + 7, 16)  # height field of DHP
    with pytest.raises(ValueError, match="ended at"):
        decode_jpeg_pixels(bytes(b))


def test_system_libjpeg_rejects_hierarchical():
    """Refusal pin for the verification posture: libjpeg-turbo has no
    Annex-J support; if this starts passing, build the interop lane."""
    import base64
    import subprocess
    import sys

    from tests import _libjpeg_harness as hj

    if not hj.available():  # pragma: no cover - env-gated
        pytest.skip("system libjpeg not present")
    stream = encode_jpeg_hierarchical(_img(8, 8), 8, 8, 1, levels=2)
    r = subprocess.run(
        [sys.executable, "-c", hj._HELPER, "decode"],
        input=base64.b64encode(stream).decode(),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode != 0, (
        "system libjpeg now decodes hierarchical JPEG — add interop"
    )


def test_probe_media_reports_full_resolution():
    """probe_media must report the DHP's FULL dims, not the reduced
    base frame's (the DHP precedes the first SOF and wins)."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        probe_media,
    )

    b = encode_jpeg_hierarchical(_img(21, 17), 21, 17, 1, levels=3)
    assert probe_media(b) == ("jpeg", 21, 17, None, None)


# -- progressive frames inside DHP (SOF2/SOF6/SOF10/SOF14, round 16) --


@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("successive", [False, True])
def test_progressive_differential_roundtrip(arith, successive):
    """SOF6 (Huffman) / SOF14 (arithmetic) progressive differential
    middles with a lossless final frame: the scan script only reorders
    coefficient delivery, so the closed-loop guarantee holds — decode
    is bit-exact, in both entropy layers, with and without the
    successive-approximation axis."""
    for (w, h, c, seed) in [(21, 13, 1, 1), (16, 16, 3, 2), (7, 5, 1, 3),
                            (33, 9, 3, 4)]:
        img = _img(w, h, c=c, seed=seed)
        b = encode_jpeg_hierarchical(
            img, w, h, c, levels=3, dct_quality=70,
            progressive=True, successive=successive, arith=arith,
        )
        assert decode_jpeg_pixels(b) == (w, h, c, bytes(img))
        ms = _markers(b)
        assert ms.count(0xCE if arith else 0xC6) == 1  # one middle
        # base stays lossless (SOF3/SOF11), final lossless differential
        assert ms.count(0xCB if arith else 0xC3) == 1
        assert ms.count(0xCF if arith else 0xC7) == 1


@pytest.mark.parametrize("arith", [False, True])
def test_progressive_dct_base_inside_dhp(arith):
    """dct_base + progressive: the base frame is SOF2/SOF10 INSIDE the
    DHP stream — previously a loud guard, now a supported frame."""
    w, h = 24, 17
    img = _img(w, h, seed=9)
    b = encode_jpeg_hierarchical(
        img, w, h, 1, levels=3, dct_quality=70,
        progressive=True, dct_base=True, arith=arith,
    )
    assert decode_jpeg_pixels(b) == (w, h, 1, bytes(img))
    ms = _markers(b)
    assert ms.count(0xCA if arith else 0xC2) == 1  # progressive base
    assert ms.count(0xCE if arith else 0xC6) == 1  # progressive middle
    assert ms.count(0xCF if arith else 0xC7) == 1  # lossless final


@pytest.mark.parametrize("arith", [False, True])
def test_progressive_restart_intervals(arith):
    """RSTn inside every progressive scan kind (DC/AC first and the
    refinement scans): per-scan modulo-8 counts, predictor/EOB-run and
    QM statistics resets."""
    w, h = 29, 23
    img = _img(w, h, c=3, seed=11)
    b = encode_jpeg_hierarchical(
        img, w, h, 3, levels=3, dct_quality=60, progressive=True,
        successive=True, restart_interval=3, arith=arith,
    )
    assert decode_jpeg_pixels(b) == (w, h, 3, bytes(img))


def test_successive_scan_census():
    """A successive progressive frame carries 2(1+channels) scans: DC
    first + per-component AC first + DC refine + per-component AC
    refine; the whole 3-level gray pyramid then holds 1 (base SOS) +
    4 (SOF6 frame) + 1 (final SOS) SOS markers."""
    img = _img(16, 16, seed=13)
    b = encode_jpeg_hierarchical(
        img, 16, 16, 1, levels=3, dct_quality=70,
        progressive=True, successive=True,
    )
    assert _markers(b).count(0xDA) == 6


def test_sof2_in_dhp_decode_equals_flat_progressive():
    """A single-frame DHP pyramid whose base is SOF2 at quality q must
    decode bit-identically to the FLAT SOF2 stream of the same pixels
    at the same quality — same quantizer, same coefficients, same
    reconstruction path."""
    from syslog_handler_with_clickhouse_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    w, h = 24, 17
    img = _img(w, h, seed=15)
    hier = encode_jpeg_hierarchical(
        img, w, h, 1, levels=1, dct_quality=70,
        progressive=True, dct_base=True,
    )
    flat = encode_jpeg_progressive(bytes(img), w, h, 1, quality=70)
    assert decode_jpeg_pixels(hier) == decode_jpeg_pixels(flat)


def test_progressive_validation():
    img = _img(8, 8)
    with pytest.raises(ValueError, match="progressive requires"):
        encode_jpeg_hierarchical(img, 8, 8, 1, progressive=True)
    with pytest.raises(ValueError, match="successive requires"):
        encode_jpeg_hierarchical(
            img, 8, 8, 1, dct_quality=70, successive=True
        )
