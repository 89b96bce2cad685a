"""Real PNG/WAV decode (stdlib only) — the round-5 verdict's last
'partial' closure.  The encoder/decoder pair is validated three ways:
round-trip across every filter type and channel count, a hand-computed
Paeth example pinned against the PNG spec arithmetic (independent of
the encoder, so a symmetric encode/decode bug cannot hide), and the
distributed decode_assets path over a mixed-media frame."""

from __future__ import annotations

import struct
import zlib

import pytest

from syslog_handler_with_clickhouse_spark.operators.multimodal import (
    decode_assets,
    decode_png_pixels,
    decode_real,
    decode_wav_samples,
    encode_png,
    encode_wav,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    c = typ + data
    return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(channels):
    """encode → decode recovers the exact pixels for every color type,
    with the five filter types cycling across rows (so Sub/Up/Average/
    Paeth reversal is all genuinely exercised, including the first-row
    and first-pixel zero-neighbor cases)."""
    w, h = 13, 11  # odd sizes: stride not a multiple of anything handy
    n = w * h * channels
    pixels = bytes((i * 37 + 11) % 251 for i in range(n))
    filters = [r % 5 for r in range(h)]
    blob = encode_png(pixels, w, h, channels, filters)
    gw, gh, gc, got = decode_png_pixels(blob)
    assert (gw, gh, gc) == (w, h, channels)
    assert got == pixels


def test_png_paeth_row_pinned_against_spec_arithmetic():
    """Hand-built PNG (no encoder involved): a 2×2 grayscale image whose
    scanlines are Paeth-filtered by hand per RFC 2083 §6.6.  Pixels
    [[10,20],[30,45]] filter to [4,10,10] / [4,20,15] — if the decoder's
    predictor or neighbor indexing drifted from the spec, these exact
    bytes would decode to something else."""
    raw = bytes([4, 10, 10, 4, 20, 15])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert decode_png_pixels(blob) == (2, 2, 1, bytes([10, 20, 30, 45]))


def test_png_multiple_idat_chunks_concatenate():
    """The IDAT stream may be split across any number of chunks at any
    byte boundary — the zlib stream spans them."""
    pixels = bytes(range(0, 200, 2))  # 100 bytes
    blob = encode_png(pixels, 10, 10, 1, [1] * 10)
    # re-split its IDAT into 7-byte chunks
    ihdr = struct.pack(">IIBBBBB", 10, 10, 8, 0, 0, 0, 0)
    comp = zlib.compress(
        b"".join(
            bytes([1])
            + bytes(
                (pixels[r * 10 + x] - (pixels[r * 10 + x - 1] if x else 0))
                & 0xFF
                for x in range(10)
            )
            for r in range(10)
        )
    )
    parts = [comp[i : i + 7] for i in range(0, len(comp), 7)]
    blob2 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + b"".join(_chunk(b"IDAT", p) for p in parts)
        + _chunk(b"IEND", b"")
    )
    assert decode_png_pixels(blob2) == decode_png_pixels(blob)


def test_png_crc_mismatch_raises():
    pixels = bytes(64)
    blob = bytearray(encode_png(pixels, 8, 8, 1))
    blob[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png_pixels(bytes(blob))


def test_png_unsupported_features_raise_not_implemented():
    # all legal depths (1/2/4/8/16) now decode; an ILLEGAL depth is
    # corrupt data (ValueError), not a format guard
    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)
    blob2 = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr2) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="depth"):
        decode_png_pixels(blob2)
    # palette (type 3) now decodes — a MISSING PLTE is corrupt, not
    # unsupported; an undefined color type stays a format guard
    ihdr_pal = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    blob_pal = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr_pal) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_pixels(blob_pal)
    ihdr_bad = struct.pack(">IIBBBBB", 2, 2, 8, 5, 0, 0, 0)
    blob_bad = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr_bad) + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="color type"):
        decode_png_pixels(blob_bad)


def test_png_palette_roundtrip():
    """Color type 3: index bytes ride through the filter layer, then
    expand via PLTE to RGB — including Adam7-interlaced palette images
    and an out-of-range index rejection."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_png_palette,
    )

    w, h = 9, 5
    palette = bytes((i * 17 + j * 5) % 256 for i in range(16) for j in range(3))
    indices = bytes((x * 3 + y * 7) % 16 for y in range(h) for x in range(w))
    exp = b"".join(
        palette[3 * i : 3 * i + 3] for i in indices
    )
    for interlace in (False, True):
        blob = encode_png_palette(indices, w, h, palette, interlace=interlace)
        W, H, C, got = decode_png_pixels(blob)
        assert (W, H, C) == (w, h, 3)
        assert got == exp, interlace
    # index beyond the palette -> corrupt stream
    bad = encode_png_palette(bytes([0, 1, 2, 15]), 2, 2, palette[: 3 * 8])
    with pytest.raises(ValueError, match="palette index"):
        decode_png_pixels(bad)


def test_wav_roundtrip_16bit():
    import numpy as np

    samples = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int64)
    blob = encode_wav(samples, 22050, 2)
    rate, channels, bits, got = decode_wav_samples(blob)
    assert (rate, channels, bits) == (22050, 2, 16)
    assert got.tolist() == samples.tolist()


def test_wav_8bit_and_unsupported():
    import numpy as np

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255])
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, bits, got = decode_wav_samples(blob)
    assert (rate, ch, bits) == (8000, 1, 8)
    assert got.tolist() == [0, 128, 255]

    # exotic compressed tags stay guarded (ADPCM pair + G.711 pair now
    # decode — q376/q392/q393); GSM 6.10 (tag 0x31) is still a guard
    fmt_gsm = struct.pack("<HHIIHH", 0x31, 1, 8000, 1625, 65, 0)
    body_f = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_gsm)) + fmt_gsm
    with pytest.raises(NotImplementedError, match="tag"):
        decode_wav_samples(b"RIFF" + struct.pack("<I", len(body_f)) + body_f)


def test_wav_extensible_unwraps_subformat():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE): the real tag lives in the first
    two SubFormat-GUID bytes — PCM16 and float32 payloads wrapped in
    the extensible header must decode identically to the plain forms;
    an unknown subformat stays guarded."""
    import numpy as np

    def ext_blob(subtag, bits, payload):
        guid_tail = bytes.fromhex("000000001000800000aa00389b71")
        fmt = (
            struct.pack("<HHIIHH", 0xFFFE, 2, 44100,
                        44100 * 2 * bits // 8, 2 * bits // 8, bits)
            + struct.pack("<HHI", 22, bits, 3)  # cbSize, valid bits, mask
            + struct.pack("<H", subtag) + guid_tail
        )
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    pcm = np.array([5, -5, 32767, -32768], dtype="<i2")
    rate, ch, bits, got = decode_wav_samples(ext_blob(1, 16, pcm.tobytes()))
    assert (rate, ch, bits) == (44100, 2, 16)
    assert got.tolist() == pcm.astype(np.int64).tolist()
    flt = np.array([0.5, -1.0, 2.25], dtype="<f4")
    rate, ch, bits, got = decode_wav_samples(ext_blob(3, 32, flt.tobytes()))
    assert bits == 32 and got.tolist() == flt.astype(np.float64).tolist()
    with pytest.raises(NotImplementedError, match="tag"):
        decode_wav_samples(ext_blob(0x31, 0, b"\x00\x00"))  # GSM guard


def test_wav_float32_roundtrip():
    """IEEE-float WAV (format tag 3): float32 samples decode exactly
    (float64 out), the everyday DAW-export format."""
    import numpy as np

    samples = np.array([0.0, 0.5, -0.25, 1.0, -1.0, 3.75], dtype=np.float32)
    blob = encode_wav(samples, 48000, 2, fmt="float32")
    rate, ch, bits, got = decode_wav_samples(blob)
    assert (rate, ch, bits) == (48000, 2, 32)
    assert got.dtype == np.float64
    assert got.tolist() == samples.astype(np.float64).tolist()


def test_wav_float64_roundtrip():
    """64-bit IEEE-float WAV (format tag 3, bits 64 — the scientific /
    mastering export, round 16): samples decode EXACTLY (no precision
    step through float32)."""
    import numpy as np

    samples = np.array(
        [0.0, 0.1, -0.25, 1.0, -1.0, 1e-300, 3.141592653589793],
        dtype=np.float64,
    )
    blob = encode_wav(samples, 96000, 1, fmt="float64")
    rate, ch, bits, got = decode_wav_samples(blob)
    assert (rate, ch, bits) == (96000, 1, 64)
    assert got.dtype == np.float64
    assert got.tolist() == samples.tolist()


def test_wav_pcm32_roundtrip():
    """32-bit integer PCM (format tag 1, bits 32, round 16): full-range
    extremes round-trip exactly."""
    import numpy as np

    samples = np.array(
        [0, 1, -1, 2_147_483_647, -2_147_483_648, 1_000_000_007],
        dtype=np.int64,
    )
    blob = encode_wav(samples, 44100, 2, fmt="pcm32")
    rate, ch, bits, got = decode_wav_samples(blob)
    assert (rate, ch, bits) == (44100, 2, 32)
    assert got.tolist() == samples.tolist()


def test_wav_pcm24_roundtrip():
    """Packed 24-bit PCM: 3-byte little-endian signed samples widen via
    the vectorized pad-and-shift (no per-sample loop); full range incl.
    the extremes round-trips."""
    import numpy as np

    samples = np.array(
        [0, 1, -1, 8_388_607, -8_388_608, 70_000, -70_000], dtype=np.int64
    )
    blob = encode_wav(samples, 44100, 1, fmt="pcm24")
    rate, ch, bits, got = decode_wav_samples(blob)
    assert (rate, ch, bits) == (44100, 1, 24)
    assert got.tolist() == samples.tolist()


def test_png_adam7_roundtrip_all_color_types():
    """Adam7: seven independently filtered sub-images must de-interleave
    back to the exact source pixels for every supported color type.
    Odd dims exercise fractional passes; w=5,h=3 leaves several passes
    EMPTY (no scanlines at all) — the spec subtlety most decoders get
    wrong first."""
    for w, h, c in ((13, 9, 1), (8, 8, 3), (5, 3, 4), (21, 17, 2), (1, 1, 3)):
        px = bytes((i * 7 + 3) % 256 for i in range(w * h * c))
        blob = encode_png(px, w, h, c, interlace=True)
        W, H, C, got = decode_png_pixels(blob)
        assert (W, H, C) == (w, h, c)
        assert got == px, (w, h, c)
        # header really says Adam7 and the stream differs from
        # the non-interlaced encoding of the same pixels
        assert blob[28] == 1 and encode_png(px, w, h, c)[28] == 0


def test_png_adam7_explicit_filters_and_non_interlaced_unchanged():
    """Explicit per-pass-row filter lists are honored in Adam7 order,
    and the non-interlaced path is byte-identical to before the
    refactor (all five filter types)."""
    w, h, c = 11, 7, 3
    px = bytes((i * 5 + 1) % 256 for i in range(w * h * c))
    n_pass_rows = 0
    for x0, y0, dx, dy in ((0,0,8,8),(4,0,8,8),(0,4,4,8),(2,0,4,4),(0,2,2,4),(1,0,2,2),(0,1,1,2)):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            n_pass_rows += ph
    filters = [(3 + r) % 5 for r in range(n_pass_rows)]
    blob = encode_png(px, w, h, c, filters=filters, interlace=True)
    assert decode_png_pixels(blob)[3] == px
    plain = encode_png(px, w, h, c, filters=[r % 5 for r in range(h)])
    assert decode_png_pixels(plain)[3] == px


def test_decode_real_dispatch_and_remaining_stub():
    blob = encode_png(bytes([5, 6, 7, 8]), 2, 2, 1)
    kind, w, h, c, px = decode_real(blob)
    assert (kind, w, h, c, px) == ("png", 2, 2, 1, bytes([5, 6, 7, 8]))
    wav = encode_wav([1, -1], 8000, 1)
    assert decode_real(wav)[0] == "wav"
    # JPEG now REALLY decodes (operators/jpeg.py) — a truncated stream
    # is a ValueError, and a valid one round-trips pixels
    with pytest.raises(ValueError):
        decode_real(b"\xff\xd8\xff\xe0rest")
    from syslog_handler_with_clickhouse_spark.operators.jpeg import encode_jpeg

    gray = bytes(range(64))
    kind, w, h, c, px = decode_real(encode_jpeg(gray, 8, 8, 1, quality=100))
    assert (kind, w, h, c, px) == ("jpeg", 8, 8, 1, gray)
    # unknown containers remain the documented environment guard
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00\x00unknown container")


def test_decode_assets_distributed_mixed_media(spark):
    """The mapInPandas path: PNG and WAV assets decode to exact stats;
    garbage and JPEG payloads survive as kind='undecoded' instead of
    failing the batch."""
    png_px = bytes((i * 3) % 251 for i in range(6 * 4 * 3))
    png_blob = encode_png(png_px, 6, 4, 3, [r % 5 for r in range(4)])
    wav_blob = encode_wav([10, -20, 30], 16000, 1)
    assets = spark.createDataFrame(
        [(1, png_blob), (2, wav_blob), (3, b"\xff\xd8\xffjunk"), (4, b"")],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.asDict() for r in decode_assets(assets).collect()}
    assert got[1]["kind"] == "png"
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (6, 4, 3)
    assert got[1]["val_sum"] == sum(png_px)
    assert got[1]["n_values"] == len(png_px)
    assert got[2]["kind"] == "wav"
    assert (got[2]["sample_rate"], got[2]["channels"]) == (16000, 1)
    assert got[2]["val_sum"] == 20
    assert (got[2]["val_min"], got[2]["val_max"]) == (-20, 30)
    assert got[3]["kind"] == "undecoded"
    assert got[4]["kind"] == "undecoded"


# ---------------------------------------------------------------------
# GIF (pure-stdlib LZW entropy decode)
# ---------------------------------------------------------------------


def _pal(n):
    return b"".join(bytes([j % 256, (j * 3) % 256, (j * 7) % 256]) for j in range(n))


def _rgb_of(pal, idx):
    return b"".join(pal[3 * v : 3 * v + 3] for v in idx)


def test_gif_roundtrip_noise_and_patterns():
    """Random and structured index streams across LZW code-width
    boundaries (511/512/513 entries) decode back bit-exactly."""
    import random

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    rng = random.Random(11)
    pal = _pal(256)
    for w, h in [(1, 1), (17, 30), (64, 8), (61, 23)]:
        for mk in (
            lambda n: bytes(rng.randrange(251) for _ in range(n)),
            lambda n: bytes([9] * n),
            lambda n: bytes(i % 13 for i in range(n)),
        ):
            idx = mk(w * h)
            W, H, C, rgb = decode_gif_pixels(encode_gif(idx, w, h, pal))
            assert (W, H, C) == (w, h, 3)
            assert rgb == _rgb_of(pal, idx)


def test_gif_interlaced_roundtrip():
    """The 4-pass interlace row order is undone exactly — a pass-order
    bug scrambles rows and fails the byte compare."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    pal = _pal(256)
    w, h = 10, 13  # odd height exercises all four passes unevenly
    idx = bytes((r * w + c) % 251 for r in range(h) for c in range(w))
    _, _, _, rgb = decode_gif_pixels(encode_gif(idx, w, h, pal, interlace=True))
    assert rgb == _rgb_of(pal, idx)


def test_gif_small_palette_and_table_reset():
    """4-color palette (min code size 2) and a stream long enough to
    fill the 4096-entry table and force a mid-stream CLEAR."""
    import random

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    rng = random.Random(3)
    pal4 = _pal(4)
    idx = bytes(rng.randrange(4) for _ in range(200 * 160))
    _, _, _, rgb = decode_gif_pixels(encode_gif(idx, 200, 160, pal4))
    assert rgb == _rgb_of(pal4, idx)


def test_gif_kwkwk_case():
    """cScSc strings hit the code==next ('KwKwK') branch; aaa... is its
    minimal trigger."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    pal = _pal(256)
    idx = bytes([1] * 7)
    _, _, _, rgb = decode_gif_pixels(encode_gif(idx, 7, 1, pal))
    assert rgb == _rgb_of(pal, idx)


def test_gif_malformed_inputs_raise():
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    with pytest.raises(ValueError):
        decode_gif_pixels(b"NOTGIF89a")
    blob = bytearray(encode_gif(bytes([1, 2, 3, 4]), 2, 2, _pal(256)))
    with pytest.raises(ValueError):
        decode_gif_pixels(bytes(blob[:20]))  # truncated mid-stream
    # extension blocks are skipped: splice a GCE before the image
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    hdr_end = 13 + 3 * 256
    spliced = bytes(blob[:hdr_end]) + gce + bytes(blob[hdr_end:])
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_real,
    )

    assert decode_real(spliced)[0] == "gif"


def test_gif_decode_assets_distributed(spark):
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_assets,
        encode_gif,
    )

    pal = _pal(256)
    idx = bytes((5 * k) % 251 for k in range(12 * 9))
    blob = encode_gif(idx, 12, 9, pal)
    assets = spark.createDataFrame(
        [(1, blob)], "doc_id long, payload binary"
    )
    r = decode_assets(assets).collect()[0]
    rgb = _rgb_of(pal, idx)
    assert r.kind == "gif"
    assert (r.width, r.height, r.channels) == (12, 9, 3)
    assert r.n_values == len(rgb)
    assert r.val_sum == sum(rgb)
    assert (r.val_min, r.val_max) == (min(rgb), max(rgb))


def test_bmp_roundtrip_all_layouts():
    """BMP: 24-bit bottom-up (default), 32-bit BGRX, 8-bit palettized,
    and top-down (negative height) all round-trip to the same RGB
    pixels; 4-byte row padding exercised via odd widths."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
    )

    w, h = 7, 5  # odd width -> padded rows for every bpp
    rgb = bytes((x * 29 + y * 31 + c * 53) % 256
                for y in range(h) for x in range(w) for c in range(3))
    for kwargs in ({"bpp": 24}, {"bpp": 32}, {"bpp": 24, "top_down": True}):
        blob = encode_bmp(rgb, w, h, **kwargs)
        assert decode_bmp_pixels(blob) == (w, h, 3, rgb), kwargs
    palette = bytes((i * 11 + j) % 256 for i in range(16) for j in range(3))
    idx = bytes((x + y * 3) % 16 for y in range(h) for x in range(w))
    exp = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    blob = encode_bmp(idx, w, h, bpp=8, palette=palette)
    assert decode_bmp_pixels(blob) == (w, h, 3, exp)


def test_bmp_guards_and_dispatch():
    import struct

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
    )

    blob = bytearray(encode_bmp(bytes(27), 3, 3))
    # RLE4 now decodes (test_bmp_subbyte_round_trips); declaring it on a
    # 24-bit image is corrupt data, not a format guard
    rle = bytearray(blob)
    rle[30:34] = struct.pack("<I", 2)
    with pytest.raises(ValueError, match="RLE4"):
        decode_bmp_pixels(bytes(rle))
    # BI_BITFIELDS on a 24-bit image is corrupt (16/32-bit only);
    # JPEG-in-BMP compression stays a genuine guard
    bf = bytearray(blob)
    bf[30:34] = struct.pack("<I", 3)
    with pytest.raises(ValueError, match="BI_BITFIELDS"):
        decode_bmp_pixels(bytes(bf))
    bj = bytearray(blob)
    bj[30:34] = struct.pack("<I", 4)  # BI_JPEG
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp_pixels(bytes(bj))
    # 16-bit now decodes (test_bmp_bitfields_round_trips); a zero mask
    # is corrupt
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_bmp_bitfields,
    )

    z = bytearray(encode_bmp_bitfields(bytes(12), 2, 2, bpp=16))
    z[54:58] = struct.pack("<I", 0)
    with pytest.raises(ValueError, match="mask"):
        decode_bmp_pixels(bytes(z))
    with pytest.raises(ValueError):
        decode_bmp_pixels(b"BMshort")
    # decode_real dispatches on the BM magic
    kind, w, h, c, px = decode_real(encode_bmp(bytes(27), 3, 3))
    assert (kind, w, h, c, px) == ("bmp", 3, 3, 3, bytes(27))


def test_audio_features_distributed(spark):
    """Square-wave fixtures across all three WAV layouts: exact energy,
    dominant rfft bin == the construction frequency, majority-power
    flag; garbage payloads null out instead of failing the batch."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        audio_features,
    )

    rows = []
    for i, (f, amp, fmt) in enumerate(
        [(2, 1000, "pcm16"), (4, 1200, "pcm24"), (8, 900, "float32"),
         (16, 1499, "pcm16")]
    ):
        half = 64 // f // 2
        s = [amp if (k // half) % 2 == 0 else -amp for k in range(64)]
        arr = np.array(s, dtype=np.float32 if fmt == "float32" else np.int64)
        rows.append((i, encode_wav(arr, 16000, 1, fmt=fmt), f, amp))
    assets = spark.createDataFrame(
        [(i, p) for i, p, _, _ in rows] + [(99, b"\x00garbage")],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in audio_features(assets).collect()}
    for i, _, f, amp in rows:
        r = got[i]
        assert (r.n, r.ssq, r.dominant_bin, r.dominant_ok) == (
            64, 64 * amp * amp, f, True,
        ), (i, f, amp)
    assert got[99].n is None and got[99].dominant_bin is None


def test_png_16bit_roundtrip_and_8bit_view():
    """Depth 16: filters operate on bytes with doubled bpp; exact
    uint16 samples round-trip via decode_png_pixels16, and the default
    decode returns the high-byte 8-bit view.  Adam7 + all filter types
    included; 8-bit inputs widen v*257 per the PNG scaling rule."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_png_pixels16,
        encode_png16,
    )

    for (w, h, c), interlace in (((9, 6, 1), False), ((7, 5, 3), True),
                                 ((13, 4, 2), False), ((5, 3, 4), True)):
        n = w * h * c
        samples = [(i * 4097 + 13) % 65536 for i in range(n)]
        filters = None if interlace else [r % 5 for r in range(h)]
        blob = encode_png16(samples, w, h, c, filters=filters,
                            interlace=interlace)
        W, H, C, got16 = decode_png_pixels16(blob)
        assert (W, H, C) == (w, h, c)
        assert got16.tolist() == samples, (w, h, c, interlace)
        W8, H8, C8, got8 = decode_png_pixels(blob)
        assert got8 == bytes(v >> 8 for v in samples)
    # 8-bit widening path
    blob8 = encode_png(bytes([0, 1, 128, 255]), 2, 2, 1)
    _, _, _, a = decode_png_pixels16(blob8)
    assert a.tolist() == [0, 257, 128 * 257, 65535]
    # 1/2/4-bit depths now decode (test_png_subbyte_round_trip_grid);
    # the 16-bit view of a 4-bit gray image is the scaled sample ·257
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_png_subbyte,
    )

    blob4 = encode_png_subbyte([0, 5, 10, 15], 2, 2, 4)
    _, _, _, a4 = decode_png_pixels16(blob4)
    assert a4.tolist() == [0, 5 * 17 * 257, 10 * 17 * 257, 65535]


def test_gif_animation_composition():
    """Multi-frame composition semantics: full first frame, disjoint
    patch frames (disposal 1), an all-transparent frame (canvas
    unchanged), restore-to-background (disposal 2), and
    restore-to-previous (disposal 3) — each hand-computed."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )

    sw, sh = 6, 4
    palette = bytes()
    pal = []
    for i in range(8):
        pal += [i * 30, i * 30 + 1, i * 30 + 2]
    palette = bytes(pal)

    def rgb(i):
        return palette[3 * i : 3 * i + 3]

    base = bytes([1] * (sw * sh))
    frames = [
        dict(left=0, top=0, w=sw, h=sh, indices=base, delay=10, disposal=1),
        # patch 2x2 at (1,1) with color 3
        dict(left=1, top=1, w=2, h=2, indices=bytes([3] * 4), delay=20,
             disposal=1),
        # all-transparent overlay: canvas must not change
        dict(left=0, top=0, w=sw, h=sh, indices=bytes([7] * (sw * sh)),
             delay=30, disposal=1, transparent=7),
        # disposal 2: draw color 5 at (4,0) 2x1, then restore rect to bg
        dict(left=4, top=0, w=2, h=1, indices=bytes([5] * 2), delay=40,
             disposal=2),
        # after restore: rect is background (idx 0); next frame sees it
        dict(left=0, top=0, w=1, h=1, indices=bytes([6]), delay=50,
             disposal=3),
        dict(left=0, top=0, w=1, h=1, indices=bytes([2]), delay=60,
             disposal=1),
    ]
    blob = encode_gif_animation(sw, sh, palette, frames, bg_idx=0)
    W, H, got = decode_gif_frames(blob)
    assert (W, H) == (sw, sh) and len(got) == 6
    assert [d for d, _ in got] == [10, 20, 30, 40, 50, 60]
    f0 = bytearray(rgb(1) * (sw * sh))
    assert got[0][1] == bytes(f0)
    f1 = bytearray(f0)
    for (x, y) in [(1, 1), (2, 1), (1, 2), (2, 2)]:
        f1[(y * sw + x) * 3 : (y * sw + x) * 3 + 3] = rgb(3)
    assert got[1][1] == bytes(f1)
    assert got[2][1] == bytes(f1)  # transparent overlay: unchanged
    f3 = bytearray(f1)
    for (x, y) in [(4, 0), (5, 0)]:
        f3[(y * sw + x) * 3 : (y * sw + x) * 3 + 3] = rgb(5)
    assert got[3][1] == bytes(f3)
    # frame 4 renders onto the disposal-2-restored canvas: (4,0),(5,0)
    # are background now, plus pixel (0,0) becomes color 6
    f4 = bytearray(f1)
    for (x, y) in [(4, 0), (5, 0)]:
        f4[(y * sw + x) * 3 : (y * sw + x) * 3 + 3] = rgb(0)
    f4[0:3] = rgb(6)
    assert got[4][1] == bytes(f4)
    # frame 5: disposal 3 restored the pre-frame-4 canvas, then (0,0)=2
    f5 = bytearray(f4)
    f5[0:3] = rgb(2)
    assert got[5][1] == bytes(f5)


def test_sample_gif_frames_distributed(spark):
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_gif_animation,
        sample_gif_frames,
    )

    palette = bytes(v for i in range(4) for v in (i * 10, i * 10, i * 10))
    frames = [
        dict(left=0, top=0, w=4, h=2, indices=bytes([1] * 8), delay=5),
        dict(left=0, top=0, w=2, h=1, indices=bytes([2] * 2), delay=7),
        dict(left=2, top=0, w=2, h=1, indices=bytes([3] * 2), delay=9),
    ]
    blob = encode_gif_animation(4, 2, palette, frames)
    assets = spark.createDataFrame(
        [(1, blob), (2, b"junk")], "doc_id long, payload binary"
    )
    got = sorted(
        [
            (r.doc_id, r.frame_idx, r.n_frames, r.delay_cs, r.rgb_sum)
            for r in sample_gif_frames(assets, every_n=2).collect()
        ]
    )
    # doc 1: frames 0 and 2 sampled; sums hand-computed
    s0 = 8 * (10 * 3)
    s2 = 4 * (10 * 3) + 2 * (20 * 3) + 2 * (30 * 3)
    assert got == [(1, 0, 3, 5, s0), (1, 2, 3, 9, s2), (2, None, None, None, None)]


def test_resize_decoded_real(spark):
    """Real resize: nearest-neighbor picks exact source pixels; the
    integer-factor mean path is an exact box average; audio/garbage
    skip cleanly."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_bmp,
        resize_decoded,
    )

    w, h = 16, 8
    rgb = bytes((x * 3 + y * 11 + c) % 256
                for y in range(h) for x in range(w) for c in range(3))
    a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(np.int64)
    assets = spark.createDataFrame(
        [(1, encode_png(rgb, w, h, 3)), (2, encode_bmp(rgb, w, h)),
         (3, encode_wav([1, 2], 8000, 1)), (4, b"xx")],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in resize_decoded(assets, 4, 4).collect()}
    ys, xs = (np.arange(4) * h) // 4, (np.arange(4) * w) // 4
    nn = a[np.ix_(ys, xs)]
    for did, kind in ((1, "png"), (2, "bmp")):
        r = got[did]
        assert (r.kind, r.out_w, r.out_h, r.channels) == (kind, 4, 4, 3)
        assert bytes(r.resized) == nn.astype(np.uint8).tobytes()
        assert r.res_sum == int(nn.sum())
    assert got[3].kind == "skipped" and got[4].kind == "skipped"
    # integer-factor exact box mean
    got_m = {r.doc_id: r for r in
             resize_decoded(assets, 4, 4, method="mean").collect()}
    bm = a.reshape(4, 2, 4, 4, 3).mean(axis=(1, 3)).astype(np.int64)
    assert got_m[1].res_sum == int(bm.sum())
    assert bytes(got_m[1].resized) == bm.astype(np.uint8).tobytes()


def test_bmp_rle8_roundtrip():
    """RLE8: encoded runs, absolute runs (word-aligned), EOL/EOD
    escapes — decodes to the same RGB as the uncompressed 8-bit form;
    RLE on non-8-bit stays rejected."""
    import struct as _st

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
        encode_bmp_rle8,
    )

    w, h = 11, 4
    palette = bytes((i * 7 + j * 3) % 256 for i in range(16) for j in range(3))
    idx = bytes(
        [0] * 5 + [3] * 6          # runs
        + [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]  # distinct (absolute-friendly)
        + [15] * 11
        + [2, 2, 9, 9, 9, 0, 0, 0, 0, 1, 1]
    )
    plain = decode_bmp_pixels(encode_bmp(idx, w, h, bpp=8, palette=palette))
    for absolute in (False, True):
        rle = encode_bmp_rle8(idx, w, h, palette, absolute_runs=absolute)
        assert decode_bmp_pixels(rle) == plain, absolute
    # RLE8 with bpp 24 is corrupt
    bad = bytearray(encode_bmp(bytes(w * h * 3), w, h))
    bad[30:34] = _st.pack("<I", 1)
    with pytest.raises(ValueError, match="RLE8"):
        decode_bmp_pixels(bytes(bad))


def test_tiff_roundtrip_matrix_and_guards():
    """TIFF: both byte orders x multi-strip x PackBits x gray/RGB, plus
    WhiteIsZero inversion, all round-trip; 16-bit guarded;
    decode_real dispatches on both magics."""
    import struct as _st

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    w, h = 11, 7
    for c in (1, 3):
        px = bytes((i * 13 + 3) % 256 for i in range(w * h * c))
        for e in ("<", ">"):
            for rps in (None, 3):
                for pb in (False, True):
                    blob = encode_tiff(px, w, h, c, endian=e,
                                       rows_per_strip=rps, packbits=pb)
                    assert decode_tiff_pixels(blob) == (w, h, c, px)
                    kind, W, H, C, got = decode_real(blob)
                    assert (kind, W, H, C, got) == ("tiff", w, h, c, px)
    g = bytes((i * 3) % 256 for i in range(w * h))
    assert decode_tiff_pixels(
        encode_tiff(g, w, h, 1, white_is_zero=True)
    ) == (w, h, 1, g)
    # LZW now decodes (compression 5); JPEG-in-TIFF (7) stays a guard
    lzw_blob = encode_tiff(g, w, h, 1, lzw=True, rows_per_strip=2)
    assert decode_tiff_pixels(lzw_blob) == (w, h, 1, g)
    # Deflate decodes under both the official (8) and Adobe (32946)
    # compression codes; the builder writes 8.
    for e in ("<", ">"):
        dz_blob = encode_tiff(g, w, h, 1, endian=e, deflate=True,
                              rows_per_strip=3)
        assert decode_tiff_pixels(dz_blob) == (w, h, 1, g)
    dz = bytearray(encode_tiff(g, w, h, 1, deflate=True))
    (ifd_off0,) = _st.unpack("<I", dz[4:8])
    (n0,) = _st.unpack("<H", dz[ifd_off0 : ifd_off0 + 2])
    for i in range(n0):
        off = ifd_off0 + 2 + 12 * i
        if _st.unpack("<H", dz[off : off + 2])[0] == 259:
            dz[off + 8 : off + 10] = _st.pack("<H", 32946)
    assert decode_tiff_pixels(bytes(dz)) == (w, h, 1, g)
    blob = bytearray(encode_tiff(g, w, h, 1))
    (ifd_off,) = _st.unpack("<I", blob[4:8])
    (n,) = _st.unpack("<H", blob[ifd_off : ifd_off + 2])
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = _st.unpack("<H", blob[off : off + 2])[0]
        if tag == 259:
            # old-style JPEG (6) stays a guard; NEW-style (7) decodes
            # since round 13 (test_tiff_jpeg_in_tiff_round_trips) —
            # relabeling raw strips as 7 is corrupt data, not a guard
            blob[off + 8 : off + 10] = _st.pack("<H", 6)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff_pixels(bytes(blob))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff_pixels(b"XX\x00\x00nope")


def test_tiff_lzw_kernel_roundtrips():
    """TIFF-variant LZW (MSB-first, EarlyChange=1): seeded fuzz across
    random/runs/repetitive inputs large enough to force width bumps at
    511/1023/2047 AND table-clear cycles (>4093 entries)."""
    import random

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    rng = random.Random(77)
    for t in range(40):
        n = rng.randint(0, 12000)
        style = t % 3
        if style == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif style == 1:
            data = bytes(rng.randrange(4) for _ in range(n))
        else:
            data = (b"abcab" * (n // 5 + 1))[:n]
        enc = _tiff_lzw_encode(data)
        assert _tiff_lzw_decode(enc, len(data)) == data, (t, n)


def test_png_subbyte_round_trip_grid():
    """Sub-byte PNG (1/2/4-bit, gray + palette, plain + Adam7) decodes
    back to the exact encoded samples across a width grid that exercises
    partial trailing bytes and empty Adam7 passes."""
    import itertools

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_png_pixels,
        decode_png_pixels16,
        encode_png_subbyte,
    )

    checked = 0
    for depth, pal, inter, w, h in itertools.product(
        (1, 2, 4), (False, True), (False, True), (1, 3, 7, 16), (1, 2, 5)
    ):
        n = 1 << depth
        samples = [(k * 3 + 1) % n for k in range(w * h)]
        palette = (
            b"".join(
                bytes([5 * j % 256, 7 * j % 256, (9 * j + 1) % 256])
                for j in range(n)
            )
            if pal
            else None
        )
        filters = None if inter else [r % 5 for r in range(h)]
        b = encode_png_subbyte(
            samples, w, h, depth, palette=palette, filters=filters, interlace=inter
        )
        W, H, C, px = decode_png_pixels(b)
        assert (W, H) == (w, h)
        if pal:
            assert C == 3
            exp = b"".join(palette[3 * s : 3 * s + 3] for s in samples)
        else:
            assert C == 1
            exp = bytes(s * (255 // (n - 1)) for s in samples)
        assert px == exp, (depth, pal, inter, w, h)
        assert list(decode_png_pixels16(b)[3]) == [v * 257 for v in exp]
        checked += 1
    assert checked == 144


def test_png_subbyte_rejects_illegal_combinations():
    import pytest as _pytest

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_subbyte,
    )

    # sub-byte RGB is illegal per spec §11.2.2 — forge the color type
    b = bytearray(encode_png_subbyte([0, 1, 1, 0], 2, 2, 1))
    b[25] = 2  # color type RGB
    import struct
    import zlib

    b[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + bytes(b[16:29])))
    with _pytest.raises(ValueError, match="illegal for color type"):
        decode_png_pixels(bytes(b))
    with _pytest.raises(ValueError, match="out of range"):
        encode_png_subbyte([0, 2], 2, 1, 1)  # sample 2 needs depth > 1


def test_bmp_subbyte_round_trips():
    """1/4-bit uncompressed (both orientations, widths crossing byte
    boundaries) and RLE4 (encoded alternating-nibble + absolute runs)
    decode back to the exact palette expansion."""
    import itertools

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
        encode_bmp_rle4,
    )

    pal16 = b"".join(
        bytes([(11 * j) % 256, (7 * j + 3) % 256, (5 * j + 1) % 256])
        for j in range(16)
    )
    pal2 = bytes([10, 20, 30, 200, 210, 220])
    checked = 0
    for bpp, w, h, td in itertools.product(
        (1, 4), (1, 2, 5, 8, 9, 13), (1, 3, 4), (False, True)
    ):
        n = 1 << bpp
        idx = bytes((x * 3 + 1) % n for x in range(w * h))
        pal = pal2 if bpp == 1 else pal16
        W, H, C, px = decode_bmp_pixels(
            encode_bmp(idx, w, h, bpp=bpp, palette=pal, top_down=td)
        )
        assert (W, H, C) == (w, h, 3)
        assert px == b"".join(pal[3 * i : 3 * i + 3] for i in idx), (bpp, w, h, td)
        checked += 1
    for w, h, absr in itertools.product((1, 2, 3, 5, 9, 14), (1, 2, 4), (False, True)):
        idx = bytes((x * 5 + x // 3) % 16 for x in range(w * h))
        W, H, C, px = decode_bmp_pixels(
            encode_bmp_rle4(idx, w, h, pal16, absolute_runs=absr)
        )
        assert (W, H, C) == (w, h, 3)
        assert px == b"".join(pal16[3 * i : 3 * i + 3] for i in idx), (w, h, absr)
        checked += 1
    # a genuine alternating two-nibble run compresses to ONE run byte
    idx = bytes([3, 7] * 8)
    blob = encode_bmp_rle4(idx, 16, 1, pal16)
    assert decode_bmp_pixels(blob)[3] == b"".join(
        pal16[3 * i : 3 * i + 3] for i in idx
    )
    assert checked == 108


def test_ima_adpcm_raw_matches_reference_recurrence():
    """Raw-nibble fixture decode == the `_ima_step` recurrence, state
    carried exactly (predictor clamp + index walk)."""
    import random

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        _ima_step,
        encode_wav_ima_adpcm_raw,
    )

    rng = random.Random(7)
    nibbles = [rng.randrange(16) for _ in range(64)]
    pred0, idx0 = -1234, 17
    rate, ch, bits, got = decode_wav_samples(
        encode_wav_ima_adpcm_raw(nibbles, 8000, pred0, idx0)
    )
    assert (rate, ch, bits) == (8000, 1, 4)
    exp = [pred0]
    p, i = pred0, idx0
    for n in nibbles:
        p, i = _ima_step(n, p, i)
        exp.append(p)
    assert got.tolist() == exp


def test_ima_adpcm_lossy_encoder_tracks_signal():
    """decode(encode(sine)) stays within a small fraction of the
    amplitude once the step index is seeded from the signal."""
    import math

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_wav_ima_adpcm,
    )

    sine = [int(8000 * math.sin(k / 10)) for k in range(200)]
    _, _, _, got = decode_wav_samples(encode_wav_ima_adpcm(sine, 8000))
    assert max(abs(a - b) for a, b in zip(got.tolist(), sine)) < 800


def test_ima_adpcm_clamps_and_guards():
    """Predictor saturates at int16 bounds; an out-of-range step index
    is corrupt; non-4-bit ADPCM is corrupt."""
    import struct

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_wav_ima_adpcm_raw,
    )

    # all-max positive nibbles from near the top: clamps at 32767
    blob = encode_wav_ima_adpcm_raw([7] * 8, 8000, 32700, 88)
    _, _, _, got = decode_wav_samples(blob)
    assert got.max() == 32767
    # step index 89 in the header -> corrupt
    bad = bytearray(encode_wav_ima_adpcm_raw([0] * 8, 8000, 0, 0))
    i = bad.find(b"data") + 8 + 2
    bad[i] = 89
    with pytest.raises(ValueError, match="step index"):
        decode_wav_samples(bytes(bad))


def test_bmp_bitfields_round_trips():
    """BI_BITFIELDS: RGB565, RGB555 and mask-specified 32-bit decode to
    the exact floor-rescaled channels, both orientations."""
    import itertools

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_bitfields,
    )

    checked = 0
    for masks, bpp in (
        ((0xF800, 0x07E0, 0x001F), 16),
        ((0x7C00, 0x03E0, 0x001F), 16),
        ((0xFF0000, 0xFF00, 0xFF), 32),
    ):
        for w, h, td in itertools.product((1, 3, 7), (1, 2, 4), (False, True)):
            px = bytes(
                (x * 37 + c * 11) % 256 for x in range(w * h) for c in range(3)
            )
            W, H, C, got = decode_bmp_pixels(
                encode_bmp_bitfields(px, w, h, bpp=bpp, masks=masks, top_down=td)
            )
            assert (W, H, C) == (w, h, 3)
            exp = bytearray()
            for i in range(w * h):
                for c, m in zip(px[3 * i : 3 * i + 3], masks):
                    sh = (m & -m).bit_length() - 1
                    mv = m >> sh
                    exp.append((c * mv // 255) * 255 // mv)
            assert got == bytes(exp), (masks, bpp, w, h, td)
            checked += 1
    assert checked == 54
    # plain BI_RGB 16-bit defaults to 555 masks
    blob = bytearray(
        encode_bmp_bitfields(
            bytes([255, 0, 0] * 4), 2, 2, bpp=16,
            masks=(0x7C00, 0x03E0, 0x001F),
        )
    )
    import struct as _st

    blob[30:34] = _st.pack("<I", 0)  # compression BI_RGB
    assert decode_bmp_pixels(bytes(blob))[3][:3] == bytes([255, 0, 0])


def test_ms_adpcm_matches_reference_recurrence():
    """MS ADPCM raw-nibble decode == the `_ms_step` recurrence: older
    samp2 emits first, high nibble first, adaptive delta floored at 16;
    predictor index > 6 is corrupt."""
    import random
    import struct as _st

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        _MS_COEF1,
        _MS_COEF2,
        _ms_step,
        encode_wav_ms_adpcm_raw,
    )

    rng = random.Random(11)
    nibbles = [rng.randrange(16) for _ in range(64)]
    bpred, idelta, s1, s2 = 4, 300, -120, 85
    rate, ch, bits, got = decode_wav_samples(
        encode_wav_ms_adpcm_raw(nibbles, 8000, bpred, idelta, s1, s2)
    )
    assert (rate, ch, bits) == (8000, 1, 4)
    exp = [s2, s1]
    d, a, b = idelta, s1, s2
    c1, c2 = _MS_COEF1[bpred], _MS_COEF2[bpred]
    for n in nibbles:
        smp, d = _ms_step(n, a, b, d, c1, c2)
        b, a = a, smp
        exp.append(smp)
    assert got.tolist() == exp
    bad = bytearray(encode_wav_ms_adpcm_raw([0] * 8, 8000, 0, 16, 0, 0))
    i = bad.find(b"data") + 8
    bad[i] = 7  # predictor index out of range
    import pytest as _pytest

    with _pytest.raises(ValueError, match="predictor index"):
        decode_wav_samples(bytes(bad))


def test_g711_bit_exact_vs_audioop():
    """Every one of the 256 mu-law and A-law codes decodes bit-exactly
    against audioop's independent C implementation."""
    import warnings

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_wav_g711,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    codes = bytes(range(256))
    for law, ref in (("ulaw", audioop.ulaw2lin), ("alaw", audioop.alaw2lin)):
        rate, ch, bits, got = decode_wav_samples(
            encode_wav_g711(codes, 8000, law)
        )
        assert (rate, ch, bits) == (8000, 1, 8)
        exp = ref(codes, 2)
        assert (
            b"".join(int(v).to_bytes(2, "little", signed=True) for v in got)
            == exp
        ), law


def test_tiff_predictor_and_planar_roundtrip():
    """Predictor 2 (horizontal differencing — the libtiff LZW pairing)
    and planar configuration 2 (plane-sequential strips), alone and
    combined, across compressions and byte orders."""
    import pytest

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    w, h = 7, 5
    g = bytes((i * 31 + 7) % 256 for i in range(w * h))
    rgb = bytes((i * 13 + 5) % 256 for i in range(w * h * 3))

    for e in ("<", ">"):
        for comp in ({}, {"lzw": True}, {"deflate": True}, {"packbits": True}):
            # gray + predictor, multi-strip
            blob = encode_tiff(g, w, h, 1, endian=e, predictor=True,
                               rows_per_strip=2, **comp)
            assert decode_tiff_pixels(blob) == (w, h, 1, g)
            # rgb chunky + predictor (stride = 3)
            blob = encode_tiff(rgb, w, h, 3, endian=e, predictor=True, **comp)
            assert decode_tiff_pixels(blob) == (w, h, 3, rgb)
            # rgb planar, multi-strip
            blob = encode_tiff(rgb, w, h, 3, endian=e, planar=True,
                               rows_per_strip=2, **comp)
            assert decode_tiff_pixels(blob) == (w, h, 3, rgb)
            # rgb planar + predictor (stride = 1 inside each plane)
            blob = encode_tiff(rgb, w, h, 3, endian=e, planar=True,
                               predictor=True, rows_per_strip=3, **comp)
            assert decode_tiff_pixels(blob) == (w, h, 3, rgb)

    # predictor asymmetry probe: a gradient row must NOT decode right if
    # the decoder skipped the un-differencing (deltas are constant 1).
    grad = bytes(range(w)) * h
    blob = encode_tiff(grad, w, h, 1, predictor=True, lzw=True)
    assert decode_tiff_pixels(blob)[3] == grad

    # unsupported predictor value still guards
    import struct as _st

    blob = bytearray(encode_tiff(g, w, h, 1, predictor=True))
    (ifd_off,) = _st.unpack("<I", blob[4:8])
    (n,) = _st.unpack("<H", blob[ifd_off : ifd_off + 2])
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if _st.unpack("<H", blob[off : off + 2])[0] == 317:
            blob[off + 8 : off + 10] = _st.pack("<H", 3)
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_tiff_pixels(bytes(blob))


def test_dhash_brightness_invariant_and_discriminative(spark):
    """dHash: uniform brightness shift can never flip a bit (cross-
    multiplied means all shift together), while transposing the
    gradient direction flips essentially every bit."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        dhash_images,
        encode_png,
    )

    w, h = 18, 12
    # horizontal gradient: strictly increasing left->right
    grad = bytes((x * 14) % 251 for y in range(h) for x in range(w))
    brighter = bytes(v + 4 for v in grad)
    # vertical gradient: constant within each row
    vert = bytes((y * 14) % 251 for y in range(h) for x in range(w))
    rows = [
        (1, encode_png(grad, w, h, 1, [0] * h)),
        (2, encode_png(brighter, w, h, 1, [2] * h)),
        (3, encode_png(vert, w, h, 1, [1] * h)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.hash_hi, r.hash_lo) for r in dhash_images(df).collect()}
    assert got[1] == got[2]                    # brightness-invariant
    assert got[1] != got[3]                    # direction-sensitive
    # increasing gradient -> every adjacent comparison is 'less': all 64
    # bits set -> both halves are 2^32 - 1.
    assert got[1] == (2**32 - 1, 2**32 - 1)
    # vertical gradient: within a row all cells equal -> no strict less,
    # all bits zero.
    assert got[3] == (0, 0)


def test_dhash_skips_non_images(spark):
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        dhash_images,
    )

    df = spark.createDataFrame(
        [(9, bytearray(b"not an image at all"))], "doc_id long, payload binary"
    )
    rows = dhash_images(df).collect()
    assert rows[0].kind == "skipped" and rows[0].hash_hi is None


def test_exif_roundtrip_and_edge_cases():
    from syslog_handler_with_clickhouse_spark.operators.jpeg import encode_jpeg
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        build_exif_app1,
        insert_app1,
        parse_exif,
    )

    px = bytes(range(64))
    base = encode_jpeg(px, 8, 8, 1)
    # no APP1 at all -> None
    assert parse_exif(base) is None
    for e in ("<", ">"):
        for ori in range(1, 9):
            jp = insert_app1(base, build_exif_app1(e, ori, 2, 640, 480))
            tags = parse_exif(jp)
            assert tags[274] == ori and tags[296] == 2
            assert tags[40962] == 640 and tags[40963] == 480
    import pytest

    with pytest.raises(ValueError, match="not a JPEG"):
        parse_exif(b"nope")


def test_tiff_tiled_roundtrip_matrix():
    """Tiled TIFF (tags 322-325): full-size edge-padded tiles across
    compressions, byte orders, predictor, gray/RGB, and tile grids that
    do and don't divide the image."""
    import pytest

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    w, h = 13, 9
    g = bytes((i * 31 + 7) % 256 for i in range(w * h))
    rgb = bytes((i * 13 + 5) % 256 for i in range(w * h * 3))
    for e in ("<", ">"):
        for comp in ({}, {"lzw": True}, {"deflate": True}, {"packbits": True}):
            for pred in (False, True):
                for px, c in ((g, 1), (rgb, 3)):
                    for t in ((8, 4), (16, 16), (4, 4)):
                        blob = encode_tiff(
                            px, w, h, c, endian=e, predictor=pred,
                            tile=t, **comp,
                        )
                        assert decode_tiff_pixels(blob) == (w, h, c, px)
    # WhiteIsZero inverts after assembly
    blob = encode_tiff(g, w, h, 1, white_is_zero=True, tile=(8, 4))
    assert decode_tiff_pixels(blob) == (w, h, 1, g)
    # planar + tiled round-trips since round 14
    blob = encode_tiff(rgb, w, h, 3, planar=True, tile=(8, 4))
    assert decode_tiff_pixels(blob) == (w, h, 3, rgb)


def test_tiff16_roundtrip_matrix():
    """Round-11: 16-bit TIFF decode (the last strip-layout codec
    guard).  Full fixture matrix — byte orders × {none, PackBits, LZW,
    Deflate} × sample-width predictor × chunky/planar × WhiteIsZero ×
    single/multi-strip — decodes to the high-byte view of the exact
    samples (the PNG-16 downconversion convention)."""
    import itertools

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    n = 0
    for e, comp, pred, planar, wiz, rps in itertools.product(
        ["<", ">"],
        ["none", "packbits", "lzw", "deflate"],
        [False, True],
        [False, True],
        [False, True],
        [None, 2],
    ):
        if planar and wiz:  # planar needs RGB, WhiteIsZero needs gray
            continue
        c = 3 if planar else (1 if wiz else 3)
        w, h = 7, 5
        vals = [(i * 1031 + 7) % 65536 for i in range(w * h * c)]
        b = encode_tiff(
            vals, w, h, c, endian=e, bits=16, rows_per_strip=rps,
            packbits=comp == "packbits", lzw=comp == "lzw",
            deflate=comp == "deflate", predictor=pred, planar=planar,
            white_is_zero=wiz,
        )
        dw, dh, dc, px = decode_tiff_pixels(b)
        assert (dw, dh, dc) == (w, h, c)
        assert px == bytes(v >> 8 for v in vals), (e, comp, pred, planar, wiz, rps)
        n += 1
    assert n == 96


def test_tiff16_predictor_is_sample_width():
    """A 16-bit predictor-2 file differenced at BYTE width would decode
    to garbage: pin one hand-built case where the two interpretations
    diverge (sample deltas cross the byte boundary)."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    vals = [1000, 2000, 300, 65535, 0, 42]  # deltas wrap + cross bytes
    b = encode_tiff(vals, 3, 2, 1, endian=">", bits=16, predictor=True)
    _, _, _, px = decode_tiff_pixels(b)
    assert px == bytes(v >> 8 for v in vals)


def test_tiff16_guards_stay_loud():
    import pytest

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    # mixed / unsupported depths refuse at decode
    b = encode_tiff([0] * 12, 4, 3, 1, bits=16)
    mutated = b.replace((16).to_bytes(2, "little"), (12).to_bytes(2, "little"), 1)
    with pytest.raises((NotImplementedError, ValueError)):
        decode_tiff_pixels(mutated)


def test_tiff16_tiled_roundtrip_matrix():
    """Tiled 16-bit TIFF (round 13 — closes the q449 guard): sample-
    width predictor per tile row, both byte orders, every compression,
    gray/RGB, WhiteIsZero, edge-padded tile grids; low bytes carry
    content so a wrong-byte high-byte view cannot pass."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    w, h = 21, 13
    for e in ("<", ">"):
        for comp in ({}, {"packbits": True}, {"lzw": True}, {"deflate": True}):
            for pred in (False, True):
                for ch in (1, 3):
                    wiz_opts = (False, True) if ch == 1 else (False,)
                    for wiz in wiz_opts:
                        px = [
                            ((40 + 5 * i) % 256) * 256 + (i % 256)
                            for i in range(w * h * ch)
                        ]
                        t = encode_tiff(
                            px, w, h, ch, endian=e, predictor=pred,
                            white_is_zero=wiz, tile=(8, 4), bits=16, **comp,
                        )
                        dw, dh, dc, out = decode_tiff_pixels(t)
                        exp = bytes(
                            (40 + 5 * i) % 256 for i in range(w * h * ch)
                        )
                        assert (dw, dh, dc) == (w, h, ch)
                        assert out == exp, (e, comp, pred, ch, wiz)


def test_bmp_core_header_round_trips():
    """OS/2 BITMAPCOREHEADER (12-byte DIB, round 13 — the last BMP
    header family): 16-bit dims, BGR-triple palette normalized to
    quads, bottom-up only; 24-bit and every palettized depth."""
    import random

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_bmp_pixels,
        decode_real,
        encode_bmp,
    )

    w, h = 19, 11
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            rgb += bytes(
                (
                    (40 + 2 * x + y) % 256,
                    (200 - x - 2 * y) % 256,
                    (30 + x + 3 * y) % 256,
                )
            )
    blob = encode_bmp(bytes(rgb), w, h, 24, core=True)
    assert decode_bmp_pixels(blob) == (w, h, 3, bytes(rgb))
    # through the container dispatcher too
    assert decode_real(blob) == ("bmp", w, h, 3, bytes(rgb))

    rng = random.Random(5)
    for bpp in (1, 4, 8):
        n = 1 << bpp
        pal = bytes(rng.randrange(256) for _ in range(3 * n))
        idx = bytes(rng.randrange(n) for _ in range(w * h))
        b = encode_bmp(idx, w, h, bpp, palette=pal, core=True)
        dw, dh, dc, out = decode_bmp_pixels(b)
        exp = b"".join(
            bytes((pal[3 * i], pal[3 * i + 1], pal[3 * i + 2])) for i in idx
        )
        assert (dw, dh, dc) == (w, h, 3)
        assert out == exp, bpp

    # core constraints stay loud
    with pytest.raises(ValueError, match="bottom-up"):
        encode_bmp(bytes(rgb), w, h, 24, core=True, top_down=True)
    # OS/2 v2 SHORT headers (cbFix 16/20/36) decode since round 14;
    # sub-16 sizes stay a loud guard; RLE24 (4) decodes since round 15
    # and Huffman-1D (3) since round 16 — but ONLY on 1-bit rasters, so
    # a 24-bit frame relabeled compression 3 is structurally corrupt
    import struct

    for fix in (16, 20, 36):
        b16 = encode_bmp(bytes(rgb), w, h, 24, os2_v2_fix=fix)
        assert decode_bmp_pixels(b16) == (w, h, 3, bytes(rgb)), fix
        pal16 = bytes(rng.randrange(256) for _ in range(3 * 16))
        idx16 = bytes(rng.randrange(16) for _ in range(w * h))
        b4 = encode_bmp(idx16, w, h, 4, palette=pal16, os2_v2_fix=fix)
        exp4 = b"".join(pal16[3 * i : 3 * i + 3] for i in idx16)
        assert decode_bmp_pixels(b4) == (w, h, 3, exp4), fix
    v2 = bytearray(encode_bmp(bytes(rgb), w, h, 24, os2_v2_fix=20))
    v2[30:34] = struct.pack("<I", 3)  # OS/2 Huffman 1D on 24-bit: corrupt
    with pytest.raises(ValueError, match="requires 1-bit"):
        decode_bmp_pixels(bytes(v2))
    tiny = bytearray(encode_bmp(bytes(rgb), w, h, 24, os2_v2_fix=16))
    tiny[14:18] = struct.pack("<I", 13)
    with pytest.raises(NotImplementedError, match="DIB header size"):
        decode_bmp_pixels(bytes(tiny))


def test_tiff_jpeg_tiled_and_rgb_round_trips():
    """Round 14: tiled JPEG-in-TIFF (tags 322-325, full-size padded
    edge tiles) and photometric-2 RGB-component streams — every
    combination must decode back to the per-segment encode_jpeg decode
    exactly (and the RGB path skips the YCbCr matrix: maxdiff vs the
    source collapses to quantization-only)."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff_jpeg,
    )

    w, h = 37, 29
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            rgb += bytes(((40 + 2 * x + y) % 256, (200 - x - 2 * y) % 256,
                          (30 + x + 3 * y) % 256))
    rgb = bytes(rgb)
    gray = bytes((40 + 2 * (i % w) + 3 * (i // w)) % 256
                 for i in range(w * h))
    src = np.frombuffer(rgb, np.uint8).astype(int)

    for kwargs in (
        dict(tile=(16, 16)),
        dict(tile=(16, 16), shared_tables=True),
        dict(photometric_rgb=True),
        dict(photometric_rgb=True, shared_tables=True),
        dict(photometric_rgb=True, tile=(16, 16)),
    ):
        blob = encode_tiff_jpeg(rgb, w, h, 3, quality=95, **kwargs)
        dw, dh, dc, px = decode_tiff_pixels(blob)
        assert (dw, dh, dc) == (w, h, 3), kwargs
        diff = np.abs(src - np.frombuffer(px, np.uint8).astype(int)).max()
        # q95 4:4:4: a couple of quanta; RGB path has no chroma matrix
        assert diff <= (1 if kwargs.get("photometric_rgb") else 2), kwargs
    dw, dh, dc, px = decode_tiff_pixels(
        encode_tiff_jpeg(gray, w, h, 1, quality=100, tile=(16, 16))
    )
    assert (dw, dh, dc, px) == (w, h, 1, gray)  # q100 gray: exact


def test_tiff_jpeg_excess_strips_rejected():
    """A malformed JPEG-in-TIFF carrying more strips than ImageLength
    needs must raise, not silently append pixels past the image (the
    rows bound would otherwise go negative and slice most of the
    extra strip into the output buffer)."""
    from syslog_handler_with_clickhouse_spark.operators.jpeg import (
        encode_jpeg,
    )
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        _decode_tiff_jpeg,
    )

    w, h, rps = 9, 19, 8  # 3 strips cover 8 + 8 + 3 rows
    strips, buf = [], bytearray()
    for r0 in range(0, h, rps):
        rows = min(rps, h - r0)
        seg = bytes((30 + x + y) & 0xFF for y in range(rows)
                    for x in range(w))
        j = encode_jpeg(seg, w, rows, 1, quality=100)
        strips.append((len(buf), len(j)))
        buf += j
    # duplicate the last strip: a 4th strip starts past row 19
    strips.append(strips[-1])
    tags = {273: [o for o, _ in strips], 279: [c for _, c in strips],
            278: [rps]}
    one = lambda t, d: tags.get(t, [d])[0]
    with pytest.raises(ValueError, match="past image height"):
        _decode_tiff_jpeg(bytes(buf), tags, one, w, h, 1, 1)


def test_tiff_jpeg_in_tiff_round_trips():
    """New-style JPEG-in-TIFF (Compression 7, round 13): per-strip
    abbreviated JPEG streams, both the self-contained and the shared
    JPEGTables (tag 347) forms, gray + color + 4:2:0; decode must
    equal per-strip decode of the same encode_jpeg streams exactly."""
    from syslog_handler_with_clickhouse_spark.operators.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff_jpeg,
    )

    w, h = 21, 19
    gray = bytes((40 + 2 * (i % w) + 3 * (i // w)) for i in range(w * h))
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            rgb += bytes((40 + 2 * x + y, 200 - x - 2 * y, 30 + x + 3 * y))
    for ch, px in ((1, gray), (3, bytes(rgb))):
        for shared in (False, True):
            subs = (False,) if ch == 1 else (False, True)
            for sub in subs:
                q = 100 if ch == 1 else 85
                blob = encode_tiff_jpeg(
                    px, w, h, ch, quality=q, rows_per_strip=8,
                    shared_tables=shared, subsample=sub,
                )
                dw, dh, dc, out = decode_tiff_pixels(blob)
                assert (dw, dh, dc) == (w, h, ch)
                exp = bytearray()
                for r0 in range(0, h, 8):
                    rows = min(8, h - r0)
                    seg = px[r0 * w * ch : (r0 + rows) * w * ch]
                    j = encode_jpeg(seg, w, rows, ch, quality=q,
                                    subsample=sub)
                    exp += decode_jpeg_pixels(j)[3]
                assert out == bytes(exp), (ch, shared, sub)
    # round 14: tiled and RGB-photometric JPEG-in-TIFF decode (see
    # test_tiff_jpeg_tiled_and_rgb_round_trips); a photometric value
    # outside {1, 2, 6} stays a loud guard
    blob = encode_tiff_jpeg(gray, w, h, 1)
    mutated = bytearray(blob)
    i = mutated.find((262).to_bytes(2, "little"))
    mutated[i + 8] = 5  # photometric CMYK-ish — unsupported
    with pytest.raises(NotImplementedError, match="variant unsupported"):
        decode_tiff_pixels(bytes(mutated))


def test_tiff_tiled_planar_round_trips():
    """Round 14: PLANARCONFIG_SEPARATE tiles (plane-major single-sample
    tiles, TIFF §15) round-trip bit-exactly across endians,
    compressions, predictor and 8/16-bit depths (16-bit decodes to the
    high-byte view, the strip-path convention)."""
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff,
    )

    w, h = 21, 13
    rgb = bytes((30 + 7 * i) % 256 for i in range(w * h * 3))
    for e in ("<", ">"):
        for kwargs in (dict(), dict(packbits=True),
                       dict(lzw=True, predictor=True), dict(deflate=True)):
            blob = encode_tiff(rgb, w, h, 3, endian=e, planar=True,
                               tile=(16, 16), **kwargs)
            assert decode_tiff_pixels(blob) == (w, h, 3, rgb), (e, kwargs)
    samples = [(i * 257) % 65536 for i in range(w * h * 3)]
    blob = encode_tiff(samples, w, h, 3, endian=">", planar=True,
                       tile=(16, 16), bits=16, lzw=True, predictor=True)
    exp = bytes((v >> 8) & 0xFF for v in samples)
    assert decode_tiff_pixels(blob) == (w, h, 3, exp)


def test_tiff_jpeg_tiled_planar_round_trips():
    """Round 15: PLANARCONFIG_SEPARATE JPEG tiles (plane-major
    single-component streams, the libtiff planar-JPEG layout,
    interop-verified in tests/test_tiff_interop.py).  The decode must
    equal the manual assembly — each plane tile decoded as grayscale
    and blitted into its channel lane — exactly, and sit within JPEG
    rounding of the source; planar YCbCr tiles stay a loud guard."""
    import pytest

    from syslog_handler_with_clickhouse_spark.operators.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff_jpeg,
    )

    w, h, tw, th = 37, 29, 16, 16
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf += bytes(((40 + 2 * x + y) % 256, (200 - x - 2 * y) % 256,
                          (30 + x + 3 * y) % 256))
    px = bytes(buf)
    for shared in (False, True):
        blob = encode_tiff_jpeg(px, w, h, 3, quality=95,
                                photometric_rgb=True, tile=(tw, th),
                                planar=True, shared_tables=shared)
        dw, dh, dc, out = decode_tiff_pixels(blob)
        assert (dw, dh, dc) == (w, h, 3)
        # manual assembly: per-plane padded tiles through the JPEG codec
        exp = bytearray(w * h * 3)
        for s in range(3):
            for ty in range(0, h, th):
                for tx in range(0, w, tw):
                    seg = bytearray(tw * th)
                    for r in range(th):
                        sy = min(ty + r, h - 1)
                        for c in range(tw):
                            sx = min(tx + c, w - 1)
                            seg[r * tw + c] = px[(sy * w + sx) * 3 + s]
                    dec = decode_jpeg_pixels(
                        encode_jpeg(bytes(seg), tw, th, 1, quality=95)
                    )[3]
                    rows = min(th, h - ty)
                    cols = min(tw, w - tx)
                    for r in range(rows):
                        for c in range(cols):
                            exp[((ty + r) * w + tx + c) * 3 + s] = dec[
                                r * tw + c
                            ]
        assert out == bytes(exp), shared
        assert max(
            abs(a - b) for a, b in zip(out, px)
        ) <= 2
    # round 16 closed the planar-YCbCr guard: relabelling a planar-RGB
    # file photometric 6 is now structurally CORRUPT — the full-size
    # "chroma" tiles contradict the (default 2,2) subsampled grid
    blob = encode_tiff_jpeg(px, w, h, 3, quality=95, photometric_rgb=True,
                            tile=(tw, th), planar=True)
    mutated = bytearray(blob)
    i = mutated.find((262).to_bytes(2, "little"))
    mutated[i + 8] = 6  # flip photometric RGB -> YCbCr
    with pytest.raises(ValueError, match="expected"):
        decode_tiff_pixels(bytes(mutated))


def test_tiff_jpeg_tiled_separated_ycbcr_round_trips():
    """Round 16: tiled separated-YCbCr JPEG-in-TIFF (planar config 2 +
    photometric 6 + tag 530 — the r15 guard): chroma planes at
    ceil(w/hs) × ceil(h/vs), tiled on the luma ta×td grid in
    ceil(tw/hs) × ceil(th/vs) single-component streams, plane-major.
    Decode must recover the source within JPEG + subsampling loss at
    every legal factor pair, both JPEGTables forms; bad subsampling
    factors stay loud."""
    import pytest

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_tiff_pixels,
        encode_tiff_jpeg,
    )

    w, h = 37, 29
    buf = bytearray()
    for y in range(h):
        for x in range(w):
            buf += bytes(((40 + 2 * x + y) % 256, (200 - x - 2 * y) % 256,
                          (30 + x + 3 * y) % 256))
    px = bytes(buf)
    for hs, vs, tol in ((2, 2, 4), (1, 1, 2), (2, 1, 3), (4, 2, 6),
                        (1, 4, 8)):
        for shared in (False, True):
            blob = encode_tiff_jpeg(
                px, w, h, 3, quality=95, tile=(16, 16), planar=True,
                ycbcr_subsampling=(hs, vs), shared_tables=shared,
            )
            dw, dh, dc, out = decode_tiff_pixels(blob)
            assert (dw, dh, dc) == (w, h, 3)
            assert max(abs(a - b) for a, b in zip(out, px)) <= tol, (
                hs, vs, shared,
            )
    with pytest.raises(ValueError, match="subsampling"):
        encode_tiff_jpeg(px, w, h, 3, tile=(16, 16), planar=True,
                         ycbcr_subsampling=(3, 2))
    # a corrupt tag-530 value in the FILE is refused loudly too
    blob = encode_tiff_jpeg(px, w, h, 3, tile=(16, 16), planar=True)
    mutated = bytearray(blob)
    i = mutated.find((530).to_bytes(2, "little"))
    assert i > 0
    mutated[i + 8] = 3
    with pytest.raises(NotImplementedError, match="subsampling"):
        decode_tiff_pixels(bytes(mutated))


def test_bmp_rle24_round_trips():
    """Round 15: OS/2 2.x RLE24 (compression 4 in the v2 short header —
    the RLE8 escape grammar with BGR-triple payloads).  Encoded and
    word-aligned absolute-run forms round-trip exactly; a delta escape
    skips pixels (left black); a truncated encoded run stays loud."""
    import random
    import struct

    import pytest

    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_rle24,
    )

    w, h = 19, 11
    rng = random.Random(15)
    # runs of random length so the encoder emits real multi-pixel runs
    px = bytearray()
    while len(px) < w * h * 3:
        trip = bytes(rng.randrange(256) for _ in range(3))
        px += trip * rng.randrange(1, 7)
    px = bytes(px[: w * h * 3])
    for absolute in (False, True):
        blob = encode_bmp_rle24(px, w, h, absolute_runs=absolute)
        assert decode_bmp_pixels(blob) == (w, h, 3, px), absolute

    # delta escape: (0,2,dx,dy) from the row start leaves the skipped
    # pixels black — build a 4x3 stream by hand (bottom-up rows)
    data = bytes([
        0, 2, 2, 1,          # delta: x+=2, y+=1 (skip bottom row + 2 px)
        2, 10, 20, 30,       # two pixels BGR(10,20,30) on middle row
        0, 0,                # EOL
        4, 40, 50, 60,       # full top row
        0, 1,                # EOD
    ])
    dib = struct.pack("<IiiHHI", 20, 4, 3, 1, 24, 4)
    hdr = b"BM" + struct.pack("<IHHI", 34 + len(data), 0, 0, 34)
    dw, dh, dc, out = decode_bmp_pixels(hdr + dib + data)
    assert (dw, dh, dc) == (4, 3, 3)
    rows = [out[r * 4 * 3 : (r + 1) * 4 * 3] for r in range(3)]
    assert rows[0] == bytes((60, 50, 40)) * 4          # top row (y=2)
    assert rows[1] == (b"\x00" * 6                      # y=1: 2 skipped
                       + bytes((30, 20, 10)) * 2)
    assert rows[2] == b"\x00" * 12                      # y=0: skipped
    # truncated encoded run is loud
    bad = hdr + dib + bytes([5, 1])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp_pixels(bad)
