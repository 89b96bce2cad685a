"""Baseline sequential JPEG (SOF0) codec — stdlib + numpy only.

Closes the last 'partial' inventory cell: JPEG *pixel* decode
(``multimodal.decode_real`` previously raised ``NotImplementedError``
for JPEG; header/dimension probing was already real).  Both directions
are implemented so the correctness oracle can be construct-then-decode
(the q224 PNG / q250 GIF pattern): the encoder builds genuinely valid
baseline JPEGs executor-side, the decoder runs the REAL entropy decode
(Huffman → dequantize → IDCT → upsample → YCbCr→RGB), and aggregated
channel statistics are pinned against the source pattern within the
quantization-error tolerance.

Scope (what "baseline" means here, per ITU-T T.81):
- SOF0 (and SOF1 extended-sequential, which decodes identically for
  8-bit), 8-bit precision, 1 or 3 components.
- Arbitrary per-component sampling factors in the general MCU loop —
  4:4:4, 4:2:2 and 4:2:0 all decode; the encoder emits 4:4:4 or 4:2:0.
- Restart markers (DRI/RSTn): DC predictors reset, bit reader
  re-aligns; the encoder can emit them so the path is testable.
- Progressive (SOF2), BOTH axes: SPECTRAL SELECTION (multi-scan decode
  with DC scans, single-component AC band scans, general EOB runs,
  inter-scan DHT redefinition) and SUCCESSIVE APPROXIMATION (Al-shifted
  first scans, raw-bit DC refinement, AC refinement with correction
  bits + EOB-run-buffered bits — T.81 G.1.2.3 / the libjpeg
  encode_mcu_AC_refine bookkeeping).  Arbitrary sampling factors:
  interleaved (multi-component) scans walk the MCU-padded grid while
  non-interleaved scans walk the component's own block grid, so 4:2:0
  progressive decodes too.  Restart intervals (DRI/RSTn) work in
  progressive scans: per-scan modulo-8 marker count, DC predictors and
  EOB runs reset, reader re-aligns.  Encoder:
  ``encode_jpeg_progressive(successive=..., subsample=...,
  restart_interval=...)``.  The entropy layer is provably lossless —
  the progressive decode of an image is bit-identical to its baseline
  decode in every mode combination (unit-pinned).
- 12-BIT PRECISION, baseline grayscale: level shift 2048, 16-bit
  quantization tables (DQT Pq=1), custom DC (16-symbol) / AC (flat
  226-symbol) Huffman tables carried in DHT; decode returns the
  high-byte 8-bit view (>> 4, the 16-bit-PNG convention).  Encoder:
  ``encode_jpeg12``.
- LOSSLESS (SOF3, Annex H): predictive coding with all seven
  predictors, mod-2^16 differences in DC-style VLI categories (cat 16
  = +32768, no extra bits), point transform, restart intervals with
  the first-line-of-interval Ra rule, precisions 2-16 (exact bytes at
  8, high-byte view deeper), interleaved 1x1 components.  Encoder:
  ``encode_jpeg_lossless``.
- ARITHMETIC CODING (SOF9 sequential AND SOF10 progressive): the T.81
  Annex D/E QM coder (113-state estimation table D.3, conditional
  exchange, byte-stuffed renormalization) with the F.1.4.4 DC/AC
  statistical models and DAC conditioning (L/U bounds, Kx split),
  grayscale and color, 4:2:0 and restart intervals included.
  Progressive covers spectral-selection bands and successive
  approximation (point-transformed first scans, fixed-bin DC
  refinement, kex-gated AC refinement) with per-scan statistics
  reset.  Encoders: ``encode_jpeg_arith`` /
  ``encode_jpeg_arith_progressive`` — the same DCT/quantize pipeline
  as ``encode_jpeg`` with the entropy layer swapped, so arithmetic
  and Huffman decodes of the same image are bit-identical (the
  differential oracle the tests pin).
- LOSSLESS-ARITHMETIC (SOF11, round 16): the SOF3 predictive walk
  with the QM coder under the Annex H.1.2.2 conditioning model (25
  (Da, Db) category-pair contexts, Db-selected magnitude sections,
  158-bin statistics area); predictors 1-7, precisions 2-16, point
  transform, restart intervals.  Encoder:
  ``encode_jpeg_lossless_arith``.  Verification is roundtrip +
  decoded-pixel equality with the SOF3 path — libjpeg-turbo rejects
  lossless+arithmetic, so no cross-implementation stream exists
  (refusal-pinned in tests/test_jpeg_lossless_arith.py).
- HIERARCHICAL (DHP/EXP, Annex J, round 16): the multi-frame walk
  with the J.1.1.2 expansion filter and ceil-pyramid odd-dimension
  trimming.  Lossless pyramid: SOF3/SOF11 base + SOF7/SOF15
  zero-prediction differential frames in both entropy layers — every
  level reconstructs exactly.  DCT progression: SOF0/SOF9 non-differential
  base and SOF5/SOF13 differential middles (Huffman AND QM
  arithmetic, 1×1, precision 8, DC coded without prediction per
  J.1.1.5) with a lossless final frame — the encoder closes the loop
  through the decoder's own ``_dct_rows_to_plane`` reconstruction, so
  the overall decode is STILL bit-exact.  PROGRESSIVE hierarchical
  frames (round 16: SOF6/SOF14 differential, SOF2/SOF10 as a DHP
  base) decode through the flat progressive walkers in frame-scoped
  mode — multi-scan spectral selection + successive approximation
  with per-block PRED = 0 DC in differential frames — closing the
  last JPEG frame-type guard.  Encoder: ``encode_jpeg_hierarchical``
  (``progressive=``/``successive=``).  12-bit arithmetic (SOF9/SOF10,
  round 15) decodes; ``encode_jpeg_arith12`` is its fixture twin.

All constant tables below are the public ITU-T T.81 Annex K examples
(the tables every libjpeg-compatible encoder ships).  The DCT is the
exact float DCT-II as an 8×8 orthonormal matrix product (numpy), not a
fast-integer approximation — bit-exactness with libjpeg is NOT a goal;
round-trip accuracy within quantization error is, and the unit tests
pin it (quality-100 round trip ≤ 1 LSB, FDCT/IDCT inverse pair to
float precision).

Spark integration: ``multimodal.decode_real`` dispatches SOI-marked
payloads here, so the Arrow-batched ``decode_assets`` mapInPandas path
(bytes never on the driver, O(1) output per asset) covers JPEG with no
new plumbing.  Registry entry: q331.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------
# ITU-T T.81 Annex K constant tables (public spec examples)
# ---------------------------------------------------------------------

# zigzag position -> natural (row-major) index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# K.1 / K.2 quantization tables, natural order
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# K.3 Huffman table examples: (bits[1..16], huffval)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
for _bits, _vals in (DC_LUM, DC_CHROM, AC_LUM, AC_CHROM):
    assert sum(_bits) == len(_vals), "corrupt Annex K Huffman table"

# orthonormal 8x8 DCT-II matrix: FDCT = D @ f @ D.T, IDCT = D.T @ F @ D
_D = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _D[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def fdct2(block: np.ndarray) -> np.ndarray:
    """2-D forward DCT of one level-shifted 8x8 block."""
    return _D @ block @ _D.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """2-D inverse DCT (exact inverse of :func:`fdct2`)."""
    return _D.T @ coef @ _D


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """Quality-scaled quantization table (the public libjpeg mapping:
    50 → base table, 100 → all-ones/lossless-quantization)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_huffman(bits, vals):
    """Canonical JPEG Huffman code assignment.  Returns
    (encode: symbol -> (code, length), decode: (length, code) -> symbol)."""
    enc, dec = {}, {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            dec[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


# ---------------------------------------------------------------------
# bit I/O with JPEG byte stuffing
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        """Pad the final partial byte with 1-bits (spec convention)."""
        while self.n:
            self.write(1, 1)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                # a real marker inside entropy data — only legal at a
                # restart boundary, which sync_restart() consumes
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} in entropy data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expect: int):
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.n = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("missing restart marker")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != (
            0xD0 + (expect & 7)
        ):
            raise ValueError(
                f"bad restart marker at {self.pos}: "
                f"{self.data[self.pos:self.pos + 2].hex()}"
            )
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s low bits back to the signed coefficient."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------
# numpy-batched entropy decode (round-11 verdict directive 5)
# ---------------------------------------------------------------------
# The sequential baseline decoder's hot loop was a per-BIT Python walk
# (_BitReader.read_bit + a dict probe per bit, ~15 Python ops per
# Huffman symbol) — measured at ~29 assets/s/core on 64×64 baseline
# JPEG, ~10³× off native codecs.  The stream stays inherently serial
# across symbols (each symbol's boundary depends on the previous
# decode), but per SYMBOL the work drops to O(1) array lookups:
#
#   * the entropy bytes are unstuffed/segmented ONCE with numpy
#     (_entropy_segments), instead of a Python branch per byte;
#   * a 2^16-entry canonical fast table (T.81 F.2.2.3's lookahead
#     idea taken to the full 16-bit max code length) maps the next 16
#     bits straight to (symbol, code length) — one index, no bit loop;
#   * the 16-bit lookahead itself comes from a precomputed per-byte
#     24-bit window (b24), so peeking at bit position p is two integer
#     ops — no accumulator refills;
#   * the IDCT + dequant + dezigzag then run BATCHED over every block
#     of a component in one einsum-shaped matmul (idct2 broadcasts),
#     instead of per-block 8×8 matmuls.
#
# The progressive decoder rides the same machinery through
# _FastScanReader (a _BitReader-compatible facade, so its multi-scan /
# EOB-run / refinement logic stays verbatim); the lossless decoder
# keeps the original _BitReader — it is not on any bench path and its
# per-sample predictor loop, not entropy I/O, dominates.


_FAST_TABLE_CACHE: dict = {}
_HUFF_DEC_CACHE: dict = {}


def _build_huffman_dec_cached(bits, vals):
    """Memoized decode dict of _build_huffman, same keying rationale as
    _fast_table_cached (the scalar _BitReader fallback paths — lossless,
    12-bit — still probe the (length, code) dict)."""
    key = (bytes(bits), bytes(vals))
    dec = _HUFF_DEC_CACHE.get(key)
    if dec is None:
        if len(_HUFF_DEC_CACHE) > 256:
            _HUFF_DEC_CACHE.clear()
        dec = _build_huffman(bits, vals)[1]
        _HUFF_DEC_CACHE[key] = dec
    return dec


def _fast_table_cached(bits, vals):
    """Memoized _fast_table keyed by the DHT payload: a corpus's images
    overwhelmingly share Huffman tables (this repo's encoder always
    emits the T.81 Annex K defaults), so per-image table construction
    (~0.3 ms for the four tables) amortizes to a dict probe.  Bounded:
    distinct tables are few; evict-all past 256 as a runaway guard."""
    key = (bytes(bits), bytes(vals))
    tab = _FAST_TABLE_CACHE.get(key)
    if tab is None:
        if len(_FAST_TABLE_CACHE) > 256:
            _FAST_TABLE_CACHE.clear()
        tab = _fast_table(bits, vals)
        _FAST_TABLE_CACHE[key] = tab
    return tab


def _fast_table(bits, vals):
    """Canonical-Huffman full-lookahead decode table: for every 16-bit
    window value, the symbol it starts with and that code's length
    (0 = invalid prefix).  Same code assignment as _build_huffman;
    codes of one length are consecutive, so each (symbol, length) fills
    one contiguous [code<<(16-L), +2^(16-L)) slab — pure np.repeat.
    Returned as BYTES, not ndarrays: the decode loop indexes one entry
    per symbol, and bytes indexing returns a Python int in ~40 ns where
    a numpy scalar index pays ~4× that in boxing (profiled round 13)."""
    syms = np.zeros(65536, dtype=np.uint8)
    lens = np.zeros(65536, dtype=np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        nb = bits[length - 1]
        if nb:
            span = 1 << (16 - length)
            start = code << (16 - length)
            if start + nb * span > 65536:
                raise ValueError("corrupt JPEG Huffman table (Kraft > 1)")
            syms[start : start + nb * span] = np.repeat(
                np.asarray(vals[k : k + nb], dtype=np.uint8), span
            )
            lens[start : start + nb * span] = length
            code += nb
            k += nb
        code <<= 1
    return bytes(syms), bytes(lens)


class _FastBitReader:
    """Bit reader over ONE unstuffed restart segment: bit position p
    peeks its next 16 bits out of a per-byte 24-bit window in two
    integer ops; Huffman decode is a single _fast_table index."""

    __slots__ = ("b24", "nbits", "p", "d8")

    def __init__(self, data):
        if data.size == 0:
            # back-to-back RSTn markers yield an empty restart segment —
            # a restart interval always covers ≥1 MCU, so this is a
            # corrupt stream; raise the decoder's contract error instead
            # of letting peek16 IndexError out (driver advice r12: the
            # old scalar _BitReader raised ValueError here)
            raise ValueError("empty JPEG restart segment (corrupt stream)")
        d = np.concatenate(
            [data.astype(np.int64), np.zeros(4, dtype=np.int64)]
        )
        # two PADDING windows past the data keep peek16 in-bounds at
        # p == nbits (a walker over-asking at exact exhaustion), so the
        # hot loop stays branch-free; decode/receive still raise the
        # truncation ValueError before consuming padding bits
        # a PYTHON list: the per-symbol loops index b24 once or twice
        # per symbol, and list indexing returns the int directly —
        # numpy scalar indexing boxes a np.int64 every probe (~4×
        # slower, profiled round 13); tolist() is one linear pass
        self.b24 = ((d[:-2] << 16) | (d[1:-1] << 8) | d[2:]).tolist()
        self.nbits = int(data.size) * 8
        self.p = 0
        self.d8 = data

    def receive_bits(self, n: int):
        """BATCH read of ``n`` raw (uncoded) bits as an int64 0/1 array —
        the vector lane for progressive refinement scans, where entire
        block runs consume one literal bit per (block | nonzero coef)
        with no Huffman decode in between (round-12 verdict directive
        5).  Order matches n consecutive ``receive(1)`` calls exactly."""
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        if self.p + n > self.nbits:
            raise ValueError("JPEG entropy stream truncated")
        q = np.arange(self.p, self.p + n)
        self.p += n
        return ((self.d8[q >> 3] >> (7 - (q & 7))) & 1).astype(np.int64)

    def peek16(self) -> int:
        p = self.p
        return (self.b24[p >> 3] >> (8 - (p & 7))) & 0xFFFF

    def decode_rs_val(self, tab) -> tuple[int, int, int]:
        """FUSED Huffman decode + VLC receive + T.81 EXTEND for a
        (run, size)-coded symbol: one Python call per symbol instead of
        decode/receive/_extend three — profiling shows per-call overhead
        IS the entropy decoder's remaining cost once the table lookups
        are O(1) (round-12 verdict directive 5).  Returns (run, size,
        value); value is 0 when size is 0, the sign-extended coefficient
        otherwise.  DC tables (symbol = size, run nibble 0) compose: the
        returned value is exactly EXTEND(RECEIVE(size))."""
        p = self.p
        v16 = (self.b24[p >> 3] >> (8 - (p & 7))) & 0xFFFF
        ln = tab[1][v16]
        if ln == 0 or p + ln > self.nbits:
            raise ValueError(
                "invalid JPEG Huffman code"
                if ln == 0
                else "JPEG entropy stream truncated"
            )
        rs = tab[0][v16]
        p += ln
        s = rs & 15
        if s:
            if p + s > self.nbits:
                raise ValueError("JPEG entropy stream truncated")
            val = ((self.b24[p >> 3] >> (8 - (p & 7))) & 0xFFFF) >> (
                16 - s
            )
            p += s
            if val < (1 << (s - 1)):
                val += 1 - (1 << s)
        else:
            val = 0
        self.p = p
        return rs >> 4, s, val

    def decode(self, table) -> int:
        v = self.peek16()
        ln = table[1][v]
        if ln == 0 or self.p + ln > self.nbits:
            raise ValueError(
                "invalid JPEG Huffman code"
                if ln == 0
                else "JPEG entropy stream truncated"
            )
        self.p += ln
        return table[0][v]

    def receive(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self.p + nbits > self.nbits:
            raise ValueError("JPEG entropy stream truncated")
        v = self.peek16() >> (16 - nbits)
        self.p += nbits
        return v


def _entropy_segments(b: bytes, pos: int):
    """Split the entropy-coded data at ``pos`` into per-restart-interval
    unstuffed byte arrays, one numpy pass over the 0xFF positions:
    0xFF00 stuffing is dropped, RSTn markers end a segment (their
    modulo-8 sequence is validated, E.1.4), any other marker terminates
    the scan.  Returns (segments, end_of_entropy_pos)."""
    data = np.frombuffer(b, dtype=np.uint8)
    segs = []
    start = pos
    cur_del: list[int] = []
    rst = 0
    end = None
    skip_to = pos
    for rel in np.nonzero(data[pos:] == 0xFF)[0]:
        i = pos + int(rel)
        if i < skip_to:
            continue
        if i + 1 >= len(b):
            raise ValueError("JPEG entropy stream truncated at 0xFF")
        nxt = data[i + 1]
        if nxt == 0x00:  # stuffed data byte
            cur_del.append(i + 1 - start)
            skip_to = i + 2
        elif 0xD0 <= nxt <= 0xD7:  # restart boundary
            if nxt - 0xD0 != rst & 7:
                raise ValueError(
                    f"bad restart marker at {i}: {b[i:i + 2].hex()}"
                )
            rst += 1
            segs.append(np.delete(data[start:i], cur_del))
            cur_del = []
            start = i + 2
            skip_to = i + 2
        else:  # a real marker: end of entropy data
            end = i
            break
    if end is None:
        raise ValueError("JPEG entropy stream truncated (no marker)")
    segs.append(np.delete(data[start:end], cur_del))
    return segs, end


class _FastScanReader:
    """_BitReader-compatible facade over _entropy_segments + per-segment
    _FastBitReaders — lets the progressive/multi-scan walker keep its
    scan logic verbatim while its Huffman decodes become fast-table
    lookups.  ``pos`` reports the terminating marker's offset (the only
    position the scan walker reads, to resume the marker walk)."""

    __slots__ = ("_segs", "_si", "_r", "pos")

    def __init__(self, b: bytes, pos: int):
        self._segs, self.pos = _entropy_segments(b, pos)
        self._si = 0
        self._r = _FastBitReader(self._segs[0])

    def decode(self, ftab) -> int:
        return self._r.decode(ftab)

    def receive(self, nbits: int) -> int:
        return self._r.receive(nbits)

    def receive_bits(self, n: int):
        return self._r.receive_bits(n)

    def decode_rs_val(self, tab):
        return self._r.decode_rs_val(tab)

    def read_bit(self) -> int:
        return self._r.receive(1)

    def sync_restart(self, expect: int):
        # marker ids were already sequence-validated during
        # segmentation; here a missing segment = a missing marker
        self._si += 1
        if self._si >= len(self._segs):
            raise ValueError("missing restart marker")
        self._r = _FastBitReader(self._segs[self._si])


def _decode_huff(r: _BitReader, dec: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = dec.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


# ---------------------------------------------------------------------
# color transforms (JFIF YCbCr)
# ---------------------------------------------------------------------


def rgb_to_ycbcr(rgb: np.ndarray, center: float = 128.0) -> np.ndarray:
    """``center`` is the chroma zero point — 2^(P-1) (128.0 for 8-bit,
    2048.0 for 12-bit extended precision)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray, center: float = 128.0) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - center, ycc[..., 2] - center
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------



def _maybe_ycbcr_to_rgb(stack: np.ndarray, comps,
                        center: float = 128.0) -> np.ndarray:
    """3-component color handling: the JFIF default is YCbCr, but
    component ids 'R','G','B' (0x52/0x47/0x42 — the libjpeg JCS_RGB
    convention, jcparam.c's jpeg_set_colorspace and jdapimin.c's
    default_decompress_parms) mark an UNTRANSFORMED RGB stream — the
    form TIFF photometric-2 JPEG strips/tiles carry (TechNote 2)."""
    if [c["id"] for c in comps] == [0x52, 0x47, 0x42]:
        return stack
    return ycbcr_to_rgb(stack, center=center)

def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad a plane to (bh*8, bw*8)."""
    h, w = plane.shape
    return np.pad(
        plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )


def _encode_block(
    w: _BitWriter, qcoef: np.ndarray, dc_pred: int, dc_enc, ac_enc
) -> int:
    """Huffman-encode one quantized block (natural order); returns the
    new DC predictor."""
    zz = qcoef.ravel()[ZIGZAG]
    diff = int(zz[0]) - dc_pred
    s = int(abs(diff)).bit_length()
    code, length = dc_enc[s]
    w.write(code, length)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        w.write(v, s)
    run = 0
    for k in range(1, 64):
        c = int(zz[k])
        if c == 0:
            run += 1
            continue
        while run > 15:
            zcode, zlen = ac_enc[0xF0]  # ZRL
            w.write(zcode, zlen)
            run -= 16
        s = int(abs(c)).bit_length()
        acode, alen = ac_enc[(run << 4) | s]
        w.write(acode, alen)
        v = c if c >= 0 else c + (1 << s) - 1
        w.write(v, s)
        run = 0
    if run:
        ecode, elen = ac_enc[0x00]  # EOB
        w.write(ecode, elen)
    return int(zz[0])


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    rgb_components: bool = False,
) -> bytes:
    """Baseline sequential JPEG encoder.  ``pixels`` is row-major
    grayscale (channels=1) or interleaved RGB (channels=3).
    ``subsample=True`` emits 4:2:0 (chroma box-mean downsampled);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs.  ``rgb_components=True`` (3-channel, no subsampling) stores
    the R/G/B planes UNTRANSFORMED with component ids 'R','G','B' and
    luminance tables on every component — the libjpeg JCS_RGB
    convention, which is how TIFF photometric-2 JPEG strips are
    encoded (no JFIF APP0: JFIF mandates YCbCr)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer length != w*h*c")
    if rgb_components and (channels != 3 or subsample):
        raise ValueError("rgb_components requires 3 channels, 4:4:4")
    img = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.float64)
    )
    qt_lum = scaled_quant(QUANT_LUM, quality)
    qt_chrom = scaled_quant(QUANT_CHROM, quality)

    if channels == 1:
        planes = [img[..., 0]]
        samp = [(1, 1)]
        qts = [qt_lum]
    elif rgb_components:
        planes = [img[..., 0], img[..., 1], img[..., 2]]
        samp = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_lum, qt_lum, qt_lum]
    else:
        ycc = rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # 4:2:0 — pad to even dims (edge), then 2x2 box mean
            ph = height + (height & 1)
            pw = width + (width & 1)
            cbp = np.pad(cb, ((0, ph - height), (0, pw - width)), mode="edge")
            crp = np.pad(cr, ((0, ph - height), (0, pw - width)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_lum, qt_chrom, qt_chrom]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    padded = [
        _pad_to_blocks(p, mcus_y * s[1], mcus_x * s[0])
        for p, s in zip(planes, samp)
    ]

    dc_enc_l, _ = _build_huffman(*DC_LUM)
    ac_enc_l, _ = _build_huffman(*AC_LUM)
    dc_enc_c, _ = _build_huffman(*DC_CHROM)
    ac_enc_c, _ = _build_huffman(*AC_CHROM)
    hufs = [
        (dc_enc_l, ac_enc_l)
        if i == 0 or channels == 1 or rgb_components
        else (dc_enc_c, ac_enc_c)
        for i in range(channels)
    ]

    w = _BitWriter()
    dc_pred = [0] * channels
    rst_count = 0
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            w.flush()
            w.out += bytes([0xFF, 0xD0 + (rst_count & 7)])
            rst_count += 1
            dc_pred = [0] * channels
        my, mx = divmod(m, mcus_x)
        for ci in range(channels):
            hi, vi = samp[ci]
            qt = qts[ci].reshape(8, 8).astype(np.float64)
            for by in range(vi):
                for bx in range(hi):
                    r0 = (my * vi + by) * 8
                    c0 = (mx * hi + bx) * 8
                    block = padded[ci][r0 : r0 + 8, c0 : c0 + 8] - 128.0
                    qcoef = np.round(fdct2(block) / qt).astype(np.int64)
                    dc_pred[ci] = _encode_block(
                        w, qcoef, dc_pred[ci], *hufs[ci]
                    )
    w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    if not rgb_components:
        out += b"\xff\xe0" + struct.pack(
            ">H", 16
        ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT
    qts_emit = (
        [(0, qt_lum)]
        if channels == 1 or rgb_components
        else [(0, qt_lum), (1, qt_chrom)]
    )
    for tid, qt in qts_emit:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64)
        out.append(tid)  # Pq=0 (8-bit), Tq=tid
        out += bytes(int(qt[z]) for z in ZIGZAG)
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * channels, 8, height, width, channels)
    comp_ids = [0x52, 0x47, 0x42] if rgb_components else [1, 2, 3]
    for ci in range(channels):
        hi, vi = samp[ci]
        tq = 0 if (ci == 0 or channels == 1 or rgb_components) else 1
        out += bytes([comp_ids[ci], (hi << 4) | vi, tq])
    # DHT
    tables = (
        [(0x00, DC_LUM), (0x10, AC_LUM)]
        if channels == 1 or rgb_components
        else [(0x00, DC_LUM), (0x10, AC_LUM), (0x01, DC_CHROM), (0x11, AC_CHROM)]
    )
    for tc_th, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
        out.append(tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
    for ci in range(channels):
        td_ta = (
            0x00 if (ci == 0 or channels == 1 or rgb_components) else 0x11
        )
        out += bytes([comp_ids[ci] if channels == 3 else ci + 1, td_ta])
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------


def decode_jpeg_pixels(b: bytes) -> tuple[int, int, int, bytes]:
    """Decode a JPEG (baseline SOF0/SOF1, progressive SOF2, lossless
    SOF3, arithmetic SOF9/SOF10, lossless-arithmetic SOF11,
    hierarchical DHP streams — lossless SOF7/SOF15 differentials and
    sequential-DCT SOF0/SOF5/SOF9/SOF13 frames in both entropy layers
    — and 12-bit baseline grayscale) to ``(width, height, channels,
    pixel_bytes)`` (row-major, interleaved RGB for 3 components,
    grayscale for 1).  Raises ``ValueError`` on corrupt streams and
    ``NotImplementedError`` for the remaining hierarchical variants
    (progressive frames: SOF6/SOF14)."""
    try:
        return _decode_jpeg(b)
    except (IndexError, struct.error) as e:  # truncated stream
        raise ValueError(f"corrupt JPEG stream: {e}") from e


def _decode_jpeg(b: bytes) -> tuple[int, int, int, bytes]:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dec: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    huff_fast: dict[tuple[int, int], tuple] = {}  # 16-bit lookahead tables
    frame = None  # (height, width, comps)
    restart_interval = 0
    scan = None
    progressive = False
    lossless = False
    arith = False
    dac_dc: dict[int, tuple[int, int]] = {}  # Tb -> (L, U)
    dac_ac: dict[int, int] = {}  # Tb -> Kx
    precision = 8

    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if marker == 0xDE:
            # DHP — hand the whole multi-frame walk to the
            # hierarchical decoder (Annex J, lossless pyramid subset)
            return _decode_jpeg_hierarchical(b, pos - 2)
        if marker == 0xDA and progressive and arith:
            # SOF10: multi-scan walk with the QM coder
            return _decode_jpeg_arith_progressive(
                b, pos - 2, qtabs, dac_dc, dac_ac, frame, restart_interval,
                precision,
            )
        if marker == 0xDA and progressive:
            # SOF2: hand the whole remaining walk (scans + interleaved
            # DHT redefinitions) to the multi-scan decoder
            return _decode_jpeg_progressive(
                b, pos - 2, qtabs, huff_fast, frame, restart_interval,
                precision,
            )
        if marker == 0xDA and lossless and arith:
            # SOF11: predictive walk with the QM coder (H.1.2.2 model)
            return _decode_jpeg_lossless_arith(
                b, pos - 2, dac_dc, frame, restart_interval, precision
            )
        if marker == 0xDA and lossless:
            # SOF3: hand the scan to the predictive decoder
            return _decode_jpeg_lossless(
                b, pos - 2, huff_dec, frame, restart_interval, precision
            )
        if marker == 0xDA and arith:
            # SOF9: hand the scan to the QM-coder sequential decoder
            return _decode_jpeg_arith(
                b, pos - 2, qtabs, dac_dc, dac_ac, frame,
                restart_interval, precision,
            )
        seg_len = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("JPEG segment truncated")
        nxt = pos + seg_len
        if marker == 0xDB:  # DQT (Pq=0: 8-bit entries, Pq=1: 16-bit)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                if pq not in (0, 1):
                    raise ValueError(f"invalid DQT precision {pq}")
                if pq == 0:
                    zz = list(seg[sp + 1 : sp + 65])
                    sp += 65
                else:
                    raw = seg[sp + 1 : sp + 129]
                    zz = [
                        (raw[2 * i] << 8) | raw[2 * i + 1] for i in range(64)
                    ]
                    sp += 129
                nat = np.zeros(64, dtype=np.int64)
                for zi, ni in enumerate(ZIGZAG):
                    nat[ni] = zz[zi]
                qtabs[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 15
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                huff_dec[(tc, th)] = _build_huffman_dec_cached(bits, vals)
                huff_fast[(tc, th)] = _fast_table_cached(bits, vals)
                sp += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            # SOF0/1/2/3/9/10/11
            progressive = marker in (0xC2, 0xCA)
            lossless = marker in (0xC3, 0xCB)
            arith = marker in (0xC9, 0xCA, 0xCB)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(f"invalid lossless precision {prec}")
            elif prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit precision")
            # 12-bit arithmetic (sequential SOF9 / progressive SOF10)
            # decodes since round 15: T.81's Annex F conditioning is
            # precision-independent (the DC magnitude tree covers
            # categories to 2^15-1 and the AC tree to Se-indexed bins,
            # both sized for 12-bit coefficients), so the QM decode
            # paths below need no changes — only this guard did.
            precision = prec
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = (h, w, comps)
        elif marker in (0xC5, 0xC6, 0xCD, 0xCE):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0} mode")
        elif marker in (0xC7, 0xCF):
            # differential lossless frames decode since round 16 — but
            # only inside a hierarchical (DHP) stream, which supplies
            # the reference they difference against
            raise ValueError(
                f"differential frame SOF{marker - 0xC0} outside a "
                "hierarchical (DHP) stream"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            sp = 0
            while sp + 1 < len(seg):
                tc, tb = seg[sp] >> 4, seg[sp] & 15
                cs = seg[sp + 1]
                if tc == 0:
                    lo, up = cs & 15, cs >> 4
                    if lo > up:
                        raise ValueError("DAC DC conditioning L > U")
                    dac_dc[tb] = (lo, up)
                elif tc == 1:
                    if not 1 <= cs <= 63:
                        raise ValueError(f"DAC AC Kx {cs} out of range")
                    dac_ac[tb] = cs
                else:
                    raise ValueError(f"invalid DAC table class {tc}")
                sp += 2
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 15))
            pos = nxt
            break  # entropy-coded data follows
        # APPn / COM / others: skip
        pos = nxt

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    if not 1 <= len(comps) <= 3 or len(scan) != len(comps):
        raise NotImplementedError(
            f"{len(comps)}-component / multi-scan JPEG unsupported"
        )
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        dc = huff_fast.get((0, td))
        ac = huff_fast.get((1, ta))
        qt = qtabs.get(c["tq"])
        if dc is None or ac is None or qt is None:
            raise ValueError("scan references missing Huffman/quant table")
        order.append((c, dc, ac, qt.astype(np.float64)))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    total_mcus = mcus_x * mcus_y

    # PASS 1 — serial entropy decode, O(1) array work per symbol (see
    # the _FastBitReader block comment): zigzag coefficient rows are
    # collected per component, blocks in (my, mx, by, bx) fill order.
    segs, _ = _entropy_segments(b, pos)
    coefs = [
        np.zeros((total_mcus * c["v"] * c["h"], 64)) for c in comps
    ]
    idx = [0] * len(comps)
    dc_pred = [0] * len(comps)
    # coefficient stores are BUFFERED in Python lists and written as one
    # fancy-indexed assignment per component after the entropy pass — a
    # list append costs ~¼ of a numpy scalar store, and the writes are
    # the non-entropy half of the pass-1 loop (profiled round 13)
    wr = [([], [], []) for _ in comps]  # (block row, k, value)
    r = _FastBitReader(segs[0])
    for m in range(total_mcus):
        if restart_interval and m and m % restart_interval == 0:
            si = m // restart_interval
            if si >= len(segs):
                raise ValueError("missing restart marker")
            r = _FastBitReader(segs[si])
            dc_pred = [0] * len(comps)
        for ci, (c, dc, ac, qt) in enumerate(order):
            rows_w, ks_w, vs_w = wr[ci]
            for _ in range(c["v"] * c["h"]):
                row_i = idx[ci]
                idx[ci] += 1
                _, _s, diff = r.decode_rs_val(dc)
                dc_pred[ci] += diff
                rows_w.append(row_i)
                ks_w.append(0)
                vs_w.append(dc_pred[ci])
                k = 1
                while k < 64:
                    run, size, val = r.decode_rs_val(ac)
                    if size == 0:
                        if run == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise ValueError("AC coefficient overrun")
                    rows_w.append(row_i)
                    ks_w.append(k)
                    vs_w.append(val)
                    k += 1
    for ci, (rows_w, ks_w, vs_w) in enumerate(wr):
        if rows_w:
            coefs[ci][np.array(rows_w), np.array(ks_w)] = np.array(vs_w)
    if len(segs) > (
        (total_mcus - 1) // restart_interval + 1 if restart_interval else 1
    ):
        raise ValueError("unexpected restart marker in entropy data")

    # PASS 2 — shared with the arithmetic decoder
    return _coefs_to_pixels(
        coefs,
        [qt for (_c, _dc, _ac, qt) in order],
        [c for (c, _dc, _ac, _qt) in order],
        mcus_x, mcus_y, hmax, vmax, h, w, precision,
    )


def _coefs_to_pixels(
    coefs, qts, comps, mcus_x, mcus_y, hmax, vmax, h, w, precision
):
    """Shared PASS 2 of the sequential decoders (Huffman and
    arithmetic): batched dezigzag + dequant + IDCT per component
    (idct2's matmuls broadcast over the block axis), one transpose/
    reshape from MCU fill order to the plane grid, chroma upsample,
    crop to (h, w), color convert.  ``coefs``/``qts``/``comps`` are in
    scan-component order."""
    zz_np = np.asarray(ZIGZAG)
    level = float(1 << (precision - 1))
    planes = []
    for ci, c in enumerate(comps):
        nat = np.zeros_like(coefs[ci])
        nat[:, zz_np] = coefs[ci]
        blocks = idct2(nat.reshape(-1, 8, 8) * qts[ci]) + level
        planes.append(
            blocks.reshape(mcus_y, mcus_x, c["v"], c["h"], 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)
        )

    # upsample to full grid, crop to (h, w)
    full = []
    for c, plane in zip(comps, planes):
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        full.append(plane[:h, :w])
    maxv = (1 << precision) - 1
    if len(comps) == 1:
        samp12 = np.clip(np.round(full[0]), 0, maxv).astype(np.int64)
        # 12-bit decodes to the high-byte 8-bit view (>> 4), the same
        # convention as 16-bit PNG; 8-bit passes through
        out = (samp12 >> (precision - 8)).astype(np.uint8)
        return (w, h, 1, out.tobytes())
    # color convert at FULL precision (chroma center 2^(P-1)), clip to
    # the sample range, then reduce to the high-byte view — same order
    # a 12-bit-aware consumer applies
    rgb = _maybe_ycbcr_to_rgb(
        np.stack(full, axis=-1), comps, center=float(1 << (precision - 1))
    )
    samp = np.clip(np.round(rgb), 0, maxv).astype(np.int64)
    out = (samp >> (precision - 8)).astype(np.uint8)
    return (w, h, 3, out.tobytes())


# ---------------------------------------------------------------------
# progressive (SOF2), spectral-selection mode
# ---------------------------------------------------------------------
# Progressive JPEG sends the DCT coefficients in multiple scans.  Both
# axes are implemented for 4:4:4 / grayscale: the SPECTRAL-SELECTION
# axis (each scan carries a band [Ss..Se] of coefficients, fully) below,
# and the SUCCESSIVE-APPROXIMATION axis (bitplane refinement,
# Ah/Al != 0) further down, and both compose with 4:2:0 subsampling
# (non-interleaved scans walk each component's own block grid);
# arithmetic-coded progressive (SOF10) lives in the QM section and
# decodes at 8 AND 12 bits (round 15); lossless-arithmetic (SOF11)
# decodes since round 16.  The remaining format guards are the
# hierarchical modes (SOF5-7/13-15).
#
# Non-interleaved AC scans use EOB RUNS: the EOBn symbol (s=0, r<15)
# ends the current block's band AND declares the next 2^r - 1 +
# receive(r) blocks all-zero in this band.  The encoder below emits
# plain EOB0 per block (legal, no run batching); the decoder handles
# the general run so real progressive streams also decode.


# Progressive AC scans need EOBn symbols (0x10..0xE0) that the Annex K
# SEQUENTIAL tables cannot encode (their Kraft sum is exactly full).
# Real progressive encoders ship optimized per-image tables; this one
# ships a fixed flat 8-bit canonical table over every symbol a
# spectral-selection AC scan can emit — 16 runs x 10 sizes (8-bit
# precision caps AC size at 10), ZRL, and EOBn for runs up to 2^15-1.
# 175 symbols x 2^-8 = 0.684 Kraft — comfortably legal, decoded from
# the DHT segment like any other table, so interop is preserved.
_PROG_AC_SYMS = sorted(
    [(r << 4) | sz for r in range(16) for sz in range(1, 11)]
    + [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
)
PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0],
    _PROG_AC_SYMS,
)
assert sum(PROG_AC[0]) == len(PROG_AC[1])


def _emit_restart(w: _BitWriter, rst: list):
    """Byte-align the writer and append the next RSTn marker (modulo-8
    per-scan count, spec E.1.4)."""
    w.flush()
    w.out += bytes([0xFF, 0xD0 + (rst[0] & 7)])
    rst[0] += 1


def encode_jpeg_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int = 85,
    successive: bool = False,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) encoder, spectral selection: scan 1 = all DC
    coefficients (interleaved over the MCU grid), then one full-band AC
    scan (1..63) per component walking that component's OWN block grid
    (ceil(comp_dims/8) — MCU-padding blocks are DC-only, per T.81's
    non-interleaved scan rules).

    ``subsample=True`` (3-channel only) emits 4:2:0 — chroma box-mean
    downsampled exactly as the baseline encoder so the progressive
    decode stays bit-identical to the baseline decode of the same
    pixels.

    ``successive=True`` adds the SUCCESSIVE-APPROXIMATION axis: the
    first scans send coefficients at Al=1 (halved precision), then a
    raw-bit DC refinement and per-component AC refinement scans
    (Ah=1, Al=0) deliver the LSBs — 2(1+channels) scans total, the
    full T.81 G.1.2.3 two-pass structure.

    ``restart_interval`` > 0 emits DRI + per-scan RSTn markers every
    that many MCUs (interleaved scans) / blocks (non-interleaved
    scans); DC predictors and EOB runs reset at each marker."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer length != w*h*c")
    img = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.float64)
    )
    qt_lum = scaled_quant(QUANT_LUM, quality)
    qt_chrom = scaled_quant(QUANT_CHROM, quality)
    if channels == 1:
        planes = [img[..., 0]]
        samp = [(1, 1)]
        qts = [qt_lum]
    else:
        ycc = rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            # 4:2:0 — identical downsampling to the baseline encoder
            ph = height + (height & 1)
            pw = width + (width & 1)
            cbp = np.pad(cb, ((0, ph - height), (0, pw - width)), mode="edge")
            crp = np.pad(cr, ((0, ph - height), (0, pw - width)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_lum, qt_chrom, qt_chrom]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    padded = [
        _pad_to_blocks(p, mcus_y * s[1], mcus_x * s[0])
        for p, s in zip(planes, samp)
    ]
    # per-component grids: padded (interleaved walk) vs own block grid
    # (non-interleaved walk excludes MCU-padding blocks)
    pgrid, cgrid = [], []
    for hi, vi in samp:
        pgrid.append((mcus_x * hi, mcus_y * vi))
        cw = -(-(width * hi) // hmax)
        ch2 = -(-(height * vi) // vmax)
        cgrid.append((-(-cw // 8), -(-ch2 // 8)))
    # quantize every block once; store zigzag-order coefficients
    coefs = []
    for ci in range(channels):
        qt = qts[ci].reshape(8, 8).astype(np.float64)
        pbx, pby = pgrid[ci]
        cz = np.zeros((pby, pbx, 64), dtype=np.int64)
        for by in range(pby):
            for bx in range(pbx):
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                cz[by, bx] = np.round(fdct2(block) / qt).astype(np.int64).ravel()[ZIGZAG]
        coefs.append(cz)

    dc_enc_l, _ = _build_huffman(*DC_LUM)
    dc_enc_c, _ = _build_huffman(*DC_CHROM)
    ac_enc_p, _ = _build_huffman(*PROG_AC)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qts_emit = [(0, qt_lum)] if channels == 1 else [(0, qt_lum), (1, qt_chrom)]
    for tid, qt in qts_emit:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64)
        out.append(tid)
        out += bytes(int(qt[z]) for z in ZIGZAG)
    out += b"\xff\xc2" + struct.pack(  # SOF2
        ">HBHHB", 8 + 3 * channels, 8, height, width, channels
    )
    for ci in range(channels):
        hi, vi = samp[ci]
        tq = 0 if (ci == 0 or channels == 1) else 1
        out += bytes([ci + 1, (hi << 4) | vi, tq])
    tables = (
        [(0x00, DC_LUM), (0x10, PROG_AC)]
        if channels == 1
        else [(0x00, DC_LUM), (0x10, PROG_AC), (0x01, DC_CHROM)]
    )
    for tc_th, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
        out.append(tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    al0 = 1 if successive else 0

    def mcu_blocks(ci):
        """(mcu_index, by, bx) over the interleaved walk of comp ci."""
        hi, vi = samp[ci]
        for m in range(n_mcus):
            my, mx = divmod(m, mcus_x)
            for by in range(vi):
                for bx in range(hi):
                    yield m, my * vi + by, mx * hi + bx

    # DC first scan: all components interleaved, Ss=Se=0, values >> Al
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
    for ci in range(channels):
        td = 0 if (ci == 0 or channels == 1) else 1
        out += bytes([ci + 1, td << 4])
    out += bytes([0, 0, al0])  # Ss=0 Se=0 Ah=0 Al=al0
    w = _BitWriter()
    pred = [0] * channels
    rst = [0]
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            _emit_restart(w, rst)
            pred = [0] * channels
        my, mx = divmod(m, mcus_x)
        for ci in range(channels):
            hi, vi = samp[ci]
            enc = dc_enc_l if (ci == 0 or channels == 1) else dc_enc_c
            for by in range(vi):
                for bx in range(hi):
                    dc = int(coefs[ci][my * vi + by, mx * hi + bx, 0]) >> al0
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    s = abs(diff).bit_length()
                    code, length = enc[s]
                    w.write(code, length)
                    if s:
                        v = diff if diff >= 0 else diff + (1 << s) - 1
                        w.write(v, s)
    w.flush()
    out += w.out

    # AC first scan per component, band 1..63, values sign·(|v| >> Al),
    # non-interleaved walk over the component's own block grid
    for ci in range(channels):
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
        out += bytes([ci + 1, 0])
        out += bytes([1, 63, al0])  # Ss=1 Se=63 Ah=0 Al=al0
        enc = ac_enc_p
        cbx, cby = cgrid[ci]
        w = _BitWriter()
        rst = [0]
        pending_eob = 0  # accumulated EOB run (spec: 1..32767 blocks)

        def flush_eob(w=w, enc=enc):
            nonlocal pending_eob
            if not pending_eob:
                return
            rr = pending_eob.bit_length() - 1
            ec, el = enc[rr << 4]
            w.write(ec, el)
            if rr:
                w.write(pending_eob - (1 << rr), rr)
            pending_eob = 0

        for by in range(cby):
            for bx in range(cbx):
                unit = by * cbx + bx
                if restart_interval and unit and unit % restart_interval == 0:
                    flush_eob()
                    _emit_restart(w, rst)
                zz = coefs[ci][by, bx]
                vals = [
                    (1 if zz[k] >= 0 else -1) * (abs(int(zz[k])) >> al0)
                    for k in range(64)
                ]
                if not any(vals[1:]):
                    pending_eob += 1
                    if pending_eob == 32767:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for k in range(1, 64):
                    c = vals[k]
                    if c == 0:
                        run += 1
                        continue
                    while run > 15:
                        zc, zl = enc[0xF0]
                        w.write(zc, zl)
                        run -= 16
                    s = abs(c).bit_length()
                    acode, alen = enc[(run << 4) | s]
                    w.write(acode, alen)
                    v = c if c >= 0 else c + (1 << s) - 1
                    w.write(v, s)
                    run = 0
                if run:
                    pending_eob = 1  # this block ends with EOB -> run starts
        flush_eob()
        w.flush()
        out += w.out

    if successive:
        # DC refinement: Ah=1, Al=0 — one raw LSB per block per comp,
        # interleaved MCU walk (restart only re-aligns: no predictors)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
        for ci in range(channels):
            out += bytes([ci + 1, 0])  # DC table unused in refinement
        out += bytes([0, 0, 0x10])  # Ss=0 Se=0 Ah=1 Al=0
        w = _BitWriter()
        rst = [0]
        for m in range(n_mcus):
            if restart_interval and m and m % restart_interval == 0:
                _emit_restart(w, rst)
            my, mx = divmod(m, mcus_x)
            for ci in range(channels):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        w.write(
                            int(coefs[ci][my * vi + by, mx * hi + bx, 0]) & 1,
                            1,
                        )
        w.flush()
        out += w.out
        # AC refinement per component: Ah=1, Al=0, component block grid
        for ci in range(channels):
            out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
            out += bytes([ci + 1, 0])
            out += bytes([1, 63, 0x10])  # Ss=1 Se=63 Ah=1 Al=0
            cbx, cby = cgrid[ci]
            w = _BitWriter()
            _emit_ac_refine(
                w,
                ac_enc_p,
                (
                    coefs[ci][by, bx]
                    for by in range(cby)
                    for bx in range(cbx)
                ),
                restart_interval=restart_interval,
            )
            w.flush()
            out += w.out

    out += b"\xff\xd9"
    return bytes(out)


def _emit_ac_refine(
    w: _BitWriter,
    enc,
    blocks,
    ss: int = 1,
    se: int = 63,
    al: int = 0,
    restart_interval: int = 0,
):
    """AC successive-approximation refinement scan (T.81 G.1.2.3 second
    pass; the libjpeg encode_mcu_AC_refine bookkeeping): newly-nonzero
    coefficients (|v| >> (al+1) == 0 but |v| >> al == 1) are inserted
    as (run<<4)|1 symbols with a raw sign bit; already-nonzero
    coefficients emit ONE raw correction bit each — buffered and
    flushed after the next symbol (ZRL / insertion / EOBn) so the
    decoder's walk reads them in encounter order.  Two buffers: ``cur``
    holds this block's bits since the last flush, ``be_run`` holds bits
    belonging to the pending EOB run.

    The ZRL loop runs at ANY nonzero coefficient BEFORE the
    correction-bit branch (libjpeg's ``while (r > 15 && k <= EOB)``):
    this is what keeps every buffered correction bit inside the span
    of the next emitted symbol.  Emitting ZRLs only at newly-nonzero
    coefficients misplaces correction bits whenever an already-nonzero
    coefficient sits more than 15 zero-history positions past the last
    symbol — the decoder then reads the bit during the wrong symbol's
    walk and rejects the stream.

    ``restart_interval`` > 0 flushes the EOB run, byte-aligns, and
    emits RSTn every that many blocks."""
    eobrun = 0
    be_run: list[int] = []  # correction bits owned by the pending EOB run
    cur: list[int] = []  # bits since the last symbol in the current block
    rst = [0]

    def flush_eobrun():
        nonlocal eobrun, be_run
        if eobrun:
            rr = eobrun.bit_length() - 1
            ec, el = enc[rr << 4]
            w.write(ec, el)
            if rr:
                w.write(eobrun - (1 << rr), rr)
            eobrun = 0
        for bit in be_run:
            w.write(bit, 1)
        be_run = []

    for bi, zz in enumerate(blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            flush_eobrun()
            _emit_restart(w, rst)
        absv = [abs(int(zz[k])) >> al for k in range(64)]
        eobpos = 0  # last newly-nonzero position in the band
        for k in range(ss, se + 1):
            if absv[k] == 1:
                eobpos = k
        run = 0
        for k in range(ss, se + 1):
            temp = absv[k]
            if temp == 0:
                run += 1
                continue
            # emit any required ZRLs (not foldable into EOB) FIRST —
            # for correction coefficients too, per libjpeg
            while run > 15 and k <= eobpos:
                flush_eobrun()
                zc, zl = enc[0xF0]
                w.write(zc, zl)
                run -= 16
                for bit in cur:
                    w.write(bit, 1)
                cur = []
            if temp > 1:
                cur.append(temp & 1)  # correction bit, buffered
                continue
            # temp == 1: newly-nonzero insertion (run <= 15 is
            # guaranteed here: k <= eobpos whenever temp == 1)
            flush_eobrun()
            acode, alen = enc[(run << 4) | 1]
            w.write(acode, alen)
            w.write(1 if zz[k] >= 0 else 0, 1)
            for bit in cur:
                w.write(bit, 1)
            cur = []
            run = 0
        if run > 0 or cur:
            eobrun += 1
            be_run.extend(cur)
            cur = []
            if eobrun == 32766:
                flush_eobrun()
    flush_eobrun()


def _skip_to_marker(b: bytes, pos: int) -> int:
    """Advance to the next real marker (0xFF + non-stuffing, non-RST
    byte) at or after ``pos``."""
    n = len(b)
    while pos < n - 1:
        if b[pos] == 0xFF and b[pos + 1] != 0x00:
            if 0xD0 <= b[pos + 1] <= 0xD7:
                pos += 2  # restart marker inside entropy data
                continue
            return pos
        pos += 1
    raise ValueError("JPEG stream ended without a terminating marker")


def _decode_jpeg_progressive(b, pos, qtabs, huff_fast, frame,
                             restart_interval=0, precision=8,
                             differential=False, frame_scoped=False):
    """Multi-scan decode loop for SOF2 — both progressive axes, any
    sampling factors, and restart intervals.  ``pos`` points at the
    first SOS marker; ``frame`` is (h, w, comps).  Handles DC/AC first
    and refinement scans plus inter-scan DHT/DRI redefinitions.

    Grid subtlety the baseline path doesn't have: INTERLEAVED scans
    (multi-component DC) walk the MCU-padded grid, but NON-INTERLEAVED
    scans (single-component DC/AC) walk the component's OWN block grid
    — ceil(comp_w/8) × ceil(comp_h/8) from its downsampled pixel dims —
    which excludes interleave-padding blocks.  Storage is the padded
    grid; pad blocks simply keep zero AC.

    Restart semantics (T.81 E.1.4 applied per scan): every Ri MCUs
    (interleaved) / blocks (non-interleaved) the reader byte-aligns and
    consumes RSTn (modulo-8 count restarting at 0 each scan); DC
    predictors and EOB runs reset.

    Hierarchical-frame mode (round 16): ``frame_scoped=True`` decodes
    ONE progressive frame inside a DHP stream (SOF2 base /
    SOF6 differential) — the walk stops at the first marker that is
    not DHT/DRI/SOS (the next frame's preamble, EXP, or EOI) and the
    function returns ``(planes, stop_pos)`` built through
    :func:`_dct_rows_to_plane` (1×1 sampling only, like the sequential
    hierarchical subset).  ``differential=True`` codes every block's
    DC DIRECTLY (PRED = 0 per J.1.1.5, the same rule the sequential
    differential path applies) and yields signed difference planes."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    grids = {}  # id -> (pbx, pby, cbx, cby)
    for c in comps:
        cw = -(-(w * c["h"]) // hmax)
        ch2 = -(-(h * c["v"]) // vmax)
        grids[c["id"]] = (
            mcus_x * c["h"],
            mcus_y * c["v"],
            -(-cw // 8),
            -(-ch2 // 8),
        )
    coefs = {
        cid: np.zeros((pby, pbx, 64), dtype=np.int64)
        for cid, (pbx, pby, _, _) in grids.items()
    }
    seen_dc = set()
    by_id = {c["id"]: c for c in comps}

    def scan_blocks(scan):
        """Yield (unit, cs, by, bx) in scan order: MCU-interleaved when
        the scan has several components (unit = MCU index),
        component-grid raster otherwise (unit = block index)."""
        if len(scan) > 1:
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for cs, _td, _ta in scan:
                    c = by_id[cs]
                    for byy in range(c["v"]):
                        for bxx in range(c["h"]):
                            yield m, cs, my * c["v"] + byy, mx * c["h"] + bxx
        else:
            cs = scan[0][0]
            _, _, cbx, cby = grids[cs]
            for by in range(cby):
                for bx in range(cbx):
                    yield by * cbx + bx, cs, by, bx

    def run_scan(scan, ss, se, ah, al, pos):
        r = _FastScanReader(b, pos)
        ri = restart_interval
        rst = [0]

        def at_restart(unit):
            """True at the start of each restart segment after the
            first: consume RSTn, re-align."""
            if ri and unit and unit % ri == 0:
                r.sync_restart(rst[0])
                rst[0] += 1
                return True
            return False

        if ss == 0 and ah == 0:  # DC first scan (Al may shift)
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            preds = {cs: 0 for cs, _, _ in scan}
            tabs = {}
            for cs, td, _ta in scan:
                tab = huff_fast.get((0, td))
                if tab is None:
                    raise ValueError("missing DC Huffman table")
                tabs[cs] = tab
            prev_unit = 0
            for unit, cs, by, bx in scan_blocks(scan):
                if unit != prev_unit:
                    prev_unit = unit
                    if at_restart(unit):
                        preds = {c_: 0 for c_ in preds}
                _, _s, diff = r.decode_rs_val(tabs[cs])
                if differential:
                    coefs[cs][by, bx, 0] = diff << al  # PRED = 0
                else:
                    preds[cs] += diff
                    coefs[cs][by, bx, 0] = preds[cs] << al
                seen_dc.add(cs)
        elif ss == 0:  # DC refinement: one raw bit per block — BATCHED
            # per restart segment: the bits are consecutive literals
            # (no Huffman decode between blocks), so a whole segment is
            # one receive_bits + one fancy-indexed add per component
            seg: list = []

            def flush_dc_refine(seg=seg):
                if not seg:
                    return
                bits = r.receive_bits(len(seg))
                for cs_ in {t[0] for t in seg}:
                    sel = [i for i, t in enumerate(seg) if t[0] == cs_]
                    bys = np.array([seg[i][1] for i in sel])
                    bxs = np.array([seg[i][2] for i in sel])
                    coefs[cs_][bys, bxs, 0] += bits[sel] << al
                seg.clear()

            prev_unit = 0
            for unit, cs, by, bx in scan_blocks(scan):
                if unit != prev_unit:
                    prev_unit = unit
                    if ri and unit % ri == 0:
                        flush_dc_refine()
                        at_restart(unit)
                seg.append((cs, by, bx))
            flush_dc_refine()
        elif ah == 0:  # AC first scan (values arrive shifted by Al)
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be 1 component")
            cs, _td, ta = scan[0]
            tab = huff_fast.get((1, ta))
            if tab is None:
                raise ValueError("missing AC Huffman table")
            cz = coefs[cs]
            _, _, cbx, cby = grids[cs]
            eobrun = 0
            n_blocks = cby * cbx
            bi = 0
            # the symbol loop runs INLINE on local ints (b24/nbits/p and
            # the bytes tables) — no method call per symbol; the reader's
            # position syncs back around restarts and at scan end.  Same
            # decode steps as _FastBitReader.decode_rs_val, same errors.
            raw = r._r
            syms_t, lens_t = tab
            b24, nbits, p = raw.b24, raw.nbits, raw.p
            # coefficient stores buffered: one fancy write per scan
            bis_w: list = []
            ks_w: list = []
            vs_w: list = []
            while bi < n_blocks:
                if ri and bi and bi % ri == 0:
                    raw.p = p
                    if at_restart(bi):
                        eobrun = 0
                        raw = r._r
                        b24, nbits, p = raw.b24, raw.nbits, raw.p
                if eobrun > 0:
                    # EOB-covered blocks carry NO data in an AC first
                    # scan — jump the block index in one step instead of
                    # a Python iteration per skipped block (but never
                    # past the next restart boundary, which resets the
                    # run exactly as the per-block walk did)
                    nxt_rst = (bi // ri + 1) * ri if ri else n_blocks
                    take = min(eobrun, nxt_rst - bi)
                    eobrun -= take
                    bi += take
                    continue
                k = ss
                while k <= se:
                    v16 = (b24[p >> 3] >> (8 - (p & 7))) & 0xFFFF
                    ln = lens_t[v16]
                    if ln == 0 or p + ln > nbits:
                        raise ValueError(
                            "invalid JPEG Huffman code"
                            if ln == 0
                            else "JPEG entropy stream truncated"
                        )
                    rs = syms_t[v16]
                    p += ln
                    s = rs & 15
                    rr = rs >> 4
                    if s == 0:
                        if rr == 15:
                            k += 16
                            continue
                        if rr:
                            if p + rr > nbits:
                                raise ValueError(
                                    "JPEG entropy stream truncated"
                                )
                            ebits = (
                                (b24[p >> 3] >> (8 - (p & 7))) & 0xFFFF
                            ) >> (16 - rr)
                            p += rr
                        else:
                            ebits = 0
                        eobrun = (1 << rr) - 1 + ebits
                        break
                    k += rr
                    if k > se:
                        raise ValueError("AC band overrun")
                    if p + s > nbits:
                        raise ValueError("JPEG entropy stream truncated")
                    val = ((b24[p >> 3] >> (8 - (p & 7))) & 0xFFFF) >> (
                        16 - s
                    )
                    p += s
                    if val < (1 << (s - 1)):
                        val += 1 - (1 << s)
                    bis_w.append(bi)
                    ks_w.append(k)
                    vs_w.append(val)
                    k += 1
                bi += 1
            raw.p = p
            if bis_w:
                arr_bi = np.array(bis_w)
                cz[arr_bi // cbx, arr_bi % cbx, np.array(ks_w)] = (
                    np.array(vs_w) << al
                )
        else:  # AC refinement (Ah = Al+1): correction bits + insertions
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be 1 component")
            cs, _td, ta = scan[0]
            tab = huff_fast.get((1, ta))
            if tab is None:
                raise ValueError("missing AC Huffman table")
            cz = coefs[cs]
            _, _, cbx, cby = grids[cs]
            p1, m1 = 1 << al, -(1 << al)
            eobrun = 0

            def refine_covered(b0: int, take: int, raw) -> None:
                """EOB-covered blocks b0..b0+take-1: every nonzero coef
                in the band receives one correction bit — consecutive
                literals, no Huffman decode in between, so the whole run
                is ONE receive_bits + a masked vector update (round-12
                verdict directive 5; row-major boolean indexing is
                exactly the per-block k-ascending scan order)."""
                idx = np.arange(b0, b0 + take)
                bys, bxs = idx // cbx, idx % cbx
                rows = cz[bys, bxs][:, ss : se + 1]
                mask = rows != 0
                cnt = int(mask.sum())
                if cnt:
                    bits = raw.receive_bits(cnt)
                    vals = rows[mask]
                    upd = (bits == 1) & ((vals & p1) == 0)
                    vals[upd] += np.where(vals[upd] >= 0, p1, m1)
                    rows[mask] = vals
                    cz[bys, bxs, ss : se + 1] = rows

            n_blocks = cby * cbx
            bi = 0
            # inline symbol loop on local ints — see the AC-first branch;
            # a correction bit is (b24[p>>3] >> (23-(p&7))) & 1 (the top
            # bit of the 16-bit lookahead), an insertion's sign bit is
            # the same read mapped to ±(1<<al)
            raw = r._r
            syms_t, lens_t = tab
            b24, nbits, p = raw.b24, raw.nbits, raw.p
            while bi < n_blocks:
                if ri and bi and bi % ri == 0:
                    raw.p = p
                    if at_restart(bi):
                        eobrun = 0
                        raw = r._r
                        b24, nbits, p = raw.b24, raw.nbits, raw.p
                if eobrun > 0:
                    nxt_rst = (bi // ri + 1) * ri if ri else n_blocks
                    take = min(eobrun, nxt_rst - bi)
                    raw.p = p
                    refine_covered(bi, take, raw)
                    p = raw.p
                    eobrun -= take
                    bi += take
                    continue
                by, bx = divmod(bi, cbx)
                blk = cz[by, bx]
                k = ss
                while k <= se:
                    v16 = (b24[p >> 3] >> (8 - (p & 7))) & 0xFFFF
                    ln = lens_t[v16]
                    if ln == 0 or p + ln > nbits:
                        raise ValueError(
                            "invalid JPEG Huffman code"
                            if ln == 0
                            else "JPEG entropy stream truncated"
                        )
                    rs = syms_t[v16]
                    p += ln
                    s = rs & 15
                    rr = rs >> 4
                    val = 0
                    if s == 0:
                        if rr != 15:
                            if rr:
                                if p + rr > nbits:
                                    raise ValueError(
                                        "JPEG entropy stream truncated"
                                    )
                                ebits = (
                                    (b24[p >> 3] >> (8 - (p & 7))) & 0xFFFF
                                ) >> (16 - rr)
                                p += rr
                            else:
                                ebits = 0
                            eobrun = (1 << rr) + ebits
                            break
                        # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "refinement insertion must have s=1"
                            )
                        if p + 1 > nbits:
                            raise ValueError("JPEG entropy stream truncated")
                        val = p1 if (b24[p >> 3] >> (23 - (p & 7))) & 1 else m1
                        p += 1
                    # advance past rr zero-history coeffs,
                    # correcting every nonzero one passed over
                    while k <= se:
                        if blk[k] != 0:
                            if p + 1 > nbits:
                                raise ValueError(
                                    "JPEG entropy stream truncated"
                                )
                            if (b24[p >> 3] >> (23 - (p & 7))) & 1:
                                if (blk[k] & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            p += 1
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if val:
                        if k > se:
                            raise ValueError("refinement overrun")
                        blk[k] = val
                    k += 1
                if eobrun > 0:
                    # the block that TERMINATED in EOB still corrects
                    # its remaining nonzeros from k onward (scalar —
                    # k is mid-band and data-dependent)
                    while k <= se:
                        if blk[k] != 0:
                            if p + 1 > nbits:
                                raise ValueError(
                                    "JPEG entropy stream truncated"
                                )
                            if (b24[p >> 3] >> (23 - (p & 7))) & 1:
                                if (blk[k] & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            p += 1
                        k += 1
                    eobrun -= 1
                bi += 1
            raw.p = p
        return r.pos

    # process the first scan (header already parsed by caller is NOT
    # the case here: caller hands us pos at the first SOS payload start
    # — so the walk below re-reads from that SOS header)
    while True:
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        pos += 2
        if frame_scoped and marker not in (0xC4, 0xDA, 0xDD):
            # end of this frame's scans: next frame's preamble, EXP,
            # or EOI — hand the marker back to the hierarchical walk
            pos -= 2
            break
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seg_len]
        nxt = pos + seg_len
        if marker == 0xC4:  # DHT (tables may be redefined between scans)
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 15
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                huff_fast[(tc, th)] = _fast_table_cached(bits, vals)
                sp += 17 + nv
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                csel, tdta = seg[1 + 2 * i : 3 + 2 * i]
                if csel not in by_id:
                    raise ValueError(f"scan references component {csel}")
                scan.append((csel, tdta >> 4, tdta & 15))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            data_pos = run_scan(scan, ss, se, ahal >> 4, ahal & 15, nxt)
            pos = _skip_to_marker(b, data_pos)
            continue
        elif marker == 0xDD:  # DRI may be (re)defined between scans
            restart_interval = struct.unpack(">H", seg[:2])[0]
        pos = nxt

    if any(c["id"] not in seen_dc for c in comps):
        raise ValueError("progressive JPEG missing a DC scan")
    if frame_scoped:
        # hierarchical subset: 1×1 sampling, value planes via the
        # shared closed-loop reconstruction (signed when differential)
        if any(c["h"] != 1 or c["v"] != 1 for c in comps):
            raise NotImplementedError(
                "hierarchical DCT frame with subsampling"
            )
        planes = []
        for c in comps:
            qt = qtabs.get(c["tq"])
            if qt is None:
                raise ValueError("missing quant table")
            planes.append(_dct_rows_to_plane(
                coefs[c["id"]].reshape(-1, 64).astype(np.float64),
                qt.astype(np.float64), mcus_x, mcus_y, h, w,
                differential,
            ))
        return planes, pos
    # reconstruct: dequantize + IDCT every block, then upsample
    planes = []
    for c in comps:
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise ValueError("missing quant table")
        qtf = qt.astype(np.float64).ravel()
        cz = coefs[c["id"]]
        pbx, pby, _, _ = grids[c["id"]]
        cw = -(-(w * c["h"]) // hmax)
        ch2 = -(-(h * c["v"]) // vmax)
        # batched dezigzag + dequant + IDCT (round-12, same shape as the
        # baseline decoder's PASS 2): idct2's matmuls broadcast over the
        # stacked block axis
        zz = cz.reshape(pby * pbx, 64).astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, np.asarray(ZIGZAG)] = zz
        level = float(1 << (precision - 1))
        blocks = idct2((nat * qtf).reshape(-1, 8, 8)) + level
        plane = (
            blocks.reshape(pby, pbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(pby * 8, pbx * 8)
        )
        plane = plane[:ch2, :cw]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    maxv = (1 << precision) - 1
    if len(comps) == 1:
        samp = np.clip(np.round(planes[0]), 0, maxv).astype(np.int64)
        out = (samp >> (precision - 8)).astype(np.uint8)
        return (w, h, 1, out.tobytes())
    rgb = _maybe_ycbcr_to_rgb(
        np.stack(planes, axis=-1), comps, center=float(1 << (precision - 1))
    )
    samp = np.clip(np.round(rgb), 0, maxv).astype(np.int64)
    out = (samp >> (precision - 8)).astype(np.uint8)
    return (w, h, 3, out.tobytes())


# ---------------------------------------------------------------------
# 12-bit precision (baseline grayscale) — T.81 extended sample depth
# ---------------------------------------------------------------------
# 12-bit DC diffs need size categories up to 15 and AC magnitudes up to
# size 14 — beyond the Annex K example tables (which stop at 11/10), so
# the encoder ships legal custom tables carried in DHT like any other:
# a 16-symbol DC table and a flat 8-bit AC table over all 226 symbols a
# 12-bit sequential scan can emit (runs 0-15 x sizes 1-14, ZRL, EOB).
DC12 = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0],
    list(range(16)),
)
_AC12_SYMS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 15)] + [0x00, 0xF0]
)
AC12 = (
    [0, 0, 0, 0, 0, 0, 0, len(_AC12_SYMS), 0, 0, 0, 0, 0, 0, 0, 0],
    _AC12_SYMS,
)
assert sum(DC12[0]) == len(DC12[1]) and sum(AC12[0]) == len(AC12[1])


def _encode_dc_diff(w: _BitWriter, diff: int, dc_enc) -> None:
    """DC size-category + magnitude bits (the _encode_block DC step,
    standalone for progressive DC scans)."""
    sz = int(abs(diff)).bit_length()
    code, length = dc_enc[sz]
    w.write(code, length)
    if sz:
        v = diff if diff >= 0 else diff + (1 << sz) - 1
        w.write(v, sz)


def _encode_ac_band(w: _BitWriter, qnat, ss: int, se: int, ac_enc) -> None:
    """One block's full-value AC band scan body (Al=0): zero runs, ZRL,
    plain EOB0 per block — the non-interleaved spectral-selection scan
    structure (the decoder's general EOB-run handling covers it)."""
    zz = qnat[ZIGZAG]
    run = 0
    for k in range(ss, se + 1):
        c = int(zz[k])
        if c == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_enc[0xF0]
            w.write(zc, zl)
            run -= 16
        sz = int(abs(c)).bit_length()
        ac, al = ac_enc[(run << 4) | sz]
        w.write(ac, al)
        v = c if c >= 0 else c + (1 << sz) - 1
        w.write(v, sz)
        run = 0
    if run:
        ec, el = ac_enc[0x00]
        w.write(ec, el)


def encode_jpeg12(
    samples, width: int, height: int, quality: int = 100,
    channels: int = 1, progressive: bool = False,
) -> bytes:
    """12-bit encoder (fixture twin of the precision-12 decode
    branches): samples 0..4095, level shift 2048, 16-bit quantization
    table (DQT Pq=1 — the combination T.81 mandates for extended
    precision), custom DC/AC tables in DHT (size categories past the
    Annex K examples).  ``channels=3`` takes interleaved 12-bit RGB
    and stores 4:4:4 YCbCr with the chroma zero at 2048;
    ``progressive=True`` emits SOF2 (round 14: an interleaved DC scan
    + one full-band AC scan per component — the spectral-selection
    structure of encode_jpeg_progressive at 12 bits)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    a = np.asarray(list(samples), dtype=np.int64).reshape(
        height, width, channels
    )
    if a.min() < 0 or a.max() > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    qt = scaled_quant(QUANT_LUM, quality)
    qtf = qt.reshape(8, 8).astype(np.float64)
    if channels == 1:
        planes = [a[..., 0].astype(np.float64)]
    else:
        ycc = rgb_to_ycbcr(a.astype(np.float64), center=2048.0)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    bx_n = -(-width // 8)
    by_n = -(-height // 8)
    padded = [_pad_to_blocks(pl, by_n, bx_n) for pl in planes]
    dc_enc, _ = _build_huffman(*DC12)
    ac_enc, _ = _build_huffman(*AC12)

    def quantize(ci, by, bx):
        block = (
            padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 2048.0
        )
        return np.round(fdct2(block) / qtf).astype(np.int64)

    scans = []  # (header bytes after SOS marker, entropy bytes)
    if not progressive:
        w = _BitWriter()
        preds = [0] * channels
        for by in range(by_n):
            for bx in range(bx_n):
                for ci in range(channels):
                    preds[ci] = _encode_block(
                        w, quantize(ci, by, bx), preds[ci], dc_enc, ac_enc
                    )
        w.flush()
        hdr = struct.pack(">HB", 6 + 2 * channels, channels)
        hdr += b"".join(bytes([ci + 1, 0x00]) for ci in range(channels))
        hdr += bytes([0, 63, 0])
        scans.append((hdr, bytes(w.out)))
    else:
        # DC scan, interleaved over all components (Ss=Se=0)
        w = _BitWriter()
        preds = [0] * channels
        for by in range(by_n):
            for bx in range(bx_n):
                for ci in range(channels):
                    qc = quantize(ci, by, bx)
                    diff = int(qc.ravel()[0]) - preds[ci]
                    preds[ci] += diff
                    _encode_dc_diff(w, diff, dc_enc)
        w.flush()
        hdr = struct.pack(">HB", 6 + 2 * channels, channels)
        hdr += b"".join(bytes([ci + 1, 0x00]) for ci in range(channels))
        hdr += bytes([0, 0, 0])
        scans.append((hdr, bytes(w.out)))
        # one full-band AC scan per component (Ss=1, Se=63), raster
        for ci in range(channels):
            w = _BitWriter()
            for by in range(by_n):
                for bx in range(bx_n):
                    _encode_ac_band(
                        w, quantize(ci, by, bx).ravel(), 1, 63, ac_enc
                    )
            w.flush()
            hdr = struct.pack(">HB", 8, 1)
            hdr += bytes([ci + 1, 0x00, 1, 63, 0])
            scans.append((hdr, bytes(w.out)))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128)
    out.append(0x10)  # Pq=1 (16-bit entries), Tq=0
    for z in ZIGZAG:
        out += struct.pack(">H", int(qt[z]))
    sof = 0xC2 if progressive else 0xC0
    out += bytes([0xFF, sof]) + struct.pack(
        ">HBHHB", 8 + 3 * channels, 12, height, width, channels
    )
    for ci in range(channels):
        out += bytes([ci + 1, 0x11, 0])
    for tc_th, (bits, vals) in ((0x00, DC12), (0x10, AC12)):
        out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
        out.append(tc_th)
        out += bytes(bits) + bytes(vals)
    for hdr, entropy in scans:
        out += b"\xff\xda" + hdr + entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------
# Lossless JPEG (SOF3, T.81 Annex H) — predictive, Huffman-coded
# ---------------------------------------------------------------------

# one shared DC-class table covering every difference category 0..16,
# all codes length 5 (17/32 < 1 satisfies the canonical Kraft bound)
_LL_BITS = [0, 0, 0, 0, 17] + [0] * 11
_LL_VALS = list(range(17))


def _ll_encode_scan(planes, width, height, channels, predictor, default,
                    restart_interval, differential=False):
    """Huffman-entropy-code one lossless scan over per-channel value
    planes (RSTn markers included): the SOF3 loop, with prediction
    forced to ZERO when ``differential`` (hierarchical SOF7 — the
    plane values are then the differences themselves, mod 2^16).
    Shared by ``encode_jpeg_lossless`` and the hierarchical encoder."""
    enc, _ = _build_huffman(_LL_BITS, _LL_VALS)
    wtr = _BitWriter()
    rst = [0]
    istart = (0, 0)
    for idx in range(width * height):
        y, x = divmod(idx, width)
        if restart_interval and idx and idx % restart_interval == 0:
            _emit_restart(wtr, rst)
            istart = (x, y)
        for c in range(channels):
            pred = 0 if differential else _ll_predict(
                planes[c], x, y, predictor, default, istart[0], istart[1]
            )
            d = (planes[c][y][x] - pred) & 0xFFFF
            if d == 32768:
                code, ln = enc[16]
                wtr.write(code, ln)
            else:
                signed = d - 65536 if d > 32768 else d
                ssss = abs(signed).bit_length()
                code, ln = enc[ssss]
                wtr.write(code, ln)
                if ssss:
                    bitsv = signed if signed >= 0 else signed + (1 << ssss) - 1
                    wtr.write(bitsv, ssss)
    wtr.flush()
    return bytes(wtr.out)


def _ll_predict(plane, x, y, predictor, default, istart_x, istart_y):
    """T.81 H.1.1/H.2.3 prediction: the first sample of the scan and of
    every restart interval predicts from 2^(P-Pt-1); the REMAINDER of
    the line the interval starts on uses the 1-D horizontal predictor
    (Ra); column 0 of later lines uses Rb; everything else uses the
    selected predictor (>> is the spec's arithmetic shift)."""
    if y == istart_y:
        return default if x == istart_x else plane[y][x - 1]
    if x == 0:
        return plane[y - 1][0]
    ra, rb, rc = plane[y][x - 1], plane[y - 1][x], plane[y - 1][x - 1]
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # predictor 7


def encode_jpeg_lossless(
    samples, width: int, height: int, channels: int = 1,
    predictor: int = 1, precision: int = 8, restart_interval: int = 0,
    point_transform: int = 0,
) -> bytes:
    """Lossless-JPEG (SOF3) encoder — fixture twin of the SOF3 decode
    path.  ``samples`` is row-major channel-interleaved ints in
    ``0..2**precision-1``; components are coded interleaved with 1×1
    sampling (one sample per component per MCU, the layout DNG/DICOM
    writers emit).  Differences are mod-2^16 with the DC-style VLI
    categories; category 16 (diff = 32768) carries no extra bits."""
    samples = list(samples)
    if len(samples) != width * height * channels:
        raise ValueError("samples length != width*height*channels")
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid predictor {predictor}")
    if not 2 <= precision <= 16:
        raise ValueError(f"invalid precision {precision}")
    if any(not 0 <= v < (1 << precision) for v in samples):
        raise ValueError("sample out of range for precision")
    planes = [
        [
            [samples[(y * width + x) * channels + c] >> point_transform
             for x in range(width)]
            for y in range(height)
        ]
        for c in range(channels)
    ]
    default = 1 << (precision - 1 - point_transform)
    entropy = _ll_encode_scan(
        planes, width, height, channels, predictor, default,
        restart_interval,
    )

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_LL_VALS))
        + bytes([0x00])
        + bytes(_LL_BITS)
        + bytes(_LL_VALS)
    )
    out += b"\xff\xc3" + struct.pack(
        ">HBHHB", 8 + 3 * channels, precision, height, width, channels
    )
    for c in range(channels):
        out += bytes([c + 1, 0x11, 0])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
    for c in range(channels):
        out += bytes([c + 1, 0x00])
    out += bytes([predictor, 0, point_transform])
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _ll_scan_planes(b, pos, huff_dec, frame, restart_interval, precision,
                    differential=False):
    """Core of the SOF3/SOF7 scan decode (``pos`` on the SOS marker):
    returns ``(planes, al, end_pos)`` — per-component mod-2^16 value
    planes (samples for a non-differential frame, coded DIFFERENCES
    with zero prediction when ``differential`` — the hierarchical
    SOF7 convention, H.2/J.1), the scan's point transform, and the
    offset of the marker terminating the entropy data (so the
    hierarchical walker can continue)."""
    if b[pos] != 0xFF or b[pos + 1] != 0xDA:
        raise ValueError("expected SOS")
    seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
    seg = b[pos + 4 : pos + 2 + seg_len]
    ns = seg[0]
    h, w, comps = frame
    if ns != len(comps):
        raise NotImplementedError("multi-scan lossless JPEG unsupported")
    by_id = {c["id"]: c for c in comps}
    tables = []
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        if c["h"] != 1 or c["v"] != 1:
            raise NotImplementedError("lossless JPEG with subsampling")
        dc = huff_dec.get((0, tdta >> 4))
        if dc is None:
            raise ValueError("scan references missing Huffman table")
        tables.append(dc)
    predictor, _se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
    al = ahal & 15
    if differential:
        if predictor != 0:
            raise ValueError(
                f"differential frame carries predictor {predictor} (must "
                "be 0 — no prediction in hierarchical difference scans)"
            )
    elif not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")

    r = _BitReader(b, pos + 2 + seg_len)
    default = 1 << (precision - 1 - al)
    planes = [[[0] * w for _ in range(h)] for _ in range(ns)]
    rst = 0
    istart = (0, 0)
    for idx in range(w * h):
        y, x = divmod(idx, w)
        if restart_interval and idx and idx % restart_interval == 0:
            r.sync_restart(rst)
            rst += 1
            istart = (x, y)
        for ci in range(ns):
            s = _decode_huff(r, tables[ci])
            if s == 16:
                diff = 32768
            elif s:
                diff = _extend(r.receive(s), s)
            else:
                diff = 0
            pred = 0 if differential else _ll_predict(
                planes[ci], x, y, predictor, default, istart[0], istart[1]
            )
            planes[ci][y][x] = (pred + diff) & 0xFFFF
    return planes, al, _skip_to_marker(b, r.pos)


def _ll_planes_to_bytes(planes, w, h, ns, al, precision):
    """Shared SOF3/SOF11/hierarchical output epilogue: exact bytes for
    precision ≤ 8, the high-byte view for deeper samples (the
    q353/q358 convention); the point transform shifts back up."""
    shift_down = max(0, precision - 8)
    out = bytearray(w * h * ns)
    for y in range(h):
        for x in range(w):
            for ci in range(ns):
                v = (planes[ci][y][x] << al) & 0xFFFF
                out[(y * w + x) * ns + ci] = (v >> shift_down) & 0xFF
    return w, h, ns, bytes(out)


def _decode_jpeg_lossless(b, pos, huff_dec, frame, restart_interval, precision):
    """SOF3 scan decode: ``pos`` sits on the SOS marker.  Returns
    ``(w, h, channels, bytes)`` — exact samples for precision ≤ 8, the
    high-byte view for deeper samples (the q353/q358 convention)."""
    planes, al, _ = _ll_scan_planes(
        b, pos, huff_dec, frame, restart_interval, precision
    )
    h, w, comps = frame
    return _ll_planes_to_bytes(planes, w, h, len(comps), al, precision)


def encode_jpeg_lossless_arith(
    samples, width: int, height: int, channels: int = 1,
    predictor: int = 1, precision: int = 8, restart_interval: int = 0,
    point_transform: int = 0, dc_cond: tuple[int, int] = (0, 1),
) -> bytes:
    """Lossless-ARITHMETIC JPEG (SOF11) encoder — fixture twin of the
    SOF11 decode path, closing the last lossless-family guard (round
    16): ``encode_jpeg_lossless``'s exact prediction pipeline
    (predictors 1-7, mod-2^16 differences, point transform, restart
    resets) with the entropy layer swapped for the T.81 QM coder under
    the Annex H.1.2.2 statistical model (see the model block comment —
    including why verification is roundtrip + SOF3-equality rather
    than libjpeg interop: libjpeg-turbo ERREXITs on lossless+arith).
    ``dc_cond`` is the DAC (L, U) conditioning pair, emitted for table
    0 which every scan component references."""
    samples = list(samples)
    if len(samples) != width * height * channels:
        raise ValueError("samples length != width*height*channels")
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid predictor {predictor}")
    if not 2 <= precision <= 16:
        raise ValueError(f"invalid precision {precision}")
    if any(not 0 <= v < (1 << precision) for v in samples):
        raise ValueError("sample out of range for precision")
    lo, up = dc_cond
    if not (0 <= lo <= up <= 15):
        raise ValueError("dc_cond must satisfy 0 <= L <= U <= 15")
    planes = [
        [
            [samples[(y * width + x) * channels + c] >> point_transform
             for x in range(width)]
            for y in range(height)
        ]
        for c in range(channels)
    ]
    default = 1 << (precision - 1 - point_transform)
    entropy = _lla_encode_scan(
        planes, width, height, channels, predictor, default,
        restart_interval, lo, up,
    )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xcb" + struct.pack(
        ">HBHHB", 8 + 3 * channels, precision, height, width, channels
    )
    for c in range(channels):
        out += bytes([c + 1, 0x11, 0])
    out += b"\xff\xcc" + struct.pack(">H", 4) + bytes([0x00, (up << 4) | lo])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
    for c in range(channels):
        out += bytes([c + 1, 0x00])
    out += bytes([predictor, 0, point_transform])
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _lla_scan_planes(b, pos, dac_dc, frame, restart_interval, precision,
                     differential=False):
    """Core of the SOF11/SOF15 scan decode (``pos`` on the SOS
    marker): the SOF3 predictive walk with QM-coded values under the
    H.1.2.2 conditioning model — zero prediction when ``differential``
    (the hierarchical SOF15 convention; the conditioning state is the
    coded values' own categories either way).  Scan components sharing
    a DAC table share a 158-bin statistics area; restarts reset coder,
    statistics, conditioning categories and prediction (H.2.3).
    Returns ``(planes, al, end_pos)`` like :func:`_ll_scan_planes`."""
    if b[pos] != 0xFF or b[pos + 1] != 0xDA:
        raise ValueError("expected SOS")
    seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
    seg = b[pos + 4 : pos + 2 + seg_len]
    ns = seg[0]
    h, w, comps = frame
    if ns != len(comps):
        raise NotImplementedError("multi-scan lossless JPEG unsupported")
    by_id = {c["id"]: c for c in comps}
    tabs = []
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        if c["h"] != 1 or c["v"] != 1:
            raise NotImplementedError("lossless JPEG with subsampling")
        tabs.append(tdta >> 4)
    predictor, _se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
    al = ahal & 15
    if differential:
        if predictor != 0:
            raise ValueError(
                f"differential frame carries predictor {predictor} (must "
                "be 0 — no prediction in hierarchical difference scans)"
            )
    elif not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    conds = {t: dac_dc.get(t, (0, 1)) for t in set(tabs)}

    segs, end = _entropy_segments(b, pos + 2 + seg_len)
    si = 0
    dec = _QMDecoder(segs[0])
    stats = {t: bytearray(158) for t in conds}
    cat_above = [[0] * w for _ in range(ns)]
    cat_left = [0] * ns
    default = 1 << (precision - 1 - al)
    planes = [[[0] * w for _ in range(h)] for _ in range(ns)]
    istart = (0, 0)
    for idx in range(w * h):
        y, x = divmod(idx, w)
        if restart_interval and idx and idx % restart_interval == 0:
            si += 1
            if si >= len(segs):
                raise ValueError("missing restart segment")
            dec = _QMDecoder(segs[si])
            stats = {t: bytearray(158) for t in conds}
            cat_above = [[0] * w for _ in range(ns)]
            cat_left = [0] * ns
            istart = (x, y)
        for ci in range(ns):
            t = tabs[ci]
            lo, up = conds[t]
            da = 0 if (x == 0 or (x, y) == istart) else cat_left[ci]
            db = cat_above[ci][x]
            diff, cat = _arith_decode_ll(dec, stats[t], da, db, lo, up)
            cat_left[ci] = cat
            cat_above[ci][x] = cat
            pred = 0 if differential else _ll_predict(
                planes[ci], x, y, predictor, default, istart[0], istart[1]
            )
            planes[ci][y][x] = (pred + diff) & 0xFFFF
    return planes, al, end


def _decode_jpeg_lossless_arith(b, pos, dac_dc, frame, restart_interval,
                                precision):
    """SOF11 scan decode — :func:`_lla_scan_planes` + the shared
    output epilogue; same contract as ``_decode_jpeg_lossless``."""
    planes, al, _ = _lla_scan_planes(
        b, pos, dac_dc, frame, restart_interval, precision
    )
    h, w, comps = frame
    return _ll_planes_to_bytes(planes, w, h, len(comps), al, precision)


# -- hierarchical mode (DHP/EXP, T.81 Annex J) --------------------------
# Round 16.  A non-differential first frame (SOF3/SOF11 lossless, or
# SOF0 Huffman-DCT) establishes the reference at reduced resolution;
# each EXP marker doubles it with the J.1.1.2 interpolation filter
# (odd samples = (a + b + 1) >> 1, edges repeat); each differential
# frame codes the difference against the (trimmed) expanded reference
# with ZERO prediction — losslessly (SOF7 Huffman / SOF15 arithmetic,
# mod-2^16) or lossily (SOF5 Huffman / SOF13 QM-arithmetic DCT:
# quantized DCT of the signed difference, no level shift).  Frame dims
# follow the ceil pyramid (w_i = ceil(w_{i+1} / 2)); an expanded
# reference one sample wider/taller than the next frame is trimmed
# (the odd-dimension rule).  An all-lossless pyramid reconstructs
# every level exactly; a DCT progression with a lossless FINAL frame
# is exact overall because the encoder tracks the decoder's own
# reconstruction (_dct_rows_to_plane is shared by both sides).
# Progressive hierarchical frames (SOF6/SOF14 differential,
# SOF2/SOF10 as a DHP base) decode via the flat progressive walkers
# in frame-scoped mode — round 16 closed that guard.  No third-party
# implementation in this container produces or consumes hierarchical
# streams (libjpeg-turbo has no Annex-J support at all), so the
# posture is the SOF11 one: exact roundtrip + pyramid cross-checks
# against the flat lossless codecs.


def _exp_upsample(plane, eh: int, ev: int):
    """J.1.1.2 reference expansion: double horizontally/vertically;
    even outputs copy, odd outputs interpolate (a + b + 1) >> 1 with
    the last sample repeated at the edge."""
    if eh:
        out = []
        for row in plane:
            w = len(row)
            r = []
            for x in range(w):
                r.append(row[x])
                nxt = row[x + 1] if x + 1 < w else row[x]
                r.append((row[x] + nxt + 1) >> 1)
            out.append(r)
        plane = out
    if ev:
        out = []
        h = len(plane)
        for y in range(h):
            out.append(plane[y])
            nxt = plane[y + 1] if y + 1 < h else plane[y]
            out.append([(a + c + 1) >> 1 for a, c in zip(plane[y], nxt)])
        plane = out
    return plane


def _dct_rows_to_plane(rows_zz, qt, mcus_x, mcus_y, h, w, differential):
    """Zigzag-ordered quantized-coefficient rows → integer value plane
    (dequant + IDCT + round; +128 level shift and [0, 255] clamp only
    for NON-differential frames — differential frames yield signed
    differences).  Shared by the hierarchical DCT decode path AND the
    encoder's closed-loop reconstruction, so the two are bit-identical
    by construction — the property that makes a lossy pyramid with a
    lossless final frame decode EXACTLY."""
    zz_np = np.asarray(ZIGZAG)
    nat = np.zeros_like(rows_zz, dtype=np.float64)
    nat[:, zz_np] = rows_zz
    blocks = idct2(nat.reshape(-1, 8, 8) * qt)
    if not differential:
        blocks = blocks + 128.0
    grid = (
        blocks.reshape(mcus_y, mcus_x, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(mcus_y * 8, mcus_x * 8)
    )
    vals = np.round(grid[:h, :w]).astype(np.int64)
    if not differential:
        vals = np.clip(vals, 0, 255)
    return [list(map(int, row)) for row in vals]


def _dct_scan_planes(b, pos, qtabs, huff_fast, frame, restart_interval,
                     differential):
    """Sequential Huffman DCT scan decode for the hierarchical subset
    (1×1 sampling, precision 8): PASS 1 of the baseline decoder with
    the DC prediction DISABLED in differential frames (J.1.1.5 — each
    block's DC is coded directly), PASS 2 through
    :func:`_dct_rows_to_plane`.  Returns (planes, end_pos)."""
    if b[pos] != 0xFF or b[pos + 1] != 0xDA:
        raise ValueError("expected SOS")
    seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
    seg = b[pos + 4 : pos + 2 + seg_len]
    ns = seg[0]
    h, w, comps = frame
    if ns != len(comps):
        raise NotImplementedError("multi-scan hierarchical DCT frame")
    by_id = {c["id"]: c for c in comps}
    order = []
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        if c["h"] != 1 or c["v"] != 1:
            raise NotImplementedError(
                "hierarchical DCT frame with subsampling"
            )
        dc = huff_fast.get((0, tdta >> 4))
        ac = huff_fast.get((1, tdta & 15))
        qt = qtabs.get(c["tq"])
        if dc is None or ac is None or qt is None:
            raise ValueError("scan references missing Huffman/quant table")
        order.append((dc, ac, qt.astype(np.float64)))
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    total_mcus = mcus_x * mcus_y

    segs, end = _entropy_segments(b, pos + 2 + seg_len)
    coefs = [np.zeros((total_mcus, 64)) for _ in order]
    dc_pred = [0] * ns
    r = _FastBitReader(segs[0])
    for m in range(total_mcus):
        if restart_interval and m and m % restart_interval == 0:
            si = m // restart_interval
            if si >= len(segs):
                raise ValueError("missing restart marker")
            r = _FastBitReader(segs[si])
            dc_pred = [0] * ns
        for ci, (dc, ac, _qt) in enumerate(order):
            _, _s, diff = r.decode_rs_val(dc)
            if differential:
                coefs[ci][m, 0] = diff  # PRED = 0 per block
            else:
                dc_pred[ci] += diff
                coefs[ci][m, 0] = dc_pred[ci]
            k = 1
            while k < 64:
                run, size, val = r.decode_rs_val(ac)
                if size == 0:
                    if run == 15:
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC coefficient overrun")
                coefs[ci][m, k] = val
                k += 1
    planes = [
        _dct_rows_to_plane(coefs[ci], qt, mcus_x, mcus_y, h, w,
                           differential)
        for ci, (_dc, _ac, qt) in enumerate(order)
    ]
    return planes, end


def _dct_arith_scan_planes(b, pos, qtabs, dac_dc, dac_ac, frame,
                           restart_interval, differential):
    """QM-coded sequential DCT scan decode for the hierarchical subset
    (1×1 sampling, precision 8) — the F.1.4.4 DC/AC models with the DC
    value coded DIRECTLY (PRED = 0) in differential frames, mirroring
    :func:`_dct_scan_planes`.  Returns (planes, end_pos)."""
    if b[pos] != 0xFF or b[pos + 1] != 0xDA:
        raise ValueError("expected SOS")
    seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
    seg = b[pos + 4 : pos + 2 + seg_len]
    ns = seg[0]
    h, w, comps = frame
    if ns != len(comps):
        raise NotImplementedError("multi-scan hierarchical DCT frame")
    by_id = {c["id"]: c for c in comps}
    order = []
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        if c["h"] != 1 or c["v"] != 1:
            raise NotImplementedError(
                "hierarchical DCT frame with subsampling"
            )
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise ValueError("scan references missing quant table")
        order.append((tdta >> 4, tdta & 15, qt.astype(np.float64)))
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    total_mcus = mcus_x * mcus_y

    def fresh_stats():
        return (
            {t: bytearray(64) for t, _ta, _qt in order},
            {ta: bytearray(256) for _t, ta, _qt in order},
        )

    segs, end = _entropy_segments(b, pos + 2 + seg_len)
    coefs = [np.zeros((total_mcus, 64)) for _ in order]
    dc_stats, ac_stats = fresh_stats()
    dc_pred = [0] * ns
    dc_ctx = [0] * ns
    dec = _QMDecoder(segs[0])
    for m in range(total_mcus):
        if restart_interval and m and m % restart_interval == 0:
            si = m // restart_interval
            if si >= len(segs):
                raise ValueError("missing restart marker")
            dec = _QMDecoder(segs[si])
            dc_stats, ac_stats = fresh_stats()
            dc_pred = [0] * ns
            dc_ctx = [0] * ns
        for ci, (td, ta, _qt) in enumerate(order):
            lo, up = dac_dc.get(td, (0, 1))
            kx = dac_ac.get(ta, 5)
            diff, dc_ctx[ci] = _arith_decode_dc(
                dec, dc_stats[td], dc_ctx[ci], lo, up
            )
            if differential:
                coefs[ci][m, 0] = diff  # PRED = 0 per block
            else:
                dc_pred[ci] += diff
                coefs[ci][m, 0] = dc_pred[ci]
            for k, val in _arith_decode_ac(dec, ac_stats[ta], kx):
                coefs[ci][m, k] = val
    planes = [
        _dct_rows_to_plane(coefs[ci], qt, mcus_x, mcus_y, h, w,
                           differential)
        for ci, (_td, _ta, qt) in enumerate(order)
    ]
    return planes, end


def _dct_arith_encode_scan(planes, w, h, channels, qt_nat,
                           restart_interval, differential, lo, up, kx):
    """QM twin of :func:`_dct_encode_scan` — same closed-loop
    reconstruction contract.  Returns (entropy_bytes, recon)."""
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    qarr = qt_nat.reshape(8, 8).astype(np.float64)
    padded = [
        _pad_to_blocks(np.asarray(p, dtype=np.float64), mcus_y, mcus_x)
        for p in planes
    ]
    rows = [np.zeros((mcus_x * mcus_y, 64)) for _ in range(channels)]
    zz_np = np.asarray(ZIGZAG)
    enc = _QMEncoder()
    dc_stats, ac_stats = bytearray(64), bytearray(256)
    dc_pred = [0] * channels
    dc_ctx = [0] * channels
    entropy = bytearray()
    rst_count = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            entropy += enc.finish()
            entropy += bytes([0xFF, 0xD0 + (rst_count & 7)])
            rst_count += 1
            enc = _QMEncoder()
            dc_stats, ac_stats = bytearray(64), bytearray(256)
            dc_pred = [0] * channels
            dc_ctx = [0] * channels
        my, mx = divmod(m, mcus_x)
        for c in range(channels):
            block = padded[c][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            if not differential:
                block = block - 128.0
            qc = np.round(fdct2(block) / qarr).astype(np.int64)
            zz = qc.ravel()[zz_np]
            rows[c][m] = zz
            dc = int(zz[0])
            diff = dc if differential else dc - dc_pred[c]
            if not differential:
                dc_pred[c] = dc
            dc_ctx[c] = _arith_encode_dc(
                enc, dc_stats, diff, dc_ctx[c], lo, up
            )
            _arith_encode_ac(enc, ac_stats, [int(v) for v in zz], kx)
    entropy += enc.finish()
    recon = [
        _dct_rows_to_plane(rows[c], qarr, mcus_x, mcus_y, h, w,
                           differential)
        for c in range(channels)
    ]
    return bytes(entropy), recon


def _dct_prog_quantize(planes, w, h, channels, qt_nat, differential):
    """Quantize one 1×1-sampled hierarchical frame's blocks once for a
    progressive scan script: → (zigzag rows per channel, mcus_x,
    mcus_y).  No level shift for differential frames (signed
    differences), same as the sequential helpers."""
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    qarr = qt_nat.reshape(8, 8).astype(np.float64)
    padded = [
        _pad_to_blocks(np.asarray(p, dtype=np.float64), mcus_y, mcus_x)
        for p in planes
    ]
    rows = [
        np.zeros((mcus_x * mcus_y, 64), dtype=np.int64)
        for _ in range(channels)
    ]
    zz_np = np.asarray(ZIGZAG)
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for c in range(channels):
            block = padded[c][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            if not differential:
                block = block - 128.0
            qc = np.round(fdct2(block) / qarr).astype(np.int64)
            rows[c][m] = qc.ravel()[zz_np]
    return rows, mcus_x, mcus_y


def _dct_prog_encode_frame(planes, w, h, channels, qt_nat,
                           restart_interval, differential,
                           successive=False):
    """Progressive-Huffman-encode one 1×1-sampled hierarchical DCT
    frame (SOF2 base / SOF6 differential, round 16): interleaved DC
    first scan (PRED = 0 per block when differential, J.1.1.5), one
    full-band AC first scan per component, plus raw-bit DC refinement
    and :func:`_emit_ac_refine` AC refinement scans when ``successive``
    (first scans then carry Al=1).  Returns ``(scan_bytes, recon)``
    where scan_bytes includes every SOS header; the frame preamble
    must carry DC_LUM at 0x00 and PROG_AC at 0x10.  Reconstruction is
    the shared closed loop (:func:`_dct_rows_to_plane`), identical to
    the sequential helpers because the final coefficients are — the
    scan script only reorders their delivery."""
    rows, mcus_x, mcus_y = _dct_prog_quantize(
        planes, w, h, channels, qt_nat, differential
    )
    n_units = mcus_x * mcus_y
    dc_enc, _ = _build_huffman(*DC_LUM)
    ac_enc, _ = _build_huffman(*PROG_AC)
    qarr = qt_nat.reshape(8, 8).astype(np.float64)
    al0 = 1 if successive else 0
    ri = restart_interval
    out = bytearray()

    def sos(ncomp, first_comp, ss, se, ah, al):
        o = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp,
                                                ncomp))
        for c in range(first_comp, first_comp + ncomp):
            o += bytes([c + 1, 0x00])
        o += bytes([ss, se, (ah << 4) | al])
        return o

    # DC first scan — all components interleaved
    out += sos(channels, 0, 0, 0, 0, al0)
    wtr = _BitWriter()
    pred = [0] * channels
    rst = [0]
    for m in range(n_units):
        if ri and m and m % ri == 0:
            _emit_restart(wtr, rst)
            pred = [0] * channels
        for c in range(channels):
            dc = int(rows[c][m, 0]) >> al0
            if differential:
                diff = dc  # PRED = 0 per block
            else:
                diff = dc - pred[c]
                pred[c] = dc
            _encode_dc_diff(wtr, diff, dc_enc)
    wtr.flush()
    out += wtr.out

    # AC first scan per component, band 1..63 at Al=al0
    for c in range(channels):
        out += sos(1, c, 1, 63, 0, al0)
        wtr = _BitWriter()
        rst = [0]
        pending_eob = 0

        def flush_eob(wtr=wtr):
            nonlocal pending_eob
            if not pending_eob:
                return
            rr = pending_eob.bit_length() - 1
            ec, el = ac_enc[rr << 4]
            wtr.write(ec, el)
            if rr:
                wtr.write(pending_eob - (1 << rr), rr)
            pending_eob = 0

        for m in range(n_units):
            if ri and m and m % ri == 0:
                flush_eob()
                _emit_restart(wtr, rst)
            zz = rows[c][m]
            vals = [
                (1 if zz[k] >= 0 else -1) * (abs(int(zz[k])) >> al0)
                for k in range(64)
            ]
            if not any(vals[1:]):
                pending_eob += 1
                if pending_eob == 32767:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for k in range(1, 64):
                v = vals[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = ac_enc[0xF0]
                    wtr.write(zc, zl)
                    run -= 16
                s = abs(v).bit_length()
                acode, alen = ac_enc[(run << 4) | s]
                wtr.write(acode, alen)
                ebits = v if v >= 0 else v + (1 << s) - 1
                wtr.write(ebits, s)
                run = 0
            if run:
                pending_eob = 1
        flush_eob()
        wtr.flush()
        out += wtr.out

    if successive:
        # DC refinement — one raw LSB per block, interleaved
        out += sos(channels, 0, 0, 0, 1, 0)
        wtr = _BitWriter()
        rst = [0]
        for m in range(n_units):
            if ri and m and m % ri == 0:
                _emit_restart(wtr, rst)
            for c in range(channels):
                wtr.write(int(rows[c][m, 0]) & 1, 1)
        wtr.flush()
        out += wtr.out
        # AC refinement per component
        for c in range(channels):
            out += sos(1, c, 1, 63, 1, 0)
            wtr = _BitWriter()
            _emit_ac_refine(
                wtr, ac_enc, (rows[c][m] for m in range(n_units)),
                restart_interval=ri,
            )
            wtr.flush()
            out += wtr.out

    recon = [
        _dct_rows_to_plane(rows[c], qarr, mcus_x, mcus_y, h, w,
                           differential)
        for c in range(channels)
    ]
    return bytes(out), recon


def _dct_prog_arith_encode_frame(planes, w, h, channels, qt_nat,
                                 restart_interval, differential,
                                 lo, up, kx, successive=False):
    """QM twin of :func:`_dct_prog_encode_frame` (SOF10 base / SOF14
    differential): same scan script over the F.1.4.4 models —
    statistics and the coder reset per scan and per restart interval,
    DC refinement is one fixed-bin bit per block.  Returns
    ``(scan_bytes, recon)``; uses DC conditioning table 0 and AC
    conditioning table 0 (the frame preamble's DAC)."""
    rows, mcus_x, mcus_y = _dct_prog_quantize(
        planes, w, h, channels, qt_nat, differential
    )
    n_units = mcus_x * mcus_y
    qarr = qt_nat.reshape(8, 8).astype(np.float64)
    al0 = 1 if successive else 0
    ri = restart_interval
    out = bytearray()

    def sos(ncomp, first_comp, ss, se, ah, al):
        o = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp,
                                                ncomp))
        for c in range(first_comp, first_comp + ncomp):
            o += bytes([c + 1, 0x00])
        o += bytes([ss, se, (ah << 4) | al])
        return o

    def rst_marker(entropy, enc, n):
        entropy += enc.finish()
        entropy += bytes([0xFF, 0xD0 + (n & 7)])

    # DC first scan — interleaved
    out += sos(channels, 0, 0, 0, 0, al0)
    entropy = bytearray()
    enc = _QMEncoder()
    dc_stats = bytearray(64)
    pred = [0] * channels
    ctx = [0] * channels
    rst_count = 0
    for m in range(n_units):
        if ri and m and m % ri == 0:
            rst_marker(entropy, enc, rst_count)
            rst_count += 1
            enc = _QMEncoder()
            dc_stats = bytearray(64)
            pred = [0] * channels
            ctx = [0] * channels
        for c in range(channels):
            dc = int(rows[c][m, 0]) >> al0
            if differential:
                diff = dc  # PRED = 0 per block
            else:
                diff = dc - pred[c]
                pred[c] = dc
            ctx[c] = _arith_encode_dc(enc, dc_stats, diff, ctx[c], lo, up)
    entropy += enc.finish()
    out += entropy

    # AC first scan per component
    for c in range(channels):
        out += sos(1, c, 1, 63, 0, al0)
        entropy = bytearray()
        enc = _QMEncoder()
        ac_stats = bytearray(256)
        rst_count = 0
        for m in range(n_units):
            if ri and m and m % ri == 0:
                rst_marker(entropy, enc, rst_count)
                rst_count += 1
                enc = _QMEncoder()
                ac_stats = bytearray(256)
            _arith_encode_ac(
                enc, ac_stats, [int(v) for v in rows[c][m]], kx, 1, 63,
                al0,
            )
        entropy += enc.finish()
        out += entropy

    if successive:
        # DC refinement — one fixed-bin bit per block
        out += sos(channels, 0, 0, 0, 1, 0)
        entropy = bytearray()
        enc = _QMEncoder()
        rst_count = 0
        for m in range(n_units):
            if ri and m and m % ri == 0:
                rst_marker(entropy, enc, rst_count)
                rst_count += 1
                enc = _QMEncoder()
            for c in range(channels):
                enc.encode_fixed(int(rows[c][m, 0]) & 1)
        entropy += enc.finish()
        out += entropy
        # AC refinement per component
        for c in range(channels):
            out += sos(1, c, 1, 63, 1, 0)
            entropy = bytearray()
            enc = _QMEncoder()
            ac_stats = bytearray(256)
            rst_count = 0
            for m in range(n_units):
                if ri and m and m % ri == 0:
                    rst_marker(entropy, enc, rst_count)
                    rst_count += 1
                    enc = _QMEncoder()
                    ac_stats = bytearray(256)
                _arith_encode_ac_refine(
                    enc, ac_stats, rows[c][m], 1, 63, 1, 0
                )
            entropy += enc.finish()
            out += entropy

    recon = [
        _dct_rows_to_plane(rows[c], qarr, mcus_x, mcus_y, h, w,
                           differential)
        for c in range(channels)
    ]
    return bytes(out), recon


def _decode_jpeg_hierarchical(b: bytes, pos: int):
    """Hierarchical stream walk (``pos`` ON the DHP marker): frames +
    EXP expansions until the reference reaches the DHP's full
    resolution.  Returns the ``decode_jpeg_pixels`` tuple."""
    seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
    seg = b[pos + 4 : pos + 2 + seg_len]
    prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
    if not 2 <= prec <= 16:
        raise ValueError(f"invalid hierarchical precision {prec}")
    pos = pos + 2 + seg_len

    huff_dec: dict[tuple[int, int], dict] = {}
    huff_fast: dict[tuple[int, int], tuple] = {}
    qtabs: dict[int, np.ndarray] = {}
    dac_dc: dict[int, tuple[int, int]] = {}
    dac_ac: dict[int, int] = {}
    restart_interval = 0
    refs = None  # per-component value planes at the current resolution
    ref_w = ref_h = 0
    frame = None
    differential = f_arith = f_dct = f_prog = False
    while pos < len(b) - 1:
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("JPEG segment truncated")
        nxt = pos + seg_len
        if marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 15
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                huff_dec[(tc, th)] = _build_huffman_dec_cached(bits, vals)
                huff_fast[(tc, th)] = _fast_table_cached(bits, vals)
                sp += 17 + nv
        elif marker == 0xDB:  # DQT (8-bit entries; 16-bit Pq=1)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                if pq not in (0, 1):
                    raise ValueError(f"invalid DQT precision {pq}")
                if pq == 0:
                    zz = list(seg[sp + 1 : sp + 65])
                    sp += 65
                else:
                    raw = seg[sp + 1 : sp + 129]
                    zz = [
                        (raw[2 * i] << 8) | raw[2 * i + 1] for i in range(64)
                    ]
                    sp += 129
                nat = np.zeros(64, dtype=np.int64)
                for zi, ni in enumerate(ZIGZAG):
                    nat[ni] = zz[zi]
                qtabs[tq] = nat.reshape(8, 8)
        elif marker == 0xCC:  # DAC
            sp = 0
            while sp + 1 < len(seg):
                tc, tb = seg[sp] >> 4, seg[sp] & 15
                cs = seg[sp + 1]
                if tc == 0:
                    lo, up = cs & 15, cs >> 4
                    if lo > up:
                        raise ValueError("DAC DC conditioning L > U")
                    dac_dc[tb] = (lo, up)
                elif tc == 1:
                    if not 1 <= cs <= 63:
                        raise ValueError(f"DAC AC Kx {cs} out of range")
                    dac_ac[tb] = cs
                else:
                    raise ValueError(f"invalid DAC table class {tc}")
                sp += 2
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDF:  # EXP
            if refs is None:
                raise ValueError("EXP before any reference frame")
            eh, ev = seg[0] >> 4, seg[0] & 15
            if eh not in (0, 1) or ev not in (0, 1):
                raise ValueError(f"invalid EXP nibbles {eh}/{ev}")
            refs = [_exp_upsample(rp, eh, ev) for rp in refs]
            ref_h, ref_w = len(refs[0]), len(refs[0][0])
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            differential = marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            f_arith = marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
            f_dct = marker in (0xC0, 0xC1, 0xC2, 0xC5, 0xC6, 0xC9, 0xCA,
                               0xCD, 0xCE)
            f_prog = marker in (0xC2, 0xC6, 0xCA, 0xCE)
            if f_dct and prec != 8:
                raise NotImplementedError(
                    "hierarchical DCT frames at precision != 8"
                )
            p2, h2, w2, nc2 = struct.unpack(">BHHB", seg[:6])
            if p2 != prec:
                raise ValueError("frame precision differs from DHP")
            if nc2 != nc:
                raise ValueError("frame component count differs from DHP")
            if differential and refs is None:
                raise ValueError("differential frame before any reference")
            if not differential and refs is not None:
                raise NotImplementedError(
                    "hierarchical non-differential replacement frames"
                )
            comps = []
            for i in range(nc2):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = (h2, w2, comps)
        elif marker == 0xDA:  # SOS — decode one frame's scan(s)
            if frame is None:
                raise ValueError("SOS before SOF in hierarchical stream")
            h2, w2, _comps = frame
            if f_prog:
                # progressive frame (SOF2/SOF10 base, SOF6/SOF14
                # differential): the frame-scoped walker consumes ALL
                # of this frame's scans (incl. inter-scan DHT/DAC/DRI)
                # and stops at the next frame's preamble
                if f_arith:
                    planes, end = _decode_jpeg_arith_progressive(
                        b, pos - 2, qtabs, dac_dc, dac_ac, frame,
                        restart_interval, differential=differential,
                        frame_scoped=True,
                    )
                else:
                    planes, end = _decode_jpeg_progressive(
                        b, pos - 2, qtabs, huff_fast, frame,
                        restart_interval, differential=differential,
                        frame_scoped=True,
                    )
                al = 0
            elif f_dct and f_arith:
                planes, end = _dct_arith_scan_planes(
                    b, pos - 2, qtabs, dac_dc, dac_ac, frame,
                    restart_interval, differential,
                )
                al = 0
            elif f_dct:
                planes, end = _dct_scan_planes(
                    b, pos - 2, qtabs, huff_fast, frame, restart_interval,
                    differential,
                )
                al = 0
            elif f_arith:
                planes, al, end = _lla_scan_planes(
                    b, pos - 2, dac_dc, frame, restart_interval, prec,
                    differential,
                )
            else:
                planes, al, end = _ll_scan_planes(
                    b, pos - 2, huff_dec, frame, restart_interval, prec,
                    differential,
                )
            if al != 0:
                raise NotImplementedError("hierarchical point transform")
            if differential:
                if w2 > ref_w or h2 > ref_h:
                    raise ValueError(
                        "differential frame larger than the reference"
                    )
                # odd-dim rule: trim the expanded reference to frame dims
                refs = [
                    [
                        [(rp[y][x] + dp[y][x]) & 0xFFFF for x in range(w2)]
                        for y in range(h2)
                    ]
                    for rp, dp in zip(refs, planes)
                ]
            else:
                refs = planes
            ref_w, ref_h = w2, h2
            frame = None
            pos = end
            continue
        pos = nxt
    if refs is None:
        raise ValueError("hierarchical stream carried no frames")
    if (ref_w, ref_h) != (fw, fh):
        raise ValueError(
            f"hierarchical stream ended at {ref_w}x{ref_h}, DHP declares "
            f"{fw}x{fh}"
        )
    return _ll_planes_to_bytes(refs, ref_w, ref_h, len(refs), 0, prec)


def _dct_encode_scan(planes, w, h, channels, qt_nat, restart_interval,
                     differential):
    """Huffman-DCT-encode one 1×1-sampled hierarchical frame scan.
    Returns ``(entropy_bytes, recon_planes)`` — the reconstruction is
    computed from the QUANTIZED coefficients through the decoder's own
    :func:`_dct_rows_to_plane`, so the encoder's closed loop tracks
    the decoder bit-exactly (what makes a lossy pyramid with a
    lossless final frame decode EXACTLY)."""
    dc_enc, _ = _build_huffman(*DC_LUM)
    ac_enc, _ = _build_huffman(*AC_LUM)
    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    qarr = qt_nat.reshape(8, 8).astype(np.float64)
    padded = [
        _pad_to_blocks(np.asarray(p, dtype=np.float64), mcus_y, mcus_x)
        for p in planes
    ]
    rows = [np.zeros((mcus_x * mcus_y, 64)) for _ in range(channels)]
    zz_np = np.asarray(ZIGZAG)
    wtr = _BitWriter()
    rst = [0]
    dc_pred = [0] * channels
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            _emit_restart(wtr, rst)
            dc_pred = [0] * channels
        my, mx = divmod(m, mcus_x)
        for c in range(channels):
            block = padded[c][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            if not differential:
                block = block - 128.0
            qc = np.round(fdct2(block) / qarr).astype(np.int64)
            pred = 0 if differential else dc_pred[c]
            newpred = _encode_block(wtr, qc, pred, dc_enc, ac_enc)
            if not differential:
                dc_pred[c] = newpred
            rows[c][m] = qc.ravel()[zz_np]
    wtr.flush()
    recon = [
        _dct_rows_to_plane(rows[c], qarr, mcus_x, mcus_y, h, w,
                           differential)
        for c in range(channels)
    ]
    return bytes(wtr.out), recon


def encode_jpeg_hierarchical(
    samples, width: int, height: int, channels: int = 1, levels: int = 2,
    predictor: int = 1, precision: int = 8, restart_interval: int = 0,
    arith: bool = False, dc_cond: tuple[int, int] = (0, 1),
    dct_quality: int | None = None, dct_base: bool = False,
    progressive: bool = False, successive: bool = False,
) -> bytes:
    """Hierarchical JPEG encoder (DHP + frames + EXP expansions) —
    fixture twin of ``_decode_jpeg_hierarchical``.  The pyramid
    decimates by 2 per level (ceil dims, top-left sample — the
    downsampling filter is an encoder choice the spec leaves open).

    Default (all-lossless) mode: SOF3/SOF11 base + SOF7/SOF15
    differential frames; every level reconstructs exactly, so decode
    == input bit for bit.  ``arith`` selects the QM entropy layer for
    the lossless frames.

    ``dct_quality`` (precision 8 only) switches the MIDDLE frames to
    lossy Huffman-DCT differentials (SOF5) at that quality —
    ``dct_base=True`` additionally makes the base frame a
    non-differential DCT frame (SOF0) — while the FINAL frame stays a
    lossless differential: the classic Annex-J progression.  The
    encoder closes the loop through the decoder's own reconstruction
    (:func:`_dct_rows_to_plane`), so the overall decode is STILL
    bit-exact — the lossy frames only shape how much residual the
    final lossless frame carries.

    ``progressive=True`` (round 16; requires ``dct_quality``) makes
    every DCT frame PROGRESSIVE — differential middles become SOF6
    (Huffman) / SOF14 (arithmetic) multi-scan frames, a ``dct_base``
    base becomes SOF2 / SOF10 inside the DHP stream; ``successive``
    adds the successive-approximation axis (first scans at Al=1, then
    DC/AC refinement scans).  The scan script only reorders coefficient
    delivery, so the closed-loop guarantee is unchanged — decode is
    still bit-exact."""
    samples = list(samples)
    if len(samples) != width * height * channels:
        raise ValueError("samples length != width*height*channels")
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid predictor {predictor}")
    if not 2 <= precision <= 16:
        raise ValueError(f"invalid precision {precision}")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if any(not 0 <= v < (1 << precision) for v in samples):
        raise ValueError("sample out of range for precision")
    lo, up = dc_cond
    if not (0 <= lo <= up <= 15):
        raise ValueError("dc_cond must satisfy 0 <= L <= U <= 15")
    if dct_quality is not None and precision != 8:
        raise ValueError("dct_quality requires precision 8")
    if dct_base and dct_quality is None:
        raise ValueError("dct_base requires dct_quality")
    if progressive and dct_quality is None:
        raise ValueError("progressive requires dct_quality")
    if successive and not progressive:
        raise ValueError("successive requires progressive")
    full = [
        [
            [samples[(y * width + x) * channels + c] for x in range(width)]
            for y in range(height)
        ]
        for c in range(channels)
    ]
    pyramid = [(full, width, height)]
    for _ in range(levels - 1):
        prev, w, h = pyramid[-1]
        if w == 1 and h == 1:
            break
        dw, dh = (w + 1) // 2, (h + 1) // 2
        pyramid.append((
            [
                [[p[2 * y][2 * x] for x in range(dw)] for y in range(dh)]
                for p in prev
            ],
            dw, dh,
        ))
    pyramid.reverse()  # smallest level first
    default = 1 << (precision - 1)

    def sof(marker, w, h):
        o = bytearray(
            bytes([0xFF, marker])
            + struct.pack(">HBHHB", 8 + 3 * channels, precision, h, w,
                          channels)
        )
        for c in range(channels):
            o += bytes([c + 1, 0x11, 0])
        return o

    def sos(pred_byte):
        o = bytearray(
            b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
        )
        for c in range(channels):
            o += bytes([c + 1, 0x00])
        o += bytes([pred_byte, 0, 0])
        return o

    ll_dht = (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(_LL_VALS))
        + bytes([0x00])
        + bytes(_LL_BITS)
        + bytes(_LL_VALS)
    )
    dct_dht = bytearray()
    for tid, (bits, vals) in ((0x00, DC_LUM), (0x10, AC_LUM)):
        dct_dht += b"\xff\xc4" + struct.pack(
            ">H", 2 + 1 + 16 + len(vals)
        ) + bytes([tid]) + bytes(bits) + bytes(vals)
    prog_dht = bytearray()
    for tid, (bits, vals) in ((0x00, DC_LUM), (0x10, PROG_AC)):
        prog_dht += b"\xff\xc4" + struct.pack(
            ">H", 2 + 1 + 16 + len(vals)
        ) + bytes([tid]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xde" + struct.pack(
        ">HBHHB", 8 + 3 * channels, precision, height, width, channels
    )
    for c in range(channels):
        out += bytes([c + 1, 0x11, 0])
    if arith:
        dac = bytes([0x00, (up << 4) | lo])
        if dct_quality is not None:
            dac += bytes([0x10, 5])  # AC Kx conditioning for table 0
        out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    qt = None
    if dct_quality is not None:
        qt = scaled_quant(QUANT_LUM, dct_quality)
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([0])
        out += bytes(int(qt.ravel()[z]) for z in ZIGZAG)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # class-0 table 0 means _LL for lossless frames but DC_LUM for DCT
    # frames — (re)define DHT whenever the next frame's kind changes
    cur_dht = None
    ref = None
    last = len(pyramid) - 1
    for li, (planes, w, h) in enumerate(pyramid):
        base = li == 0
        # middle frames go DCT when dct_quality is set; base goes DCT
        # only under dct_base; the FINAL differential frame is always
        # lossless so the pyramid reconstructs exactly
        use_dct = dct_quality is not None and (
            (base and dct_base) or (not base and li != last)
        )
        if not base:
            pw, ph = pyramid[li - 1][1], pyramid[li - 1][2]
            eh = 1 if w > pw else 0
            ev = 1 if h > ph else 0
            out += b"\xff\xdf" + struct.pack(">H", 3) + bytes(
                [(eh << 4) | ev]
            )
            ref = [_exp_upsample(rp, eh, ev) for rp in ref]
            diffs = [
                [
                    [(pp[y][x] - rp[y][x]) & 0xFFFF for x in range(w)]
                    for y in range(h)
                ]
                for pp, rp in zip(planes, ref)
            ]
        if use_dct:
            dht_kind = "prog" if progressive else "dct"
            if not arith and cur_dht != dht_kind:
                out += prog_dht if progressive else dct_dht
                cur_dht = dht_kind
            if base:
                if progressive:
                    if arith:
                        scans, recon = _dct_prog_arith_encode_frame(
                            planes, w, h, channels, qt, restart_interval,
                            False, lo, up, 5, successive,
                        )
                        out += sof(0xCA, w, h)  # SOF10 inside DHP
                    else:
                        scans, recon = _dct_prog_encode_frame(
                            planes, w, h, channels, qt, restart_interval,
                            False, successive,
                        )
                        out += sof(0xC2, w, h)  # SOF2 inside DHP
                    out += scans
                    ref = recon
                    continue
                if arith:
                    entropy, recon = _dct_arith_encode_scan(
                        planes, w, h, channels, qt, restart_interval,
                        False, lo, up, 5,
                    )
                else:
                    entropy, recon = _dct_encode_scan(
                        planes, w, h, channels, qt, restart_interval,
                        False,
                    )
                out += sof(0xC9 if arith else 0xC0, w, h)
                out += sos(0)
                out += entropy
                ref = recon
            else:
                # DCT codes SIGNED differences: fold mod-2^16 back
                sdiffs = [
                    [
                        [d - 65536 if d >= 32768 else d for d in row]
                        for row in dp
                    ]
                    for dp in diffs
                ]
                if progressive:
                    if arith:
                        entropy, recon = _dct_prog_arith_encode_frame(
                            sdiffs, w, h, channels, qt, restart_interval,
                            True, lo, up, 5, successive,
                        )
                        out += sof(0xCE, w, h)  # SOF14
                    else:
                        entropy, recon = _dct_prog_encode_frame(
                            sdiffs, w, h, channels, qt, restart_interval,
                            True, successive,
                        )
                        out += sof(0xC6, w, h)  # SOF6
                    # scan bytes already carry their SOS headers
                elif arith:
                    entropy, recon = _dct_arith_encode_scan(
                        sdiffs, w, h, channels, qt, restart_interval,
                        True, lo, up, 5,
                    )
                    out += sof(0xCD, w, h)
                    out += sos(0)
                else:
                    entropy, recon = _dct_encode_scan(
                        sdiffs, w, h, channels, qt, restart_interval, True
                    )
                    out += sof(0xC5, w, h)
                    out += sos(0)
                out += entropy
                ref = [
                    [
                        [(rp[y][x] + dr[y][x]) & 0xFFFF for x in range(w)]
                        for y in range(h)
                    ]
                    for rp, dr in zip(ref, recon)
                ]
        elif base:
            if not arith and cur_dht != "ll":
                out += ll_dht
                cur_dht = "ll"
            out += sof(0xCB if arith else 0xC3, w, h)
            out += sos(predictor)
            if arith:
                out += _lla_encode_scan(
                    planes, w, h, channels, predictor, default,
                    restart_interval, lo, up,
                )
            else:
                out += _ll_encode_scan(
                    planes, w, h, channels, predictor, default,
                    restart_interval,
                )
            ref = planes
        else:
            # lossless differential: diff against the DECODER-tracked
            # reference (identical to `planes` when every prior frame
            # was lossless; the DCT residual otherwise)
            if not arith and cur_dht != "ll":
                out += ll_dht
                cur_dht = "ll"
            out += sof(0xCF if arith else 0xC7, w, h)
            out += sos(0)
            if arith:
                out += _lla_encode_scan(
                    diffs, w, h, channels, 0, default, restart_interval,
                    lo, up, differential=True,
                )
            else:
                out += _ll_encode_scan(
                    diffs, w, h, channels, 0, default, restart_interval,
                    differential=True,
                )
            ref = planes
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------
# arithmetic coding (SOF9): QM-coder per ITU-T T.81 Annexes D & E,
# statistical models per F.1.4.4
# ---------------------------------------------------------------------
# The reference (lib/cacheManage.go) stores media blobs opaquely; this
# tier exists for the LLM-pipeline decode path, where arithmetic-coded
# JPEGs are the long-tail variant every corpus crawl eventually hits.
# The coder is the spec's QM arithmetic coder: a 113-state probability
# estimation table (T.81 Table D.3 — the states are shared with JBIG),
# MPS/LPS conditional exchange, byte-oriented renormalization with
# 0xFF00 bit stuffing, and the sequential DCT statistical model of
# F.1.4.4 (5-category DC conditioning contexts, 3-bin-per-index AC
# contexts with the Kx low/high magnitude split, fixed ~0.5 AC sign
# bin).  Verification posture: the Qe table values are the published
# spec constants; correctness is pinned by (a) exhaustive roundtrip
# equality against the Huffman path over the SAME quantized
# coefficients (the entropy layer is lossless, so decode(arith) must
# equal decode(huffman) BIT-EXACTLY for every image/variant), (b) a
# seeded-noise stress sweep that exercises deep magnitude categories,
# carry propagation and stuffing, and (c) CROSS-IMPLEMENTATION
# interop (tests/test_jpeg_arith_interop.py): the system
# libjpeg-turbo decodes every stream this encoder produces —
# sequential, progressive, successive, restarts, non-default DAC —
# and this decoder reads libjpeg-encoded arithmetic streams
# including its default 4:2:0 and its standard multi-band
# progressive script.

#: T.81 Table D.3 — (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS).
_QE_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
)

_QE_FIXED = 0x5A1D  # the non-adaptive ~0.5 bin (AC sign, F.1.4.3.1)


class _QMEncoder:
    """T.81 Annex D arithmetic encoder.  Convention: after ``A -= Qe``
    the MPS sub-interval is the bottom ``[0, A)`` and the LPS the top
    ``[A, A+Qe)``; conditional exchange swaps them when ``A < Qe``.
    ``C`` is the 28-bit code register; BYTEOUT takes bits 19-26 with
    the carry walked back through already-emitted bytes (the spec's
    0xFF stack collapses to a back-walk when the stream is buffered
    in memory).  0xFF00 stuffing is applied in ``finish()``."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.raw = bytearray()  # un-stuffed entropy bytes

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            # carry: walk back over any 0xFF run (D.1.8's stack case)
            i = len(self.raw) - 1
            while i >= 0 and self.raw[i] == 0xFF:
                self.raw[i] = 0x00
                i -= 1
            if i < 0:
                # unreachable for a well-formed coder (C + A <= 2^16
                # << shifts bounds the carry); fail loudly rather than
                # let Python's negative indexing corrupt the stream
                raise AssertionError("QM carry propagated past stream start")
            self.raw[i] += 1
            t &= 0xFF
        self.raw.append(t)
        self.c &= 0x7FFFF
        self.ct = 8

    def _renorm(self):
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a >= 0x8000:
                break

    def encode(self, area: bytearray, i: int, bit: int):
        """CODE the decision ``bit`` in context ``area[i]`` (packed
        ``mps << 7 | index``) with estimation (D.1.3-D.1.6)."""
        sv = area[i]
        qe, nlps, nmps, sw = _QE_TABLE[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if bit == mps:
            if self.a >= 0x8000:
                return
            if self.a < qe:  # conditional exchange: MPS coded on top
                self.c += self.a
                self.a = qe
            area[i] = (mps << 7) | nmps
        else:
            if self.a >= qe:  # LPS on top (no exchange)
                self.c += self.a
                self.a = qe
            # else: exchange — LPS keeps the (larger) bottom interval
            if sw:
                mps = 1 - mps
            area[i] = (mps << 7) | nlps
        self._renorm()

    def encode_fixed(self, bit: int):
        """CODE with the fixed ~0.5 bin (no estimation, MPS=0)."""
        self.a -= _QE_FIXED
        if bit == 0:
            if self.a >= 0x8000:
                return
            if self.a < _QE_FIXED:
                self.c += self.a
                self.a = _QE_FIXED
        else:
            if self.a >= _QE_FIXED:
                self.c += self.a
                self.a = _QE_FIXED
        self._renorm()

    def finish(self) -> bytes:
        """FLUSH (D.1.9): clear as many low C bits as the final
        interval allows, push out the remaining register bytes, strip
        trailing zeros (the decoder zero-feeds past the data), then
        stuff 0x00 after every 0xFF."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        while self.raw and self.raw[-1] == 0x00:
            self.raw.pop()
        out = bytearray()
        for byte in self.raw:
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


class _QMDecoder:
    """T.81 Annex E arithmetic decoder over ONE de-stuffed entropy
    segment (``_entropy_segments`` output).  Bytes past the segment end
    decode as zeros (the spec's marker-reached convention), which is
    why the encoder may strip trailing zero bytes."""

    def __init__(self, data):
        self.d = data
        self.n = len(data)
        # Chigh (bits 16-31) = the first 16 code-value bits, the next
        # byte staged at bits 8-15, A at the encoder's INITENC scale —
        # the alignment the encoder's CT=11 first BYTEOUT produces
        # (first byte out = code bits 1-8).
        b0 = int(data[0]) if self.n > 0 else 0
        b1 = int(data[1]) if self.n > 1 else 0
        b2 = int(data[2]) if self.n > 2 else 0
        self.bp = 3
        self.c = (b0 << 24) | (b1 << 16) | (b2 << 8)
        self.ct = 8
        self.a = 0x10000

    def _bytein(self):
        self.c += (int(self.d[self.bp]) if self.bp < self.n else 0) << 8
        self.bp += 1
        self.ct = 8

    def _renorm(self):
        while True:
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def decode(self, area: bytearray, i: int) -> int:
        """DECODE a decision in context ``area[i]`` with estimation
        (E.3.2/E.3.3) — exact mirror of ``_QMEncoder.encode``."""
        sv = area[i]
        qe, nlps, nmps, sw = _QE_TABLE[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if (self.c >> 16) < self.a:
            if self.a & 0x8000:
                return mps
            if self.a < qe:  # conditional exchange: bottom is LPS
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                area[i] = (mps << 7) | nlps
            else:
                d = mps
                area[i] = (mps << 7) | nmps
        else:
            self.c -= self.a << 16
            if self.a < qe:  # conditional exchange: top is MPS
                d = mps
                area[i] = (mps << 7) | nmps
            else:
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                area[i] = (mps << 7) | nlps
            self.a = qe
        self._renorm()
        return d

    def decode_fixed(self) -> int:
        """DECODE with the fixed ~0.5 bin (AC sign)."""
        self.a -= _QE_FIXED
        if (self.c >> 16) < self.a:
            if self.a & 0x8000:
                return 0
            d = 1 if self.a < _QE_FIXED else 0
        else:
            self.c -= self.a << 16
            d = 0 if self.a < _QE_FIXED else 1
            self.a = _QE_FIXED
        self._renorm()
        return d


def _dc_arith_context(m: int, sign: int, lo: int, up: int) -> int:
    """F.1.4.4.1.2 conditioning category of the PREVIOUS block's DC
    difference for the next block's context base: ``m`` is the MSB of
    Sz (0 when |diff| <= 1), classified against the DAC L/U bounds.
    Bases: 0 zero/near-zero, 4/8 small +/-, 12/16 large +/-."""
    if m < ((1 << lo) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 12 + sign * 4
    return 4 + sign * 4


def _arith_encode_dc(enc, stats, diff, ctx, lo, up):
    """Encode one DC difference (F.1.4.1 / Figures F.4-F.7): S0
    decision at the conditioning context base, adaptive sign,
    SP/SN magnitude>1 decision, X1..X15 category chain at bin 20,
    single shared mantissa bin at category+14.  Returns the context
    base the NEXT block's S0 uses."""
    if diff == 0:
        enc.encode(stats, ctx, 0)
        return 0
    enc.encode(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    st = ctx + 2 + sign
    if sz == 0:
        enc.encode(stats, st, 0)
        return _dc_arith_context(0, sign, lo, up)
    enc.encode(stats, st, 1)
    msb = 1 << (sz.bit_length() - 1)
    m = 1
    st = 20  # X1 (Table F.4)
    while m != msb:
        enc.encode(stats, st, 1)
        st += 1
        m <<= 1
    enc.encode(stats, st, 0)
    st += 14  # M_n — ONE shared bin for every mantissa bit
    bit = msb >> 1
    while bit:
        enc.encode(stats, st, 1 if sz & bit else 0)
        bit >>= 1
    return _dc_arith_context(msb, sign, lo, up)


def _arith_decode_dc(dec, stats, ctx, lo, up):
    """Decode one DC difference — mirror of ``_arith_encode_dc``.
    Returns (diff, next context base)."""
    if dec.decode(stats, ctx) == 0:
        return 0, 0
    sign = dec.decode(stats, ctx + 1)
    st = ctx + 2 + sign
    m = dec.decode(stats, st)
    if m:
        st = 20
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("corrupt arithmetic DC magnitude")
            st += 1
    nxt = _dc_arith_context(m, sign, lo, up)
    v = m
    st += 14
    while m > 1:
        m >>= 1
        if dec.decode(stats, st):
            v |= m
    v += 1
    return (-v if sign else v), nxt


# -- lossless-arithmetic statistical model (SOF11, T.81 Annex H.1.2.2) --
# The DC difference decision tree of F.1.4.1 conditioned on the 5x5
# category pair of the differences already coded at the LEFT (Da) and
# ABOVE (Db) sample positions: 25 four-bin context groups (S0, SS,
# SP, SN) at bins 0..99, then TWO X1..X15/M magnitude sections — bins
# 100..128 when Db is in the zero/small categories, 129..157 when Db
# is large — the spec's 158-bin lossless statistics area.  Neighbor
# categories reset to ZERO at scan/restart starts and where the
# neighbor lies outside the current restart interval (restarts reset
# all statistics and conditioning, H.2.3).  NOTE on verification: no
# implementation available in this container cross-checks SOF11 —
# libjpeg-turbo implements lossless Huffman and DCT arithmetic but
# ERREXITs on their combination (pinned by a refusal probe in
# tests/test_jpeg_lossless_arith.py) — so the posture is (a) exact
# roundtrip over every predictor/precision/restart/Pt variant,
# (b) decoded-pixel equality with the SOF3 Huffman path (both entropy
# layers are lossless over the same predictions), (c) seeded-noise
# stress through the deep magnitude chains (diffs to ±32768).


def _ll_arith_cat(m: int, sign: int, lo: int, up: int) -> int:
    """5-category classification of a coded difference for the
    lossless conditioning state — the same L/U boundaries as the DC
    model's F.1.4.4.1.2 (``m`` is the MSB of Sz, 0 when |diff| <= 1):
    0 zero/near-zero, 1/2 small +/-, 3/4 large +/-."""
    if m < ((1 << lo) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 3 + sign
    return 1 + sign


def _arith_encode_ll(enc, stats, diff, da, db, lo, up):
    """Encode one lossless prediction difference in the (Da, Db)
    conditioning context; returns the category of ``diff`` for the
    neighbor state of later samples."""
    ctx = 4 * (5 * db + da)
    if diff == 0:
        enc.encode(stats, ctx, 0)
        return 0
    enc.encode(stats, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    st = ctx + 2 + sign
    if sz == 0:
        enc.encode(stats, st, 0)
        return _ll_arith_cat(0, sign, lo, up)
    enc.encode(stats, st, 1)
    msb = 1 << (sz.bit_length() - 1)
    m = 1
    st = 100 if db < 3 else 129  # X1 of the Db-selected section
    while m != msb:
        enc.encode(stats, st, 1)
        st += 1
        m <<= 1
    enc.encode(stats, st, 0)
    st += 14  # M_n — one shared mantissa bin per section/category
    bit = msb >> 1
    while bit:
        enc.encode(stats, st, 1 if sz & bit else 0)
        bit >>= 1
    return _ll_arith_cat(msb, sign, lo, up)


def _lla_encode_scan(planes, width, height, channels, predictor, default,
                     restart_interval, lo, up, differential=False):
    """QM-entropy-code one lossless scan (RSTn markers included, fresh
    coder + 158-bin statistics + conditioning per interval), with
    prediction forced to ZERO when ``differential`` (hierarchical
    SOF15).  Shared by ``encode_jpeg_lossless_arith`` and the
    hierarchical encoder."""
    enc = _QMEncoder()
    stats = bytearray(158)
    cat_above = [[0] * width for _ in range(channels)]
    cat_left = [0] * channels
    entropy = bytearray()
    rst_count = 0
    istart = (0, 0)
    for idx in range(width * height):
        y, x = divmod(idx, width)
        if restart_interval and idx and idx % restart_interval == 0:
            entropy += enc.finish()
            entropy += bytes([0xFF, 0xD0 + (rst_count & 7)])
            rst_count += 1
            enc = _QMEncoder()
            stats = bytearray(158)
            cat_above = [[0] * width for _ in range(channels)]
            cat_left = [0] * channels
            istart = (x, y)
        for c in range(channels):
            pred = 0 if differential else _ll_predict(
                planes[c], x, y, predictor, default, istart[0], istart[1]
            )
            d = (planes[c][y][x] - pred) & 0xFFFF
            signed = d - 65536 if d >= 32768 else d
            da = 0 if (x == 0 or (x, y) == istart) else cat_left[c]
            db = cat_above[c][x]
            cat = _arith_encode_ll(enc, stats, signed, da, db, lo, up)
            cat_left[c] = cat
            cat_above[c][x] = cat
    entropy += enc.finish()
    return bytes(entropy)


def _arith_decode_ll(dec, stats, da, db, lo, up):
    """Decode one lossless difference — mirror of
    ``_arith_encode_ll``.  Returns (diff, category)."""
    ctx = 4 * (5 * db + da)
    if dec.decode(stats, ctx) == 0:
        return 0, 0
    sign = dec.decode(stats, ctx + 1)
    st = ctx + 2 + sign
    m = dec.decode(stats, st)
    if m:
        st = 100 if db < 3 else 129
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:  # past X15 — Sz <= 32767 by construction
                raise ValueError("corrupt arithmetic lossless magnitude")
            st += 1
    cat = _ll_arith_cat(m, sign, lo, up)
    v = m
    st += 14
    while m > 1:
        m >>= 1
        if dec.decode(stats, st):
            v |= m
    v += 1
    return (-v if sign else v), cat


def _arith_encode_ac(enc, stats, zz, kx, ss=1, se=63, al=0):
    """Encode one block's AC band (F.1.4.2 / Figures F.5, F.8): per
    zigzag index k, EOB decision at 3(k-1), zero-run decisions at
    3(k-1)+1, fixed-bin sign, SP/X1 sharing 3(k-1)+2, X2+ categories
    in the 189 (k <= Kx) / 217 section, shared mantissa bin at +14.
    ``ss``/``se`` bound the band (progressive spectral selection) and
    ``al`` is the successive-approximation point transform — AC
    magnitudes shift as magnitudes (sign·(|v| >> Al), F.1.4.4.2)."""
    vis = [0] * (se + 1)
    last = 0
    for k in range(ss, se + 1):
        a = int(zz[k])
        v = abs(a) >> al
        if v:
            vis[k] = -v if a < 0 else v
            last = k
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > last:
            enc.encode(stats, st, 1)  # EOB
            return
        enc.encode(stats, st, 0)
        while vis[k] == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = int(vis[k])
        sign = 1 if v < 0 else 0
        enc.encode_fixed(sign)
        sz = (-v if sign else v) - 1
        st += 2  # SP, shared with X1
        if sz == 0:
            enc.encode(stats, st, 0)
        else:
            enc.encode(stats, st, 1)
            if sz == 1:
                enc.encode(stats, st, 0)
                msb = 1
            else:
                enc.encode(stats, st, 1)
                msb = 1 << (sz.bit_length() - 1)
                m = 2
                st = 189 if k <= kx else 217  # X2 of the lo/hi section
                while m != msb:
                    enc.encode(stats, st, 1)
                    st += 1
                    m <<= 1
                enc.encode(stats, st, 0)
            st += 14
            bit = msb >> 1
            while bit:
                enc.encode(stats, st, 1 if sz & bit else 0)
                bit >>= 1
        k += 1


def _arith_decode_ac(dec, stats, kx, ss=1, se=63, al=0):
    """Decode one block's AC band — mirror of ``_arith_encode_ac``.
    Returns a list of (zigzag index, value), values scaled << ``al``
    (successive-approximation first scans deliver shifted bits)."""
    out = []
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            break  # EOB
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic AC run")
        sign = dec.decode_fixed()
        st += 2
        m = dec.decode(stats, st)
        if m and dec.decode(stats, st):
            m = 2
            st = 189 if k <= kx else 217
            while dec.decode(stats, st):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("corrupt arithmetic AC magnitude")
                st += 1
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(stats, st):
                v |= m
        v += 1
        if al:
            v <<= al
        out.append((k, -v if sign else v))
        k += 1
    return out


def encode_jpeg_arith(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    dc_cond: tuple[int, int] = (0, 1),
    ac_kx: int = 5,
) -> bytes:
    """Arithmetic-coded sequential JPEG encoder (SOF9): the SAME
    pixel -> DCT -> quantize pipeline as ``encode_jpeg`` with the
    entropy layer swapped for the T.81 QM coder, so for any input the
    decoded pixels are BIT-IDENTICAL to decoding the Huffman encoding
    at the same quality/subsample/restart settings (both entropy
    layers are lossless over identical quantized coefficients — the
    roundtrip tests pin exactly that).  ``dc_cond``/``ac_kx`` are the
    DAC conditioning parameters (defaults are the spec defaults);
    non-default values exercise the DAC parse path.  Restart markers
    flush the coder and reset statistics, predictions and contexts."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer length != w*h*c")
    lo, up = dc_cond
    if not (0 <= lo <= up <= 15):
        raise ValueError("dc_cond must satisfy 0 <= L <= U <= 15")
    if not 1 <= ac_kx <= 63:
        raise ValueError("ac_kx must be in 1..63")
    img = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.float64)
    )
    qt_lum = scaled_quant(QUANT_LUM, quality)
    qt_chrom = scaled_quant(QUANT_CHROM, quality)

    if channels == 1:
        planes = [img[..., 0]]
        samp = [(1, 1)]
        qts = [qt_lum]
    else:
        ycc = rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph = height + (height & 1)
            pw = width + (width & 1)
            cbp = np.pad(cb, ((0, ph - height), (0, pw - width)), mode="edge")
            crp = np.pad(cr, ((0, ph - height), (0, pw - width)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_lum, qt_chrom, qt_chrom]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    padded = [
        _pad_to_blocks(p, mcus_y * s[1], mcus_x * s[0])
        for p, s in zip(planes, samp)
    ]

    n_tab = 1 if channels == 1 else 2

    def fresh_stats():
        return (
            [bytearray(64) for _ in range(n_tab)],
            [bytearray(256) for _ in range(n_tab)],
        )

    enc = _QMEncoder()
    dc_stats, ac_stats = fresh_stats()
    dc_pred = [0] * channels
    dc_ctx = [0] * channels
    entropy = bytearray()
    rst_count = 0
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            entropy += enc.finish()
            entropy += bytes([0xFF, 0xD0 + (rst_count & 7)])
            rst_count += 1
            enc = _QMEncoder()
            dc_stats, ac_stats = fresh_stats()
            dc_pred = [0] * channels
            dc_ctx = [0] * channels
        my, mx = divmod(m, mcus_x)
        for ci in range(channels):
            hi, vi = samp[ci]
            qt = qts[ci].reshape(8, 8).astype(np.float64)
            tbl = 0 if (ci == 0 or channels == 1) else 1
            for by in range(vi):
                for bx in range(hi):
                    r0 = (my * vi + by) * 8
                    c0 = (mx * hi + bx) * 8
                    block = padded[ci][r0 : r0 + 8, c0 : c0 + 8] - 128.0
                    qcoef = np.round(fdct2(block) / qt).astype(np.int64)
                    flat = qcoef.reshape(64)
                    zz = [int(flat[z]) for z in ZIGZAG]
                    diff = zz[0] - dc_pred[ci]
                    dc_pred[ci] = zz[0]
                    dc_ctx[ci] = _arith_encode_dc(
                        enc, dc_stats[tbl], diff, dc_ctx[ci], lo, up
                    )
                    _arith_encode_ac(enc, ac_stats[tbl], zz, ac_kx)
    entropy += enc.finish()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qts_emit = [(0, qt_lum)] if channels == 1 else [(0, qt_lum), (1, qt_chrom)]
    for tid, qt in qts_emit:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64)
        out.append(tid)
        out += bytes(int(qt[z]) for z in ZIGZAG)
    # SOF9 — extended sequential, arithmetic coding
    out += b"\xff\xc9" + struct.pack(
        ">HBHHB", 8 + 3 * channels, 8, height, width, channels
    )
    for ci in range(channels):
        hi, vi = samp[ci]
        tq = 0 if (ci == 0 or channels == 1) else 1
        out += bytes([ci + 1, (hi << 4) | vi, tq])
    # DAC — conditioning for every table id the scan references
    dac = bytearray()
    for tb in range(n_tab):
        dac += bytes([0x00 | tb, (up << 4) | lo])
        dac += bytes([0x10 | tb, ac_kx])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
    for ci in range(channels):
        td_ta = 0x00 if (ci == 0 or channels == 1) else 0x11
        out += bytes([ci + 1, td_ta])
    out += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_arith12(
    samples, width: int, height: int, quality: int = 100,
    channels: int = 1, dc_cond: tuple[int, int] = (0, 1), ac_kx: int = 5,
    progressive: bool = False,
) -> bytes:
    """12-bit arithmetic-coded sequential encoder (SOF9 at precision
    12, round 15 — fixture twin of the 12-bit QM decode path): the
    EXACT coefficient pipeline of :func:`encode_jpeg12`'s sequential
    branch (level shift 2048, 16-bit Pq=1 quantization table, 4:4:4
    YCbCr with chroma zero 2048 for color) with the entropy layer
    swapped for the T.81 QM coder — so decoding this stream is
    bit-identical to decoding ``encode_jpeg12`` at the same quality
    (both entropy layers are lossless over identical quantized
    coefficients; the tests pin exactly that)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    lo, up = dc_cond
    if not (0 <= lo <= up <= 15):
        raise ValueError("dc_cond must satisfy 0 <= L <= U <= 15")
    if not 1 <= ac_kx <= 63:
        raise ValueError("ac_kx must be in 1..63")
    a = np.asarray(list(samples), dtype=np.int64).reshape(
        height, width, channels
    )
    if a.min() < 0 or a.max() > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    qt = scaled_quant(QUANT_LUM, quality)
    qtf = qt.reshape(8, 8).astype(np.float64)
    if channels == 1:
        planes = [a[..., 0].astype(np.float64)]
    else:
        ycc = rgb_to_ycbcr(a.astype(np.float64), center=2048.0)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    bx_n = -(-width // 8)
    by_n = -(-height // 8)
    padded = [_pad_to_blocks(pl, by_n, bx_n) for pl in planes]

    def quantize_zz(ci, by, bx):
        block = (
            padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 2048.0
        )
        flat = np.round(fdct2(block) / qtf).astype(np.int64).reshape(64)
        return [int(flat[z]) for z in ZIGZAG]

    scans = []  # (header bytes after SOS length field, entropy bytes)
    if not progressive:
        enc = _QMEncoder()
        dc_stats, ac_stats = bytearray(64), bytearray(256)
        dc_pred = [0] * channels
        dc_ctx = [0] * channels
        for by in range(by_n):
            for bx in range(bx_n):
                for ci in range(channels):
                    zz = quantize_zz(ci, by, bx)
                    diff = zz[0] - dc_pred[ci]
                    dc_pred[ci] = zz[0]
                    dc_ctx[ci] = _arith_encode_dc(
                        enc, dc_stats, diff, dc_ctx[ci], lo, up
                    )
                    _arith_encode_ac(enc, ac_stats, zz, ac_kx)
        hdr = struct.pack(">HB", 6 + 2 * channels, channels)
        hdr += b"".join(bytes([ci + 1, 0x00]) for ci in range(channels))
        hdr += bytes([0, 63, 0])
        scans.append((hdr, enc.finish()))
    else:
        # interleaved DC scan (Ss=Se=0), then one full-band AC scan
        # per component — encode_jpeg12's progressive scan script with
        # the QM models (fresh coder + statistics per scan)
        enc = _QMEncoder()
        dc_stats = bytearray(64)
        dc_pred = [0] * channels
        dc_ctx = [0] * channels
        for by in range(by_n):
            for bx in range(bx_n):
                for ci in range(channels):
                    zz = quantize_zz(ci, by, bx)
                    diff = zz[0] - dc_pred[ci]
                    dc_pred[ci] = zz[0]
                    dc_ctx[ci] = _arith_encode_dc(
                        enc, dc_stats, diff, dc_ctx[ci], lo, up
                    )
        hdr = struct.pack(">HB", 6 + 2 * channels, channels)
        hdr += b"".join(bytes([ci + 1, 0x00]) for ci in range(channels))
        hdr += bytes([0, 0, 0])
        scans.append((hdr, enc.finish()))
        for ci in range(channels):
            enc = _QMEncoder()
            ac_stats = bytearray(256)
            for by in range(by_n):
                for bx in range(bx_n):
                    _arith_encode_ac(
                        enc, ac_stats, quantize_zz(ci, by, bx), ac_kx,
                        ss=1, se=63,
                    )
            hdr = struct.pack(">HB", 8, 1)
            hdr += bytes([ci + 1, 0x00, 1, 63, 0])
            scans.append((hdr, enc.finish()))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128)
    out.append(0x10)  # Pq=1 (16-bit entries), Tq=0
    for z in ZIGZAG:
        out += struct.pack(">H", int(qt[z]))
    sof = 0xCA if progressive else 0xC9
    out += bytes([0xFF, sof]) + struct.pack(
        ">HBHHB", 8 + 3 * channels, 12, height, width, channels
    )
    for ci in range(channels):
        out += bytes([ci + 1, 0x11, 0])
    dac = bytes([0x00, (up << 4) | lo, 0x10, ac_kx])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    for hdr, entropy in scans:
        out += b"\xff\xda" + hdr + entropy
    out += b"\xff\xd9"
    return bytes(out)


def _decode_jpeg_arith(
    b, pos, qtabs, dac_dc, dac_ac, frame, restart_interval, precision
):
    """Sequential arithmetic-coded scan decode (SOF9).  ``pos`` points
    at the 0xFFDA marker; statistics areas are keyed by DAC table id
    (scan components sharing a conditioning table share statistics,
    F.1.4.4), and restart markers reset coder, statistics, predictions
    and conditioning contexts.  Reuses ``_entropy_segments`` (the
    QM coder uses the same 0xFF00 stuffing convention as the Huffman
    stream) and the shared ``_coefs_to_pixels`` PASS 2."""
    if b[pos : pos + 2] != b"\xff\xda":
        raise ValueError("arithmetic scan: expected SOS")
    seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
    seg = b[pos + 4 : pos + 2 + seg_len]
    ns = seg[0]
    scan = []
    for i in range(ns):
        cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
        scan.append((cs, tdta >> 4, tdta & 15))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    if ss != 0 or se != 63:
        raise NotImplementedError(
            "arithmetic JPEG: only full-band sequential scans"
        )
    h, w, comps = frame
    if not 1 <= len(comps) <= 3 or len(scan) != len(comps):
        raise NotImplementedError(
            f"{len(comps)}-component / multi-scan arithmetic JPEG "
            "unsupported"
        )
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise ValueError("scan references missing quant table")
        lo, up = dac_dc.get(td, (0, 1))  # spec defaults (F.1.4.4.1.2)
        kx = dac_ac.get(ta, 5)
        order.append((c, td, ta, lo, up, kx, qt.astype(np.float64)))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    total_mcus = mcus_x * mcus_y

    segs, _ = _entropy_segments(b, pos + 2 + seg_len)
    coefs = [
        np.zeros((total_mcus * c["v"] * c["h"], 64)) for c in comps
    ]
    idx = [0] * len(comps)
    wr = [([], [], []) for _ in comps]  # (block row, zigzag k, value)

    def fresh_stats():
        return (
            {td: bytearray(64) for (_c, td, *_rest) in order},
            {ta: bytearray(256) for (_c, _td, ta, *_rest) in order},
        )

    dec = _QMDecoder(segs[0])
    dc_stats, ac_stats = fresh_stats()
    dc_pred = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    for m in range(total_mcus):
        if restart_interval and m and m % restart_interval == 0:
            si = m // restart_interval
            if si >= len(segs):
                raise ValueError("missing restart marker")
            dec = _QMDecoder(segs[si])
            dc_stats, ac_stats = fresh_stats()
            dc_pred = [0] * len(comps)
            dc_ctx = [0] * len(comps)
        for ci, (c, td, ta, lo, up, kx, _qt) in enumerate(order):
            rows_w, ks_w, vs_w = wr[ci]
            for _ in range(c["v"] * c["h"]):
                row_i = idx[ci]
                idx[ci] += 1
                diff, dc_ctx[ci] = _arith_decode_dc(
                    dec, dc_stats[td], dc_ctx[ci], lo, up
                )
                dc_pred[ci] += diff
                rows_w.append(row_i)
                ks_w.append(0)
                vs_w.append(dc_pred[ci])
                for k, v in _arith_decode_ac(dec, ac_stats[ta], kx):
                    rows_w.append(row_i)
                    ks_w.append(k)
                    vs_w.append(v)
    for ci, (rows_w, ks_w, vs_w) in enumerate(wr):
        if rows_w:
            coefs[ci][np.array(rows_w), np.array(ks_w)] = np.array(vs_w)
    if len(segs) > (
        (total_mcus - 1) // restart_interval + 1 if restart_interval else 1
    ):
        raise ValueError("unexpected restart marker in entropy data")

    return _coefs_to_pixels(
        coefs,
        [qt for (*_head, qt) in order],
        [c for (c, *_rest) in order],
        mcus_x, mcus_y, hmax, vmax, h, w, precision,
    )


# ---------------------------------------------------------------------
# progressive arithmetic (SOF10): the F.1.4.4 models over the
# spectral-selection / successive-approximation scan structure
# ---------------------------------------------------------------------


def _arith_encode_ac_refine(enc, stats, zz, ss, se, ah, al):
    """Encode one block's AC successive-approximation refinement scan
    (G.1.3.3 arithmetic variant): per band index, EOB decisions only
    beyond the PREVIOUS stage's last nonzero (kex); previously-nonzero
    coefficients send one correction bit at bin 3(k-1)+2;
    newly-significant coefficients send a significance 1 at 3(k-1)+1
    plus a fixed-bin sign.  Refinement is one bit (Ah == Al+1), so a
    newly-significant magnitude at this stage is exactly 1."""
    kex = 0
    for k in range(se, 0, -1):
        if abs(int(zz[k])) >> ah:
            kex = k
            break
    ke = 0
    for k in range(se, ss - 1, -1):
        if abs(int(zz[k])) >> al:
            ke = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > ke:
                enc.encode(stats, st, 1)  # EOB — nothing visible remains
                return
            enc.encode(stats, st, 0)
        while True:
            t = int(zz[k])
            a = abs(t)
            if a >> ah:  # previously nonzero: one correction bit
                enc.encode(stats, st + 2, (a >> al) & 1)
                break
            if a >> al:  # newly significant (magnitude exactly 1)
                enc.encode(stats, st + 1, 1)
                enc.encode_fixed(1 if t < 0 else 0)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        k += 1


def _arith_decode_ac_refine(dec, stats, zzrow, ss, se, al):
    """Decode one block's AC refinement scan — mirror of
    ``_arith_encode_ac_refine``; mutates ``zzrow`` in place."""
    p1 = 1 << al
    m1 = -p1
    kex = 0
    for k in range(se, 0, -1):
        if zzrow[k]:
            kex = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(stats, st):
            break  # EOB
        while True:
            v = int(zzrow[k])
            if v:
                if dec.decode(stats, st + 2):
                    zzrow[k] = v + (m1 if v < 0 else p1)
                break
            if dec.decode(stats, st + 1):
                zzrow[k] = m1 if dec.decode_fixed() else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("corrupt arithmetic AC refinement")
        k += 1


def encode_jpeg_arith_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    quality: int = 85,
    successive: bool = False,
    subsample: bool = False,
    restart_interval: int = 0,
    dc_cond: tuple[int, int] = (0, 1),
    ac_kx: int = 5,
) -> bytes:
    """Progressive arithmetic-coded JPEG encoder (SOF10): the
    ``encode_jpeg_progressive`` scan script (interleaved DC scan, one
    full-band AC scan per component; ``successive=True`` sends first
    scans at Al=1 then DC/AC refinement scans) with the QM coder as
    the entropy layer.  The entropy layer is lossless, so the decode
    is bit-identical to the baseline/progressive Huffman decode of the
    same pixels (the differential oracle the tests pin).  Statistics
    reset per scan AND per restart interval; the coder is flushed and
    re-initialized at every restart marker."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer length != w*h*c")
    lo, up = dc_cond
    if not (0 <= lo <= up <= 15):
        raise ValueError("dc_cond must satisfy 0 <= L <= U <= 15")
    if not 1 <= ac_kx <= 63:
        raise ValueError("ac_kx must be in 1..63")
    img = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.float64)
    )
    qt_lum = scaled_quant(QUANT_LUM, quality)
    qt_chrom = scaled_quant(QUANT_CHROM, quality)
    if channels == 1:
        planes = [img[..., 0]]
        samp = [(1, 1)]
        qts = [qt_lum]
    else:
        ycc = rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph = height + (height & 1)
            pw = width + (width & 1)
            cbp = np.pad(cb, ((0, ph - height), (0, pw - width)), mode="edge")
            crp = np.pad(cr, ((0, ph - height), (0, pw - width)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_lum, qt_chrom, qt_chrom]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    padded = [
        _pad_to_blocks(p, mcus_y * s[1], mcus_x * s[0])
        for p, s in zip(planes, samp)
    ]
    pgrid, cgrid = [], []
    for hi, vi in samp:
        pgrid.append((mcus_x * hi, mcus_y * vi))
        cw = -(-(width * hi) // hmax)
        ch2 = -(-(height * vi) // vmax)
        cgrid.append((-(-cw // 8), -(-ch2 // 8)))
    coefs = []
    for ci in range(channels):
        qt = qts[ci].reshape(8, 8).astype(np.float64)
        pbx, pby = pgrid[ci]
        cz = np.zeros((pby, pbx, 64), dtype=np.int64)
        for by in range(pby):
            for bx in range(pbx):
                block = (
                    padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    - 128.0
                )
                cz[by, bx] = (
                    np.round(fdct2(block) / qt).astype(np.int64).ravel()[ZIGZAG]
                )
        coefs.append(cz)

    n_tab = 1 if channels == 1 else 2
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qts_emit = [(0, qt_lum)] if channels == 1 else [(0, qt_lum), (1, qt_chrom)]
    for tid, qt in qts_emit:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64)
        out.append(tid)
        out += bytes(int(qt[z]) for z in ZIGZAG)
    out += b"\xff\xca" + struct.pack(  # SOF10
        ">HBHHB", 8 + 3 * channels, 8, height, width, channels
    )
    for ci in range(channels):
        hi, vi = samp[ci]
        tq = 0 if (ci == 0 or channels == 1) else 1
        out += bytes([ci + 1, (hi << 4) | vi, tq])
    dac = bytearray()
    for tb in range(n_tab):
        dac += bytes([0x00 | tb, (up << 4) | lo])
        dac += bytes([0x10 | tb, ac_kx])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    al0 = 1 if successive else 0
    ri = restart_interval

    def sos(comps_td_ta, ss, se, ah, al):
        seg = bytearray()
        seg += struct.pack(">HB", 6 + 2 * len(comps_td_ta), len(comps_td_ta))
        for cid, td, ta in comps_td_ta:
            seg += bytes([cid, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + seg

    # scan 1 — DC first, interleaved, floor point transform by Al
    out += sos(
        [(ci + 1, 0 if (ci == 0 or channels == 1) else 1, 0)
         for ci in range(channels)],
        0, 0, 0, al0,
    )
    entropy = bytearray()
    enc = _QMEncoder()
    dc_stats = [bytearray(64) for _ in range(n_tab)]
    pred = [0] * channels
    ctx = [0] * channels
    rst_count = 0
    for m in range(n_mcus):
        if ri and m and m % ri == 0:
            entropy += enc.finish()
            entropy += bytes([0xFF, 0xD0 + (rst_count & 7)])
            rst_count += 1
            enc = _QMEncoder()
            dc_stats = [bytearray(64) for _ in range(n_tab)]
            pred = [0] * channels
            ctx = [0] * channels
        my, mx = divmod(m, mcus_x)
        for ci in range(channels):
            hi, vi = samp[ci]
            tbl = 0 if (ci == 0 or channels == 1) else 1
            for by in range(vi):
                for bx in range(hi):
                    dc = int(coefs[ci][my * vi + by, mx * hi + bx, 0]) >> al0
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    ctx[ci] = _arith_encode_dc(
                        enc, dc_stats[tbl], diff, ctx[ci], lo, up
                    )
    entropy += enc.finish()
    out += entropy

    # AC first scan per component, non-interleaved over its own grid
    for ci in range(channels):
        tbl = 0 if (ci == 0 or channels == 1) else 1
        out += sos([(ci + 1, 0, tbl)], 1, 63, 0, al0)
        entropy = bytearray()
        enc = _QMEncoder()
        ac_stats = bytearray(256)
        rst_count = 0
        cbx, cby = cgrid[ci]
        for unit in range(cbx * cby):
            if ri and unit and unit % ri == 0:
                entropy += enc.finish()
                entropy += bytes([0xFF, 0xD0 + (rst_count & 7)])
                rst_count += 1
                enc = _QMEncoder()
                ac_stats = bytearray(256)
            by, bx = divmod(unit, cbx)
            _arith_encode_ac(
                enc, ac_stats, coefs[ci][by, bx], ac_kx, 1, 63, al0
            )
        entropy += enc.finish()
        out += entropy

    if successive:
        # DC refinement — one fixed-bin bit per block, interleaved
        out += sos(
            [(ci + 1, 0 if (ci == 0 or channels == 1) else 1, 0)
             for ci in range(channels)],
            0, 0, 1, 0,
        )
        entropy = bytearray()
        enc = _QMEncoder()
        rst_count = 0
        for m in range(n_mcus):
            if ri and m and m % ri == 0:
                entropy += enc.finish()
                entropy += bytes([0xFF, 0xD0 + (rst_count & 7)])
                rst_count += 1
                enc = _QMEncoder()
            my, mx = divmod(m, mcus_x)
            for ci in range(channels):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(coefs[ci][my * vi + by, mx * hi + bx, 0])
                        enc.encode_fixed(dc & 1)
        entropy += enc.finish()
        out += entropy

        # AC refinement per component
        for ci in range(channels):
            tbl = 0 if (ci == 0 or channels == 1) else 1
            out += sos([(ci + 1, 0, tbl)], 1, 63, 1, 0)
            entropy = bytearray()
            enc = _QMEncoder()
            ac_stats = bytearray(256)
            rst_count = 0
            cbx, cby = cgrid[ci]
            for unit in range(cbx * cby):
                if ri and unit and unit % ri == 0:
                    entropy += enc.finish()
                    entropy += bytes([0xFF, 0xD0 + (rst_count & 7)])
                    rst_count += 1
                    enc = _QMEncoder()
                    ac_stats = bytearray(256)
                by, bx = divmod(unit, cbx)
                _arith_encode_ac_refine(
                    enc, ac_stats, coefs[ci][by, bx], 1, 63, 1, 0
                )
            entropy += enc.finish()
            out += entropy

    out += b"\xff\xd9"
    return bytes(out)


def _decode_jpeg_arith_progressive(
    b, pos, qtabs, dac_dc, dac_ac, frame, restart_interval, precision=8,
    differential=False, frame_scoped=False,
):
    """Multi-scan decode loop for SOF10 (progressive arithmetic):
    the SOF2 walker's grid/scan conventions (interleaved scans walk
    the MCU-padded grid, non-interleaved scans the component's own
    block grid) with the QM coder and F.1.4.4 models per scan —
    DC first/refine (refine = one fixed-bin bit per block), AC
    first (band + point transform) and AC refine (kex-gated EOB
    decisions, correction bits, fixed-bin signs).  Statistics reset
    per scan and per restart interval; DAC/DRI may be redefined
    between scans.  ``pos`` points at the first SOS marker.

    ``frame_scoped``/``differential`` are the hierarchical-frame mode
    (SOF10 base / SOF14 differential inside a DHP stream) — same
    contract as :func:`_decode_jpeg_progressive`: stop at the first
    marker that is not DAC/DRI/SOS, return ``(planes, stop_pos)``
    through :func:`_dct_rows_to_plane`, DC coded with PRED = 0 when
    differential (J.1.1.5)."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    grids = {}
    for c in comps:
        cw = -(-(w * c["h"]) // hmax)
        ch2 = -(-(h * c["v"]) // vmax)
        grids[c["id"]] = (
            mcus_x * c["h"],
            mcus_y * c["v"],
            -(-cw // 8),
            -(-ch2 // 8),
        )
    coefs = {
        cid: np.zeros((pby, pbx, 64), dtype=np.int64)
        for cid, (pbx, pby, _, _) in grids.items()
    }
    seen_dc = set()
    by_id = {c["id"]: c for c in comps}

    def scan_blocks(scan):
        if len(scan) > 1:
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for cs, _td, _ta in scan:
                    c = by_id[cs]
                    for byy in range(c["v"]):
                        for bxx in range(c["h"]):
                            yield m, cs, my * c["v"] + byy, mx * c["h"] + bxx
        else:
            cs = scan[0][0]
            _, _, cbx, cby = grids[cs]
            for by in range(cby):
                for bx in range(cbx):
                    yield by * cbx + bx, cs, by, bx

    def run_scan(scan, ss, se, ah, al, pos):
        segs, end = _entropy_segments(b, pos)
        ri = restart_interval
        cond = {}
        for cs, td, ta in scan:
            cond[cs] = (*dac_dc.get(td, (0, 1)), dac_ac.get(ta, 5), td, ta)

        state = {}

        def fresh(si):
            state["dec"] = _QMDecoder(segs[si])
            state["dc"] = {td: bytearray(64) for (_cs, td, _ta) in scan}
            state["ac"] = {ta: bytearray(256) for (_cs, _td, ta) in scan}
            state["pred"] = {cs: 0 for (cs, _td, _ta) in scan}
            state["ctx"] = {cs: 0 for (cs, _td, _ta) in scan}

        fresh(0)
        n_units = 0
        prev_unit = -1
        for unit, cs, by, bx in scan_blocks(scan):
            if unit != prev_unit:
                prev_unit = unit
                n_units = unit + 1
                if ri and unit and unit % ri == 0:
                    si = unit // ri
                    if si >= len(segs):
                        raise ValueError("missing restart marker")
                    fresh(si)
            dec = state["dec"]
            lo, up, kx, td, ta = cond[cs]
            zz = coefs[cs][by, bx]
            if ss == 0 and ah == 0:  # DC first
                if se != 0:
                    raise ValueError("DC scan must have Se=0")
                diff, state["ctx"][cs] = _arith_decode_dc(
                    dec, state["dc"][td], state["ctx"][cs], lo, up
                )
                if differential:
                    zz[0] = diff << al  # PRED = 0
                else:
                    state["pred"][cs] += diff
                    zz[0] = state["pred"][cs] << al
                seen_dc.add(cs)
            elif ss == 0:  # DC refinement: one fixed-bin bit
                if dec.decode_fixed():
                    zz[0] |= 1 << al
            elif ah == 0:  # AC first (band, point transform)
                if len(scan) > 1:
                    raise ValueError("AC scans must be single-component")
                for k, v in _arith_decode_ac(
                    dec, state["ac"][ta], kx, ss, se, al
                ):
                    zz[k] = v
            else:  # AC refinement
                if len(scan) > 1:
                    raise ValueError("AC scans must be single-component")
                _arith_decode_ac_refine(
                    dec, state["ac"][ta], zz, ss, se, al
                )
        if len(segs) > ((n_units - 1) // ri + 1 if ri else 1):
            raise ValueError("unexpected restart marker in entropy data")
        return end

    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        pos += 2
        if frame_scoped and marker not in (0xCC, 0xDA, 0xDD):
            # end of this frame's scans — hand back to the DHP walk
            pos -= 2
            break
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack(">H", b[pos : pos + 2])[0]
        seg = b[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("JPEG segment truncated")
        nxt = pos + seg_len
        if marker == 0xDA:
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                if cs not in by_id:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append((cs, tdta >> 4, tdta & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = run_scan(scan, ss, se, ahal >> 4, ahal & 15, nxt)
            continue
        if marker == 0xCC:  # DAC between scans
            sp = 0
            while sp + 1 < len(seg):
                tc, tb = seg[sp] >> 4, seg[sp] & 15
                cs_v = seg[sp + 1]
                if tc == 0:
                    lo, up = cs_v & 15, cs_v >> 4
                    if lo > up:
                        raise ValueError("DAC DC conditioning L > U")
                    dac_dc[tb] = (lo, up)
                elif tc == 1:
                    if not 1 <= cs_v <= 63:
                        raise ValueError(f"DAC AC Kx {cs_v} out of range")
                    dac_ac[tb] = cs_v
                else:
                    raise ValueError(f"invalid DAC table class {tc}")
                sp += 2
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        pos = nxt

    if any(c["id"] not in seen_dc for c in comps):
        raise ValueError("progressive JPEG missing a DC scan")
    if frame_scoped:
        if any(c["h"] != 1 or c["v"] != 1 for c in comps):
            raise NotImplementedError(
                "hierarchical DCT frame with subsampling"
            )
        planes = []
        for c in comps:
            qt = qtabs.get(c["tq"])
            if qt is None:
                raise ValueError("missing quant table")
            planes.append(_dct_rows_to_plane(
                coefs[c["id"]].reshape(-1, 64).astype(np.float64),
                qt.astype(np.float64), mcus_x, mcus_y, h, w,
                differential,
            ))
        return planes, pos
    # reconstruct — same batched pass as the SOF2 walker
    planes = []
    for c in comps:
        qt = qtabs.get(c["tq"])
        if qt is None:
            raise ValueError("missing quant table")
        qtf = qt.astype(np.float64).ravel()
        cz = coefs[c["id"]]
        pbx, pby, _, _ = grids[c["id"]]
        cw = -(-(w * c["h"]) // hmax)
        ch2 = -(-(h * c["v"]) // vmax)
        zz = cz.reshape(pby * pbx, 64).astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, np.asarray(ZIGZAG)] = zz
        blocks = idct2((nat * qtf).reshape(-1, 8, 8)) + float(
            1 << (precision - 1)
        )
        plane = (
            blocks.reshape(pby, pbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(pby * 8, pbx * 8)
        )
        plane = plane[:ch2, :cw]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    maxv = (1 << precision) - 1
    if len(comps) == 1:
        samp = np.clip(np.round(planes[0]), 0, maxv).astype(np.int64)
        out = (samp >> (precision - 8)).astype(np.uint8)
        return (w, h, 1, out.tobytes())
    rgb = _maybe_ycbcr_to_rgb(
        np.stack(planes, axis=-1), comps, center=float(1 << (precision - 1))
    )
    samp = np.clip(np.round(rgb), 0, maxv).astype(np.int64)
    out = (samp >> (precision - 8)).astype(np.uint8)
    return (w, h, 3, out.tobytes())
