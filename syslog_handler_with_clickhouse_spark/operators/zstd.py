"""Zstandard decoder (RFC 8878): pure-Python core (round 16)
+ ctypes libzstd fast path (round 17).

The reference (lib/cacheManage.go) stores payloads opaquely; this tier
exists for the LLM-pipeline compressed-corpus ingestion path
(`multimodal.decompress_assets`), where `.zst` is the long-tail codec
every modern corpus crawl ships (Common Crawl moved its WET/WARC
archives to zstd) and this container carries NO zstd library in
Python.  The JVM side does carry one — Spark bundles zstd-jni for
Parquet/ORC — which is exactly what makes a from-scratch decoder
verifiable here: tests/test_zstd.py compresses structured + random
corpora through zstd-jni at multiple levels and pins this decoder
byte-exact on every stream (the cross-implementation posture of the
JPEG/TIFF codecs).

Scope — the full single-pass frame format:

- frame header: magic 0xFD2FB528, Single_Segment handling, window
  descriptor, all four Frame_Content_Size widths, content checksum
  (XXH64 low-32, verified when present), skippable frames,
  multi-frame concatenation;
- blocks: Raw, RLE, Compressed;
- literals: Raw, RLE, Compressed (1- and 4-stream) and Treeless
  (repeat table), Huffman weights both direct (4-bit nibbles) and
  FSE-compressed (two interleaved states on a backward bitstream);
- sequences: Predefined / RLE / FSE_Compressed / Repeat modes for all
  three categories, the RFC's normalized-count reader (variable-bit,
  zero-repeat flags), the (size>>1)+(size>>3)+3 spread, baseline/bits
  state machine, the three repeat offsets with the literals_length==0
  index shift and the repeat1-1 special case.

Dictionaries (§5) are supported too: structured dictionaries (magic
EC30A437 — pre-built Huffman/FSE entropy tables, starting repeat
offsets, content history) and raw-content dictionaries, applied per
frame exactly as ``ZSTD_decompress_usingDict`` does; the differential
suite trains real dictionaries through zstd-jni's ZstdDictTrainer.  A
frame referencing a dictionary that was not supplied is refused
loudly (``decompress_assets`` surfaces it as a codec='error' row —
the seam has no dictionary side-channel).

Design note for the 100 TB path: decompression runs executor-side
inside the Arrow-batched ``decompress_assets`` seam — this module is
plain bytes→bytes with no Spark dependency, so the driver never sees
a payload.  Round 17 added a ctypes fast path: when ``libzstd.so.1``
loads (it ships in this container), ``zstd_decompress`` routes
through ``ZSTD_decompressStream`` at ~200 MB/s per thread — ~85× the
interpreter tier — with the pure-Python decoder kept as the
no-library fallback and the differential oracle (``force_pure=True``;
tests pin pure == ctypes == zstd-jni).  The pure decoder itself is
one-pass with O(window) state; the backward bitstream reads 1-9 byte
slices (O(1) per symbol — a whole-stream big-int shift would be
quadratic) and the Huffman table is one flat packed-int list
(~2.4-3.6 MB/s per core depending on ratio).  At cluster scale the
codec parallelizes per payload like every other mapInPandas stage;
where a JVM-side path exists (Parquet/ORC zstd), Spark's own zstd-jni
handles it — this module serves the raw `.zst` payload tier only.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

__all__ = ["zstd_decompress", "zstd_compress_store", "zstd_frame_stats",
           "xxh64"]

_MAGIC = 0xFD2FB528
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F

# --- RFC 8878 §3.1.1.3.2.1.1: sequence code tables ------------------
# literals-length codes 0-35: (baseline, extra bits)
_LL_BASE = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
# match-length codes 0-52: (baseline, extra bits)
_ML_BASE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37,
    39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1,
    1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]

# §3.1.1.3.2.2: predefined FSE distributions
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
     2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
     -1, -1, -1, -1], 6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     -1, -1, -1, -1, -1, -1, -1], 6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1], 5,
)
_MAX_ACC = {"ll": 9, "of": 8, "ml": 9, "huf": 6}


class ZstdError(ValueError):
    """Corrupt or non-conforming Zstandard data."""


# --- bitstreams ------------------------------------------------------


class _BackBits:
    """RFC 8878 backward bitstream: the last byte carries a 1-bit
    sentinel above the data; reading proceeds from just below it
    toward bit 0 of the first byte.  Reads below position 0 return
    zero bits (legal only for the final Huffman peek).

    Reads slice only the 1-9 bytes that cover the requested bits —
    O(1) per read regardless of stream length (a whole-stream big-int
    shift would make long literal streams quadratic)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ZstdError("backward bitstream missing sentinel")
        self.data = data
        # bits below the sentinel
        self.pos = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        hi = self.pos
        p = hi - n
        if p < 0:
            raise ZstdError("backward bitstream exhausted")
        self.pos = p
        chunk = int.from_bytes(
            self.data[p >> 3 : (hi + 7) >> 3], "little"
        )
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def peek_pad(self, n: int) -> int:
        """Peek n bits, zero-padded below position 0 (Huffman tail)."""
        hi = self.pos
        p = hi - n
        if p >= 0:
            chunk = int.from_bytes(
                self.data[p >> 3 : (hi + 7) >> 3], "little"
            )
            return (chunk >> (p & 7)) & ((1 << n) - 1)
        if hi <= 0:
            return 0
        chunk = int.from_bytes(self.data[: (hi + 7) >> 3], "little")
        return (chunk << -p) & ((1 << n) - 1)

    def skip_pad(self, n: int) -> None:
        self.pos -= n  # may go negative at the Huffman tail


class _FwdBits:
    """Forward bitstream, LSB-first within bytes (the FSE
    normalized-count header)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            bp = self.bitpos + i
            byte = bp >> 3
            if byte >= len(self.data):
                raise ZstdError("count bitstream exhausted")
            out |= ((self.data[byte] >> (bp & 7)) & 1) << i
        self.bitpos += n
        return out

    def peek(self, n: int) -> int:
        save = self.bitpos
        try:
            v = self.read(n)
        finally:
            self.bitpos = save
        return v

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) >> 3


# --- FSE -------------------------------------------------------------


def _fse_read_ncount(fb: _FwdBits, max_acc: int, max_symbol: int):
    """RFC 8878 §4.1.1 normalized-count reader → (probs, accuracy)."""
    acc = fb.read(4) + 5
    if acc > max_acc:
        raise ZstdError(f"FSE accuracy {acc} > {max_acc}")
    remaining = (1 << acc) + 1
    threshold = 1 << acc
    nbits = acc + 1
    probs: list[int] = []
    prev_zero = False
    while remaining > 1 and len(probs) <= max_symbol:
        if prev_zero:
            while True:
                rep = fb.read(2)
                probs.extend([0] * rep)
                if rep != 3:
                    break
            prev_zero = False
            if len(probs) > max_symbol:
                break
            continue
        vmax = 2 * threshold - 1 - remaining
        count = fb.peek(nbits)
        if (count & (threshold - 1)) < vmax:
            count &= threshold - 1
            fb.read(nbits - 1)
        else:
            count = fb.read(nbits)
            if count >= threshold:
                count -= vmax
        count -= 1  # -1 encodes "less than 1"
        remaining -= -count if count < 0 else count
        probs.append(count)
        prev_zero = count == 0
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ZstdError("FSE counts do not sum to table size")
    return probs, acc


def _fse_build_dtable(probs: list[int], acc: int):
    """§4.1.1.2 spread + state machine → list of (symbol, nbits,
    new_state_base) indexed by state."""
    size = 1 << acc
    table_sym = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            table_sym[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            table_sym[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("FSE table spread did not close")
    nxt = [1 if p == -1 else p for p in probs]
    table = [None] * size
    for state in range(size):
        s = table_sym[state]
        ns = nxt[s]
        nxt[s] += 1
        nbits = acc - (ns.bit_length() - 1)
        table[state] = (s, nbits, (ns << nbits) - size)
    return table


class _FseState:
    __slots__ = ("table", "state")

    def __init__(self, table, bb: _BackBits, acc: int):
        self.table = table
        self.state = bb.read(acc)

    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, bb: _BackBits) -> None:
        _s, nbits, base = self.table[self.state]
        self.state = base + bb.read(nbits)


def _rle_table(symbol: int):
    return [(symbol, 0, 0)]


# --- Huffman ---------------------------------------------------------


def _huf_read_weights(src: bytes):
    """§4.2.1 Huffman tree description → (weights list, bytes used)."""
    if not src:
        raise ZstdError("empty Huffman description")
    hdr = src[0]
    if hdr < 128:
        comp = src[1 : 1 + hdr]
        if len(comp) != hdr:
            raise ZstdError("Huffman FSE weights truncated")
        fb = _FwdBits(comp)
        probs, acc = _fse_read_ncount(fb, _MAX_ACC["huf"], 255)
        table = _fse_build_dtable(probs, acc)
        bb = _BackBits(comp[fb.bytes_consumed():])
        s1 = _FseState(table, bb, acc)
        s2 = _FseState(table, bb, acc)
        weights: list[int] = []
        while True:
            # bound INSIDE the loop: a crafted single-symbol ncount
            # yields an FSE table whose every state is a 0-bit
            # self-loop, so without this the loop never terminates
            # (bb.pos never decreases on 0-bit reads)
            if len(weights) > 255:
                raise ZstdError("more than 255 Huffman weights")
            weights.append(s1.symbol())
            if bb.pos < 0:
                break
            try:
                s1.update(bb)
            except ZstdError:
                weights.append(s2.symbol())
                break
            weights.append(s2.symbol())
            if bb.pos < 0:
                break
            try:
                s2.update(bb)
            except ZstdError:
                weights.append(s1.symbol())
                break
        if len(weights) > 255:
            raise ZstdError("more than 255 Huffman weights")
        return weights, 1 + hdr
    n = hdr - 127
    nbytes = (n + 1) // 2
    raw = src[1 : 1 + nbytes]
    if len(raw) != nbytes:
        raise ZstdError("Huffman weights truncated")
    weights = []
    for i in range(n):
        b = raw[i >> 1]
        weights.append((b >> 4) if i % 2 == 0 else (b & 15))
    return weights, 1 + nbytes


def _huf_build(weights: list[int]):
    """Canonical table from explicit weights + the implied last one →
    (decode list of (symbol, nbits) sized 2^table_log, table_log)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("Huffman tree has no symbols")
    table_log = total.bit_length()  # smallest log with 2^log > total
    if table_log > 11:
        raise ZstdError(f"Huffman table log {table_log} > 11")
    rest = (1 << table_log) - total
    if rest & (rest - 1):
        raise ZstdError("invalid implied last Huffman weight")
    weights = weights + [rest.bit_length()]
    # packed entries (symbol << 4) | nbits — nbits <= table_log+1-1
    # <= 11 fits the nibble; one flat list lookup in the hot loop
    dec = [0] * (1 << table_log)
    pos = 0
    for w in range(1, table_log + 1):
        span = 1 << (w - 1)
        nbits = table_log + 1 - w
        for sym, sw in enumerate(weights):
            if sw == w:
                dec[pos : pos + span] = [(sym << 4) | nbits] * span
                pos += span
    if pos != len(dec):
        raise ZstdError("Huffman table not fully populated")
    return dec, table_log


def _huf_decode_stream(data: bytes, dec, table_log: int, n_out: int):
    """Backward-bitstream Huffman decode, loop-local bit reader: each
    symbol peeks table_log bits via a 1-3-byte slice (O(1) — no
    whole-stream integer)."""
    if not data or data[-1] == 0:
        raise ZstdError("backward bitstream missing sentinel")
    pos = (len(data) - 1) * 8 + data[-1].bit_length() - 1
    out = bytearray(n_out)
    mask = (1 << table_log) - 1
    fb = int.from_bytes
    for i in range(n_out):
        p = pos - table_log
        if p >= 0:
            idx = (
                fb(data[p >> 3 : (pos + 7) >> 3], "little") >> (p & 7)
            ) & mask
        elif pos > 0:
            idx = (fb(data[: (pos + 7) >> 3], "little") << -p) & mask
        else:
            idx = 0
        e = dec[idx]
        pos -= e & 15
        out[i] = e >> 4
    if pos > 0:
        raise ZstdError("Huffman stream has trailing bits")
    return bytes(out)


# --- literals section ------------------------------------------------


def _decode_literals(block: bytes, huf_prev):
    """→ (literals bytes, bytes consumed, huffman table for reuse)."""
    if not block:
        raise ZstdError("empty literals section")
    b0 = block[0]
    ltype = b0 & 3
    sfmt = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sfmt in (0, 2):
            rsize = b0 >> 3
            hlen = 1
        elif sfmt == 1:
            rsize = (b0 >> 4) | (block[1] << 4)
            hlen = 2
        else:
            rsize = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hlen = 3
        if ltype == 0:
            lit = block[hlen : hlen + rsize]
            if len(lit) != rsize:
                raise ZstdError("raw literals truncated")
            return bytes(lit), hlen + rsize, huf_prev
        return bytes([block[hlen]]) * rsize, hlen + 1, huf_prev
    # Compressed (2) / Treeless (3)
    if sfmt == 0:
        streams, hlen, bits = 1, 3, 10
    elif sfmt == 1:
        streams, hlen, bits = 4, 3, 10
    elif sfmt == 2:
        streams, hlen, bits = 4, 4, 14
    else:
        streams, hlen, bits = 4, 5, 18
    v = int.from_bytes(block[:hlen], "little") >> 4
    mask = (1 << bits) - 1
    rsize = v & mask
    csize = (v >> bits) & mask
    payload = block[hlen : hlen + csize]
    if len(payload) != csize:
        raise ZstdError("compressed literals truncated")
    if ltype == 2:
        weights, used = _huf_read_weights(payload)
        dec, tlog = _huf_build(weights)
        payload = payload[used:]
    else:
        if huf_prev is None:
            raise ZstdError("treeless literals with no previous tree")
        dec, tlog = huf_prev
    if streams == 1:
        lit = _huf_decode_stream(payload, dec, tlog, rsize)
    else:
        if len(payload) < 6:
            raise ZstdError("4-stream jump table truncated")
        s1, s2, s3 = struct.unpack_from("<HHH", payload)
        cuts = [6, 6 + s1, 6 + s1 + s2, 6 + s1 + s2 + s3, len(payload)]
        if cuts[3] > len(payload):
            raise ZstdError("4-stream sizes exceed payload")
        r13 = (rsize + 3) >> 2
        r4 = rsize - 3 * r13
        if r4 < 0:
            raise ZstdError("regenerated size too small for 4 streams")
        parts = []
        for i, rs in enumerate((r13, r13, r13, r4)):
            parts.append(_huf_decode_stream(
                payload[cuts[i] : cuts[i + 1]], dec, tlog, rs
            ))
        lit = b"".join(parts)
    return lit, hlen + csize, (dec, tlog)


# --- sequences section ----------------------------------------------


def _seq_table(mode: int, fb_data: bytes, off: int, kind: str, prev,
               max_symbol: int, default):
    """One category's table by compression mode → (table, acc,
    new offset, table-for-repeat)."""
    if mode == 0:  # Predefined
        probs, acc = default
        return _fse_build_dtable(probs, acc), acc, off, None
    if mode == 1:  # RLE
        sym = fb_data[off]
        if sym > max_symbol:
            raise ZstdError(f"RLE {kind} symbol {sym} out of range")
        return _rle_table(sym), 0, off + 1, None
    if mode == 2:  # FSE_Compressed
        fb = _FwdBits(fb_data[off:])
        probs, acc = _fse_read_ncount(fb, _MAX_ACC[kind], max_symbol)
        table = _fse_build_dtable(probs, acc)
        return table, acc, off + fb.bytes_consumed(), None
    if prev is None:
        raise ZstdError(f"repeat {kind} table with no previous")
    return prev[0], prev[1], off, None


_BLOCK_MAX = 1 << 17  # §3.1.1.2.3/4 Block_Maximum_Size (128 KB)


def _decode_block(block: bytes, out: bytearray, ctx: dict) -> None:
    """One Compressed block: literals + sequences appended to ``out``
    (which already holds the frame's history for match copies).

    The regenerated size is capped at ``_BLOCK_MAX`` INSIDE the
    sequence loop — a single block's sequences could otherwise emit
    gigabytes (tens of thousands of matches × ~128 KB each) before any
    between-block ``max_output`` check runs; the spec caps a block's
    decompressed size at min(Window_Size, 128 KB), so enforcing 128 KB
    both bounds adversarial input and rejects nothing conformant."""
    base = len(out)
    lit, used, huf = _decode_literals(block, ctx.get("huf"))
    if len(lit) > _BLOCK_MAX:
        raise ZstdError("literals exceed 128 KB block maximum")
    ctx["huf"] = huf
    body = block[used:]
    if not body:
        raise ZstdError("missing sequences section")
    b0 = body[0]
    if b0 == 0:
        nseq, off = 0, 1
    elif b0 < 128:
        nseq, off = b0, 1
    elif b0 < 255:
        nseq, off = ((b0 - 128) << 8) | body[1], 2
    else:
        # RFC 8878 §3.1.1.3.2.1: byte0==0xFF means byte1 + (byte2<<8)
        # PLUS 0x7F00 (addition, not OR — counts >= 0x8000 need the
        # carry; an OR silently truncates them and desyncs the stream)
        nseq, off = (body[1] | (body[2] << 8)) + 0x7F00, 3
    if nseq == 0:
        out += lit
        return
    modes = body[off]
    off += 1
    if modes & 3:
        raise ZstdError("reserved sequence mode bits set")
    ll_mode, of_mode, ml_mode = (modes >> 6) & 3, (modes >> 4) & 3, \
        (modes >> 2) & 3
    ll_t, ll_acc, off, _ = _seq_table(
        ll_mode, body, off, "ll", ctx.get("ll"), 35, _LL_DEFAULT)
    of_t, of_acc, off, _ = _seq_table(
        of_mode, body, off, "of", ctx.get("of"), 31, _OF_DEFAULT)
    ml_t, ml_acc, off, _ = _seq_table(
        ml_mode, body, off, "ml", ctx.get("ml"), 52, _ML_DEFAULT)
    ctx["ll"], ctx["of"], ctx["ml"] = (ll_t, ll_acc), (of_t, of_acc), \
        (ml_t, ml_acc)
    bb = _BackBits(body[off:])
    ll_s = _FseState(ll_t, bb, ll_acc)
    of_s = _FseState(of_t, bb, of_acc)
    ml_s = _FseState(ml_t, bb, ml_acc)
    reps = ctx["reps"]
    lit_pos = 0
    for i in range(nseq):
        of_code = of_s.symbol()
        if of_code > 31:
            raise ZstdError("offset code out of range")
        of_val = (1 << of_code) + bb.read(of_code)
        ml_code = ml_s.symbol()
        ml = _ML_BASE[ml_code] + bb.read(_ML_BITS[ml_code])
        ll_code = ll_s.symbol()
        ll = _LL_BASE[ll_code] + bb.read(_LL_BITS[ll_code])
        # repeat-offset resolution (§3.1.1.3.2.1.1)
        if of_val > 3:
            offset = of_val - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = of_val - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 2:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # ll == 0 and of_val == 3
                offset = reps[0] - 1
                if offset == 0:
                    raise ZstdError("repeat offset underflow")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_pos + ll > len(lit):
            raise ZstdError("literals exhausted mid-sequence")
        out += lit[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ZstdError("match offset beyond window start")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:
            # overlapping copy: byte-serial semantics == repeating the
            # trailing `offset`-byte pattern
            pattern = bytes(out[len(out) - offset :])
            out += (pattern * (ml // offset + 1))[:ml]
        if len(out) - base > _BLOCK_MAX:
            raise ZstdError("block output exceeds 128 KB maximum")
        if i + 1 < nseq:
            ll_s.update(bb)
            ml_s.update(bb)
            of_s.update(bb)
    if bb.pos != 0:
        raise ZstdError("sequence bitstream not fully consumed")
    out += lit[lit_pos:]
    if len(out) - base > _BLOCK_MAX:
        raise ZstdError("block output exceeds 128 KB maximum")


# --- dictionaries ----------------------------------------------------

_DICT_MAGIC = 0xEC30A437


def _parse_dict(d: bytes) -> dict:
    """§5: a structured dictionary (magic EC30A437) carries an ID,
    pre-built entropy tables (Huffman literals, then OF/ML/LL FSE, in
    that order, each byte-aligned), three starting repeat offsets, and
    content (the history prefix).  Anything without the magic is a
    raw-content dictionary: pure history, no ID, no tables."""
    if len(d) < 8 or struct.unpack_from("<I", d)[0] != _DICT_MAGIC:
        return {"id": None, "huf": None, "ll": None, "of": None,
                "ml": None, "reps": [1, 4, 8], "content": bytes(d)}
    did = struct.unpack_from("<I", d, 4)[0]
    pos = 8
    weights, used = _huf_read_weights(d[pos:])
    dec, tlog = _huf_build(weights)
    pos += used
    tables = {}
    for kind in ("of", "ml", "ll"):
        fb = _FwdBits(d[pos:])
        probs, acc = _fse_read_ncount(
            fb, _MAX_ACC[kind],
            {"ll": 35, "of": 31, "ml": 52}[kind],
        )
        tables[kind] = (_fse_build_dtable(probs, acc), acc)
        pos += fb.bytes_consumed()
    reps = list(struct.unpack_from("<III", d, pos))
    pos += 12
    if any(r == 0 for r in reps):
        raise ZstdError("dictionary repeat offset of zero")
    return {"id": did, "huf": (dec, tlog), "ll": tables["ll"],
            "of": tables["of"], "ml": tables["ml"], "reps": reps,
            "content": bytes(d[pos:])}


# --- frames ----------------------------------------------------------


def zstd_decompress(data: bytes, max_output: int | None = None,
                    dictionary: bytes | None = None, *,
                    force_pure: bool = False) -> bytes:
    """Decode a complete Zstandard payload (one or more frames,
    skippable frames passed over).  ``max_output`` bounds the total
    decompressed size (decompression-bomb guard for the ingestion
    seam).  ``dictionary`` supplies the §5 dictionary a frame's
    Dictionary_ID references — structured (entropy tables + repeat
    offsets + content history) or raw content; each frame decodes
    against its own history window seeded with the dictionary
    content, never against previous frames.

    Routing (round 17): when ``libzstd`` is loadable the bulk decode
    runs through ``ZSTD_decompressStream`` via ctypes — ~2 orders of
    magnitude faster than the interpreter, which matters in the
    compressed-corpus ingestion seam (Common Crawl-scale `.zst`).
    The pure-Python decoder remains the no-library fallback and the
    differential oracle (``force_pure=True``); both paths share the
    loud frame-grammar / dictionary-contract errors because the
    native route pre-scans with :func:`zstd_frame_stats` first
    (libzstd's own Dictionary_ID check is advisory, and its error
    strings differ)."""
    if force_pure or _LIB is None:
        return _decompress_pure(data, max_output, dictionary)
    return _native_decompress(data, max_output, dictionary)


def _decompress_pure(data: bytes, max_output: int | None = None,
                     dictionary: bytes | None = None) -> bytes:
    """The from-scratch RFC 8878 decoder (see module docstring)."""
    zdict = _parse_dict(dictionary) if dictionary is not None else None
    total = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ZstdError("truncated frame magic")
        magic = struct.unpack_from("<I", data, pos)[0]
        if _SKIP_LO <= magic <= _SKIP_HI:
            if n - pos < 8:
                raise ZstdError("truncated skippable frame")
            size = struct.unpack_from("<I", data, pos + 4)[0]
            pos += 8 + size
            if pos > n:
                raise ZstdError("skippable frame overruns input")
            continue
        if magic != _MAGIC:
            raise ZstdError(f"bad frame magic {magic:#x}")
        pos += 4
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        did_flag = fhd & 3
        if fhd & 0x18:
            raise ZstdError("reserved frame header bits set")
        if not single:
            pos += 1  # window descriptor (whole frames in memory)
        did_len = (0, 1, 2, 4)[did_flag]
        # a supplied dictionary applies to every frame (the reference
        # ZSTD_decompress_usingDict posture — raw-content dicts leave
        # the frame's Dictionary_ID unset); a declared ID must match a
        # structured dictionary's, and requires one to be supplied
        use_dict = zdict is not None
        if did_len:
            did = int.from_bytes(data[pos : pos + did_len], "little")
            if did:
                if zdict is None:
                    raise ZstdError(
                        f"frame references dictionary {did} but none "
                        "was supplied"
                    )
                if zdict["id"] is not None and zdict["id"] != did:
                    raise ZstdError(
                        f"frame wants dictionary {did}, supplied "
                        f"{zdict['id']}"
                    )
            pos += did_len
        fcs_len = (1 if single else 0, 2, 4, 8)[fcs_flag]
        fcs = None
        if fcs_len:
            fcs = int.from_bytes(data[pos : pos + fcs_len], "little")
            if fcs_len == 2:
                fcs += 256
            pos += fcs_len
        # per-frame output seeded with the dictionary history — frames
        # are independent (matches may reach the dict, never a
        # previous frame)
        if use_dict:
            hist = len(zdict["content"])
            out = bytearray(zdict["content"])
            ctx = {"reps": list(zdict["reps"]), "huf": zdict["huf"],
                   "ll": zdict["ll"], "of": zdict["of"],
                   "ml": zdict["ml"]}
        else:
            hist = 0
            out = bytearray()
            ctx = {"reps": [1, 4, 8], "huf": None}
        while True:
            if n - pos < 3:
                raise ZstdError("truncated block header")
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # Raw
                if bsize > _BLOCK_MAX:
                    raise ZstdError("raw block exceeds 128 KB maximum")
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                # bsize here is the REGENERATED size from a 21-bit
                # field — without the cap a 4-byte block emits 2 MB,
                # and the spec caps regenerated size at 128 KB anyway
                if bsize > _BLOCK_MAX:
                    raise ZstdError("RLE block exceeds 128 KB maximum")
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                _decode_block(data[pos : pos + bsize], out, ctx)
                pos += bsize
            else:
                raise ZstdError("reserved block type")
            if pos > n:
                raise ZstdError("block overruns input")
            if max_output is not None and \
                    len(total) + len(out) - hist > max_output:
                raise ZstdError("output exceeds max_output")
            if last:
                break
        if fcs is not None and len(out) - hist != fcs:
            raise ZstdError(
                f"frame content size {len(out) - hist} != "
                f"declared {fcs}"
            )
        if checksum:
            want = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            got = xxh64(bytes(out[hist:])) & 0xFFFFFFFF
            if got != want:
                raise ZstdError("content checksum mismatch")
        total += out[hist:]
    return bytes(total)


def zstd_frame_stats(data: bytes) -> list[dict]:
    """Structural walk WITHOUT decoding entropy payloads — one dict
    per frame: block-type counts, literals-section kinds (raw / rle /
    compressed / treeless), stream counts, sequence-section presence,
    checksum flag, dictionary id, declared content size.  Serves
    three masters: ingestion diagnostics (what does this corpus
    actually contain?), the differential tests' no-silent-caps
    assertions — a mode the suite claims to exercise must be SHOWN to
    occur in the streams it decodes — and the native path's loud
    pre-scan, which is why truncation anywhere in the walk must raise
    ZstdError, never IndexError."""
    try:
        return _frame_stats_walk(data)
    except (IndexError, struct.error):
        raise ZstdError("truncated frame structure") from None


def _frame_stats_walk(data: bytes) -> list[dict]:
    frames = []
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ZstdError("truncated frame magic")
        magic = struct.unpack_from("<I", data, pos)[0]
        if _SKIP_LO <= magic <= _SKIP_HI:
            size = struct.unpack_from("<I", data, pos + 4)[0]
            frames.append({"kind": "skippable", "size": size})
            pos += 8 + size
            continue
        if magic != _MAGIC:
            raise ZstdError(f"bad frame magic {magic:#x}")
        pos += 4
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single = (fhd >> 5) & 1
        if not single:
            pos += 1
        did_flag = fhd & 3
        did_len = (0, 1, 2, 4)[did_flag]
        did = int.from_bytes(data[pos : pos + did_len], "little") \
            if did_len else 0
        pos += did_len
        fcs_len = (1 if single else 0, 2, 4, 8)[fcs_flag]
        fcs = None
        if fcs_len:
            fcs = int.from_bytes(data[pos : pos + fcs_len], "little")
            if fcs_len == 2:
                fcs += 256
            pos += fcs_len
        st = {"kind": "zstd", "dict_id": did, "content_size": fcs,
              "checksum": bool((fhd >> 2) & 1),
              "blocks": {"raw": 0, "rle": 0, "compressed": 0},
              "literals": {"raw": 0, "rle": 0, "compressed": 0,
                           "treeless": 0},
              "four_stream": 0, "with_sequences": 0}
        while True:
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
            if btype == 0:
                st["blocks"]["raw"] += 1
                pos += bsize
            elif btype == 1:
                st["blocks"]["rle"] += 1
                pos += 1
            elif btype == 2:
                st["blocks"]["compressed"] += 1
                block = data[pos : pos + bsize]
                b0 = block[0]
                ltype = b0 & 3
                sfmt = (b0 >> 2) & 3
                st["literals"][
                    ("raw", "rle", "compressed", "treeless")[ltype]
                ] += 1
                if ltype in (0, 1):
                    if sfmt in (0, 2):
                        rsize, hlen = b0 >> 3, 1
                    elif sfmt == 1:
                        rsize = (b0 >> 4) | (block[1] << 4)
                        hlen = 2
                    else:
                        rsize = (b0 >> 4) | (block[1] << 4) | \
                            (block[2] << 12)
                        hlen = 3
                    used = hlen + (rsize if ltype == 0 else 1)
                else:
                    if sfmt == 0:
                        hlen, bits = 3, 10
                    elif sfmt == 1:
                        hlen, bits = 3, 10
                        st["four_stream"] += 1
                    elif sfmt == 2:
                        hlen, bits = 4, 14
                        st["four_stream"] += 1
                    else:
                        hlen, bits = 5, 18
                        st["four_stream"] += 1
                    v = int.from_bytes(block[:hlen], "little") >> 4
                    used = hlen + ((v >> bits) & ((1 << bits) - 1))
                if used < len(block) and block[used] != 0:
                    st["with_sequences"] += 1
                pos += bsize
            else:
                raise ZstdError("reserved block type")
            if pos > n:
                raise ZstdError("block overruns input")
            if last:
                break
        if st["checksum"]:
            pos += 4
        frames.append(st)
    return frames


def zstd_compress_store(data: bytes, checksum: bool = True) -> bytes:
    """Minimal spec-conforming COMPRESSOR: store-mode only (Raw
    blocks, plus an RLE block when the input is one repeated byte) —
    the self-contained fixture twin for the ingestion queries; the
    entropy-coded decode paths are pinned against zstd-jni in
    tests/test_zstd.py."""
    out = bytearray(struct.pack("<I", _MAGIC))
    fhd = 0x20  # single-segment
    if checksum:
        fhd |= 0x04
    n = len(data)
    if n < 256:
        out.append(fhd)
        out.append(n)
    else:
        out.append(fhd | 0x80)  # fcs_flag 2 -> 4 bytes
        out += struct.pack("<I", n)
    step = 1 << 17  # Block_Maximum_Size — applies to RLE output too
    if n and data.count(data[0]) == n:
        # split into <= 128 KB RLE blocks: the 21-bit size field could
        # carry more, but the spec caps a block's REGENERATED size at
        # 128 KB and libzstd rejects larger as corrupt
        for i in range(0, n, step):
            sz = min(step, n - i)
            last = 1 if i + step >= n else 0
            out += int.to_bytes((sz << 3) | (1 << 1) | last, 3, "little")
            out.append(data[0])
    elif n == 0:
        out += int.to_bytes(1, 3, "little")  # empty raw last block
    else:
        for i in range(0, n, step):
            chunk = data[i : i + step]
            last = 1 if i + step >= n else 0
            out += int.to_bytes((len(chunk) << 3) | last, 3, "little")
            out += chunk
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


# --- XXH64 (content checksum) ----------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (the zstd frame checksum hash), pure Python."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) +
             _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(
            h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64,
            23,
        ) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M64, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# --- libzstd fast path (ctypes) --------------------------------------
#
# The container ships libzstd.so.1 (the JVM's zstd-jni wraps the same
# library) even though no Python zstd package exists.  At 100 TB of
# `.zst` corpus the interpreter-tier decoder (~3.6 MB/s/core) is a
# ~300 core-day bill vs ~1 with the C library, so the seam routes
# through ZSTD_decompressStream when the library loads; the
# pure-Python decoder above stays as the no-library fallback and the
# differential oracle (tests pin pure == ctypes == zstd-jni).


class _ZBuf(ctypes.Structure):
    # ZSTD_inBuffer / ZSTD_outBuffer share this layout
    _fields_ = [("p", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


def _load_libzstd():
    """Probe libzstd >= 1.4 (stable streaming + DCtx advanced API);
    None when absent — every caller falls back to pure Python."""
    try:
        name = ctypes.util.find_library("zstd") or "libzstd.so.1"
        lib = ctypes.CDLL(name)
        lib.ZSTD_versionNumber.restype = ctypes.c_uint
        if lib.ZSTD_versionNumber() < 10400:
            return None
        lib.ZSTD_createDCtx.restype = ctypes.c_void_p
        lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_getErrorName.restype = ctypes.c_char_p
        lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
        lib.ZSTD_decompressStream.restype = ctypes.c_size_t
        lib.ZSTD_decompressStream.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(_ZBuf),
            ctypes.POINTER(_ZBuf)]
        lib.ZSTD_DCtx_loadDictionary.restype = ctypes.c_size_t
        lib.ZSTD_DCtx_loadDictionary.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
        return lib
    except Exception:
        return None


_LIB = _load_libzstd()


def _native_decompress(data: bytes, max_output: int | None,
                       dictionary: bytes | None) -> bytes:
    """ZSTD_decompressStream over the whole payload.

    A pure-Python structural pre-scan (:func:`zstd_frame_stats`) runs
    first so frame-grammar and dictionary-contract violations raise
    the SAME loud messages as the fallback path — libzstd treats the
    frame's Dictionary_ID as advisory and would happily decode an
    empty ID-7 frame with no dictionary at all."""
    if not data:
        return b""
    stats = zstd_frame_stats(data)
    zid = None
    if dictionary is not None and len(dictionary) >= 8 and \
            struct.unpack_from("<I", dictionary)[0] == _DICT_MAGIC:
        zid = struct.unpack_from("<I", dictionary, 4)[0]
    declared = 0
    all_declared = True
    for st in stats:
        if st["kind"] != "zstd":
            continue
        did = st.get("dict_id")
        if did:
            if dictionary is None:
                raise ZstdError(
                    f"frame references dictionary {did} but none "
                    "was supplied"
                )
            if zid is None:
                # raw-content dictionary on an ID-declaring frame:
                # libzstd 1.5 refuses ("Dictionary mismatch") where
                # the ZSTD_decompress_usingDict posture accepts — keep
                # parity via the pure path for this corner
                return _decompress_pure(data, max_output, dictionary)
            if zid != did:
                raise ZstdError(
                    f"frame wants dictionary {did}, supplied {zid}"
                )
        if st.get("content_size") is None:
            all_declared = False
        else:
            declared += st["content_size"]
    lib = _LIB
    dctx = lib.ZSTD_createDCtx()
    if not dctx:
        raise ZstdError("ZSTD_createDCtx failed")
    try:
        if dictionary is not None:
            rc = lib.ZSTD_DCtx_loadDictionary(
                dctx, dictionary, len(dictionary))
            if lib.ZSTD_isError(rc):
                raise ZstdError(
                    "libzstd: " + lib.ZSTD_getErrorName(rc).decode())
        buf = ctypes.create_string_buffer(1 << 20)
        # bytes -> c_char_p is a no-copy read-only pointer; `data`
        # stays referenced for the duration of the call
        inb = _ZBuf(ctypes.cast(ctypes.c_char_p(data), ctypes.c_void_p),
                    len(data), 0)
        chunks = []
        total = 0
        while True:
            outb = _ZBuf(ctypes.cast(buf, ctypes.c_void_p),
                         ctypes.sizeof(buf), 0)
            before = (inb.pos, total)
            ret = lib.ZSTD_decompressStream(
                dctx, ctypes.byref(outb), ctypes.byref(inb))
            if lib.ZSTD_isError(ret):
                raise ZstdError(
                    "libzstd: " + lib.ZSTD_getErrorName(ret).decode())
            if outb.pos:
                chunks.append(buf.raw[: outb.pos])
                total += outb.pos
                if max_output is not None and total > max_output:
                    raise ZstdError("output exceeds max_output")
            if inb.pos >= inb.size and outb.pos < outb.size:
                if ret != 0:
                    raise ZstdError("truncated frame")
                break
            if before == (inb.pos, total):
                raise ZstdError("libzstd made no progress")
    finally:
        lib.ZSTD_freeDCtx(dctx)
    out = b"".join(chunks)
    # FCS parity with the pure path: when every frame declares a
    # content size, mismatches are loud with the same message
    if all_declared and len(out) != declared:
        raise ZstdError(
            f"frame content size {len(out)} != declared {declared}")
    return out
