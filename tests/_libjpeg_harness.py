"""Shared ctypes harness for driving the SYSTEM libjpeg-turbo
(libjpeg62 ABI) from tests, in error-isolated subprocesses (libjpeg's
default error manager exit()s the process on failure).  Struct sizes
are probed from the library's own mismatch message; field offsets are
the 62-LP64 ABI.  Used by test_jpeg_arith_interop.py (QM coder) and
test_jpeg_huffman_interop.py (Huffman family)."""

from __future__ import annotations

import base64
import os
import subprocess
import sys

LIB = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"

_LIB = LIB

_HELPER = r"""
import base64, ctypes, re, subprocess, sys

LIB = "%s"
lj = ctypes.CDLL(LIB)
lj.jpeg_std_error.restype = ctypes.c_void_p


def probe_size(create):
    # deliberately wrong size; std error prints 'library thinks size is N'
    code = (
        "import ctypes;lj=ctypes.CDLL('" + LIB + "');"
        "lj.jpeg_std_error.restype=ctypes.c_void_p;"
        "e=ctypes.create_string_buffer(1024);p=lj.jpeg_std_error(e);"
        "c=ctypes.create_string_buffer(4096);"
        "ctypes.cast(c,ctypes.POINTER(ctypes.c_void_p))[0]=p;"
        "lj." + create + "(c,62,1)"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    m = re.search(r"size is (\d+)", r.stderr)
    assert m, r.stderr
    return int(m.group(1))


def mk(create, size):
    err = ctypes.create_string_buffer(1024)
    eptr = lj.jpeg_std_error(err)
    cinfo = ctypes.create_string_buffer(size)
    ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = eptr
    getattr(lj, create)(cinfo, 62, size)
    cinfo._err_keepalive = err  # cinfo->err must outlive the struct
    return cinfo


def u32(buf, off, val=None):
    p = ctypes.cast(ctypes.byref(buf, off), ctypes.POINTER(ctypes.c_uint))
    if val is None:
        return p[0]
    p[0] = val


def decode(data):
    size = probe_size("jpeg_CreateDecompress")
    cinfo = mk("jpeg_CreateDecompress", size)
    src = ctypes.create_string_buffer(data, len(data))
    lj.jpeg_mem_src(cinfo, src, ctypes.c_ulong(len(data)))
    lj.jpeg_read_header(cinfo, 1)
    # replicated (non-fancy) chroma upsampling, matching our decoder --
    # do_fancy_upsampling boolean at 100 (62 LP64 ABI)
    ctypes.cast(ctypes.byref(cinfo, 100), ctypes.POINTER(ctypes.c_int))[0] = 0
    lj.jpeg_start_decompress(cinfo)
    # output dims: scan the struct for the (width, height) pair we know
    # from the SOF we just parsed is implausible to fake -- instead the
    # caller passes dims; simpler: image_width/height at 48/52 (62 ABI)
    w, h = u32(cinfo, 48), u32(cinfo, 52)
    # output_components: after start_decompress, out_color_components /
    # output_components sit at 144/148 in the 62 LP64 layout
    c = ctypes.cast(ctypes.byref(cinfo, 148), ctypes.POINTER(ctypes.c_int))[0]
    assert c in (1, 3), c
    row = ctypes.create_string_buffer(w * c)
    rowp = (ctypes.c_void_p * 1)(ctypes.addressof(row))
    out = bytearray()
    for _ in range(h):
        n = lj.jpeg_read_scanlines(cinfo, rowp, 1)
        assert n == 1
        out += row.raw[: w * c]
    lj.jpeg_finish_decompress(cinfo)
    lj.jpeg_destroy_decompress(cinfo)
    return w, h, c, bytes(out)


def encode(w, h, c, quality, rst, prog, arith, opt, px):
    size = probe_size("jpeg_CreateCompress")
    cinfo = mk("jpeg_CreateCompress", size)
    outbuf = ctypes.c_void_p(0)
    outsize = ctypes.c_ulong(0)
    lj.jpeg_mem_dest(cinfo, ctypes.byref(outbuf), ctypes.byref(outsize))
    u32(cinfo, 48, w)   # image_width
    u32(cinfo, 52, h)   # image_height
    ctypes.cast(ctypes.byref(cinfo, 56), ctypes.POINTER(ctypes.c_int))[0] = c
    ctypes.cast(ctypes.byref(cinfo, 60), ctypes.POINTER(ctypes.c_int))[0] = (
        1 if c == 1 else 2  # JCS_GRAYSCALE / JCS_RGB
    )
    lj.jpeg_set_defaults(cinfo)
    lj.jpeg_set_quality(cinfo, quality, 1)
    # booleans arith_code / optimize_coding at 260 / 264 (62 LP64 ABI)
    if arith:
        ctypes.cast(ctypes.byref(cinfo, 260), ctypes.POINTER(ctypes.c_int))[0] = 1
    if opt:
        ctypes.cast(ctypes.byref(cinfo, 264), ctypes.POINTER(ctypes.c_int))[0] = 1
    if rst:
        u32(cinfo, 280, rst)  # restart_interval
    if prog:
        lj.jpeg_simple_progression(cinfo)
    lj.jpeg_start_compress(cinfo, 1)
    stride = w * c
    for y in range(h):
        row = ctypes.create_string_buffer(px[y * stride : (y + 1) * stride], stride)
        rowp = (ctypes.c_void_p * 1)(ctypes.addressof(row))
        n = lj.jpeg_write_scanlines(cinfo, rowp, 1)
        assert n == 1
    lj.jpeg_finish_compress(cinfo)
    data = ctypes.string_at(outbuf, outsize.value)
    lj.jpeg_destroy_compress(cinfo)
    return data


mode = sys.argv[1]
if mode == "decode":
    data = base64.b64decode(sys.stdin.read())
    w, h, c, px = decode(data)
    print(w, h, c)
    print(base64.b64encode(px).decode())
else:
    w, h, c, quality, rst, prog, arith, opt = (int(x) for x in sys.argv[2:10])
    px = base64.b64decode(sys.stdin.read())
    data = encode(w, h, c, quality, rst, prog, arith, opt, px)
    print(base64.b64encode(data).decode())
""" % _LIB


def sys_decode(jpeg: bytes):
    r = subprocess.run(
        [sys.executable, "-c", _HELPER, "decode"],
        input=base64.b64encode(jpeg).decode(),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, f"system libjpeg rejected the stream: {r.stderr}"
    dims, px64 = r.stdout.split("\n")[:2]
    w, h, c = (int(x) for x in dims.split())
    return w, h, c, base64.b64decode(px64)


def sys_encode(w, h, c, quality, rst, prog, px: bytes, *, arith=True,
               opt=False) -> bytes:
    r = subprocess.run(
        [sys.executable, "-c", _HELPER, "encode",
         str(w), str(h), str(c), str(quality), str(rst), str(int(prog)),
         str(int(arith)), str(int(opt))],
        input=base64.b64encode(px).decode(),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, f"system libjpeg encode failed: {r.stderr}"
    return base64.b64decode(r.stdout.strip())




def available() -> bool:
    return os.path.exists(LIB)
