"""Multimodal column plumbing (tier X).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode/feature-extract step runs as Arrow-batched ``mapInPandas`` —
the real 100 TB shape: schema declared up front, work distributed per
input partition, bytes never round-trip through the driver.

The actual media codecs are NOT in this container, so the decode is a
deterministic fake (byte statistics); the Spark-side plumbing — binary
schema, UDF signature, batch iteration — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def as_binary_assets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model documents as binary assets: payload + typed metadata columns."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
    )


def decode_real(payload: bytes) -> bytes:
    """Placeholder for a real media decode (PIL/librosa/ffmpeg are not in
    this container)."""
    raise NotImplementedError("media codecs unavailable in this environment")


FRAME_BYTES = 64  # fixed frame size for the deterministic frame sampler

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def sample_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """One-to-MANY Arrow-batched frame sampling: the payload is treated as
    consecutive ``FRAME_BYTES`` frames and every ``every_n``-th frame is
    emitted as its own row — the video frame-sample shape (generator
    semantics: output rows ≠ input rows, schema declared up front)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    ids.append(int(did))
                    idxs.append(i)
                    frames.append(b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(batches, FRAME_SCHEMA)


def resize_images(assets: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic fake 'resize': payload tiled/truncated to exactly
    width×height bytes.  A real PIL/opencv resize drops into ``_rz``
    unchanged — the binary-in/binary-out mapInPandas plumbing, schema,
    and batch shape are what this exercises."""
    target = width * height

    def _rz(payload) -> bytes:
        b = bytes(payload)
        if not b:
            return bytes(target)
        reps = (target + len(b) - 1) // len(b)
        return (b * reps)[:target]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pdf["payload"].map(_rz),
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(batches, RESIZE_SCHEMA)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake 'decode': byte count / sum / mean per payload —
    stands in for image resize / audio frame-sample while exercising the
    exact mapInPandas shape a real decoder would use.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n = payloads.map(len).astype("int64")
            s = payloads.map(lambda b: int(sum(b))).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n,
                    "byte_sum": s,
                    "byte_mean": s / n,
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def probe_media(b: bytes) -> tuple[str, int | None, int | None, int | None, int | None]:
    """REAL container-metadata decode — pure struct parsing, no codec
    libraries: PNG IHDR, JPEG SOF0/1/2 markers, GIF logical screen
    descriptor, BMP DIB header, WAV fmt chunk.  Pixel/sample decode
    still requires the absent codecs (``decode_real``); dimensions,
    format identification, and audio parameters do not.

    Returns (format, width, height, sample_rate, channels) with None for
    fields the container doesn't carry; ("unknown", None, ...) when no
    magic matches — never raises on truncated/garbage payloads."""
    import struct

    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return ("png", w, h, None, None)
        if b[:3] == b"\xff\xd8\xff":
            # Walk JPEG segments to a start-of-frame marker.  Per the
            # round-5 advice this handles the full marker grammar, not
            # just the golden fixtures: 0xFF fill bytes between segments,
            # length-less markers (TEM 0x01, RSTn 0xD0-0xD7), and every
            # SOFn variant carrying dimensions (0xC0-0xCF minus DHT 0xC4,
            # JPGext 0xC8, DAC 0xCC — i.e. baseline, progressive,
            # lossless, arithmetic, differential).
            _SOF = {
                m
                for m in range(0xC0, 0xD0)
                if m not in (0xC4, 0xC8, 0xCC)
            }
            i = 2
            while i + 1 < len(b):
                if b[i] != 0xFF:
                    break
                # 0xFF fill bytes: any number may pad before the marker id
                while i + 1 < len(b) and b[i + 1] == 0xFF:
                    i += 1
                if i + 1 >= len(b):
                    break
                marker = b[i + 1]
                if marker in _SOF:
                    if i + 9 > len(b):
                        break
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return ("jpeg", w, h, None, None)
                if marker == 0xD9:  # EOI — no frame header found
                    break
                if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                    # TEM / RSTn carry no length word
                    i += 2
                    continue
                if marker == 0xDA:
                    # SOS: entropy-coded data follows — a naive length
                    # hop no longer lands on marker boundaries; stop.
                    break
                if i + 4 > len(b):
                    break
                seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
                if seg_len < 2:
                    break
                i += 2 + seg_len
            return ("jpeg", None, None, None, None)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return ("gif", w, h, None, None)
        if b[:2] == b"BM" and len(b) >= 26:
            # Gate the dimension read on the DIB header size at offset 14
            # (round-5 advice): BITMAPCOREHEADER (12) stores unsigned
            # 16-bit dims at 18; BITMAPINFOHEADER and successors (>=40)
            # store signed 32-bit dims (negative height = top-down rows).
            dib = struct.unpack("<I", b[14:18])[0]
            if dib == 12 and len(b) >= 22:
                w, h = struct.unpack("<HH", b[18:22])
                return ("bmp", w, h, None, None)
            if dib >= 40:
                w, h = struct.unpack("<ii", b[18:26])
                return ("bmp", w, abs(h), None, None)
            return ("bmp", None, None, None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
                if cid == b"fmt " and i + 16 <= len(b):
                    channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
                    return ("wav", None, None, rate, channels)
                i += 8 + clen + (clen & 1)
            return ("wav", None, None, None, None)
    except Exception:
        pass
    return ("unknown", None, None, None, None)


def probe_assets(assets: DataFrame) -> DataFrame:
    """Distributed media probing: `probe_media` over every payload via
    Arrow-batched mapInPandas — the same plumbing the fake decoders use,
    but with a REAL parser inside (the round-4 'partial' upgrade: format
    identification and container metadata need no codecs)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [probe_media(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "format": [r[0] for r in rows],
                    "width": pd.array([r[1] for r in rows], dtype="Int32"),
                    "height": pd.array([r[2] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array([r[3] for r in rows], dtype="Int32"),
                    "channels": pd.array([r[4] for r in rows], dtype="Int32"),
                }
            )

    return assets.mapInPandas(batches, PROBE_SCHEMA)
