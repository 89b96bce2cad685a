"""Media-codec throughput bound (round-10 verdict directive 8): put a
measured number on the pure-Python decode ceiling so the weak-vs-done
call is data-driven.  A 100×-the-q362-fixture corpus per codec (default
8 192 assets, 64×64 RGB / 4 096-sample WAV — JPEG tiers smaller, they
are the slow path) flows through the REAL distributed path
(`multimodal.decode_assets`, Arrow-batched mapInPandas); fixtures are
generated executor-side from ids (no driver data), persisted, and the
decode is timed on a warm second run.

For each codec it reports assets/s on local[32], assets/s/core, the
measured average payload size, and the 100 TB envelope that follows:

    assets_at_100TB = 100e12 / avg_bytes
    wall_days(1000 execs × 32 cores) =
        assets_at_100TB / (per_core × 32 000) / 86 400

Round 12 (verdict directive 4): the timed decode is the MEDIAN OF 3
warm runs — bench.py's protocol — with per-run walls recorded, so a
single scheduling hiccup cannot masquerade as a codec property.

Run: python scripts/media_scale_bench.py [n_assets]
Prints one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

W = H = 64
CODECS = [
    # (name, relative count weight — JPEG decode is the slow path)
    ("png8", 1.0),
    ("png16", 1.0),
    ("bmp24", 1.0),
    ("gif", 1.0),
    ("tiff8_lzw", 1.0),
    ("tiff16_lzw", 1.0),
    ("wav_pcm16", 1.0),
    ("jpeg_base", 0.25),
    ("jpeg_prog", 0.125),
]


def _payload(codec: str, d: int) -> bytes:
    from syslog_handler_with_clickhouse_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
        encode_png16,
        encode_tiff,
        encode_wav,
    )

    n = W * H * 3
    px = bytes((d * 31 + k * 7) % 256 for k in range(n))
    if codec == "png8":
        return encode_png(px, W, H, 3, filters=[r % 5 for r in range(H)])
    if codec == "png16":
        vals = [(d * 1031 + 257 * k) % 65536 for k in range(W * H)]
        return encode_png16(vals, W, H, 1)
    if codec == "bmp24":
        return encode_bmp(px, W, H, 24)
    if codec == "gif":
        pal = bytes((i * 3 + j) % 256 for i in range(64) for j in range(3))
        idx = bytes((d + k) % 64 for k in range(W * H))
        return encode_gif(idx, W, H, pal)
    if codec == "tiff8_lzw":
        return encode_tiff(px, W, H, 3, lzw=True, predictor=True)
    if codec == "tiff16_lzw":
        vals = [(d * 1031 + 257 * k) % 65536 for k in range(W * H)]
        return encode_tiff(vals, W, H, 1, bits=16, lzw=True, predictor=True)
    if codec == "wav_pcm16":
        smp = [((d * 37 + k * 11) % 65536) - 32768 for k in range(4096)]
        return encode_wav(smp, 16000, 1)
    if codec == "jpeg_base":
        return encode_jpeg(px, W, H, 3, subsample=True)
    if codec == "jpeg_prog":
        return encode_jpeg_progressive(px, W, H, 3, subsample=True)
    raise ValueError(codec)


def build_assets(spark, codec: str, n: int):
    import pandas as pd

    def gen(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].astype("int64"),
                    "payload": [_payload(codec, int(d)) for d in pdf["id"]],
                }
            )

    df = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "doc_id long, payload binary")
        .persist()
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.length("payload")).alias("b")
    ).collect()[0]
    return df, int(stats.n), float(stats.b)


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    spark = get_spark("media-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    from syslog_handler_with_clickhouse_spark.operators.multimodal import (
        decode_assets,
    )

    out = {"loadavg_start": list(os.getloadavg()), "n_base": base_n,
           "codecs": []}
    for codec, weight in CODECS:
        n = max(256, int(base_n * weight))
        assets, n_built, avg_b = build_assets(spark, codec, n)
        dec = decode_assets(assets)
        # warm run (JVM + Arrow + codegen), then median of 3 timed runs
        dec.write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            dec.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        wall = statistics.median(walls)
        n_ok = dec.filter(F.col("kind") != "undecoded").count()
        assets.unpersist()
        per_s = n_built / wall
        per_core = per_s / 32
        assets_100tb = 100e12 / avg_b
        days = assets_100tb / (per_core * 32_000) / 86_400
        row = {
            "codec": codec,
            "n_assets": n_built,
            "decoded_ok": n_ok,
            "avg_bytes": round(avg_b, 0),
            "wall_sec": round(wall, 2),
            "wall_runs": [round(x, 2) for x in walls],
            "assets_per_sec_32c": round(per_s, 1),
            "assets_per_sec_core": round(per_core, 2),
            "days_100tb_1000x32": round(days, 1),
        }
        print("#", row, file=sys.stderr, flush=True)
        out["codecs"].append(row)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
