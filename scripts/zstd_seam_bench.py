"""zstd ingestion-seam throughput (rounds 16/17 methodology).

Corpus: 1 000 documents of mixed text, ~220 KB each (~220 MB raw),
compressed at level 3 through zstd-jni (the JVM's real encoder), then
driven through the 32-thread Arrow-batched ``decompress_assets`` seam.
Also reports single-thread decode for the pure-Python RFC 8878 decoder
and (when loadable) the ctypes libzstd fast path — the round-17 ratio
this script exists to record.

Run:  python scripts/zstd_seam_bench.py 2>/dev/null
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syslog_handler_with_clickhouse_spark.operators import zstd as zmod  # noqa: E402
from syslog_handler_with_clickhouse_spark.operators.multimodal import (  # noqa: E402
    decompress_assets,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("zstd-seam-bench")
    spark.sparkContext.setLogLevel("ERROR")
    jz = spark._jvm.com.github.luben.zstd.Zstd
    rng = random.Random(17)
    words = [bytes(rng.choices(b"abcdefghijklmnop ", k=rng.randrange(2, 10)))
             for _ in range(400)]
    doc = b"".join(rng.choice(words) for _ in range(40000))  # ~220 KB
    n_docs = 1000
    comp = bytes(jz.compress(doc, 3))
    raw_mb = len(doc) * n_docs / 1e6

    # single-thread decode, one payload repeated (warm)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        assert zmod.zstd_decompress(comp, force_pure=True) == doc
    pure_mbs = len(doc) * reps / 1e6 / (time.perf_counter() - t0)
    native_mbs = None
    if zmod._LIB is not None:
        reps = 200
        t0 = time.perf_counter()
        for _ in range(reps):
            assert zmod.zstd_decompress(comp) == doc
        native_mbs = len(doc) * reps / 1e6 / (time.perf_counter() - t0)

    # the seam: same payload per doc_id (decode cost is per-payload)
    df = spark.range(n_docs).selectExpr("id as doc_id") \
        .repartition(32) \
        .selectExpr("doc_id", f"unhex('{comp.hex()}') as payload")
    seam = []
    for _ in range(2):  # cold (JVM/first-job), then warm
        t0 = time.perf_counter()
        agg = decompress_assets(df).groupBy("codec").count().collect()
        seam.append(time.perf_counter() - t0)
        counts = {r["codec"]: r["count"] for r in agg}
        assert counts.get("zstd") == n_docs, counts
    seam_s = seam[-1]
    print(json.dumps({
        "metric": "zstd_seam_throughput",
        "raw_mb": round(raw_mb, 1),
        "doc_kb": round(len(doc) / 1e3, 1),
        "comp_ratio": round(len(doc) / len(comp), 2),
        "pure_mb_s_1thread": round(pure_mbs, 2),
        "native_mb_s_1thread": round(native_mbs, 1) if native_mbs else None,
        "seam_s_32threads": round(seam_s, 2),
        "seam_s_cold": round(seam[0], 2),
        "seam_mb_s": round(raw_mb / seam_s, 1),
        "libzstd": zmod._LIB is not None,
        "loadavg": os.getloadavg()[0],
    }))


if __name__ == "__main__":
    main()
