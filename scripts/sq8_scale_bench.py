"""SQ8 ANN scale probe: storage + scan economics of the q434 layout at
1 M x 64-dim vectors vs the raw integer-grid representation.

What it measures (and what the 100 TB argument rests on):
- parquet bytes: codes stored as array<smallint> + (mn, mx) vs the raw
  array<bigint> grid — the scan-traffic ratio an executor pays per
  candidate.
- top-k scan wall time: broadcast 20 queries, one pass computing the
  integer dot against (a) raw vectors, (b) the SQ8 asymmetric
  dequantization — ADC adds 2 integer ops/component but reads ~4-8x
  fewer bytes.

Run: python scripts/sq8_scale_bench.py [n_vectors]
Prints one JSON line; paste into PERF.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from syslog_handler_with_clickhouse_spark.operators.similarity import (  # noqa: E402
    sq8_dequantize,
    sq8_quantize,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _du(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("sq8-scale")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="sq8bench")
    try:
        # full-entropy doubles in ~[-1.07, 1.07] — ~2^31 distinct values,
        # so parquet can neither dictionary-encode nor bit-pack them:
        # THIS is the scan-bytes baseline a real float64 corpus pays
        raw = spark.range(n).select(
            F.col("id").alias("vid"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: (
                    (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2147483647))
                     - 1073741823).cast("double") / 1e9
                ),
            ).alias("qv"),
        )
        raw_p, sq_p = f"{d}/raw", f"{d}/sq8"
        raw.write.mode("overwrite").parquet(raw_p)
        v = spark.read.parquet(raw_p).select(
            "vid",
            F.transform(
                "qv", lambda x: F.round(x * 1000).cast("bigint")
            ).alias("qv"),
        )
        sq = sq8_quantize(v)
        sq.select(
            "vid",
            "mn",
            "mx",
            F.transform("codes", lambda c: c.cast("smallint")).alias("codes"),
        ).write.mode("overwrite").parquet(sq_p)
        raw_bytes, sq_bytes = _du(raw_p), _du(sq_p)

        qdf = (
            spark.read.parquet(raw_p)
            .filter(F.col("vid") % (n // 20) == 0)
            .select(F.col("vid").alias("query_id"), F.col("qv").alias("q_qv"))
        )
        qint = (
            spark.read.parquet(raw_p)
            .filter(F.col("vid") % (n // 20) == 0)
            .select(
                F.col("vid").alias("query_id"),
                F.transform(
                    "qv", lambda x: F.round(x * 1000).cast("bigint")
                ).alias("q_iv"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("vid")
        )

        t0 = time.time()
        raw = spark.read.parquet(raw_p)

        def _ddot(a, b):
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        exact = (
            F.broadcast(qdf)
            .crossJoin(raw)
            .select("query_id", "vid", _ddot("q_qv", "qv").alias("score"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 10)
            .count()
        )
        t_exact = time.time() - t0

        t0 = time.time()
        codes = spark.read.parquet(sq_p).select(
            "vid",
            sq8_dequantize(
                F.transform("codes", lambda c: c.cast("bigint")),
                F.col("mn"),
                F.col("mx"),
            ).alias("dq"),
        )
        adc = (
            F.broadcast(qint)
            .crossJoin(codes)
            .select("query_id", "vid", _dot("q_iv", "dq").alias("score"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 10)
            .count()
        )
        t_adc = time.time() - t0

        print(
            json.dumps(
                {
                    "n_vectors": n,
                    "raw_mb": round(raw_bytes / 1e6, 1),
                    "sq8_mb": round(sq_bytes / 1e6, 1),
                    "compression": round(raw_bytes / sq_bytes, 2),
                    "exact_scan_s": round(t_exact, 2),
                    "adc_scan_s": round(t_adc, 2),
                    "rows": [exact, adc],
                }
            )
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
