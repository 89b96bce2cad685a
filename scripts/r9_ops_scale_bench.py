"""Round-9 new-operator scale sweep: binary segmentation, Poisson
bootstrap, and Collapsing-engine FINAL reads on synthetic frames well
past the fixture scale.

Expectations that make this a scale witness:
- ``binary_segmentation`` (q427): work is rows x depth window passes
  keyed on the series key — wall time should grow ~linearly in total
  points at fixed depth, independent of how points split across keys.
- Poisson bootstrap (q425 kernel): one projection + one (replicate)-
  keyed aggregation over rows x B expanded records — linear in rows.
- ``collapse_final`` (q421): one hash aggregation over the signed
  stream — linear, no window, no join.

Run: python scripts/r9_ops_scale_bench.py [sizes_csv]
Prints one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from syslog_handler_with_clickhouse_spark.operators.changepoints import (  # noqa: E402
    binary_segmentation,
)
from syslog_handler_with_clickhouse_spark.operators.engines import (  # noqa: E402
    collapse_final,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402


def main():
    sizes = [int(s) for s in (
        sys.argv[1].split(",") if len(sys.argv) > 1 else
        ["1000000", "5000000", "20000000"]
    )]
    spark = get_spark("r9-ops-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        # --- binary segmentation: n points over n/1000 keys, planted
        # x1/x2/x3 regime at thirds of each 1000-point series
        ser = spark.range(n).select(
            (F.col("id") % (n // 1000)).alias("key"),
            (F.col("id") / (n // 1000)).cast("bigint").alias("t"),
        ).select(
            "key", "t",
            (
                (F.lit(100) + F.pmod(F.xxhash64("key", "t"), F.lit(11)))
                * (1 + (F.col("t") >= 333).cast("int")
                     + (F.col("t") >= 666).cast("int"))
            ).alias("v"),
        )
        t0 = time.time()
        segs = binary_segmentation(ser, ["key"], "t", "v", depth=2).count()
        t_bs = time.time() - t0

        # --- Poisson bootstrap kernel: 16 replicates over n rows
        rows = spark.range(n).select(
            F.col("id").alias("rid"),
            (F.pmod(F.xxhash64("id"), F.lit(10000)) + 1).alias("cents"),
        )
        x = rows.select(
            "rid", "cents",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"),
        ).withColumn(
            "u",
            F.pmod(F.xxhash64(F.concat(F.col("rid"), F.lit("_"), F.col("b"))),
                   F.lit(1000000000)),
        )
        w = F.lit(8)
        for k, thr in reversed(list(enumerate(
            (367879441, 735758882, 919698602, 981011843,
             996340153, 999405815, 999916758, 999989750)))):
            w = F.when(F.col("u") < thr, F.lit(k)).otherwise(w)
        t0 = time.time()
        reps = (
            x.withColumn("w", w)
            .groupBy("b")
            .agg(F.expr("SUM(w * cents) DIV SUM(w)").alias("m"))
            .count()
        )
        t_pb = time.time() - t0

        # --- collapsing FINAL: n signed rows over n/20 keys (10
        # versions each -> 10 inserts + 9 cancels + 1 survivor)
        signed = spark.range(n).select(
            (F.col("id") % (n // 20)).alias("key"),
            (F.col("id") / (n // 20)).cast("bigint").alias("seq"),
            (F.col("id") % 1000).alias("v"),
            F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
            .alias("sign"),
        )
        t0 = time.time()
        surv = collapse_final(signed, ["key"], ["v"], order_col="seq").count()
        t_cf = time.time() - t0

        out.append({
            "n": n, "binseg_s": round(t_bs, 2), "binseg_segments": segs,
            "bootstrap_s": round(t_pb, 2), "bootstrap_reps": reps,
            "collapse_s": round(t_cf, 2), "collapse_survivors": surv,
        })
        print(f"# n={n}: binseg {t_bs:.2f}s ({segs} segs), "
              f"bootstrap {t_pb:.2f}s, collapse {t_cf:.2f}s ({surv} keys)",
              file=sys.stderr)
    print(json.dumps({"sweep": out, "loadavg": os.getloadavg()[0]}))


if __name__ == "__main__":
    main()
