"""quantileGK scale sweep (round-8): measured evidence that the
mergeable eps-summary's STATE stays bounded while N grows — the
property the 100 TB design banks on — and that accuracy holds at every
scale.

Data is pure spark.range + hash arithmetic (no driver data): values are
a deterministic long-tailed mix (xxhash64-uniform base, squared to
skew) so the quantile spread is non-trivial.  Per N it records:

- wall time of the full gk_quantiles pass (partials + merge);
- n_samples: merged summary size (the state that crossed the shuffle);
- worst observed rank error across p in {0.5, 0.9, 0.99} against the
  exact percentiles of the same frame (exact pass timed separately for
  the honesty column).

Run: python scripts/gk_scale_bench.py [sizes_csv]
     (default "1000000,5000000,20000000")
Prints one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from syslog_handler_with_clickhouse_spark.operators.sketches import (  # noqa: E402
    gk_quantiles,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

EPS = 0.01
PROBS = [0.5, 0.9, 0.99]


def synth(spark, n: int):
    base = spark.range(n)
    u = (F.abs(F.xxhash64("id")) % 1_000_000) / 1_000_000.0
    return base.select(
        (F.lit(1.0) + u * u * 1000.0).alias("v"),
        (F.col("id") % 4).cast("string").alias("g"),
    )


def main():
    sizes = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else
                  "1000000,5000000,20000000").split(",")
    ]
    spark = get_spark("gk-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        df = synth(spark, n)
        t0 = time.time()
        rows = gk_quantiles(df, "v", ["g"], PROBS, EPS).collect()
        gk_s = time.time() - t0
        t0 = time.time()
        exact = {
            r["g"]: r
            for r in df.groupBy("g")
            .agg(
                F.percentile("v", F.array(*[F.lit(p) for p in PROBS])).alias(
                    "q"
                ),
                # exact-rank brackets at +-EPS for the error measure
                F.percentile(
                    "v",
                    F.array(
                        *[
                            F.lit(x)
                            for p in PROBS
                            for x in (max(p - EPS, 0.0), min(p + EPS, 1.0))
                        ]
                    ),
                ).alias("b"),
            )
            .collect()
        }
        exact_s = time.time() - t0
        worst_outside = 0
        n_samples = max(r["n_samples"] for r in rows)
        for r in rows:
            b = exact[r["g"]]["b"]
            for i, est in enumerate(r["quantiles"]):
                if not (b[2 * i] <= est <= b[2 * i + 1]):
                    worst_outside += 1
        out.append(
            {
                "n": n,
                "gk_sec": round(gk_s, 2),
                "exact_sec": round(exact_s, 2),
                "max_group_samples": n_samples,
                "estimates_outside_eps_bracket": worst_outside,
            }
        )
        print(f"# n={n}: {out[-1]}", file=sys.stderr)
    print(json.dumps({"eps": EPS, "probs": PROBS, "sweep": out}))


if __name__ == "__main__":
    main()
