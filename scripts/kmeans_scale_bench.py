"""k-means / SemDeDup scale sweep (round-9): measured evidence that the
Lloyd loop's cost is one projection-only scan per iteration plus a
k×dim-group aggregate — i.e. linear in corpus size with no corpus
shuffle — and that the final assignment (the step a 100 TB pipeline
runs over the FULL corpus after training on a sample) is a pure scan.

Vectors are synthesized executor-side (spark.range + xxhash64, no
driver data), 64-d, values 0..999 — the same family as scale_bench.py
so the numbers are comparable.

What it records, per corpus size:
- train_sec: 2 full Lloyd iterations (assign→refine ×2), k=16.
- assign_sec: ONE final assignment pass + count (the full-corpus step).
- assign_rows_per_sec: the scan rate of the projection-only assignment.

Run: python scripts/kmeans_scale_bench.py [sizes_csv]
     (default "1000000,2000000,5000000,10000000")
Prints one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from syslog_handler_with_clickhouse_spark.operators import clustering  # noqa: E402
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

DIM = 64
K = 16
ITERS = 2


def synth_embeddings(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)).cast(
                "double"
            ),
        ).alias("embedding"),
    )


def main() -> None:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1_000_000, 2_000_000, 5_000_000, 10_000_000]
    )
    spark = get_spark("kmeans-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"loadavg_start": list(os.getloadavg()), "k": K, "dim": DIM,
           "iters": ITERS, "sweep": []}
    for n in sizes:
        emb = synth_embeddings(spark, n)
        v = clustering.quantize_vectors(emb)
        cent = v.filter(F.col("vid") < K).select(
            F.col("vid").alias("cell"), F.col("qv").alias("cv")
        )
        t0 = time.monotonic()
        for _ in range(ITERS):
            cent = clustering.refine_step(clustering.assign_nearest(v, cent))
        # materialize the trained centroids so assign_sec is pure scan
        cent = cent.localCheckpoint(eager=True)
        t_train = time.monotonic() - t0
        t0 = time.monotonic()
        # aggregate over the COMPUTED columns — a bare count() would let
        # Catalyst prune the assignment projection away entirely
        row = (
            clustering.assign_nearest(v, cent)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("cluster").alias("cl_sum"),
                F.avg("d2").alias("d2_avg"),  # sum would overflow long
            )
            .first()
        )
        n_rows = row["n"]
        t_assign = time.monotonic() - t0
        cent.unpersist()
        rec = {
            "n_vectors": n,
            "train_sec": round(t_train, 2),
            "assign_sec": round(t_assign, 2),
            "assign_rows_per_sec": int(n_rows / t_assign),
        }
        out["sweep"].append(rec)
        print(f"# kmeans n={n}: train={t_train:.1f}s assign={t_assign:.1f}s "
              f"({rec['assign_rows_per_sec']} rows/s)", file=sys.stderr)

    out["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
