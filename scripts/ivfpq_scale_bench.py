"""IVF-PQ build-vs-scan scale sweep (round-11 companion to the bench
split, directive 5): time `ivfpq_build` (one-time index construction,
cached + fully materialized) and `ivfpq_scan` (16-query probe batch
against the cache) separately at growing corpus sizes, so the two
phases' scaling shapes are measured rather than inferred from the
single sf0.1 bench point.

Expectation: build grows ~linearly with corpus (k-means assignment +
codebook training touch every vector once per pass); scan grows with
the PROBED share (nprobe/n_cells of the code table) — sub-corpus-linear
per query batch.

Round 12 (verdict directive 4): every point is the MEDIAN OF 3 runs —
bench.py's protocol — so single-run scheduling anomalies (the r11
500 k-scan outlier) are measured away rather than narrated; per-run
values are recorded alongside the medians.

Run: python scripts/ivfpq_scale_bench.py [sizes_csv]
     (default "100000,500000,1000000")
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

from scripts.scale_bench import synth_embeddings  # noqa: E402
from syslog_handler_with_clickhouse_spark.operators.similarity import (  # noqa: E402
    ivfpq_build,
    ivfpq_scan,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

N_RUNS = 3


def main() -> None:
    sizes = [
        int(s)
        for s in (
            sys.argv[1] if len(sys.argv) > 1 else "100000,500000,1000000"
        ).split(",")
    ]
    spark = get_spark("ivfpq-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"loadavg_start": list(os.getloadavg()), "runs": N_RUNS, "sweep": []}
    for n in sizes:
        emb = synth_embeddings(spark, n).withColumn(
            "embedding", F.transform("embedding", lambda x: x.cast("double"))
        )
        builds, scans, n_res = [], [], None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            index = {k: df.cache() for k, df in ivfpq_build(emb).items()}
            for df in index.values():
                df.count()
            builds.append(round(time.perf_counter() - t0, 2))
            qpred = F.col("vid") % (n // 16) == 0  # 16 probe queries
            t0 = time.perf_counter()
            scan = ivfpq_scan(index, k=10, query_pred=qpred)
            n_res = scan.count()
            scans.append(round(time.perf_counter() - t0, 2))
            for df in index.values():
                df.unpersist()
        row = {
            "n_vectors": n,
            "build_sec": statistics.median(builds),
            "scan_sec": statistics.median(scans),
            "build_runs": builds,
            "scan_runs": scans,
            "scan_results": n_res,
        }
        print("#", row, file=sys.stderr, flush=True)
        out["sweep"].append(row)
    out["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
