"""Full-registry timing sweep: every query once, sequentially, one warm JVM.

Regenerates the table in PERF.md.  Single-run numbers (the contract is
"no pathological query", not a benchmark — bench.py's median-of-3 is the
noise-controlled headline).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/perf_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from syslog_handler_with_clickhouse_spark.queries import QUERIES
    from syslog_handler_with_clickhouse_spark.session import get_spark

    spark = get_spark("syslog-spark-perf-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in QUERIES:
        t0 = time.time()
        try:
            # noop sink, not count(): count lets Catalyst prune projections
            # (bench.py got the same fix — round-4 verdict item 1)
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.time() - t0, 2)
        except Exception as e:  # a sweep must finish; failures are the finding
            failures[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"# {name}: {timings.get(name, 'FAIL')}", file=sys.stderr)

    print(json.dumps({"sf_dir": SF_DIR, "timings": timings, "failures": failures}))
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"| {name} | {sec:.2f} |", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
