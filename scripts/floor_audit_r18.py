"""Round-18 width-floor audit (VERDICT r17 'next round' #2): run the
full query registry at a small SF with ``_size_floor`` instrumented, and
report every floor that BINDS (exceeds the session width).  At sf0.01
the true data per operator input is ~1 MB, so any floor that raises a
shuffle past the session's 32 partitions is estimate-driven — either a
genuine fan-out (explode: acceptable, bounded by the leaf clamp) or a
join-inflated estimate that survived a localCheckpoint (the poison the
clamp cannot see through — pinned in tests/test_optimizations_r17.py).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/floor_audit_r18.py

Prints one JSON line: {"binding": [{query, floor, size, leaf_sum}...],
"clamp_events": N, "timings": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from syslog_handler_with_clickhouse_spark.operators import dedup
    from syslog_handler_with_clickhouse_spark.queries import QUERIES
    from syslog_handler_with_clickhouse_spark.session import get_spark

    spark = get_spark("floor-audit-r18")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))

    orig = dedup._size_floor
    current: list = ["<none>"]
    binding: list = []

    def probe(df):
        floor = orig(df)
        if floor > sess:
            try:
                plan = df._jdf.queryExecution().optimizedPlan()
                size = int(plan.stats().sizeInBytes())
            except Exception:
                size = -1
            binding.append(
                {"query": current[0], "floor": floor, "size": size}
            )
        return floor

    dedup._size_floor = probe
    # retrieval imported the symbol by name — patch there too
    from syslog_handler_with_clickhouse_spark.operators import retrieval

    retrieval._size_floor = probe

    timings: dict = {}
    failures: dict = {}
    for name in QUERIES:
        current[0] = name
        t0 = time.time()
        try:
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.time() - t0, 2)
        except Exception as e:
            failures[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"# {name}: {timings.get(name, 'FAIL')}", file=sys.stderr)

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "session_width": sess,
                "binding": binding,
                "clamp_events": len(dedup._FLOOR_CLAMP_EVENTS),
                "failures": failures,
                "timings": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
