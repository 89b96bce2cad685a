"""Skew-resilience bench: salted vs plain join on a zipf(1.5) key at 20M+
rows (round-5 verdict #5 — measured evidence, not just the q75 plan).

Synthesizes a deterministic heavy-tail device column (u = hash(id)/2^30,
device = min(floor(u^-2), cap): P(device >= k) = k^-0.5, the zipf(1.5)
count tail; the hottest key draws ~29% of all rows), joins it to a
device dim with (a) the plain shuffle join and (b) salted_join, with AQE
and broadcast disabled so the salting itself is what's measured, and
reports wall time + per-task shuffle-read distribution from the UI
status API.  A third run re-enables AQE's skew-join split on the plain
join — the first line of defense salting backs up.

Run: python scripts/skew_bench.py [n_rows]  (default 20_000_000)
Prints one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from syslog_handler_with_clickhouse_spark.metrics import (  # noqa: E402
    shuffle_skew_probe,
)
from syslog_handler_with_clickhouse_spark.operators.joins import (  # noqa: E402
    salted_join,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # make AQE's split actually fire at this scale: the hot partition is
    # ~65 MB, under the 256 MB default threshold — on a real cluster the
    # same ratio appears at GBs/partition where the default does fire
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")

    def timed(df, label: str, aqe: bool) -> dict:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(aqe).lower()
        )
        t0 = time.monotonic()
        probe = shuffle_skew_probe(spark, df)
        probe["seconds"] = round(time.monotonic() - t0, 3)
        probe["label"] = label
        return probe

    results = []
    # Two dim regimes, because salting's cost is ×buckets on the dim
    # side: with a dim comparable to the fact (10M keys) the replication
    # can cost more than the hot task it removes; with a small dim
    # (100k keys — the common device/tenant/UA table) replication is
    # noise and salting converts the hot-task wall into total/cores.
    for cap, tag in ((10_000_000, "dim10m"), (100_000, "dim100k")):
        u = (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000_000)) + 1) / 1e9
        device = F.least(F.floor(1 / (u * u)), F.lit(cap)).cast("bigint")
        fact = spark.range(n).select(
            device.alias("device"), F.col("id").alias("payload")
        )
        dim = spark.range(1, cap + 1).select(
            F.col("id").alias("device"), (F.col("id") % 97).alias("attr")
        )
        # warmup: materialize both inputs once so JIT/codegen don't bill
        # the first measured variant
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        fact.write.format("noop").mode("overwrite").save()
        dim.write.format("noop").mode("overwrite").save()
        results += [
            timed(fact.join(dim, "device"), f"{tag}_plain_no_aqe", aqe=False),
            timed(
                salted_join(fact, dim, on="device", buckets=16),
                f"{tag}_salted16_no_aqe",
                aqe=False,
            ),
            timed(
                fact.join(dim, "device"), f"{tag}_plain_aqe_skewjoin", aqe=True
            ),
        ]
    out = {
        "n_rows": n,
        "loadavg": os.getloadavg(),
        "cpus": os.cpu_count(),
        "results": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
