"""Boilerplate e2e re-run with the round-15 absolute-df BM25 cap
(verdict directive 3): bm25_boilerplate_r14 measured a 2 %-df planted
boilerplate token family flooding BOTH RRF variants (~10 GB spill,
~400 s at 2 M docs) straight past the default 9/10 RATIO cap — the
q458 Jaccard cap cannot save the hybrid because the flood is in the
SHARED BM25 leg.  This sweep re-runs that exact point three ways:

  rrf_default     — the r14 control (9/10 ratio only, the flood);
  rrf_abs_capped  — ``bm25_max_df_abs`` set between the organic token
                    df (~1.2 k) and the boilerplate family's df (2 %
                    of docs), i.e. exactly how an operator responds to
                    the hot-token telemetry;
  and records the ``stats=[]`` telemetry from the capped run — the
  boilerplate token must surface as top_tokens[0] with its planted df.

Corpus: scripts/bm25_scale_bench's boilerplate fixture (synth_corpus +
the disclaimer sentence appended to doc_id % 50 == 0).

Run: python scripts/bm25_boilerplate_abs_cap_bench.py [n_docs]
     (default 2000000)
Prints one JSON line; paste into PERF.md and save as
bm25_boilerplate_r15.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.bm25_scale_bench import BOILERPLATE  # noqa: E402
from scripts.funnel_scale_bench import _stage_delta  # noqa: E402
from scripts.scale_bench import synth_corpus  # noqa: E402
from syslog_handler_with_clickhouse_spark.metrics import (  # noqa: E402
    _completed_stages,
)
from syslog_handler_with_clickhouse_spark.operators.retrieval import (  # noqa: E402
    rrf_hybrid_topk,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

N_QUERIES = 2_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("bm25-boilerplate-abs-cap")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        synth_corpus(spark, n)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 50 == 0,
                F.concat_ws(" ", "text", F.lit(BOILERPLATE)),
            ).otherwise(F.col("text")).alias("text"),
        )
        .repartition(max(32, n // 200_000))
        .localCheckpoint(eager=True)
    )
    step = max(1, n // N_QUERIES)
    queries_df = docs.filter(F.col("doc_id") % step == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    row: dict = {"n_docs": n, "n_queries": queries_df.count(),
                 "boiler_df": n // 50, "abs_cap": 20_000}

    # telemetry witness (one stats run, untimed): the hot family must
    # be visible BEFORE anyone picks a cap
    from syslog_handler_with_clickhouse_spark.operators.retrieval import (
        bm25_topk,
    )

    st: list = []
    bm25_topk(
        docs, queries_df.limit(1), k=5, stats=st, hot_token_warn=n // 100
    ).count()
    row["telemetry"] = st[0]
    variants = [
        ("rrf_default", dict()),
        ("rrf_abs_capped", dict(bm25_max_df_abs=20_000)),
    ]
    for name, kw in variants:
        walls, shuf = [], []
        n_rows = 0
        for _ in range(3):
            seen = {s["stageId"] for s in _completed_stages(spark)}
            t0 = time.perf_counter()
            n_rows = rrf_hybrid_topk(
                docs, queries_df, k_leg=20, k_out=3, **kw
            ).count()
            walls.append(round(time.perf_counter() - t0, 2))
            _, m = _stage_delta(spark, seen)
            shuf.append(m)
        row[f"{name}_sec"] = statistics.median(walls)
        row[f"{name}_runs"] = walls
        row[f"{name}_rows"] = n_rows
        mid = walls.index(row[f"{name}_sec"])
        row[f"{name}_shuffle_read_mb"] = shuf[mid]["shuffle_read_mb"]
        row[f"{name}_shuffle_write_mb"] = shuf[mid]["shuffle_write_mb"]
        row[f"{name}_spill_disk_mb"] = shuf[mid]["disk_spill_mb"]
        print("#", name, row[f"{name}_sec"], "s", file=sys.stderr, flush=True)
    print(json.dumps({"boilerplate_abs_cap": row,
                      "loadavg": list(os.getloadavg())}))


if __name__ == "__main__":
    main()
