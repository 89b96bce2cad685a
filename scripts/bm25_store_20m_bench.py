"""Round-15 flagship point for the stored BM25 index: 20 M documents.

Three claims, measured at 10× the store_index_scale_r15 sweep's top:
  1. bootstrap (one-time O(corpus)) is minutes, not hours;
  2. per-insert cost stays batch-proportional (200 k = 1 % batches);
  3. QUERY time through the stored index — pure bucketed-table joins,
     the corpus text never re-read — vs `bm25_topk`'s full scan-path
     recompute of the same 2 000-query workload on the same corpus
     (identical results; q465's oracle contract).

Run: SPARK_GRAFT_DRIVER_MEM=24g python scripts/bm25_store_20m_bench.py
Prints one JSON line; save as bm25_store_20m_r15.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.funnel_scale_bench import _stage_delta  # noqa: E402
from scripts.scale_bench import synth_corpus  # noqa: E402
from syslog_handler_with_clickhouse_spark.metrics import (  # noqa: E402
    _completed_stages,
)
from syslog_handler_with_clickhouse_spark.operators.retrieval import (  # noqa: E402
    bm25_store_compact,
    bm25_store_init,
    bm25_store_insert,
    bm25_store_topk,
    bm25_topk,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

PREFIX = "store20m"
N = 20_000_000
B = N // 100
N_QUERIES = 2_000


def timed(spark, fn):
    seen = {s["stageId"] for s in _completed_stages(spark)}
    t0 = time.perf_counter()
    out = fn()
    wall = round(time.perf_counter() - t0, 2)
    _, m = _stage_delta(spark, seen)
    return out, wall, m


def du_mb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return round(total / 1e6, 1)


def main() -> None:
    spark = get_spark("bm25-store-20m")
    spark.sparkContext.setLogLevel("ERROR")
    total = N + 3 * B
    docs = (
        synth_corpus(spark, total)
        .repartition(max(32, total // 200_000))
        .localCheckpoint(eager=True)
    )
    loc = tempfile.mkdtemp(prefix="store20m_")
    bm25_store_init(spark, PREFIX, num_buckets=64, location=loc)
    row: dict = {"n_corpus": N, "n_batch": B, "n_queries": N_QUERIES}
    try:
        boot = docs.filter(F.col("doc_id") < N)
        _, row["bootstrap_sec"], bm = timed(
            spark, lambda: bm25_store_insert(spark, PREFIX, boot)
        )
        row["bootstrap_shuffle_mb"] = bm["shuffle_read_mb"]
        row["state_mb_after_boot"] = du_mb(loc)
        for i in range(3):
            lo, hi = N + i * B, N + (i + 1) * B
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).localCheckpoint(eager=True)
            pre = du_mb(loc)
            _, sec, m = timed(
                spark, lambda: bm25_store_insert(spark, PREFIX, batch)
            )
            row[f"insert{i}_sec"] = sec
            row[f"insert{i}_shuffle_mb"] = m["shuffle_read_mb"]
            row[f"insert{i}_spill_mb"] = m.get("disk_spill_mb", 0)
            row[f"insert{i}_written_mb"] = round(du_mb(loc) - pre, 1)
        _, row["compact_full_sec"], _ = timed(
            spark, lambda: bm25_store_compact(spark, PREFIX, full=True)
        )

        step = max(1, total // N_QUERIES)
        queries = docs.filter(F.col("doc_id") % step == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        ).localCheckpoint(eager=True)
        kw = dict(k=5, max_df_num=1, max_df_den=4)
        n_idx, row["query_via_index_sec"], im = timed(
            spark,
            lambda: bm25_store_topk(spark, PREFIX, queries, **kw).count(),
        )
        row["query_via_index_rows"] = n_idx
        row["query_via_index_shuffle_mb"] = im["shuffle_read_mb"]
        row["query_via_index_spill_mb"] = im.get("disk_spill_mb", 0)
        n_scan, row["query_via_scan_sec"], sm = timed(
            spark, lambda: bm25_topk(docs, queries, **kw).count()
        )
        row["query_via_scan_rows"] = n_scan
        row["query_via_scan_shuffle_mb"] = sm["shuffle_read_mb"]
        row["query_via_scan_spill_mb"] = sm.get("disk_spill_mb", 0)
        assert n_idx == n_scan, (n_idx, n_scan)
    finally:
        for t in (f"{PREFIX}_postings", f"{PREFIX}_dl", f"{PREFIX}_df"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            spark.sql(f"DROP TABLE IF EXISTS {t}__alt")
        shutil.rmtree(loc, ignore_errors=True)
        docs.unpersist()
    print("#", row, file=sys.stderr, flush=True)
    print(json.dumps({"bm25_store_20m": row,
                      "loadavg": list(os.getloadavg())}))


if __name__ == "__main__":
    main()
