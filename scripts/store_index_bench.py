"""Stored-index maintenance sweep (round-15 verdict directives 1+2):
prove the per-insert claim with measurements — folding a 1 % batch
into the STORED BM25 index (`operators/retrieval.bm25_store_insert`)
and the STORED IVF-PQ index (`operators/similarity.ivfpq_store_insert`)
must cost on the order of the BATCH (wall, shuffle, and — the round-14
`weak` — bytes WRITTEN to state storage), while the round-14
DataFrame-state variants (`bm25_index_insert` / `ivfpq_insert`)
localCheckpoint the full corpus-sized union every time.

Protocol per corpus size N (B = N/100):
  1. synthesize N + 3·B docs / vectors (scale_bench synths);
  2. bootstrap the stored state with the first N rows (recorded as the
     amortized one-time cost);
  3. fold 3 batches of B, recording per-insert wall seconds, shuffle
     read MB, disk spill MB, and the state directory's byte GROWTH
     (du before/after — the direct O(batch)-vs-O(corpus) I/O signal);
  4. run ONE DataFrame-state insert of the same batch on the same
     accumulated corpus and record its wall + shuffle + the
     checkpointed state's size (what it rewrites per batch);
  5. at the smallest N, assert the stored BM25 top-k equals the scan
     path bit for bit (the q465 contract, at scale).

Run: python scripts/store_index_bench.py [sizes_csv]
     (default "1000000,5000000")
Prints one JSON line; paste into PERF.md and save as
store_index_scale_r15.json.
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
from scripts.scale_bench import synth_corpus, synth_embeddings  # noqa: E402
from syslog_handler_with_clickhouse_spark.metrics import (  # noqa: E402
    _completed_stages,
)
from syslog_handler_with_clickhouse_spark.operators.retrieval import (  # noqa: E402
    bm25_index_init,
    bm25_index_insert,
    bm25_store_init,
    bm25_store_insert,
    bm25_store_topk,
    bm25_topk,
)
from syslog_handler_with_clickhouse_spark.operators.similarity import (  # noqa: E402
    ivfpq_insert,
    ivfpq_store_init,
    ivfpq_store_insert,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

PREFIX = "storebench"


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


def cached_blocks_mb(spark) -> float:
    """Total bytes of cached/checkpointed RDD blocks currently in the
    block manager.  The DELTA across a DataFrame-state insert is the
    state the round-14 variant (re)materializes for that one batch."""
    total = 0
    for i in spark.sparkContext._jsc.sc().getRDDStorageInfo():
        total += i.memSize() + i.diskSize()
    return round(total / 1e6, 1)


def bench_bm25(spark, n: int, b: int, row: dict) -> None:
    total = n + 3 * b
    docs = (
        synth_corpus(spark, total)
        .repartition(max(32, total // 200_000))
        .localCheckpoint(eager=True)
    )
    loc = tempfile.mkdtemp(prefix="storebench_bm25_")
    bm25_store_init(spark, PREFIX, num_buckets=64, location=loc)
    try:
        boot = docs.filter(F.col("doc_id") < n)
        _, row["bm25_bootstrap_sec"], bm = timed(
            spark, lambda: bm25_store_insert(spark, PREFIX, boot)
        )
        row["bm25_state_mb_after_boot"] = du_mb(loc)
        for i in range(3):
            lo, hi = n + i * b, n + (i + 1) * b
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).localCheckpoint(eager=True)
            pre = du_mb(loc)
            _, sec, m = timed(
                spark, lambda: bm25_store_insert(spark, PREFIX, batch)
            )
            row[f"bm25_insert{i}_sec"] = sec
            row[f"bm25_insert{i}_shuffle_mb"] = m["shuffle_read_mb"]
            row[f"bm25_insert{i}_spill_mb"] = m.get("disk_spill_mb", 0)
            row[f"bm25_insert{i}_written_mb"] = round(du_mb(loc) - pre, 1)
        # the round-14 DataFrame-state cost of ONE batch on the same
        # accumulated corpus: bootstrap the state (untimed), then time
        # the last batch's fold — it checkpoints the full union
        idx = bm25_index_init(spark)
        idx = bm25_index_insert(
            idx, docs.filter(F.col("doc_id") < n + 2 * b)
        )
        last = docs.filter(F.col("doc_id") >= n + 2 * b).localCheckpoint(
            eager=True
        )
        pre_blocks = cached_blocks_mb(spark)
        idx2, row["bm25_dfstate_insert_sec"], dm = timed(
            spark, lambda: bm25_index_insert(idx, last)
        )
        row["bm25_dfstate_insert_shuffle_mb"] = dm["shuffle_read_mb"]
        row["bm25_dfstate_state_mb"] = round(
            cached_blocks_mb(spark) - pre_blocks, 1
        )
        if row.get("check_equality"):
            queries = docs.filter(F.col("doc_id") % 10_000 == 0).select(
                F.col("doc_id").alias("query_id"), "text"
            )
            a = sorted(
                map(
                    tuple,
                    bm25_store_topk(
                        spark, PREFIX, queries, k=5,
                        max_df_num=1, max_df_den=4,
                    ).collect(),
                )
            )
            bq = sorted(
                map(
                    tuple,
                    bm25_topk(
                        docs, queries, k=5, max_df_num=1, max_df_den=4
                    ).collect(),
                )
            )
            assert a == bq and a, "stored BM25 != scan path"
            row["bm25_store_equals_scan"] = True
    finally:
        for t in (f"{PREFIX}_postings", f"{PREFIX}_dl", f"{PREFIX}_df"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            spark.sql(f"DROP TABLE IF EXISTS {t}__alt")
        shutil.rmtree(loc, ignore_errors=True)
        docs.unpersist()


def bench_ivfpq(spark, n: int, b: int, row: dict) -> None:
    total = n + 3 * b
    emb = (
        synth_embeddings(spark, total)
        .repartition(max(32, total // 100_000))
        .localCheckpoint(eager=True)
    )
    loc = tempfile.mkdtemp(prefix="storebench_ivf_")
    try:
        train = emb.filter(F.col("vec_id") < n)
        _, row["ivf_init_sec"], _ = timed(
            spark,
            lambda: ivfpq_store_init(
                spark, PREFIX, train, num_buckets=64, location=loc
            ),
        )
        row["ivf_state_mb_after_init"] = du_mb(loc)
        for i in range(3):
            lo, hi = n + i * b, n + (i + 1) * b
            batch = emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).localCheckpoint(eager=True)
            pre = du_mb(loc)
            _, sec, m = timed(
                spark, lambda: ivfpq_store_insert(spark, PREFIX, batch)
            )
            row[f"ivf_insert{i}_sec"] = sec
            row[f"ivf_insert{i}_shuffle_mb"] = m["shuffle_read_mb"]
            row[f"ivf_insert{i}_written_mb"] = round(du_mb(loc) - pre, 1)
        # DataFrame-state single-batch cost on the accumulated corpus
        from syslog_handler_with_clickhouse_spark.operators.similarity import (
            ivfpq_build,
        )

        idx = ivfpq_build(train)
        idx = ivfpq_insert(
            idx,
            emb.filter(
                (F.col("vec_id") >= n) & (F.col("vec_id") < n + 2 * b)
            ),
        )
        last = emb.filter(F.col("vec_id") >= n + 2 * b).localCheckpoint(
            eager=True
        )
        pre_blocks = cached_blocks_mb(spark)
        idx2, row["ivf_dfstate_insert_sec"], dm = timed(
            spark, lambda: ivfpq_insert(idx, last)
        )
        row["ivf_dfstate_insert_shuffle_mb"] = dm["shuffle_read_mb"]
        row["ivf_dfstate_state_mb"] = round(
            cached_blocks_mb(spark) - pre_blocks, 1
        )
    finally:
        for t in (f"{PREFIX}_v", f"{PREFIX}_codes", f"{PREFIX}_cent",
                  f"{PREFIX}_books"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            spark.sql(f"DROP TABLE IF EXISTS {t}__alt")
        shutil.rmtree(loc, ignore_errors=True)
        emb.unpersist()


def main() -> None:
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "1000000,5000000").split(",")
    ]
    spark = get_spark("store-index-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        b = n // 100
        row: dict = {
            "n_corpus": n,
            "n_batch": b,
            "check_equality": n == min(sizes),
        }
        bench_bm25(spark, n, b, row)
        bench_ivfpq(spark, n, b, row)
        row.pop("check_equality", None)
        print("#", row, file=sys.stderr, flush=True)
        out.append(row)
    print(json.dumps({"store_index_sweep": out,
                      "loadavg": list(os.getloadavg())}))


if __name__ == "__main__":
    main()
