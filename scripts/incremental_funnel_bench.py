"""Incremental dedup-funnel maintenance sweep (round-14 verdict
directive 1): prove the PER-BATCH claim with measurements — folding a
1 % document batch into the bucketed maintenance state
(`operators/dedup.incremental_dedup_store_insert`) must cost on the
order of the BATCH, not the corpus, while a full recompute
(star edges + dedup_components over everything) re-pays the corpus
every time.

Protocol per corpus size N:
  1. synthesize N + 3·B docs (B = N/100) with scale_bench.synth_corpus
     (10-doc near-dup clusters — batches extend and MERGE existing
     components, because a cluster's docs straddle the batch cuts);
  2. bootstrap the state with the first N docs (one big insert — this
     IS a full funnel run, recorded as the amortized baseline);
  3. fold 3 batches of B docs, recording per-insert wall seconds plus
     shuffle read/write and spill from the stage metrics;
  4. run the FULL recompute over all N + 3·B docs and record the same;
  5. at the smallest N, assert label-for-label equality between the
     maintained state and the full recompute (the q459 contract, at
     scale).

Run: python scripts/incremental_funnel_bench.py [sizes_csv]
     (default "1000000,5000000,10000000")
Prints one JSON line; paste into PERF.md and save as
incremental_scale_r14.json.
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
from syslog_handler_with_clickhouse_spark.operators.dedup import (  # noqa: E402
    dedup_components,
    incremental_dedup_store_init,
    incremental_dedup_store_insert,
    incremental_dedup_store_labels,
    minhash_lsh_star_edges,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

PREFIX = "incbench"


def timed(spark, fn):
    seen = {s["stageId"] for s in _completed_stages(spark)}
    t0 = time.perf_counter()
    out = fn()
    wall = round(time.perf_counter() - t0, 2)
    _, m = _stage_delta(spark, seen)
    return out, wall, m


def main() -> None:
    sizes = [
        int(s)
        for s in (
            sys.argv[1] if len(sys.argv) > 1 else "1000000,5000000,10000000"
        ).split(",")
    ]
    spark = get_spark("incremental-funnel-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        b = n // 100
        total = n + 3 * b
        docs = (
            synth_corpus(spark, total)
            .repartition(max(32, total // 200_000))
            .localCheckpoint(eager=True)
        )
        loc = tempfile.mkdtemp(prefix="incbench_")
        incremental_dedup_store_init(spark, PREFIX, num_buckets=64,
                                     location=loc)
        row: dict = {"n_corpus": n, "n_batch": b}
        try:
            boot = docs.filter(F.col("doc_id") < n)
            _, row["bootstrap_sec"], bm = timed(
                spark,
                lambda: incremental_dedup_store_insert(spark, PREFIX, boot),
            )
            row["bootstrap_shuffle_mb"] = bm["shuffle_read_mb"]
            for i in range(3):
                lo, hi = n + i * b, n + (i + 1) * b
                batch = docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ).localCheckpoint(eager=True)
                st: list = []
                _, sec, m = timed(
                    spark,
                    lambda: incremental_dedup_store_insert(
                        spark, PREFIX, batch, stats=st
                    ),
                )
                row[f"insert{i}_sec"] = sec
                row[f"insert{i}_shuffle_mb"] = m["shuffle_read_mb"]
                row[f"insert{i}_spill_mb"] = m.get("disk_spill_mb", 0)
                row[f"insert{i}_relabels"] = st[0]["relabeled_comps"]

            def full():
                lab = dedup_components(
                    minhash_lsh_star_edges(docs, "text", "doc_id")
                )
                return lab.count()

            row["full_labeled"], row["full_sec"], fm = timed(spark, full)
            row["full_shuffle_mb"] = fm["shuffle_read_mb"]
            row["speedup_insert_vs_full"] = round(
                row["full_sec"]
                / max(
                    1e-9,
                    sum(row[f"insert{i}_sec"] for i in range(3)) / 3,
                ),
                1,
            )

            if n == min(sizes):
                inc = incremental_dedup_store_labels(spark, PREFIX)
                full_lab = dedup_components(
                    minhash_lsh_star_edges(docs, "text", "doc_id")
                )
                ids = docs.select(F.col("doc_id").alias("node"))
                fl = ids.join(full_lab, "node", "left").select(
                    "node",
                    F.coalesce("comp", F.col("node")).alias("comp"),
                )
                mism = (
                    inc.withColumnRenamed("comp", "ic")
                    .join(fl, "node")
                    .filter(F.col("ic") != F.col("comp"))
                    .count()
                )
                row["label_mismatches"] = mism
                assert mism == 0, f"incremental != full at n={n}"
        finally:
            for t in (f"{PREFIX}_buckets", f"{PREFIX}_labels",
                      f"{PREFIX}_relabel"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(loc, ignore_errors=True)
            docs.unpersist()
        print("#", row, file=sys.stderr, flush=True)
        out.append(row)
    print(json.dumps({"incremental_sweep": out,
                      "loadavg": list(os.getloadavg())}))


if __name__ == "__main__":
    main()
