"""Retrieval-tier scale sweep (round-12 verdict directive 4): q394's
``bm25_topk`` and q413's RRF fusion (BM25 leg + shingle-Jaccard leg)
measured at 1 M - 20 M documents with a FIXED 2 000-query workload, so
the growth curves isolate the corpus side:

- postings rows (distinct (doc, token)) must grow ~linearly in docs;
- the scored join fan-out — Σ over query terms of posting-list length —
  is THE number the max_df stop-term cap must bound: the sweep records
  the capped fan-out AND the analytic uncapped fan-out (computable from
  the df table without running the explosion), so the cap's effect is a
  measured ratio, not prose;
- wall time is median-of-3 warm runs (cc_scale protocol), with total
  shuffle read/write attributed from the Spark UI REST stage metrics.

Corpus: scripts/scale_bench.synth_corpus (10-doc clusters sharing a
word sequence + a per-doc tail) — the same fixture family every other
sweep in this repo uses, so cross-sweep numbers are comparable.

Run: python scripts/bm25_scale_bench.py [sizes_csv]
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

from scripts.funnel_scale_bench import _stage_delta  # noqa: E402
from scripts.scale_bench import synth_corpus  # noqa: E402
from syslog_handler_with_clickhouse_spark.functions.text import (  # noqa: E402
    TOKEN_RE,
)
from syslog_handler_with_clickhouse_spark.metrics import (  # noqa: E402
    _completed_stages,
)
from syslog_handler_with_clickhouse_spark.operators.dedup import (  # noqa: E402
    _size_floor,
)
from syslog_handler_with_clickhouse_spark.operators.retrieval import (  # noqa: E402
    bm25_topk,
    rrf_hybrid_topk,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

N_QUERIES = 2_000

_ADV_KEY = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def scoped(spark, est_df, fn):
    """Run ``fn`` (which performs its own actions) under a shuffle
    width floored from ``est_df``'s plan estimate + the 4 MB AQE
    advisory — the funnel script's posture, for the SCRIPT's own
    composition stages (the size witnesses and the RRF jaccard leg;
    bm25_topk scopes itself since round 13)."""
    sess = spark.conf.get("spark.sql.shuffle.partitions")
    adv = spark.conf.get(_ADV_KEY)
    w = max(int(sess), _size_floor(est_df))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(w))
        spark.conf.set(_ADV_KEY, str(4 << 20))
        return fn()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", sess)
        spark.conf.set(_ADV_KEY, adv)


BOILERPLATE = (
    "standard legal disclaimer applies to this document in every "
    "respect always"
)


def main():
    sizes = [
        int(s)
        for s in (
            sys.argv[1]
            if len(sys.argv) > 1
            else "1000000,5000000,10000000,20000000"
        ).split(",")
    ]
    # --boilerplate: append a shared 11-word chunk to every 50th doc —
    # a web-corpus boilerplate family.  Query docs (every n/2000th)
    # land on the same stride, so the UNCAPPED jaccard leg fans every
    # query's boilerplate shingles across the whole family (the
    # hot-shingle blow-up q458's cap exists for); the capped leg drops
    # them at df > 4.
    boiler = "--boilerplate" in sys.argv
    spark = get_spark("bm25-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        # synthesize at ~200k rows/partition (the funnel script's
        # realism fix): spark.range's 32-partition default puts n/32-row
        # PARTIAL aggregates on every downstream map task — a 5M-doc
        # run measured 1.6 GB of map-side disk spill from that alone,
        # which a real multi-split scan would never produce
        docs = synth_corpus(spark, n)
        if boiler:
            docs = docs.select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 50 == 0,
                    F.concat_ws(" ", "text", F.lit(BOILERPLATE)),
                ).otherwise(F.col("text")).alias("text"),
            )
        docs = (
            docs.repartition(max(32, n // 200_000))
            .localCheckpoint(eager=True)
        )
        step = max(1, n // N_QUERIES)
        queries_df = docs.filter(F.col("doc_id") % step == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        row: dict = {"n_docs": n, "n_queries": queries_df.count()}

        # size witnesses (untimed, once): postings linearity + the
        # max_df cap's measured effect on the join fan-out
        tok = docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_RE), 0
                )
            ).alias("token"),
        )
        postings = tok.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).alias("tf")
        )
        row["n_postings"] = scoped(spark, tok, postings.count)
        df_ = postings.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
        qterms = queries_df.select(
            "query_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_RE), 0
                )
            ).alias("token"),
        ).distinct()
        fan_agg = qterms.join(df_, "token").agg(
            F.sum("dfreq").alias("uncapped"),
            F.sum(
                F.when(F.col("dfreq") * 4 <= F.lit(row["n_docs"]), F.col("dfreq"))
            ).alias("capped"),
        )
        fan = scoped(spark, tok, lambda: fan_agg.collect())[0]
        row["fanout_uncapped"] = int(fan.uncapped or 0)
        row["fanout_capped"] = int(fan.capped or 0)

        # timed: median-of-3 warm runs, shuffle attributed per run
        # in --boilerplate mode both RRF variants run a TIGHT BM25-leg
        # cap (1/100 — the boilerplate tokens are 2 % of docs, so the
        # default 9/10 leg would drown both variants in the SAME
        # token fan-out and mask the jaccard-leg delta the comparison
        # exists to isolate); the standalone bm25 timing is skipped
        # there (it measures the token cap, already witnessed by
        # fanout_uncapped/fanout_capped)
        bm = dict(bm25_max_df_num=1, bm25_max_df_den=100) if boiler else {}
        timings = [] if boiler else [
            ("bm25", lambda: bm25_topk(docs, queries_df, k=5).count()),
        ]
        timings += [
            # bm25_topk and rrf_hybrid_topk derive their own widths
            # (round 14: the RRF composition moved into the operator)
            ("rrf", lambda: rrf_hybrid_topk(
                docs, queries_df, k_leg=20, k_out=3, **bm
            ).count()),
            # q458's capped form: jaccard_max_df=4 drops the
            # cluster-shared body shingles (df ~= CLUSTER_SIZE) and
            # the planted boilerplate family — the spill/wall delta
            # vs "rrf" is the contract's measured payoff
            ("rrf_capped", lambda: rrf_hybrid_topk(
                docs, queries_df, k_leg=20, k_out=3, jaccard_max_df=4,
                **bm
            ).count()),
        ]
        for name, frame_fn in timings:
            walls, shuf = [], []
            for _ in range(3):
                seen = {s["stageId"] for s in _completed_stages(spark)}
                t0 = time.perf_counter()
                n_rows = frame_fn()
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
        row["boilerplate"] = boiler
        print("#", row, file=sys.stderr, flush=True)
        out.append(row)
        docs.unpersist()
    print(json.dumps({"bm25_sweep": out, "loadavg": list(os.getloadavg())}))


if __name__ == "__main__":
    main()
