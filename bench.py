"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative heavy queries across the operator surface.
HEADLINE = [
    "q01_pricing_summary",   # scan + hash agg
    "q109_tpch_q6",          # pure scan-throughput probe (TPC-H Q6)
    "q11_agg_basic",         # high-cardinality group-by
    "q14_percentiles",       # exact percentiles
    "q17_topk_per_group",    # window rank
    "q22_join_large",        # fact-fact shuffle join
    "q25_outer_join",        # outer join + agg
    "q26_range_join",        # equi+range self-join
    "q27_asof_join",         # as-of via union+window
    "q30_window_frames",     # running frames
    "q34_explode_wordcount", # explode + agg
    "q38_jaccard_pairs",     # near-dup inverted-index join
    "q39_minhash_lsh",       # minhash signatures + banding
    "q41_simsearch_brute",   # brute-force cosine top-k
    "q48_window_tumbling",   # time-window agg
    "q50_session_window",    # session windows
    "q51_parse_syslog",      # the reference parse path
    "q56_shipping_priority", # TPC-H Q3 3-way join + top-N
    "q57_local_supplier_volume",  # TPC-H Q5 6-way join
    "q60_embedding_neardup", # LSH-blocked cosine near-dup
    "q70_stream_ingest_store",  # full streaming ingest -> store -> read
    "q133_tpch_q13",         # outer join + double aggregation
    "q136_tpch_q19",         # disjunctive CNF pushdown join
    "q137_tpch_q21",         # semi+anti join tree (EXISTS/NOT EXISTS)
]


# Flagship LLM-data-pipeline tier (round-10 directive 1): the dedup/ANN/
# retrieval/curation operators were previously invisible to the driver's
# round-over-round bench — a regression there showed up nowhere.  Same
# 3-run-median protocol, reported as a second suite in the SAME JSON line.
LLM_TIER = [
    "q39_minhash_lsh",        # MinHash signatures + LSH banding join
    "q334_dedup_components",  # connected components over dup pairs
    "q369_kmeans_clusters",   # k-means assignment (broadcast projection)
    "q394_bm25_retrieval",    # inverted-index BM25 top-k
    "q407_cdc_chunking",      # content-defined chunking dedup
    "q431_c4_line_filters",   # C4 line rules, feature-only exchanges (r11)
    "q433_line_dedup",        # CCNet-style cross-doc line dedup
    "q446_curation_funnel",   # end-to-end quality->dedup->pack funnel
    "q453_gopher_repetition", # Gopher dup-line/top-bigram repetition (r11)
    "q454_dsir_importance",   # DSIR hashed-ngram LLR data selection (r11)
    "q465_bm25_store_index",  # stored BM25 index: 3 appends + topk (r15)
    "q466_ivfpq_store_index", # stored IVF-PQ: init+2 appends+scan (r15)
    "q469_bm25_store_auto_compact",   # guarded appends + auto-compact (r16)
    "q470_ivfpq_store_sampled_train", # sampled-train init + compacts (r16)
    # ADDED round 17 (additive — no existing entry removed/renamed):
    # the end-to-end corpus pipeline (quality gate -> exact dedup ->
    # jaccard near-dup -> components -> survivors).  Round 17 found it
    # running 4313-partition shuffles off a join-inflated Catalyst
    # estimate (127 s at sf0.01 for ~1 MB of corpus); benching it keeps
    # the width-floor clamp honest round-over-round.
    "q84_corpus_pipeline",
]
# q389 IVF-PQ is benched as TWO phases (round-10 directive 5): the old
# fused q389_ivfpq_ann number (6.26 s in BENCH_r10) mixed one-time index
# construction with the per-query-batch scan, so a regression in either
# was invisible.  See _bench_ivfpq_split.

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Round-10 directive 7: a contended host makes bench artifacts lie (three
# separate rounds spent re-adjudicating phantom regressions).  Flag the
# artifact as noisy when the box is already loaded BEFORE the run starts.
NOISY_LOADAVG = float(os.environ.get("SPARK_GRAFT_NOISY_LOADAVG", "2.0"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _suite_plan(names: list[str], already: set) -> tuple[list, list]:
    """Split a suite into (run, reused): names already timed by an
    earlier suite are REUSED, not re-run — re-running overwrote the
    first suite's runs_detail samples with the second's, making the
    artifact self-inconsistent (round-10 ADVICE item 3), and burned
    three redundant timed runs."""
    run = [n for n in names if n not in already]
    reused = [n for n in names if n in already]
    return run, reused


def main() -> None:
    # Environment honesty (round-5 verdict nit 1: the official r5
    # artifact was produced on a busy box and read as a phantom 26%
    # regression): record load BEFORE the run so a contended artifact is
    # self-describing, and again after (the suite itself loads all
    # cores, so the END loadavg mostly reflects the bench's own work).
    loadavg_start = os.getloadavg()
    t_import = time.time()
    from syslog_handler_with_clickhouse_spark.queries import QUERIES
    from syslog_handler_with_clickhouse_spark.session import get_spark

    spark = get_spark("syslog-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers with a trivial action (not timed).
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    t_ready = time.time()

    # Median-of-RUNS per query: the single-run harness had ±30%+ variance on
    # a contended box (round-3 verdict adjudicated a false 2.1× regression
    # alarm) — medians make one noisy run invisible.
    all_runs: dict[str, list[float]] = {}
    rows: dict[str, int] = {}

    def run_suite(names: list[str]) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            fn = QUERIES[name]
            samples: list[float] = []
            for i in range(RUNS):
                t0 = time.time()
                df = fn(spark, SF_DIR)
                # noop sink: evaluates EVERY output column (count() lets
                # Catalyst prune unused projections, which under-measured
                # projection-only queries such as q51_parse_syslog —
                # round-4 verdict item 1).
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
                if i == 0:
                    # row count reported for context / ingest rate; untimed.
                    rows[name] = df.count()
            all_runs[name] = samples
            timings[name] = round(_median(samples), 3)
            print(
                f"# {name}: median={timings[name]:.3f}s runs={samples} "
                f"rows={rows[name]}",
                file=sys.stderr,
            )
        return timings

    def bench_ivfpq_split() -> dict[str, float]:
        """q389 in two phases.  Build is timed to a fully MATERIALIZED,
        cached index (every frame counted); scan runs against that
        cache, so its number is pure probe + ADC + rerank cost."""
        from pyspark.sql import functions as F

        from syslog_handler_with_clickhouse_spark.operators.similarity import (
            ivfpq_build,
            ivfpq_scan,
        )
        from syslog_handler_with_clickhouse_spark.queries.clustering import (
            q389_corpus,
        )

        corpus = q389_corpus(spark, SF_DIR)
        qpred = (F.col("vid") % 50 == 0) & (F.col("vid") < 1000000)
        build_s: list[float] = []
        scan_s: list[float] = []
        index: dict = {}
        for i in range(RUNS):
            for df in index.values():
                df.unpersist()
            t0 = time.time()
            index = {k: df.cache() for k, df in ivfpq_build(corpus).items()}
            for df in index.values():
                df.count()
            build_s.append(round(time.time() - t0, 3))
            t0 = time.time()
            scan = ivfpq_scan(index, k=10, query_pred=qpred)
            scan.write.format("noop").mode("overwrite").save()
            scan_s.append(round(time.time() - t0, 3))
            if i == 0:
                rows["q389_scan"] = scan.count()
        for df in index.values():
            df.unpersist()
        all_runs["q389_build"] = build_s
        all_runs["q389_scan"] = scan_s
        out = {
            "q389_build": round(_median(build_s), 3),
            "q389_scan": round(_median(scan_s), 3),
        }
        for name in ("q389_build", "q389_scan"):
            print(
                f"# {name}: median={out[name]:.3f}s runs={all_runs[name]}",
                file=sys.stderr,
            )
        return out

    def run_scale_lane() -> dict[str, float]:
        """Round-18 additive SCALE LANE (VERDICT r17 'next round' #8):
        every headline query is sub-second at sf0.1 and dominated by
        per-query fixed overhead, so the driver's low-core/high-core
        comparison measured session overhead, not parallelism (all 24
        c8/c32 ratios ≈ 1).  This entry duplicates the documents corpus
        24× under disjoint id ranges and runs the CPU-heavy minhash
        signature+banding tier on it — a multi-second compute-bound job
        whose core ratio carries real signal (measured on this box:
        7.8 s at 32 cores vs 22.2 s at 8 → ratio 2.85; bm25 and
        winnowing lanes were tried and REJECTED as latency-bound at
        this volume — ratios 1.0/1.2).  Additive only: reported in
        "queries"/"runs_detail" but NOT in "value", so
        headline_suite_seconds stays comparable with every earlier
        BENCH artifact."""
        from pyspark.sql import functions as F

        from syslog_handler_with_clickhouse_spark.operators import dedup

        def corpus():
            d = spark.read.parquet(
                os.path.join(SF_DIR, "documents.parquet")
            ).select("doc_id", "text")
            out = None
            for rep in range(24):
                part = d.select(
                    (F.col("doc_id") + F.lit(rep * 10_000_000)).alias(
                        "doc_id"
                    ),
                    "text",
                )
                out = part if out is None else out.unionByName(part)
            return out

        out: dict[str, float] = {}
        name = "scale24x_minhash_bands"
        samples = []
        for i in range(RUNS):
            t0 = time.time()
            df = dedup.minhash_bands(
                dedup.minhash_signatures(corpus(), "text", "doc_id")
            )
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            if i == 0:
                rows[name] = df.count()
        all_runs[name] = samples
        out[name] = round(_median(samples), 3)
        print(
            f"# {name}: median={out[name]:.3f}s runs={samples} "
            f"rows={rows[name]}",
            file=sys.stderr,
        )
        return out

    timings = run_suite(HEADLINE)
    # overlapping names reuse the headline timing (round-10 ADVICE 3:
    # re-running overwrote runs_detail and produced a self-inconsistent
    # artifact)
    llm_run, llm_reused = _suite_plan(LLM_TIER, set(timings))
    llm_timings = run_suite(llm_run)
    for name in llm_reused:
        llm_timings[name] = timings[name]
    llm_timings.update(bench_ivfpq_split())
    llm_timings = {k: llm_timings[k] for k in sorted(llm_timings)}

    # headline total FIRST (the scale lane is reported beside the
    # headline queries but never counted into the comparable total)
    total = round(sum(timings.values()), 3)
    timings.update(run_scale_lane())
    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    ingest = "q70_stream_ingest_store"
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": {k: v for k, v in timings.items()},
        # second suite: flagship LLM-pipeline operators (directive 1).
        # Kept OUT of "value" so headline_suite_seconds stays comparable
        # with BENCH_r01..r09; regressions here are judged per-query.
        "llm_queries": {k: v for k, v in llm_timings.items()},
        "llm_suite_seconds": round(sum(llm_timings.values()), 3),
        "sf": float(sf_match.group(1).rstrip(".")) if sf_match else None,
        "runs": RUNS,
        "runs_detail": all_runs,
        "startup_sec": round(t_ready - t_import, 3),
        # reference capacity envelope is >=500 rows/s (BASELINE.md) — this is
        # the full stream-parse-store-readback path, not just the socket read
        "ingest_rows_per_sec": round(rows[ingest] / timings[ingest], 1)
        if timings.get(ingest)
        else None,
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "cpus_host": os.cpu_count(),
        # directive 7: self-describing contention flag — when the box was
        # already loaded before the run, timings here are NOT comparable
        # round-over-round (32-thread width degrades 2-4× under external
        # load, PERF.md round-6); don't re-litigate noise as regression.
        "noisy": loadavg_start[0] > NOISY_LOADAVG,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
