"""Curation-funnel 100× rehearsal (round-9 directive 5 / round-10
verdict directive 2): compose the verified funnel kernels —
q430 Gopher quality gate → q36 exact dedup → q39/q334 MinHash-LSH +
connected components → q379 packing arithmetic — over a 10–50 M-doc
synthetic corpus and record, PER STAGE, wall seconds plus the runtime
truth the plan pins can't show: total shuffle read/write bytes, the
single heaviest shuffle stage, and memory/disk spill.

Corpus synthesis is pure spark.range + hash arithmetic (the
scripts/scale_bench.py family): clusters of 10 docs share a 6-word
base; docs with id%5==0 drop their unique tail for a CLUSTER-shared
one (2 exact duplicates per cluster for the md5 stage); docs with
id%23==0 are 3-word stubs that fail the Gopher word-count gate; all
others carry the 'the a' stop-word prefix the Gopher rule wants.
Every rate is therefore closed-form checkable:

  quality survivors ≈ n·22/23, exact-unique removes ~1/10 of
  survivors, LSH candidates ≈ choose(10,2)-ish per cluster band hit,
  components ≈ one per cluster.

Run: python scripts/funnel_scale_bench.py [sizes_csv]
     (default "10000000,50000000")
Prints one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# big-frame checkpoints store SERIALIZED: deserialized row objects for
# 10M docs are what pressured the 8g default heap (round-12 rehearsal)
_CK = dict(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)

from syslog_handler_with_clickhouse_spark.functions.text import (  # noqa: E402
    gopher_rules,
)
from syslog_handler_with_clickhouse_spark.metrics import (  # noqa: E402
    _completed_stages,
)
from syslog_handler_with_clickhouse_spark.operators.dedup import (  # noqa: E402
    _size_floor,
    dedup_components,
    minhash_lsh_star_edges,
    minhash_signatures,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

CLUSTER_SIZE = 10
WORDS_PER_DOC = 6
VOCAB = 10_000


def synth_funnel_corpus(spark, n: int):
    """n docs with quality failures, exact duplicates, and near-dup
    clusters — every funnel stage has real work to do.

    Synthesized at ~200 k rows per partition: a real corpus of this
    size scans in thousands of file splits, and the 32-partition
    default of ``spark.range`` was the one unrealistic posture left —
    it put 1.5 M-row PARTIAL aggregates on every downstream map task
    (the 50 M-doc exact-dedup stage's measured 12 GB map-side spill)."""
    base = spark.range(0, n, 1, max(32, n // 200_000)).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / CLUSTER_SIZE).cast("long").alias("cl"),
        F.concat(F.lit("s"), F.pmod(F.col("id"), F.lit(4))).alias("source"),
    )
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("cl"), F.lit(j)), F.lit(VOCAB)),
        )
        for j in range(WORDS_PER_DOC)
    ]
    tail = F.when(
        F.col("doc_id") % 5 == 0,  # exact-dup pair inside the cluster
        F.concat(F.lit("d"), F.pmod(F.xxhash64("cl"), F.lit(VOCAB))),
    ).otherwise(
        F.concat(F.lit("t"), F.pmod(F.xxhash64("doc_id"), F.lit(VOCAB)))
    )
    text = F.when(
        F.col("doc_id") % 23 == 0,  # 3-word stub: fails the quality gate
        F.concat_ws(" ", words[0], words[1], tail),
    ).otherwise(F.concat_ws(" ", F.lit("the"), F.lit("a"), *words, tail))
    return base.select("doc_id", "source", text.alias("text"))


def _stage_delta(spark, before_ids: set) -> tuple[set, dict]:
    """Aggregate shuffle/spill metrics over stages completed since
    ``before_ids``; returns (new_id_set, metrics)."""
    stages = _completed_stages(spark)
    ids = {s["stageId"] for s in stages}
    new = [s for s in stages if s["stageId"] not in before_ids]

    def tot(key):
        return sum(int(s.get(key, 0) or 0) for s in new)

    return ids, {
        "n_stages": len(new),
        "shuffle_read_mb": round(tot("shuffleReadBytes") / 1e6, 1),
        "shuffle_write_mb": round(tot("shuffleWriteBytes") / 1e6, 1),
        "peak_stage_shuffle_mb": round(
            max(
                (int(s.get("shuffleReadBytes", 0) or 0) for s in new),
                default=0,
            )
            / 1e6,
            1,
        ),
        "mem_spill_mb": round(tot("memoryBytesSpilled") / 1e6, 1),
        "disk_spill_mb": round(tot("diskBytesSpilled") / 1e6, 1),
    }


def run_funnel(spark, n: int) -> dict:
    docs = synth_funnel_corpus(spark, n)
    out: dict = {"n_docs": n, "stages": {}}
    seen = {s["stageId"] for s in _completed_stages(spark)}

    def scoped(est_df, fn):
        """Run ``fn`` (which performs its own actions) with the
        session shuffle width floored from ``est_df``'s plan size and a
        4 MB AQE advisory — the same posture the dedup operators derive
        internally (operators/dedup.py), applied here to the SCRIPT's
        own composition stages (md5 group-by, survivor join), which
        were the only spillers left at 50 M docs."""
        sess = spark.conf.get("spark.sql.shuffle.partitions")
        adv = spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        )
        w = max(int(sess), _size_floor(est_df))
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(w))
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                str(4 << 20),
            )
            return fn()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", sess)
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", adv
            )

    def stage(name, fn):
        nonlocal seen
        t0 = time.perf_counter()
        result = fn()
        wall = round(time.perf_counter() - t0, 1)
        seen, m = _stage_delta(spark, seen)
        m["wall_sec"] = wall
        out["stages"][name] = m
        print(f"# {name}: {m}", file=sys.stderr, flush=True)
        return result

    # 1. Gopher quality gate (q430 kernel) — row-local projection
    def s_quality():
        r = gopher_rules(F.col("text"), min_words=5)
        q = docs.select(
            "doc_id",
            "source",
            "text",
            F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
        ).filter(
            r["r_word_count"] & r["r_mean_word_len"] & r["r_stop_words"]
        )
        q = q.localCheckpoint(**_CK)
        out["n_quality"] = q.count()
        return q

    q = stage("quality", s_quality)

    # 2. exact dedup (q36 kernel) — one digest-keyed shuffle
    def s_exact():
        u = (
            q.groupBy(F.md5("text").alias("h"))
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min("source").alias("source"),
                F.first("text").alias("text"),
                F.min("n_words").alias("n_words"),
            )
            .drop("h")
        )
        u = u.localCheckpoint(**_CK)
        out["n_unique"] = u.count()
        return u

    u = stage("exact_dedup", lambda: scoped(q, s_exact))

    # 3. MinHash signatures + LSH banding — STAR EDGES since round 13
    # (q456 kernel): the funnel's only candidate consumer is the
    # component closure, so per-bucket (min, member) edges replace the
    # all-pairs emission — Σb not Σb² rows, identical components
    def s_lsh():
        sig = minhash_signatures(u, "text", "doc_id")
        pairs = minhash_lsh_star_edges(sig=sig).localCheckpoint(**_CK)
        out["n_candidates"] = pairs.count()
        return pairs

    pairs = stage("lsh_candidates", s_lsh)

    # 4. connected components over the candidate graph (q334 kernel)
    def s_cc():
        stats: list = []
        labels = dedup_components(pairs, stats=stats)
        labels = labels.localCheckpoint(**_CK)
        row = labels.agg(
            F.count(F.lit(1)).alias("nodes"),
            F.countDistinct("comp").alias("comps"),
        ).collect()[0]
        out["cc_nodes"] = int(row.nodes)
        out["cc_components"] = int(row.comps)
        out["cc_rounds"] = len(stats)
        # per-round contraction record (round-12 verdict directive 1:
        # show CC round 1 shrinking once the candidates are star edges)
        out["cc_round_stats"] = stats
        return labels

    labels = stage("components", s_cc)

    # 5. survivors + packing arithmetic (q379 kernel): keep one doc per
    # component (its minimum), every unclustered doc, then the 512-token
    # greedy-concat sequence count per source
    def s_pack():
        keep = labels.filter(F.col("node") == F.col("comp")).select(
            F.col("node").alias("doc_id")
        )
        solo = u.join(
            labels.select(F.col("node").alias("doc_id")), "doc_id",
            "left_anti",
        ).select("doc_id")
        surv = u.join(keep.unionByName(solo), "doc_id")
        packed = surv.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("tokens"),
            (
                (F.sum("n_words") + 511)
                - (F.sum("n_words") + 511) % 512
            ).cast("bigint").alias("_r"),
        )
        rows = packed.select(
            "source", "n_docs", "tokens", (F.col("_r") / 512).cast("bigint")
        ).collect()
        out["n_survivors"] = int(sum(r.n_docs for r in rows))
        out["tokens_kept"] = int(sum(r.tokens for r in rows))
        return rows

    stage("pack", lambda: scoped(u, s_pack))
    out["wall_total_sec"] = round(
        sum(s["wall_sec"] for s in out["stages"].values()), 1
    )
    return out


def main() -> None:
    sizes = [
        int(s)
        for s in (
            sys.argv[1] if len(sys.argv) > 1 else "10000000,50000000"
        ).split(",")
    ]
    spark = get_spark("funnel-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Spill posture: since round 12 the heavy dedup operators derive
    # their own shuffle-partition floor from plan-estimated input size
    # (`operators/dedup.py:_size_floor` + the in-loop width in
    # `dedup_components`), so this env knob is an explicit OVERRIDE for
    # experiments, not a requirement — repo defaults are expected to
    # complete the 10 M-doc funnel without it (round-11 verdict
    # directive 2).
    parts = os.environ.get("SPARK_GRAFT_FUNNEL_PARTITIONS")
    if parts:
        spark.conf.set("spark.sql.shuffle.partitions", parts)
    results = {
        "loadavg_start": list(os.getloadavg()),
        "shuffle_partitions": int(
            spark.conf.get("spark.sql.shuffle.partitions")
        ),
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "funnel": [],
    }
    for n in sizes:
        results["funnel"].append(run_funnel(spark, n))
    results["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
