"""Dedup/ANN scale sweep (round-6 verdict #3): measured evidence that
MinHash-LSH candidate generation grows near-linearly with corpus size
and that PQ ANN beats the exact brute-force scan at scale.

Corpus synthesis is pure spark.range + hash arithmetic (no driver
data): each doc's text is a sequence of pseudo-words drawn from a
10k-word vocabulary by xxhash64(id-cluster, position) — docs inside a
cluster of CLUSTER_SIZE share the same base text with a per-doc suffix
perturbation, so real near-dup structure exists at every scale and the
candidate-pair count has a predictable linear shape (~choose(c,2) pairs
per cluster).  Embeddings are 64-d integer vectors from the same hash
family.

What it records, per corpus size:
- lsh: signature+banding+candidate-count wall time, n_candidates, and
  candidates-per-doc (the linearity witness: flat ≈ linear growth).
- pq vs brute: wall time of pq_topk (16 queries, top-10) vs the exact
  brute-force cosine scan over the same corpus — the crossover the
  100 TB design banks on.

Run: python scripts/scale_bench.py [sizes_csv]
     (default "1000000,2000000,5000000,10000000,20000000" for LSH and
      "1000000,2000000,5000000" for PQ/brute)
Prints one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from syslog_handler_with_clickhouse_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    minhash_signatures,
)
from syslog_handler_with_clickhouse_spark.operators.similarity import (  # noqa: E402
    cosine_topk_bruteforce,
    pq_topk,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

CLUSTER_SIZE = 10  # docs per near-dup cluster
WORDS_PER_DOC = 6
VOCAB = 10_000
DIM = 64


def synth_corpus(spark, n: int):
    """n docs: cluster-shared word sequence + one per-doc tail word."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / CLUSTER_SIZE).cast("long").alias("cl"),
    )
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("cl"), F.lit(j)), F.lit(VOCAB)),
        )
        for j in range(WORDS_PER_DOC)
    ]
    tail = F.concat(
        F.lit("t"), F.pmod(F.xxhash64("doc_id"), F.lit(VOCAB))
    )
    return base.select(
        "doc_id", F.concat_ws(" ", *words, tail).alias("text")
    )


def synth_embeddings(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)),
        ).alias("embedding"),
    )


def main() -> None:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1_000_000, 2_000_000, 5_000_000, 10_000_000, 20_000_000]
    )
    pq_sizes = [s for s in sizes if s <= 5_000_000] or sizes[:1]
    spark = get_spark("scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"loadavg_start": list(os.getloadavg()), "lsh": [], "ann": []}

    for n in sizes:
        docs = synth_corpus(spark, n)
        t0 = time.monotonic()
        sig = minhash_signatures(docs, "text", "doc_id").localCheckpoint(
            eager=True
        )
        t_sig = time.monotonic() - t0
        t0 = time.monotonic()
        n_cand = minhash_lsh_pairs(sig=sig).count()
        t_cand = time.monotonic() - t0
        sig.unpersist()
        out["lsh"].append(
            {
                "n_docs": n,
                "sig_sec": round(t_sig, 2),
                "cand_sec": round(t_cand, 2),
                "n_candidates": n_cand,
                "cand_per_doc": round(n_cand / n, 3),
            }
        )
        print(f"# lsh n={n}: sig={t_sig:.1f}s cand={t_cand:.1f}s "
              f"pairs={n_cand} ({n_cand / n:.3f}/doc)", file=sys.stderr)

    # PQ accounting split the way a serving system amortizes it:
    # (a) index build — train codebooks + encode the corpus to 8 small
    #     codes/vector (one-time, amortized over every future query);
    # (b) ADC scan — the per-query-batch cost over the ENCODED corpus;
    # (c) brute — the exact scan every query batch pays forever.
    from pyspark.sql.window import Window

    from syslog_handler_with_clickhouse_spark.operators.similarity import (
        _pq_assign,
        _pq_subvectors,
        pq_codebooks,
    )

    m_sub, n_codes, k = 8, 16, 10
    d_sub = DIM // m_sub
    for n in pq_sizes:
        emb = synth_embeddings(spark, n).localCheckpoint(eager=True)
        t0 = time.monotonic()
        sub = _pq_subvectors(emb, "vec_id", "embedding", m_sub, d_sub)
        cent = pq_codebooks(sub, m_sub, d_sub, n_codes).localCheckpoint(
            eager=True
        )
        codes = (
            _pq_assign(sub, cent)
            .select("vid", "m", "code")
            .localCheckpoint(eager=True)
        )
        t_build = time.monotonic() - t0

        queries = sub.filter(F.col("vid") < 16)
        lut_d2 = F.aggregate(
            F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        lut = (
            queries.select(F.col("vid").alias("query_id"), "m", "sv")
            .join(F.broadcast(cent), "m")
            .select("query_id", "m", "code", lut_d2.alias("part_d2"))
        )
        w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
        t0 = time.monotonic()
        n_pq = (
            codes.withColumnRenamed("vid", "neighbor_id")
            .join(F.broadcast(lut), ["m", "code"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum("part_d2").alias("adc_d2"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .count()
        )
        t_scan = time.monotonic() - t0
        t0 = time.monotonic()
        n_bf = cosine_topk_bruteforce(
            emb, k=k, query_pred=F.col("query_id") < 16
        ).count()
        t_bf = time.monotonic() - t0
        cent.unpersist()
        codes.unpersist()
        emb.unpersist()
        out["ann"].append(
            {
                "n_vecs": n,
                "pq_build_sec": round(t_build, 2),
                "pq_scan_sec": round(t_scan, 2),
                "brute_sec": round(t_bf, 2),
                "scan_speedup": round(t_bf / t_scan, 2),
                "rows_pq": n_pq,
                "rows_brute": n_bf,
            }
        )
        print(f"# ann n={n}: build={t_build:.1f}s scan={t_scan:.1f}s "
              f"brute={t_bf:.1f}s (scan {t_bf / t_scan:.1f}x)",
              file=sys.stderr)

    out["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
