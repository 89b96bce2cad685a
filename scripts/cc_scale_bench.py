"""Connected-components scale sweep (round-7 verdict #3): run q334's
``dedup_components`` on the SAME synthetic LSH candidate graphs the
round-7 dedup sweep measured (scripts/scale_bench.py corpus: 10-doc
near-dup clusters, ~4.37 candidates/doc), at 1 M - 20 M docs, and
record rounds-to-converge plus per-round wall time.

The expectation that makes this a scale witness: near-dup clusters are
near-cliques, so one large-star round collapses most clusters onto
their min and the alternating-star edge set CONTRACTS — round 1 costs
one join over the full candidate edge set, later rounds only the
remnant (`operators/dedup.py:_star_half_round`, plan-pinned by
test_plans.py::test_star_round_exchanges_key_on_join_keys_only; the
round-12 rewrite of the static-edge min-label loop the round-11
rehearsal measured at 84 GB cumulative shuffle / 50 M docs).

Run: python scripts/cc_scale_bench.py [sizes_csv]
Prints one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_bench import synth_corpus  # noqa: E402
from syslog_handler_with_clickhouse_spark.operators.dedup import (  # noqa: E402
    dedup_components,
    minhash_lsh_pairs,
    minhash_signatures,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402


def main():
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else
                  "1000000,5000000,10000000,20000000").split(",")
    ]
    spark = get_spark("cc-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        docs = synth_corpus(spark, n)
        t0 = time.perf_counter()
        sig = minhash_signatures(docs, "text", "doc_id")
        pairs = minhash_lsh_pairs(sig=sig).localCheckpoint(eager=True)
        n_edges = pairs.count()
        cand_sec = round(time.perf_counter() - t0, 1)
        stats: list = []
        t0 = time.perf_counter()
        labels = dedup_components(pairs, stats=stats)
        agg = labels.agg(
            F.count(F.lit(1)).alias("nodes"),
            F.countDistinct("comp").alias("comps"),
        ).collect()[0]
        cc_sec = round(time.perf_counter() - t0, 1)
        row = {
            "n_docs": n,
            "n_edges": n_edges,
            "cand_sec": cand_sec,
            "cc_sec": cc_sec,
            "rounds": len(stats),
            "round_secs": [s["sec"] for s in stats],
            "round_edges": [s.get("edges") for s in stats],
            "nodes": int(agg.nodes),
            "components": int(agg.comps),
        }
        print("#", row, file=sys.stderr, flush=True)
        out.append(row)
    print(json.dumps({"cc_sweep": out}))


if __name__ == "__main__":
    main()
