"""Corpus-quality-family scale sweep: Gopher rule matrix (q430 kernel),
C4 line pipeline (q431 shape), and CCNet line dedup (q433 shape) on
synthetic corpora well past fixture scale.

Expectations that make this a scale witness:
- gopher_rules: row-local string arithmetic + one source-keyed
  aggregate -> linear in documents.
- C4 shred: posexplode (docs x 40 words) + (doc, line)-keyed rebuild +
  doc/source aggregates -> linear in total words.
- line dedup: one line-keyed count aggregate + join-back -> linear in
  lines; boilerplate keys are hot but carry counts, not text.

Run: python scripts/quality_scale_bench.py [sizes_csv]
Prints one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from syslog_handler_with_clickhouse_spark.functions.text import (  # noqa: E402
    gopher_rules,
)
from syslog_handler_with_clickhouse_spark.session import get_spark  # noqa: E402

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "a the line customer query window data group big vector join small "
    "order column stream filter sort"
).split()


def _docs(spark, n):
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.element_at(
            vocab, (F.pmod(F.xxhash64(F.col("id"), i), F.lit(30)) + 1).cast("int")
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 20).cast("string").alias("source"),
        F.concat_ws(" ", words).alias("text"),
    )


def main():
    sizes = [
        int(s)
        for s in (
            sys.argv[1].split(",") if len(sys.argv) > 1 else ["1000000", "4000000"]
        )
    ]
    spark = get_spark("quality-scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in sizes:
        docs = _docs(spark, n)

        t0 = time.time()
        rules = gopher_rules(F.col("text"))
        g = (
            docs.select("source", *[c.alias(k) for k, c in rules.items()])
            .groupBy("source")
            .agg(
                *[
                    F.sum(F.when(F.col(k), 1).otherwise(0)).alias(f"p_{k}")
                    for k in rules
                ]
            )
            .count()
        )
        t_gopher = time.time() - t0

        t0 = time.time()
        from syslog_handler_with_clickhouse_spark.functions.text import (
            shred_lines,
        )

        lines = shred_lines(docs)
        keep = F.col("line").like("%e%") & (F.col("nw") >= 5)
        c4 = (
            lines.groupBy("doc_id", "source")
            .agg(F.sum(F.when(keep, 1).otherwise(0)).alias("kept"))
            .groupBy("source")
            .agg(F.sum("kept").alias("k"), F.count(F.lit(1)).alias("d"))
            .count()
        )
        t_c4 = time.time() - t0

        t0 = time.time()
        content = lines.select("doc_id", "source", "line")
        boiler = docs.select(
            "doc_id",
            "source",
            F.concat(F.lit("subscribe to "), F.col("source")).alias("line"),
        )
        all_lines = content.unionByName(boiler)
        df_t = all_lines.groupBy("line").agg(
            F.countDistinct("doc_id").alias("line_df")
        )
        dd = (
            all_lines.join(df_t, "line")
            .groupBy("source")
            .agg(
                F.sum(F.when(F.col("line_df") < 20, 1).otherwise(0)).alias("kept"),
                F.count(F.lit(1)).alias("total"),
            )
            .count()
        )
        t_dedup = time.time() - t0

        out.append(
            {
                "docs": n,
                "gopher_s": round(t_gopher, 2),
                "c4_shred_s": round(t_c4, 2),
                "line_dedup_s": round(t_dedup, 2),
                "groups": {"gopher": g, "c4": c4, "dedup": dd},
            }
        )
        print(json.dumps(out[-1]), file=sys.stderr)
    print(json.dumps({"sweep": out}))
    spark.stop()


if __name__ == "__main__":
    main()
