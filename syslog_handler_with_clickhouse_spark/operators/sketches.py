"""Mergeable frequency-sketch operators (ClickHouse approximate ``topK``
— the SpaceSaving/Misra-Gries family).

Exact heavy hitters need a full groupBy shuffle of every key.  The
Misra-Gries summary bounds state at k counters PER PARTITION, shuffles
only k rows per partition, and still guarantees:

- undercount only: for any key v, est(v) ≥ exact(v) − err_total, where
  err_total = Σ_i ⌊n_i/(k+1)⌋ over partitions (each partition's decrement
  rounds);
- any key absent from the merged summary has exact(v) ≤ err_total;
- every key with exact(v) > err_total is PRESENT in the summary (the
  heavy-hitter capture guarantee).

This is the 100 TB shape for "top user agents / IPs / devices" over a
key space too large to group exactly: map-side O(k) state, one tiny
shuffle, provable bounds.  Arrow-batched via mapInPandas — the per-row
Python loop touches only the local batch, never the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summarize(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries, merged by key.

    Returns one row per surviving key: ``(value, est, err_total)`` where
    ``est`` is the summed counter (a lower bound on the exact count) and
    ``err_total`` the global undercount bound.  ``est ≤ exact ≤ est +
    err_total`` for present keys; ``exact ≤ err_total`` for absent ones.
    """
    import pandas as pd

    out_schema = "pid long, value string, cnt long, err long"

    def summarize(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict = {}
        n = 0
        for pdf in batches:
            for v in pdf[col].astype(str):
                n += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        err = n // (k + 1)
        # always emit ≥1 row so this partition's error bound is counted
        vals = list(counters) or [None]
        cnts = [counters[v] for v in counters] or [0]
        yield pd.DataFrame(
            {"pid": pid, "value": vals, "cnt": cnts, "err": err}
        )

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, out_schema
    )
    # one error bound per partition (constant within it) → sum across
    per_pid_err = summaries.groupBy("pid").agg(F.max("err").alias("perr"))
    err_total = per_pid_err.agg(F.sum("perr").alias("err_total"))
    merged = (
        summaries.filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.sum("cnt").alias("est"))
    )
    return merged.crossJoin(F.broadcast(err_total))
