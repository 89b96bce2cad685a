"""Kendall tau-b rank correlation — the last everyday rank statistic
missing beside Spearman (q194): ClickHouse ``kendallTau`` semantics
with full tie correction.

Algorithm (Knight 1966, the O(n log n) form every serious
implementation uses instead of the O(n^2) pair scan):

1. sort pairs by (x, y);
2. tie terms: n1 = sum over x-tie groups t(t-1)/2, n3 = sum over
   (x,y)-tie groups t(t-1)/2, n2 = sum over y-tie groups;
3. S = number of y inversions under the x-sort (merge-sort count);
4. concordant - discordant = n0 - n1 - n2 + n3 - 2S with
   n0 = n(n-1)/2;
5. tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)).

Scale posture: per-GROUP computation inside ``applyInPandas`` — the
group's (x, y) pairs are the state, the same sample-bounded contract
as the q196-q199 stats tests (a group is a metric's sample, not the
whole fact table).  The merge sort is pure Python over numpy-sorted
arrays; no quadratic pair expansion anywhere (the ORACLE uses the
O(n^2) pair-count SQL as the independent cross-check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _inversions(a: list) -> int:
    """Merge-sort inversion count (strict: pairs i<j with a[i] > a[j])."""
    n = len(a)
    if n < 2:
        return 0
    mid = n // 2
    left, right = a[:mid], a[mid:]
    inv = _inversions(left) + _inversions(right)
    out = []
    i = j = 0
    while i < len(left) and j < len(right):
        if left[i] <= right[j]:
            out.append(left[i])
            i += 1
        else:
            inv += len(left) - i
            out.append(right[j])
            j += 1
    out.extend(left[i:])
    out.extend(right[j:])
    a[:] = out
    return inv


def _tie_term(vals: np.ndarray) -> int:
    _, counts = np.unique(vals, return_counts=True)
    return int((counts * (counts - 1) // 2).sum())


def kendall_tau_b(
    df: DataFrame, x: str, y: str, group_cols: list[str]
) -> DataFrame:
    """Per-group Kendall tau-b over integer-valued columns.  Returns
    (group, n, cd = concordant - discordant, tau_b) — cd is an exact
    integer so parity is exact; tau_b is the standard tie-corrected
    ratio (null when either margin is all-ties)."""
    out_schema = ", ".join(
        [f"{g} string" for g in group_cols]
        + ["n bigint", "cd bigint", "tau_b double"]
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf["_x"].to_numpy(dtype=np.int64)
        ys = pdf["_y"].to_numpy(dtype=np.int64)
        n = xs.size
        order = np.lexsort((ys, xs))
        xs, ys = xs[order], ys[order]
        n0 = n * (n - 1) // 2
        n1 = _tie_term(xs)
        n2 = _tie_term(ys)
        pairs = xs.astype(np.int64) * (2**32) + ys  # (x,y) composite
        n3 = _tie_term(pairs)
        s = _inversions(ys.tolist())
        cd = n0 - n1 - n2 + n3 - 2 * s
        denom = (n0 - n1) * (n0 - n2)
        tau = float(cd) / float(np.sqrt(float(denom))) if denom > 0 else None
        head = pdf.iloc[[0]][group_cols].copy()
        head["n"] = n
        head["cd"] = cd
        head["tau_b"] = tau
        return head

    return (
        df.select(
            *[F.col(g).cast("string").alias(g) for g in group_cols],
            F.col(x).cast("long").alias("_x"),
            F.col(y).cast("long").alias("_y"),
        )
        .groupBy(*group_cols)
        .applyInPandas(compute, out_schema)
    )
