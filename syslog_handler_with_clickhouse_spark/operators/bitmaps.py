"""Exact compressed-bitmap aggregates — the ClickHouse ``groupBitmap`` /
``bitmapAnd`` / ``bitmapOr`` / ``bitmapXor`` / ``bitmapAndnot`` family
re-expressed Spark-first.

ClickHouse keeps a roaring bitmap per group (``groupBitmapState``) and
offers set algebra + cardinalities over those states.  The idea that
makes roaring work — integers cluster, so store RUNS, not members — maps
directly onto a sorted run-length encoding: a bitmap is an
``array<bigint>`` of interleaved ``[lo0, hi0, lo1, hi1, ...]`` closed
intervals, strictly increasing and non-adjacent (``hi_i + 1 < lo_{i+1}``),
i.e. the canonical form.  Every value set has exactly ONE canonical run
list, so equality of bitmaps is array equality and merge order can never
change the result.

Two-level aggregation, the same shape as the KMV sketch
(``sketches.kmv_partials``): level 1 (``bitmap_partials``) compresses
each input partition's values into runs inside an Arrow-batched
``mapInPandas`` — per-(partition, group) state is O(runs), and the ONE
shuffle carries run state, never raw values.  Level 2
(``bitmap_merge``) unions the partial run lists per group in
``applyInPandas`` (a k-way sorted-interval sweep).  Set algebra
(AND/OR/XOR/ANDNOT) is two-pointer interval intersection /
subtraction — O(runs_a + runs_b), no expansion to members.

100 TB posture: the state size is bounded by the number of runs, which
for clustered id spaces (auto-increment user ids, log sequence numbers)
is orders of magnitude below cardinality; worst-case (random sparse
ids) it degrades to 2 longs per member — exactly the point where an
APPROXIMATE sketch (KMV, ``sketches.kmv_sketch``) is the right tool
instead.  The pairing mirrors ClickHouse's groupBitmap (exact) vs
uniqTheta (approximate).

Reference: ClickHouse bitmap function family semantics (groupBitmap,
bitmapCardinality, bitmapAnd/Or/Xor/Andnot and their *Cardinality
forms).  The reference repo itself (253-LoC Go collector) has no
aggregate surface; this family is part of the implied ClickHouse
analytics contract per SURVEY.md §0/§2.3.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# run-list kernel (numpy / pure python on STATE, never on raw rows)
# ---------------------------------------------------------------------


def runs_from_values(vals) -> list[int]:
    """Canonical interleaved run list [lo0, hi0, lo1, hi1, ...] from an
    iterable of ints (dupes fine, order-free, None dropped)."""
    a = np.unique(np.asarray([v for v in vals if v is not None], dtype=np.int64))
    if a.size == 0:
        return []
    # run breaks where the gap exceeds 1
    brk = np.nonzero(np.diff(a) > 1)[0]
    los = np.concatenate(([a[0]], a[brk + 1]))
    his = np.concatenate((a[brk], [a[-1]]))
    out = np.empty(2 * los.size, dtype=np.int64)
    out[0::2] = los
    out[1::2] = his
    return out.tolist()


def _pairs(runs) -> list[tuple[int, int]]:
    return [(int(runs[i]), int(runs[i + 1])) for i in range(0, len(runs), 2)]


def _flat(pairs) -> list[int]:
    out: list[int] = []
    for lo, hi in pairs:
        out.append(int(lo))
        out.append(int(hi))
    return out


def merge_runs(run_lists) -> list[int]:
    """Union of canonical run lists -> canonical run list (sort by lo,
    sweep, coalescing overlapping OR adjacent intervals)."""
    ivs = sorted(p for rl in run_lists for p in _pairs(rl))
    out: list[tuple[int, int]] = []
    for lo, hi in ivs:
        if out and lo <= out[-1][1] + 1:
            if hi > out[-1][1]:
                out[-1] = (out[-1][0], hi)
        else:
            out.append((lo, hi))
    return _flat(out)


def and_runs(a, b) -> list[int]:
    """Intersection, two-pointer over canonical run lists."""
    pa, pb = _pairs(a), _pairs(b)
    i = j = 0
    out: list[tuple[int, int]] = []
    while i < len(pa) and j < len(pb):
        lo = max(pa[i][0], pb[j][0])
        hi = min(pa[i][1], pb[j][1])
        if lo <= hi:
            out.append((lo, hi))
        if pa[i][1] < pb[j][1]:
            i += 1
        else:
            j += 1
    return _flat(out)


def andnot_runs(a, b) -> list[int]:
    """A \\ B, two-pointer subtraction of b's intervals from a's."""
    pb = _pairs(b)
    out: list[tuple[int, int]] = []
    j = 0
    for lo, hi in _pairs(a):
        cur = lo
        while j < len(pb) and pb[j][1] < cur:
            j += 1
        k = j
        while k < len(pb) and pb[k][0] <= hi:
            blo, bhi = pb[k]
            if blo > cur:
                out.append((cur, blo - 1))
            cur = max(cur, bhi + 1)
            if cur > hi:
                break
            k += 1
        if cur <= hi:
            out.append((cur, hi))
    return _flat(out)


def xor_runs(a, b) -> list[int]:
    """Symmetric difference = (A \\ B) ∪ (B \\ A); the two parts are
    disjoint but may be ADJACENT, so re-canonicalize via merge."""
    return merge_runs([andnot_runs(a, b), andnot_runs(b, a)])


def runs_cardinality(runs) -> int:
    return sum(hi - lo + 1 for lo, hi in _pairs(runs))


def runs_contains(runs, v: int) -> bool:
    """``bitmapContains`` kernel: membership via bisect over the
    interleaved run list — O(log runs)."""
    import bisect

    if not len(runs):
        return False
    # position of the first lo strictly greater than v
    i = bisect.bisect_right([runs[k] for k in range(0, len(runs), 2)], v)
    if i == 0:
        return False
    return v <= runs[2 * (i - 1) + 1]


def runs_has_any(a, b) -> bool:
    """``bitmapHasAny`` kernel: two-pointer early-exit intersection
    test — O(runs_a + runs_b), stops at the first overlap."""
    pa, pb = _pairs(a), _pairs(b)
    i = j = 0
    while i < len(pa) and j < len(pb):
        if max(pa[i][0], pb[j][0]) <= min(pa[i][1], pb[j][1]):
            return True
        if pa[i][1] < pb[j][1]:
            i += 1
        else:
            j += 1
    return False


def runs_has_all(a, b) -> bool:
    """``bitmapHasAll(a, b)`` kernel: does A contain every element of
    B?  In canonical form each B-interval must sit inside a SINGLE
    A-interval (A's gaps are real gaps), so one two-pointer pass with
    early exit decides it — O(runs_a + runs_b)."""
    pa, pb = _pairs(a), _pairs(b)
    i = 0
    for blo, bhi in pb:
        while i < len(pa) and pa[i][1] < blo:
            i += 1
        if i == len(pa) or pa[i][0] > blo or pa[i][1] < bhi:
            return False
    return True


# ---------------------------------------------------------------------
# level 1 + level 2 aggregation
# ---------------------------------------------------------------------


def bitmap_partials(
    df: DataFrame, col: str, group_cols: list[str]
) -> DataFrame:
    """Level 1: one canonical run list per (input partition, group).
    Raw values are compressed to runs BEFORE the shuffle — the exchange
    carries O(runs) state per partition-group, never members."""
    out_schema = ", ".join(
        [f"{g} string" for g in group_cols] + ["runs array<bigint>"]
    )

    def summarize(batches):
        state: dict = {}  # key tuple -> np.int64 array of distinct values
        for pdf in batches:
            groups = (
                pdf.groupby(group_cols, sort=False, dropna=False)
                if group_cols
                else [((), pdf)]
            )
            for key, grp in groups:
                if not isinstance(key, tuple):
                    key = (key,)
                v = grp["_v"].dropna().to_numpy(dtype=np.int64)
                cur = state.get(key)
                state[key] = (
                    np.unique(v) if cur is None else np.union1d(cur, v)
                )
        rows = [
            (*[str(x) for x in key], runs_from_values(vals))
            for key, vals in state.items()
        ]
        yield pd.DataFrame(rows, columns=[*group_cols, "runs"])

    return df.select(
        *[F.col(g).cast("string").alias(g) for g in group_cols],
        F.col(col).cast("long").alias("_v"),
    ).mapInPandas(summarize, out_schema)


def bitmap_merge(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Level 2: union the partial run lists per group (sorted-interval
    sweep) and attach the exact cardinality.  Canonical form makes the
    result independent of partial arrival order."""
    out_schema = ", ".join(
        [f"{g} string" for g in group_cols]
        + ["runs array<bigint>", "cardinality bigint"]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        runs = merge_runs([list(r) for r in pdf["runs"]])
        head = pdf.iloc[[0]][group_cols] if group_cols else pd.DataFrame([{}])
        out = head.copy()
        out["runs"] = [runs]
        out["cardinality"] = runs_cardinality(runs)
        return out

    if group_cols:
        return partials.groupBy(*group_cols).applyInPandas(merge, out_schema)

    # global bitmap: the partials frame is one O(runs) row per input
    # partition — coalesce(1) moves only state, then one merge pass.
    # An empty input yields an empty iterator; the empty bitmap
    # (runs=[], cardinality=0) is the correct identity result.
    def merge_global(it):
        batches = [pdf for pdf in it if len(pdf)]
        if not batches:
            yield pd.DataFrame({"runs": [[]], "cardinality": [0]})
            return
        yield merge(pd.concat(batches))

    return partials.coalesce(1).mapInPandas(merge_global, out_schema)


def group_bitmap(
    df: DataFrame, col: str, group_cols: list[str]
) -> DataFrame:
    """``groupBitmapState(col) GROUP BY group_cols`` analogue: one exact
    compressed bitmap (canonical run list) + cardinality per group."""
    return bitmap_merge(bitmap_partials(df, col, group_cols), group_cols)


def bitmap_set_algebra(
    states: DataFrame, group_col: str, key_a: str, key_b: str
) -> DataFrame:
    """ClickHouse ``bitmapAnd/Or/Xor/AndnotCardinality`` over two stored
    bitmap states (rows of ``group_bitmap`` output selected by
    ``group_col`` value).  Both sides are single-row STATE frames, so
    the broadcast crossJoin moves O(runs) bytes; the algebra itself is
    an Arrow-batched pandas transform on state, never on members."""
    a = states.filter(F.col(group_col) == key_a).select(
        F.col("runs").alias("runs_a")
    )
    b = states.filter(F.col(group_col) == key_b).select(
        F.col("runs").alias("runs_b")
    )
    joined = a.crossJoin(F.broadcast(b))

    out_schema = (
        "card_a bigint, card_b bigint, and_card bigint, or_card bigint, "
        "xor_card bigint, andnot_card bigint"
    )

    def algebra(it):
        for pdf in it:
            rows = []
            for ra, rb in zip(pdf["runs_a"], pdf["runs_b"]):
                ra, rb = list(ra), list(rb)
                rows.append(
                    (
                        runs_cardinality(ra),
                        runs_cardinality(rb),
                        runs_cardinality(and_runs(ra, rb)),
                        runs_cardinality(merge_runs([ra, rb])),
                        runs_cardinality(xor_runs(ra, rb)),
                        runs_cardinality(andnot_runs(ra, rb)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "card_a",
                    "card_b",
                    "and_card",
                    "or_card",
                    "xor_card",
                    "andnot_card",
                ],
            )

    return joined.mapInPandas(algebra, out_schema)


def bitmap_predicate_matrix(
    states: DataFrame, group_col: str, probe_values: list[int]
) -> DataFrame:
    """ClickHouse ``bitmapHasAny`` / ``bitmapHasAll`` / ``bitmapContains``
    over every ordered pair of stored bitmap states, plus per-pair
    ``bitmapAndCardinality`` and state-size telemetry for the left side.

    The states frame is one O(runs) row per group, so the pair matrix is
    a broadcast self-join of state only — members are never expanded;
    each predicate is an early-exit two-pointer (has_any/has_all) or a
    bisect (contains) ON STATE inside one Arrow batch.
    ``contains_k`` columns report membership of ``probe_values[k]`` in
    the LEFT bitmap."""
    a = states.select(
        F.col(group_col).alias("grp_a"), F.col("runs").alias("runs_a")
    )
    b = states.select(
        F.col(group_col).alias("grp_b"), F.col("runs").alias("runs_b")
    )
    joined = a.crossJoin(F.broadcast(b))

    contains_cols = [f"contains_{k}" for k in range(len(probe_values))]
    out_schema = ", ".join(
        ["grp_a string", "grp_b string", "has_any boolean",
         "has_all boolean", "and_card bigint", "n_runs_a bigint"]
        + [f"{c} boolean" for c in contains_cols]
    )

    def pred(it):
        for pdf in it:
            rows = []
            for ga, ra, gb, rb in zip(
                pdf["grp_a"], pdf["runs_a"], pdf["grp_b"], pdf["runs_b"]
            ):
                ra, rb = list(ra), list(rb)
                rows.append(
                    (
                        ga,
                        gb,
                        runs_has_any(ra, rb),
                        runs_has_all(ra, rb),
                        runs_cardinality(and_runs(ra, rb)),
                        len(ra) // 2,
                        *[runs_contains(ra, v) for v in probe_values],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["grp_a", "grp_b", "has_any", "has_all",
                         "and_card", "n_runs_a", *contains_cols],
            )

    return joined.mapInPandas(pred, out_schema)


def bitmap_fold(states: DataFrame) -> DataFrame:
    """ClickHouse ``groupBitmapAnd`` / ``groupBitmapOr`` /
    ``groupBitmapXor`` analogue: fold EVERY stored bitmap state into
    one row of intersection / union / symmetric-difference
    cardinalities.  AND, OR and XOR are all associative + commutative
    on sets, so the sequential fold over the (tiny, O(runs)-per-row)
    state frame is order-free; ``coalesce(1)`` moves only state."""
    out_schema = (
        "n_states bigint, and_card bigint, or_card bigint, xor_card bigint"
    )

    def fold(it):
        acc_and = None
        acc_or: list[int] = []
        acc_xor: list[int] = []
        n = 0
        for pdf in it:
            for runs in pdf["runs"]:
                runs = list(runs)
                n += 1
                acc_and = runs if acc_and is None else and_runs(acc_and, runs)
                acc_or = merge_runs([acc_or, runs])
                acc_xor = xor_runs(acc_xor, runs)
        yield pd.DataFrame(
            [
                (
                    n,
                    runs_cardinality(acc_and or []),
                    runs_cardinality(acc_or),
                    runs_cardinality(acc_xor),
                )
            ],
            columns=["n_states", "and_card", "or_card", "xor_card"],
        )

    return states.select("runs").coalesce(1).mapInPandas(fold, out_schema)
