"""Misra-Gries heavy-hitter sketch: capture guarantee and error bounds
on data where the sketch actually evicts (unlike the uniform fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.operators.sketches import mg_summarize


def _mk(spark, rows):
    return spark.createDataFrame([(v,) for v in rows], "key string").coalesce(4)


def test_heavy_key_captured_with_tight_estimate(spark):
    # 30% heavy key + 7000 singletons: far more distinct keys than k=32,
    # so eviction churns constantly — the regime the sketch exists for
    rows = ["heavy"] * 3000 + [f"u{i}" for i in range(7000)]
    df = _mk(spark, rows)
    sk = {r.value: (r.est, r.err_total) for r in mg_summarize(df, "key", k=32).collect()}
    assert "heavy" in sk  # capture: exact(heavy)=3000 > err_total
    est, err = sk["heavy"]
    assert est <= 3000 <= est + err, (est, err)
    # bound is meaningful: err_total = sum_i floor(n_i/33) <= n/33
    assert err <= 10000 // 33 + 4


def test_soundness_for_every_key(spark):
    import collections

    rows = (["a"] * 500 + ["b"] * 300 + ["c"] * 200
            + [f"x{i % 400}" for i in range(1000)])
    df = _mk(spark, rows)
    sk_rows = mg_summarize(df, "key", k=16).collect()
    err = sk_rows[0].err_total if sk_rows else 0
    sk = {r.value: r.est for r in sk_rows}
    exact = collections.Counter(rows)
    for key, cnt in exact.items():
        if key in sk:
            assert sk[key] <= cnt <= sk[key] + err, key
        else:
            assert cnt <= err, (key, cnt, err)


def test_summary_size_bounded(spark):
    rows = [f"k{i}" for i in range(5000)]
    df = _mk(spark, rows)
    out = mg_summarize(df, "key", k=8).collect()
    # ≤ k surviving counters per partition (4 partitions)
    assert len(out) <= 8 * 4


def test_unpersist_mg_releases_cached_summary(spark):
    """mg_summarize eagerly caches its per-partition summary so both
    output branches share one sketch pass; unpersist_mg must actually
    release those blocks (round-5 advice: the eager localCheckpoint had
    no release path and pinned storage for the session's lifetime)."""
    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        unpersist_mg,
    )

    df = _mk(spark, ["a"] * 50 + [f"u{i}" for i in range(100)])
    res = mg_summarize(df, "key", k=16)
    handle = res._mg_summaries
    assert handle.storageLevel.useMemory  # cached + materialized
    assert len(res.collect()) > 0
    assert unpersist_mg(res) is True
    assert not handle.storageLevel.useMemory  # blocks released
    # no-op on foreign DataFrames
    assert unpersist_mg(df) is False


def test_weighted_merge_equivalent_to_unit_stream(spark):
    """The vectorized interior pre-aggregates each Arrow batch with
    value_counts() and MG-merges (value, weight) pairs.  Weighted MG must
    keep the exact same guarantees as the unit-weight stream: run both a
    naive unit-weight MG in plain Python and the Spark sketch on a
    single-partition input, and check the sketch's bound algebra holds
    key-by-key against the naive sketch's exact counts."""
    import collections

    rows = (["hot"] * 800 + ["warm"] * 250
            + [f"tail{i % 300}" for i in range(900)])

    # naive unit-weight Misra-Gries, one pass, k=16 (the textbook loop)
    k = 16
    counters: dict = {}
    naive_err = 0
    for v in rows:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            naive_err += 1
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]

    df = spark.createDataFrame([(v,) for v in rows], "key string").coalesce(1)
    sk_rows = mg_summarize(df, "key", k=k).collect()
    err = sk_rows[0].err_total
    sk = {r.value: r.est for r in sk_rows}
    exact = collections.Counter(rows)

    # both sketches bound err by n/(k+1)
    assert err <= len(rows) // (k + 1)
    assert naive_err <= len(rows) // (k + 1)
    # weighted sketch is sound against exact counts for every key
    for key, cnt in exact.items():
        if key in sk:
            assert sk[key] <= cnt <= sk[key] + err, key
        else:
            assert cnt <= err, (key, cnt, err)
    # the heavy key survives both sketches with a tight estimate
    assert "hot" in sk and "hot" in counters
    assert sk["hot"] >= exact["hot"] - err


def test_hh_twophase_exact_topk_and_guarantee(spark):
    from syslog_handler_with_clickhouse_spark.operators.sketches import hh_twophase

    rows = (["hot"] * 900 + ["warm"] * 400 + ["mild"] * 150
            + [f"tail{i}" for i in range(5000)])
    df = _mk(spark, rows)
    got = hh_twophase(df, "key", k=3, buckets=1 << 14).collect()
    # top-3 by exact count with deterministic tiebreak
    assert [(r.value, r.exact_cnt) for r in got] == [
        ("hot", 900), ("warm", 400), ("mild", 150)]
    # capture guarantee: every key with exact > threshold is in the
    # candidate bucket set, so exact_cnt here is the true count
    thresh = got[0].guarantee_threshold
    assert all(r.exact_cnt > 0 for r in got)
    assert thresh >= 1  # bucket counts are at least the keys they hold


def test_hh_twophase_matches_exact_groupby(spark):
    import collections

    from syslog_handler_with_clickhouse_spark.operators.sketches import hh_twophase

    rows = [f"k{i % 700}" for i in range(4000)] + ["dominant"] * 500
    exact = collections.Counter(rows)
    df = _mk(spark, rows)
    got = hh_twophase(df, "key", k=10, buckets=1 << 14).collect()
    thresh = got[0].guarantee_threshold
    # every returned count is the TRUE count (phase 2 is exact)
    for r in got:
        assert r.exact_cnt == exact[r.value], r.value
    # capture guarantee: every key with exact > threshold is returned
    # (k=10 is large enough to hold them all here)
    heavy = {k_ for k_, c in exact.items() if c > thresh}
    assert heavy <= {r.value for r in got}
    assert got[0].value == "dominant" and got[0].exact_cnt == 500


# ---------------------------------------------------------------------------
# t-digest (mergeable quantile sketch)
# ---------------------------------------------------------------------------


def _rank_error(values_sorted, est, q):
    """|true rank of est - q·n| / n, with est's rank taken as the count
    of values strictly below it (the most favorable valid rank would be
    anywhere within the tied run; strictly-below is the conservative
    left edge, so we allow the tied-run width on top of the bound in
    callers that need it — the fixtures here have no heavy ties)."""
    import bisect

    n = len(values_sorted)
    lo = bisect.bisect_left(values_sorted, est)
    hi = bisect.bisect_right(values_sorted, est)
    # distance from the nearest valid rank of est to the target rank
    target = q * n
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target)) / n


def test_tdigest_state_bounded_and_rank_error():
    """Pure-Python kernel: centroid count stays O(delta) and every
    quantile estimate lands within ~π/(2δ) rank of truth (we assert the
    looser 2% for δ=100), with tails much tighter thanks to the k1
    scale function."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        td_compress,
        td_quantile,
    )

    rng = np.random.RandomState(7)
    for data in (
        rng.uniform(0, 1000, 100_000),
        rng.lognormal(3, 2, 100_000),  # heavy right skew
        np.repeat(np.arange(100), 1000).astype(float),  # heavy ties
    ):
        m, w = td_compress(data, np.ones(data.size), delta=100.0)
        assert m.size <= 200, f"state blew past 2*delta: {m.size}"
        assert w.sum() == data.size
        s = np.sort(data).tolist()
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            est = td_quantile(m, w, q)
            assert _rank_error(s, est, q) <= 0.02, (q, est)
        # tail quantiles: k1 keeps extreme centroids tiny
        for q in (0.001, 0.999):
            est = td_quantile(m, w, q)
            assert _rank_error(s, est, q) <= 0.005, (q, est)


def test_tdigest_merge_preserves_bound():
    """Merging per-chunk digests (the level-2 path) keeps the rank-error
    guarantee over the union — the mergeability property itself."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        td_compress,
        td_quantile,
    )

    rng = np.random.RandomState(11)
    chunks = [rng.exponential(50, 10_000) + i * 10 for i in range(8)]
    partials = [td_compress(c, np.ones(c.size), 100.0) for c in chunks]
    merged_m = np.concatenate([p[0] for p in partials])
    merged_w = np.concatenate([p[1] for p in partials])
    m, w = td_compress(merged_m, merged_w, 100.0)
    assert m.size <= 200
    allv = np.sort(np.concatenate(chunks)).tolist()
    for q in (0.05, 0.5, 0.95):
        assert _rank_error(allv, td_quantile(m, w, q), q) <= 0.03


def test_tdigest_spark_merge_equals_python_rederivation(spark):
    """merge-equals-monolithic (round-5 verdict #3): feed KNOWN partial
    digests through the Spark level-2 merge and require bit-identical
    quantiles to a pure-Python re-derivation running the same
    deterministic merge — and a single-partition end-to-end run must
    equal the monolithic Python digest of the raw values."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        td_compress,
        td_quantile,
        tdigest_merge_quantiles,
        tdigest_quantiles,
    )

    probs = [0.1, 0.5, 0.9]
    rng = np.random.RandomState(3)
    chunks = [rng.uniform(0, 100, 3000) for _ in range(4)]
    partials = [td_compress(c, np.ones(c.size), 100.0) for c in chunks]

    rows = [("g", p[0].tolist(), p[1].tolist()) for p in partials]
    pdf = spark.createDataFrame(
        rows, "grp string, td_means array<double>, td_weights array<double>"
    )
    got = tdigest_merge_quantiles(pdf, ["grp"], probs, 100.0).collect()[0]

    mm = np.concatenate([p[0] for p in partials])
    ww = np.concatenate([p[1] for p in partials])
    m, w = td_compress(mm, ww, 100.0)
    expect = [td_quantile(m, w, p) for p in probs]
    assert got.quantiles == expect  # bit-identical: same deterministic ops
    assert got.n_centroids == m.size

    # single-partition end-to-end == monolithic python digest
    vals = rng.uniform(0, 100, 5000)
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "value double"
    ).coalesce(1)
    got1 = tdigest_quantiles(df, "value", [], probs, 100.0)
    # empty group_cols: group everything
    got1 = got1.collect()[0] if not got1.columns[0:0] else got1.collect()[0]
    m1, w1 = td_compress(vals, np.ones(vals.size), 100.0)
    expect1 = [td_quantile(m1, w1, p) for p in probs]
    assert got1.quantiles == expect1


def test_tdigest_distributed_grouped(spark):
    """End-to-end over 8 partitions with groups: bound holds per group,
    state stays bounded, nulls ignored."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        tdigest_quantiles,
    )

    rng = np.random.RandomState(5)
    rows = []
    by_g = {}
    for g, scale in (("a", 10.0), ("b", 1000.0)):
        v = rng.gamma(2.0, scale, 20_000)
        by_g[g] = np.sort(v).tolist()
        rows += [(g, float(x)) for x in v]
    rows.append(("a", None))
    df = spark.createDataFrame(rows, "grp string, value double").repartition(8)
    out = {
        r.grp: r
        for r in tdigest_quantiles(
            df, "value", ["grp"], [0.1, 0.5, 0.9], 100.0
        ).collect()
    }
    for g in ("a", "b"):
        assert out[g].n_centroids <= 200
        for q, est in zip((0.1, 0.5, 0.9), out[g].quantiles):
            assert _rank_error(by_g[g], est, q) <= 0.03, (g, q, est)


# ---------------------------------------------------------------------
# KMV / theta distinct sketch (operators/sketches.py: kmv_*)
# ---------------------------------------------------------------------


def test_kmv_exact_mode_below_k(spark):
    """Fewer distinct values than k -> the sketch IS the distinct set:
    theta = 1.0 and est_distinct is exactly right, regardless of how
    many partitions / duplicate rows fed it."""
    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        kmv_sketch,
    )

    rows = [(f"g{i % 2}", i % 100) for i in range(10_000)]
    df = spark.createDataFrame(rows, "grp string, v int").repartition(16)
    out = {r.grp: r for r in kmv_sketch(df, "v", ["grp"], k=256).collect()}
    for g in ("g0", "g1"):
        assert out[g].theta == 1.0
        assert out[g].est_distinct == 50.0
        assert len(out[g].kmv_hashes) == 50


def test_kmv_partition_layout_invariant(spark):
    """Merge-equals-monolithic: the merged sketch (and hence every
    estimate) is IDENTICAL whether the data arrives in 1 partition or
    32 — the defining mergeability property."""
    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        kmv_sketch,
    )

    rows = [("g", i * 7919) for i in range(20_000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    one = kmv_sketch(df.coalesce(1), "v", ["grp"], k=128).collect()[0]
    many = kmv_sketch(df.repartition(32), "v", ["grp"], k=128).collect()[0]
    assert one.kmv_hashes == many.kmv_hashes
    assert one.theta == many.theta
    assert one.est_distinct == many.est_distinct


def test_kmv_estimate_and_state_bounds(spark):
    """20k distinct at k=128: state capped at k hashes and the estimate
    lands well inside 5 relative standard deviations (1/sqrt(k-2))."""
    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        kmv_sketch,
    )

    n = 20_000
    df = spark.createDataFrame(
        [("g", i * 2654435761 % (1 << 40)) for i in range(n)],
        "grp string, v long",
    ).repartition(8)
    r = kmv_sketch(df, "v", ["grp"], k=128).collect()[0]
    assert len(r.kmv_hashes) == 128
    assert 0.0 < r.theta < 1.0
    rsd = 1.0 / (128 - 2) ** 0.5
    assert abs(r.est_distinct - n) / n <= 5 * rsd


def test_kmv_intersection_estimate(spark):
    """Theta intersection on two overlapping integer sets: A = 0..12k,
    B = 8k..20k, |A ∩ B| = 4k.  The estimate must land within 5 sigma
    of truth (sigma ~ sqrt(|A∩B|/theta)/theta is loose; use 25%)."""
    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_sketch,
    )

    a = spark.createDataFrame(
        [(i,) for i in range(0, 12_000)], "v long"
    ).repartition(4)
    b = spark.createDataFrame(
        [(i,) for i in range(8_000, 20_000)], "v long"
    ).repartition(4)
    sa = kmv_sketch(a, "v", [], k=512)
    sb = kmv_sketch(b, "v", [], k=512)
    est = kmv_intersect_estimate(sa, sb, k=512).collect()[0].est_intersect
    assert abs(est - 4_000) / 4_000 <= 0.25


# ---------------------------------------------------------------------
# Adaptive histogram (operators/sketches.py: adaptive_histogram)
# ---------------------------------------------------------------------


def test_adaptive_histogram_invariants(spark):
    """Weight conservation (exact), bin-count bound, sorted covering
    bounds — on a bimodal distribution where equi-width would waste
    bins, the adaptive merge must keep both modes separated."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        adaptive_histogram,
    )

    rng = np.random.RandomState(9)
    vals = np.concatenate(
        [rng.normal(0.0, 1.0, 5000), rng.normal(100.0, 1.0, 5000)]
    )
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "grp string, value double"
    ).repartition(8)
    bins = sorted(
        adaptive_histogram(df, "value", ["grp"], 10).collect(),
        key=lambda r: r.bin_idx,
    )
    assert 1 <= len(bins) <= 10
    assert abs(sum(b.height for b in bins) - 10_000) < 1e-6
    for a, b in zip(bins, bins[1:]):
        assert b.lower >= a.upper - 1e-9
    assert bins[0].lower >= vals.min() - 1e-9
    assert bins[-1].upper <= vals.max() + 1e-9
    # bimodal: no bin may straddle the empty [10, 90] gap with real mass
    straddlers = [
        b for b in bins if b.lower < 10 and b.upper > 90 and b.height > 0
    ]
    assert not straddlers, straddlers


def test_adaptive_histogram_partition_invariant(spark):
    """Same data, 1 vs 16 partitions: the per-partition digests differ,
    but weight totals and the COARSE shape (per-mode mass) must agree."""
    import numpy as np

    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        adaptive_histogram,
    )

    rng = np.random.RandomState(4)
    vals = np.concatenate(
        [rng.normal(0.0, 1.0, 3000), rng.normal(50.0, 1.0, 7000)]
    )
    rows = [("g", float(v)) for v in vals]
    df1 = spark.createDataFrame(rows, "grp string, value double").coalesce(1)
    df16 = spark.createDataFrame(rows, "grp string, value double").repartition(
        16
    )
    def mode_mass(bins):
        lo = sum(b.height for b in bins if (b.lower + b.upper) / 2 < 25)
        hi = sum(b.height for b in bins if (b.lower + b.upper) / 2 >= 25)
        return lo, hi

    b1 = adaptive_histogram(df1, "value", ["grp"], 8).collect()
    b16 = adaptive_histogram(df16, "value", ["grp"], 8).collect()
    lo1, hi1 = mode_mass(b1)
    lo16, hi16 = mode_mass(b16)
    assert abs(lo1 - 3000) < 150 and abs(lo16 - 3000) < 150
    assert abs(hi1 - 7000) < 150 and abs(hi16 - 7000) < 150


# ---------------------------------------------------------------------
# quantileTiming / uniqUpTo analogues (round 8)
# ---------------------------------------------------------------------


def test_timing_bucket_map_edges(spark):
    """The CH-style bucket map at its three regime boundaries: exact
    below 1024, 16-wide lower-bound buckets to 65535, saturation
    above; negatives clamp to 0."""
    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        timing_bucket,
    )

    vals = [-5, 0, 1, 1023, 1024, 1039, 1040, 65535, 65536, 10**9]
    exp = [0, 0, 1, 1023, 1024, 1024, 1040, 65520, 65535, 65535]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r.bucket for r in df.select(timing_bucket("v")).collect()]
    assert got == exp


def test_timing_quantiles_exact_and_partition_invariant(spark):
    """Quantiles are exact ranks over bucket counts (rank = ceil(q*N)),
    and the result is independent of input partitioning — the bucket
    counts are a mergeable state."""
    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        timing_quantiles,
    )

    # group a: 1..100 exact region -> q50=50, q90=90, q99=99
    # group b: spans regimes
    rows = [("a", v) for v in range(1, 101)]
    rows += [("b", v) for v in [10, 2000, 2010, 70000]]
    ref = None
    for parts in (1, 5, 32):
        df = spark.createDataFrame(rows, "g string, ms long").repartition(
            parts
        )
        out = {
            r.g: (r.n, r.qt_0_5, r.qt_0_9, r.qt_0_99)
            for r in timing_quantiles(df, "ms", ["g"], [0.5, 0.9, 0.99]).collect()
        }
        if ref is None:
            ref = out
        assert out == ref, parts
    assert ref["a"] == (100, 50, 90, 99)
    # group b reference: apply the bucket map, then rank ceil(q*4)
    b_sorted = sorted(
        [v if v < 1024 else (v - v % 16 if v < 65536 else 65535) for v in [10, 2000, 2010, 70000]]
    )
    assert ref["b"] == (4, b_sorted[1], b_sorted[3], b_sorted[3])


def test_timing_quantiles_match_brute_force(spark):
    """Hypothesis-style differential (fixed seeds, Spark per example is
    slow): the native bucket-cumsum quantile equals a direct
    computation of min{bucket : cum >= ceil(q*N)} over the bucketed
    multiset, across regimes and weights."""
    import math
    import random

    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        timing_quantiles,
    )

    def bucket(v):
        v = max(0, v)
        return v if v < 1024 else (v - v % 16 if v < 65536 else 65535)

    rng = random.Random(99)
    for trial in range(3):
        rows = [
            ("g", rng.choice([rng.randint(0, 1023), rng.randint(1024, 65535),
                              rng.randint(65536, 10**6)]),
             rng.randint(1, 5))
            for _ in range(200)
        ]
        df = spark.createDataFrame(rows, "g string, ms long, w long")
        got = timing_quantiles(
            df.repartition(7), "ms", ["g"], [0.25, 0.5, 0.9, 0.99],
            weight="w",
        ).collect()[0]
        buckets = sorted(
            b for (_, v, w) in rows for b in [bucket(v)] * w
        )
        n = len(buckets)
        for q, gotv in ((0.25, got.qt_0_25), (0.5, got.qt_0_5),
                        (0.9, got.qt_0_9), (0.99, got.qt_0_99)):
            rank = math.ceil(q * n)
            assert gotv == buckets[rank - 1], (trial, q)
        assert got.n == n


def test_gk_summary_rank_error_and_partition_invariance(spark):
    """quantileGK analogue: estimates stay inside the eps exact-rank
    bracket under BOTH 1-partition and 16-partition layouts (merge
    cannot degrade past the composed bound), and merged state is
    bounded by partitions * (2/eps + 2) samples."""
    import numpy as np
    import pandas as pd

    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        gk_quantiles,
    )

    rng = np.random.default_rng(41)
    vals = np.concatenate(
        [rng.normal(0, 1, 6000), rng.exponential(4, 6000)]
    )
    pdf = pd.DataFrame({"g": ["a"] * 6000 + ["b"] * 6000, "v": vals})
    probs, eps = [0.1, 0.5, 0.9], 0.05
    for nparts in (1, 16):
        df = spark.createDataFrame(pdf).repartition(nparts)
        out = gk_quantiles(df, "v", ["g"], probs, eps).collect()
        assert len(out) == 2
        for r in out:
            grp = np.sort(pdf[pdf.g == r["g"]].v.to_numpy())
            n = grp.size
            assert r["n"] == n
            assert r["n_samples"] <= nparts * (int(2 / eps) + 2)
            for p, est in zip(probs, r["quantiles"]):
                rank = np.searchsorted(grp, est, side="right")
                assert abs(rank - p * n) / n <= eps + 1e-9


def test_gk_summary_empty_and_single_value(spark):
    import pandas as pd

    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        gk_quantiles,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a", "a", "b"], "v": [None, None, 7.0]})
    )
    out = {r["g"]: r for r in
           gk_quantiles(df, "v", ["g"], [0.5], 0.1).collect()}
    assert out["b"]["quantiles"] == [7.0] and out["b"]["n"] == 1
    import math

    q_a = out["a"]["quantiles"][0]
    # Arrow surfaces the NaN placeholder as None in array<double>
    assert out["a"]["n"] == 0 and (q_a is None or math.isnan(q_a))
