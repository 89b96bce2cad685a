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
