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
