"""Binary segmentation (operators/changepoints.py): planted-shift
recovery, no-split-on-flat behavior, min_len guard, plan contract."""

from __future__ import annotations

from syslog_handler_with_clickhouse_spark.operators.changepoints import (
    binary_segmentation,
)
from syslog_handler_with_clickhouse_spark.plans.explain import (
    python_eval_nodes,
)
from syslog_handler_with_clickhouse_spark.queries import QUERIES

from conftest import SF_DIR


def _series(spark, vals, key="a"):
    return spark.createDataFrame(
        [(key, i, v) for i, v in enumerate(vals)], "k string, t int, v long"
    )


def test_two_planted_shifts_recovered(spark):
    # 10 @ 10, 10 @ 50, 10 @ 120: depth 2 finds both boundaries exactly
    vals = [10] * 10 + [50] * 10 + [120] * 10
    segs = sorted(
        (r["start"], r["end"], r["mean_ppm"])
        for r in binary_segmentation(
            _series(spark, vals), ["k"], "t", "v", depth=2
        ).collect()
    )
    assert segs == [
        (0, 9, 10_000_000),
        (10, 19, 50_000_000),
        (20, 29, 120_000_000),
    ]


def test_flat_series_never_splits(spark):
    segs = binary_segmentation(
        _series(spark, [7] * 20), ["k"], "t", "v", depth=2
    ).collect()
    assert len(segs) == 1 and segs[0]["n_points"] == 20


def test_min_len_floors_every_segment(spark):
    # true shift at t=10 would leave a 2-point tail; the accepted split
    # lands at the closest ALLOWED point (t=9) and no segment ever has
    # fewer than min_len points
    vals = [10] * 10 + [1000] * 2
    segs = binary_segmentation(
        _series(spark, vals), ["k"], "t", "v", depth=2, min_len=3
    ).collect()
    assert all(r["n_points"] >= 3 for r in segs)
    assert sorted((r["start"], r["end"]) for r in segs) == [(0, 8), (9, 11)]


def test_keys_segment_independently(spark):
    df = _series(spark, [10] * 6 + [100] * 6, key="a").union(
        _series(spark, [5] * 12, key="b")
    )
    out = binary_segmentation(df, ["k"], "t", "v", depth=1).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    assert len(by_key["a"]) == 2 and len(by_key["b"]) == 1


def test_q427_python_free(spark):
    df = QUERIES["q427_binary_segmentation"](spark, SF_DIR)
    assert python_eval_nodes(df) == []
