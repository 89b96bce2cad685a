"""Unit tests for join operators beyond the oracle parity suite:
range_join's two ``on`` forms and asof_join argument validation.
(asof_join semantics are covered by the 60-case DuckDB differential in
test_asof_property.py, both directions.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.operators.joins import asof_join, range_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "k long, lo long"
    )
    right = spark.createDataFrame(
        [(1, 12), (1, 25), (2, 29), (3, 99)], "k long, x long"
    )
    return left, right


def test_range_join_string_key(spark):
    left, right = _frames(spark)
    out = range_join(
        left, right, "k", (F.col("x") > F.col("lo")) & (F.col("x") <= F.col("lo") + 5)
    )
    got = sorted((r.k, r.lo, r.x) for r in out.collect())
    assert got == [(1, 10, 12), (1, 20, 25)]
    # name-based key: the shared column appears once, unambiguously
    assert out.columns.count("k") == 1


def test_range_join_column_condition(spark):
    left, right = _frames(spark)
    la, ra = left.alias("l"), right.alias("r")
    out = range_join(
        la,
        ra,
        F.col("l.k") == F.col("r.k"),
        (F.col("r.x") > F.col("l.lo")) & (F.col("r.x") <= F.col("l.lo") + 5),
    )
    got = sorted((r["lo"], r["x"]) for r in out.collect())
    assert got == [(10, 12), (20, 25)]


def test_asof_join_rejects_unknown_direction(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(
            left, right, on="k", left_ts="lo", right_ts="x",
            value_cols=["x"], direction="sideways",
        )
