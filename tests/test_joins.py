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


def test_asof_nearest_tie_prefers_backward(spark):
    """q414 composition contract: equal distance both directions picks
    the EARLIER (backward) row; beyond-tolerance yields NULL."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.queries import QUERIES

    # drive through the registered query's building blocks directly
    from syslog_handler_with_clickhouse_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 12:00:00")],
        "event_id bigint, user_id bigint, p_ts string",
    ).select("event_id", "user_id", F.to_timestamp("p_ts").alias("p_ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 11:50:00"), (10, "2024-01-01 12:10:00")],
        "user_id bigint, e_ts string",
    ).select(
        "user_id",
        F.to_timestamp("e_ts").alias("e_ts"),
        F.to_timestamp("e_ts").alias("err_ts"),
    )
    b = asof_join(left, right, on="user_id", left_ts="p_ts", right_ts="e_ts",
                  value_cols=["err_ts"], direction="backward").collect()[0]
    f = asof_join(left, right, on="user_id", left_ts="p_ts", right_ts="e_ts",
                  value_cols=["err_ts"], direction="forward").collect()[0]
    # both candidates are 10 minutes away; backward finds 11:50,
    # forward finds 12:10 — the q414 CASE (db <= df) keeps backward.
    assert str(b.err_ts_asof) == "2024-01-01 11:50:00"
    assert str(f.err_ts_asof) == "2024-01-01 12:10:00"
