"""CH Collapsing / VersionedCollapsing engine semantics
(operators/engines.py): merge-outcome edge cases the q421/q422 oracle
streams can't reach, plus the single-aggregation plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.operators.engines import (
    collapse_final,
    versioned_collapse_final,
)
from syslog_handler_with_clickhouse_spark.plans.explain import (
    formatted_plan,
    python_eval_nodes,
)
from syslog_handler_with_clickhouse_spark.queries import QUERIES

from conftest import SF_DIR


def _signed(spark, rows):
    return spark.createDataFrame(rows, "k int, seq int, v int, sign int")


def test_collapse_full_annihilation_vanishes(spark):
    # insert then cancel, nothing else: the key disappears entirely
    df = _signed(spark, [(1, 1, 10, 1), (1, 1, 10, -1)])
    assert collapse_final(df, ["k"], ["v"], order_col="seq").count() == 0


def test_collapse_keeps_latest_plus_one_state(spark):
    df = _signed(
        spark,
        [
            (1, 1, 10, 1),
            (1, 1, 10, -1),
            (1, 2, 20, 1),
            (1, 2, 20, -1),
            (1, 3, 30, 1),  # survivor
            (2, 1, 7, 1),  # single-version key
        ],
    )
    out = {
        r["k"]: (r["v"], r["net_sign"])
        for r in collapse_final(df, ["k"], ["v"], order_col="seq").collect()
    }
    assert out == {1: (30, 1), 2: (7, 1)}


def test_collapse_cancel_arriving_late_still_pairs(spark):
    # cancels interleave arbitrarily: only sum(sign) and max_by matter
    df = _signed(spark, [(1, 2, 20, 1), (1, 1, 10, -1), (1, 1, 10, 1)])
    (row,) = collapse_final(df, ["k"], ["v"], order_col="seq").collect()
    assert (row["v"], row["net_sign"]) == (20, 1)


def test_versioned_orphan_cancel_surfaces_not_nulls(spark):
    # cancel whose insert never arrived: CH keeps the row; we must not
    # emit NULL state
    df = _signed(spark, [(1, 5, 50, -1)])
    (row,) = versioned_collapse_final(df, ["k"], "seq", ["v"]).collect()
    assert (row["v"], row["net"]) == (50, -1)


def test_versioned_multiplicity_preserved(spark):
    # at-least-once duplicate insert: both copies survive as net=2
    df = _signed(
        spark,
        [(1, 1, 10, 1), (1, 1, 10, -1), (1, 2, 20, 1), (1, 2, 20, 1)],
    )
    (row,) = versioned_collapse_final(df, ["k"], "seq", ["v"]).collect()
    assert (row["seq"], row["v"], row["net"]) == (2, 20, 2)


def test_engine_queries_python_free_single_agg(spark):
    """q421/q422 stay JVM-side, and the collapse itself is hash
    aggregation — no extra window or join beyond the documented stream
    construction (q421 joins its telescoping check; q422 has no join
    at all)."""
    for name in ["q421_collapsing_final", "q422_versioned_collapsing_final"]:
        df = QUERIES[name](spark, SF_DIR)
        assert python_eval_nodes(df) == [], name
        # max_by over a struct compiles to SortAggregate; either
        # aggregate node satisfies the one-aggregation contract
        assert "Aggregate" in formatted_plan(df), name
    plan = formatted_plan(QUERIES["q422_versioned_collapsing_final"](spark, SF_DIR))
    assert "Join" not in plan, plan
