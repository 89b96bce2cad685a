"""Round-17 optimization internals: the concurrent-actions helper and
the join-inflation clamp in the derived shuffle-width floor.

The value-level proof that none of the round-17 plan surgery moved a
result lives in test_oracle_parity.py (all 476 queries); these tests
pin the two new MECHANISMS directly.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.operators.actions import (
    run_actions,
)
from syslog_handler_with_clickhouse_spark.operators.dedup import (
    _FLOOR_CAP,
    _size_floor,
)

SF_DIR = "/root/testdata/sf0.001"


def test_run_actions_runs_all_thunks(spark):
    out = []
    run_actions(
        lambda: out.append(spark.range(5).count()),
        lambda: out.append(spark.range(3).count()),
        lambda: out.append(spark.range(2).count()),
    )
    assert sorted(out) == [2, 3, 5]


def test_run_actions_propagates_first_error_after_all_finish(spark):
    done = []

    def ok():
        time.sleep(0.2)
        done.append(spark.range(4).count())

    def boom():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        run_actions(boom, ok)
    # the sibling action was not abandoned mid-flight: table writes are
    # job-atomic only if they are allowed to finish
    assert done == [4]


def test_run_actions_single_and_empty_fast_paths(spark):
    out = []
    run_actions(lambda: out.append(1))
    run_actions()
    run_actions(None, lambda: out.append(2), None)
    assert out == [1, 2]


def test_size_floor_clamps_join_inflated_estimates(spark):
    """The q84 shape: an aggregate self-joined back onto its input
    carries a size estimate orders of magnitude over the data (probed
    20 000x at sf0.01), which localCheckpoint PROPAGATES.  The floor
    must see through it — clamped to a bounded fan-out over the plan's
    leaf scan sizes — or every derived width downstream explodes
    (measured round 17: 4313-partition shuffles on a ~1 MB corpus)."""
    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    keepers = docs.groupBy(
        F.md5(F.col("text").cast("binary")).alias("h")
    ).agg(F.min("doc_id").alias("doc_id"))
    joined = docs.join(keepers.select("doc_id"), "doc_id")

    est = int(
        joined._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    leaf = int(
        docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    floor = _size_floor(joined)
    # the clamp only matters when Catalyst actually inflates; assert the
    # premise so a future Spark fixing join estimation retires this test
    # loudly instead of leaving it vacuous
    assert est > 8 * 2 * leaf, (est, leaf)
    # floor bounded by fan-out-capped leaf bytes, not the join estimate:
    # unclamped this would be ceil(est / 256 KB) (~1100 at sf0.001);
    # clamped it is a handful (exact value depends on the join plan's
    # leaf projections, so pin the magnitude, not the constant)
    unclamped = -(-est // (256 << 10))
    assert floor <= 16 < unclamped, (floor, est, leaf, unclamped)
    # the DOCUMENTED limitation: localCheckpoint propagates the child
    # plan's (inflated) stats AND collapses the plan to a single
    # LogicalRDD leaf, so the leaf-sum clamp has nothing to clamp
    # against — the floor re-inflates.  This is why q459 passes its
    # join-derived batches LAZY; if a future Spark version gives
    # checkpoints honest materialized stats, this pin flips and the
    # lazy-batch workarounds can be retired.
    ck = joined.localCheckpoint(eager=True)
    assert _size_floor(ck) == unclamped, (_size_floor(ck), unclamped)


def test_size_floor_keeps_honest_scan_floors(spark):
    """The clamp must not disturb scan-shaped inputs: the floor of a
    plain file scan is unchanged (leaf sum == the estimate itself)."""
    from syslog_handler_with_clickhouse_spark.sources.testdata import (
        load_table,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    est = int(
        docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    expect = min(_FLOOR_CAP, -(-est // (256 << 10)))
    assert _size_floor(docs) == expect
