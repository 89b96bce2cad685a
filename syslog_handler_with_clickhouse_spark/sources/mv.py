"""Incremental materialized-view maintenance.

ClickHouse analogue: ``CREATE MATERIALIZED VIEW ... ENGINE =
AggregatingMergeTree`` — the ingest-time pattern the reference's target
database uses to keep dashboard aggregates fresh without rescanning the
raw table (the reference itself delegates every query to ClickHouse,
`lib/cacheManage.go:35-65`, so its implied serving layer is exactly this).

Spark-first re-expression: the MV state is a tiny keyed table of
MERGEABLE partial aggregates — count + integer/decimal sums, the
algebraic states from which avg/rate/share derive at read time — stored
as versioned commits in the transactional snapshot store
(`sources/snapshots.py`).  Each refresh scans ONLY the new batch plus
the current state (group-cardinality-sized), never the raw history:

    refresh cost  = O(|batch|)   + O(|groups|)
    read cost     = O(|groups|)

At 100 TB the raw table is unscannable on a serving path; the state
table stays kilobytes per thousand groups.  ``batch_id`` rides the
snapshot store's idempotent-commit guard, so a foreachBatch retry after
a crash between write and checkpoint merges the batch ONCE — the MV is
exactly-once under streaming replay, which ClickHouse MVs themselves
are not (they double-apply on re-INSERT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .snapshots import latest_version, read_snapshot, write_snapshot


def _partials(df: DataFrame, keys: list[str], sum_cols: list[str]) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )


def refresh_mv(
    batch_df: DataFrame,
    path: str,
    keys: list[str],
    sum_cols: list[str],
    batch_id: int | None = None,
) -> int:
    """Fold one new batch into the MV state and publish atomically.

    The merge is the -Merge combinator over algebraic states: partial
    (n, sum_c...) rows from the batch union with the current state and
    re-aggregate by key with plain sums — associative and commutative,
    so batch arrival order never changes the result.  Returns the
    published snapshot version (unchanged if ``batch_id`` was already
    committed — duplicate delivery is a no-op, not a double count).
    """
    spark = batch_df.sparkSession
    part = _partials(batch_df, keys, sum_cols)
    if latest_version(path) > 0:
        state = read_snapshot(spark, path)
        part = (
            state.unionByName(part)
            .groupBy(*keys)
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            )
        )
    # group-cardinality-sized: one file keeps the state read a single task
    return write_snapshot(part.coalesce(1), path, mode="overwrite", batch_id=batch_id)


def read_mv(spark, path: str, version: int | None = None) -> DataFrame:
    """Current (or time-travelled) MV state: keys + n + sum_<c> columns.
    Derived measures (avg = sum/n, ...) are the caller's read-time
    finalization — the stored state stays mergeable."""
    return read_snapshot(spark, path, version=version)


def refresh_mv_from_changefeed(
    spark,
    path: str,
    source_path: str,
    keys: list[str],
    sum_cols: list[str],
    v_from: int,
    v_to: int,
    batch_id: int | None = None,
) -> int:
    """TRUE incremental view maintenance from the source store's CDC
    feed (`snapshots.snapshot_diff`): inserts contribute +1/+x partials,
    deletes contribute −1/−x, and the signed partials merge into the MV
    state exactly like an append batch — count and sum are the
    self-inverting algebraic aggregates, so deletions need no rescan.
    Groups whose count reaches zero are dropped from the state.

    This closes the loop the pieces already support separately: the
    source mutates transactionally (delete-rewrite), the changefeed
    reads only changed files, and the MV folds the delta at
    O(|change| + |groups|) cost — the 100 TB serving path where the raw
    table is never rescanned even under GDPR-style erasure."""
    from .snapshots import snapshot_diff

    feed = snapshot_diff(spark, source_path, v_from, v_to)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    part = feed.groupBy(*keys).agg(
        F.sum(sign).alias("n"),
        *[F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in sum_cols],
    )
    if latest_version(path) > 0:
        state = read_snapshot(spark, path)
        part = (
            state.unionByName(part)
            .groupBy(*keys)
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            )
        )
    else:
        # No MV base state yet: a delete-bearing changefeed folded
        # without the base would persist negative counts as "initial"
        # state — a caller bug (the base snapshot was never built).
        neg = part.filter(F.col("n") < 0).limit(1).count()
        if neg:
            raise ValueError(
                "refresh_mv_from_changefeed: MV state is empty but the "
                "changefeed folds to negative counts — initialize the MV "
                "from a base snapshot before applying delete deltas"
            )
    part = part.filter(F.col("n") != 0)
    return write_snapshot(
        part.coalesce(1), path, mode="overwrite", batch_id=batch_id
    )
