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


# ---------------------------------------------------------------------
# wide MV state: count/sum + min/max + uniqState (KMV)
# ---------------------------------------------------------------------
# The AggregatingMergeTree states real ClickHouse MVs carry beyond
# sumState/countState: minState/maxState and uniqState.  min/max merge
# with least/greatest; uniqState is the KMV hash array (the same
# mergeable sketch as operators/sketches.kmv_*, trimmed back to k on
# every merge — pure native array algebra, q272 precedent).
#
# Deletion semantics are the honest IVM split: count/sum are
# SELF-INVERTING (fold signed partials), but min/max/uniq are not — a
# deleted minimum cannot be un-merged.  So the changefeed path folds
# sums algebraically and recomputes min/max/uniq ONLY for groups the
# delete touched, reading the post-delete source snapshot restricted to
# those keys (left-semi on a group-cardinality key set).  Cost is
# O(|change| + |rows in delete-touched groups|), still never a full
# rescan; insert-only groups stay purely mergeable.


def _kmv_expr(col: str, k: int):
    """k smallest distinct (0,1]-normalized hashes of ``col`` — the
    mergeable uniqState.  NULLs hash to NULL and drop out (collect_list
    skips them): countDistinct semantics."""
    u = F.xxhash64(F.col(col)).cast("double") / float(2**64) + 0.5
    u = F.when(F.col(col).isNotNull(), F.greatest(u, F.lit(2.0**-64)))
    return F.slice(F.array_sort(F.array_distinct(F.collect_list(u))), 1, k)


def _kmv_remerge(name: str, k: int):
    """-Merge combinator for stored uniqState arrays: flatten, dedupe,
    re-trim to the k smallest.  Associative + commutative, so refresh
    order never changes the state."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(name)))),
        1,
        k,
    )


def _wide_partials(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    minmax_cols: list[str],
    uniq_cols: list[str],
    k: int,
) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[F.min(c).alias(f"min_{c}") for c in minmax_cols],
        *[F.max(c).alias(f"max_{c}") for c in minmax_cols],
        *[_kmv_expr(c, k).alias(f"kmv_{c}") for c in uniq_cols],
    )


def _wide_merge_aggs(
    sum_cols: list[str],
    minmax_cols: list[str],
    uniq_cols: list[str],
    k: int,
):
    return [
        F.sum("n").alias("n"),
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        *[F.min(f"min_{c}").alias(f"min_{c}") for c in minmax_cols],
        *[F.max(f"max_{c}").alias(f"max_{c}") for c in minmax_cols],
        *[_kmv_remerge(f"kmv_{c}", k).alias(f"kmv_{c}") for c in uniq_cols],
    ]


def refresh_mv_wide(
    batch_df: DataFrame,
    path: str,
    keys: list[str],
    sum_cols: list[str],
    minmax_cols: list[str],
    uniq_cols: list[str],
    k: int = 256,
    batch_id: int | None = None,
) -> int:
    """Append-path refresh of the wide state: every component is
    mergeable, so one union + re-aggregate folds the batch exactly like
    :func:`refresh_mv`."""
    spark = batch_df.sparkSession
    part = _wide_partials(batch_df, keys, sum_cols, minmax_cols, uniq_cols, k)
    if latest_version(path) > 0:
        state = read_snapshot(spark, path)
        part = (
            state.unionByName(part)
            .groupBy(*keys)
            .agg(*_wide_merge_aggs(sum_cols, minmax_cols, uniq_cols, k))
        )
    return write_snapshot(
        part.coalesce(1), path, mode="overwrite", batch_id=batch_id
    )


def refresh_mv_wide_from_changefeed(
    spark,
    path: str,
    source_path: str,
    keys: list[str],
    sum_cols: list[str],
    minmax_cols: list[str],
    uniq_cols: list[str],
    v_from: int,
    v_to: int,
    k: int = 256,
    batch_id: int | None = None,
) -> int:
    """Changefeed refresh of the wide state.  count/sum fold signed
    partials (self-inverting); min/max/uniq merge mergeably for
    insert-only groups and are RECOMPUTED from the ``v_to`` source
    snapshot for the (few) groups the delete touched — the bounded
    partial-rescan every IVM system needs for non-invertible
    aggregates."""
    from .snapshots import read_snapshot as read_src
    from .snapshots import snapshot_diff

    if latest_version(path) == 0:
        raise ValueError(
            "refresh_mv_wide_from_changefeed: initialize the MV with "
            "refresh_mv_wide before folding changefeed deltas"
        )
    feed = snapshot_diff(spark, source_path, v_from, v_to)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    signed = feed.groupBy(*keys).agg(
        F.sum(sign).alias("n"),
        *[F.sum(sign * F.col(c)).alias(f"sum_{c}") for c in sum_cols],
    )
    state = read_snapshot(spark, path)

    # count/sum: algebraic fold of signed partials into the state
    ns = (
        state.select(*keys, "n", *[f"sum_{c}" for c in sum_cols])
        .unionByName(signed)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
        .filter(F.col("n") != 0)
    )

    mm_cols = (
        [f"min_{c}" for c in minmax_cols]
        + [f"max_{c}" for c in minmax_cols]
        + [f"kmv_{c}" for c in uniq_cols]
    )
    state_mm = state.select(*keys, *mm_cols)

    # non-invertible part: groups touched by a delete get recomputed
    # from the post-change snapshot restricted to those keys
    del_keys = (
        feed.filter(F.col("_change_type") == "delete")
        .select(*keys)
        .distinct()
    )
    src_now = read_src(spark, source_path, version=v_to)
    recomputed = (
        src_now.join(F.broadcast(del_keys), keys, "left_semi")
        .groupBy(*keys)
        .agg(
            *[F.min(c).alias(f"min_{c}") for c in minmax_cols],
            *[F.max(c).alias(f"max_{c}") for c in minmax_cols],
            *[_kmv_expr(c, k).alias(f"kmv_{c}") for c in uniq_cols],
        )
    )
    # insert-only groups: mergeable fold of state + inserted partials
    ins_mm = (
        feed.filter(F.col("_change_type") == "insert")
        .groupBy(*keys)
        .agg(
            *[F.min(c).alias(f"min_{c}") for c in minmax_cols],
            *[F.max(c).alias(f"max_{c}") for c in minmax_cols],
            *[_kmv_expr(c, k).alias(f"kmv_{c}") for c in uniq_cols],
        )
    )
    merged_mm = (
        state_mm.unionByName(ins_mm)
        .join(F.broadcast(del_keys), keys, "left_anti")
        .groupBy(*keys)
        .agg(
            *[F.min(f"min_{c}").alias(f"min_{c}") for c in minmax_cols],
            *[F.max(f"max_{c}").alias(f"max_{c}") for c in minmax_cols],
            *[
                _kmv_remerge(f"kmv_{c}", k).alias(f"kmv_{c}")
                for c in uniq_cols
            ],
        )
    )
    final_mm = merged_mm.unionByName(recomputed)
    part = ns.join(final_mm, keys, "inner")
    return write_snapshot(
        part.coalesce(1), path, mode="overwrite", batch_id=batch_id
    )


def finalize_uniq(state: DataFrame, col: str, k: int = 256):
    """Read-time finalization of a stored uniqState column: exact size
    below k, else the KMV estimator (k-1)/h_k."""
    name = f"kmv_{col}"
    sz = F.size(name)
    return F.when(sz < k, sz.cast("double")).otherwise(
        F.lit(float(k - 1)) / F.element_at(name, k)
    )


# ---------------------------------------------------------------------
# join-view IVM: MV over fact ⋈ dim with out-of-order arrival
# ---------------------------------------------------------------------
# The AggregatingMergeTree-over-a-JOIN pattern (in ClickHouse: an MV on
# the fact table whose SELECT joins a dimension): the view
#
#     SELECT dim.group_col, count(*), sum(fact.val)
#     FROM fact JOIN dim USING (key) GROUP BY dim.group_col
#
# maintained incrementally under INSERTS TO EITHER SIDE, in any order,
# without ever rescanning the fact history.  Classic delta rule
# ΔV = ΔF⋈D + F⋈ΔD (+ ΔF⋈ΔD), made O(|Δ|) by keeping, next to the
# view state, a PENDING state: per-key mergeable fact partials whose
# dimension row has not arrived yet.
#
#   fact batch:  partials by key; keys already in the dim state fold
#                straight into the view (keyed equi-join, |Δ|-sized);
#                the rest fold into pending.
#   dim batch:   new keys upsert the dim state AND release their
#                pending partials into the view; released rows leave
#                pending.
#
# Every refresh touches O(|batch| + |touched keys|); the fact table is
# never read back.  Dim-key UPDATES (group migration) are out of scope
# — the honest limitation, as with the wide-MV min/max delete split.


def _jmv(root: str, part: str) -> str:
    return f"{root.rstrip('/')}/{part}"


def refresh_join_mv_fact(
    batch_df: DataFrame,
    root: str,
    key: str,
    group_col: str,
    sum_col: str,
    sign: int = 1,
) -> None:
    """Fold one fact batch into the join-MV (view += matched partials,
    pending += unmatched partials).  ``sign=-1`` applies the batch as
    DELETES: count and sum are self-inverting algebraic aggregates, so
    retractions fold exactly like inserts with negated partials —
    whether the deleted rows currently live in the view (dim arrived)
    or still in pending (dim not yet arrived); zeroed groups vanish
    from the state."""
    spark = batch_df.sparkSession
    dp = batch_df.groupBy(key).agg(
        (F.count(F.lit(1)) * sign).alias("n"),
        (F.sum(F.col(sum_col).cast("decimal(18,2)")) * sign)
        .cast("decimal(18,2)")
        .alias("s"),
    )
    have_dim = latest_version(_jmv(root, "dim")) > 0
    if have_dim:
        from ..operators.actions import run_actions

        dim = read_snapshot(spark, _jmv(root, "dim"))
        matched = dp.join(dim, key).groupBy(group_col).agg(
            F.sum("n").alias("n"), F.sum("s").cast("decimal(18,2)").alias("s")
        )
        unmatched = dp.join(dim.select(key), key, "left_anti")
        # view and pending folds write DIFFERENT snapshot paths from the
        # same batch partials — independent jobs, run concurrently
        # (guide §2.6); a refresh is otherwise two serialized
        # read+fold+write round trips
        run_actions(
            lambda: _fold_state(matched, _jmv(root, "view"), [group_col]),
            lambda: _fold_state(
                unmatched.select(key, "n", "s"), _jmv(root, "pending"), [key]
            ),
        )
    else:
        _fold_state(dp.select(key, "n", "s"), _jmv(root, "pending"), [key])


def refresh_join_mv_dim(batch_df: DataFrame, root: str, key: str, group_col: str) -> None:
    """Apply one dimension batch: upsert new keys, release their pending
    fact partials into the view."""
    spark = batch_df.sparkSession
    newdim = batch_df.select(key, group_col).dropDuplicates([key])
    if latest_version(_jmv(root, "dim")) > 0:
        dim = read_snapshot(spark, _jmv(root, "dim"))
        newdim = newdim.join(dim.select(key), key, "left_anti")
        dim = dim.unionByName(newdim)
    else:
        dim = newdim
    write_snapshot(dim.coalesce(1), _jmv(root, "dim"), mode="overwrite")
    if latest_version(_jmv(root, "pending")) > 0:
        from ..operators.actions import run_actions

        pend = read_snapshot(spark, _jmv(root, "pending"))
        released = pend.join(newdim, key).groupBy(group_col).agg(
            F.sum("n").alias("n"), F.sum("s").cast("decimal(18,2)").alias("s")
        )
        keep = pend.join(newdim.select(key), key, "left_anti")
        # release-into-view and rewrite-pending target different paths —
        # concurrent (guide §2.6)
        run_actions(
            lambda: _fold_state(released, _jmv(root, "view"), [group_col]),
            lambda: write_snapshot(
                keep.coalesce(1), _jmv(root, "pending"), mode="overwrite"
            ),
        )


def _fold_state(part: DataFrame, path: str, keys: list[str]) -> None:
    spark = part.sparkSession
    if latest_version(path) > 0:
        part = (
            read_snapshot(spark, path)
            .unionByName(part)
            .groupBy(*keys)
            .agg(
                F.sum("n").alias("n"),
                F.sum("s").cast("decimal(18,2)").alias("s"),
            )
        )
    part = part.filter((F.col("n") != 0) | (F.col("s") != 0))
    write_snapshot(part.coalesce(1), path, mode="overwrite")


def read_join_mv(spark, root: str) -> DataFrame:
    """Current join-view state: (group_col, n, s)."""
    return read_snapshot(spark, _jmv(root, "view"))


def read_join_mv_pending(spark, root: str) -> DataFrame:
    return read_snapshot(spark, _jmv(root, "pending"))
