"""Join operators beyond plain equi-joins (SURVEY §2.3 Joins).

The reference delegates all querying to ClickHouse; these are the join
shapes a `mikrotik_logs`-style table (device dims, config-change streams)
exists to serve, implemented with scale-first physical shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join, matching DuckDB's ASOF JOIN in both directions:
    ``backward`` pairs each left row with the LATEST right row at
    right_ts <= left_ts; ``forward`` with the EARLIEST right row at
    right_ts >= left_ts (both inclusive).

    Physical shape: union + single sort within key partitions +
    ``last(ignorenulls)`` running window — ONE shuffle on the key, no
    range-join blowup, no per-key skew quadratic term.  This scales to
    100 TB the way a merge-asof does: each key's timeline is processed
    in one sorted pass.  Forward is the identical plan with the timeline
    walked in descending ts order, so the running ``last`` holds the
    smallest right_ts that is still >= left_ts.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lcols = [c for c in left.columns]
    # Right-side values ride in ONE struct (non-null for every right row,
    # null for left rows): the running last(ignorenulls) then latches onto
    # the nearest right ROW, so a matching row whose value columns are NULL
    # still wins — DuckDB ASOF semantics — instead of falling through to an
    # older/newer row the way per-column ignorenulls would.
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # after right rows at equal ts (<= semantics)
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        # Build the null-struct type programmatically — a DDL string would
        # need escaping for backticks in column names and simpleString()
        # does not quote nested field names.
        F.lit(None)
        .cast(T.StructType([T.StructField(c, right.schema[c].dataType) for c in value_cols]))
        .alias("__r"),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            tagged_left.schema["__l"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # __side ascending keeps right rows (0) ahead of left rows (1) at equal
    # ts in BOTH directions, which is exactly inclusive <= / >= semantics.
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__side",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    ).filter(F.col("__side") == 1)
    out = filled.select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col("__r")[c].alias(f"{c}_asof") for c in value_cols],
    )
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key``.

    Two tables bucketed identically join WITHOUT a shuffle — the
    co-location is paid once at write time and amortized over every
    subsequent join, the standard layout for repeatedly-joined 100 TB
    fact tables (asserted shuffle-free in tests/test_plans.py).
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the skewed side's rows scatter across
    ``buckets`` sub-keys (deterministic row-content hash), the other side
    replicates ×buckets, and the join key becomes (key, salt) — a hot key
    spreads over ``buckets`` tasks instead of melting one.

    Result is row-identical to ``skewed.join(other, on, how)``.

    Decision rule (measured, PERF.md round-6 / scripts/skew_bench.py):
    salting levels max/median task input from 11.8-25× to 1.2-2.6× on a
    zipf(1.5) key at 20 M rows, but its cost is ×``buckets`` replication
    of ``other`` — with a dim comparable to the fact that replication
    costs more than the hot task it removes.  So: AQE's skew-join split
    is the first line of defense (mind ``skewedPartitionThresholdInBytes``
    — the 256 MB default never fires on smaller partitions); reach for
    explicit salting when a single key exceeds one task's capacity AND
    ``other`` is small relative to the skewed side.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(buckets)
    ).alias("__salt")
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = left.join(right, [on, "__salt"], how)
    return out.drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Column,
    range_cond: Column,
) -> DataFrame:
    """Equi + range join: equi key keeps it a hash/sort-merge join with the
    range predicate applied as a post-join filter — never a broadcast
    nested loop over the full cross product.

    ``on`` is either a column NAME present on both sides (name-based equi
    key — the only form that is unambiguous when both inputs share the
    column) or a boolean Column join expression.
    """
    join_on = [on] if isinstance(on, str) else on
    return left.join(right, on=join_on, how="inner").filter(range_cond)
