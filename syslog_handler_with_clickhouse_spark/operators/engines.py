"""ClickHouse Collapsing / VersionedCollapsing MergeTree semantics as
single-shuffle Spark aggregations.

Reference parity: the reference stack writes syslog rows into ClickHouse
MergeTree tables (`main.go:61-76` builds the INSERT pipeline); the
Collapsing engines are the standard CH answer to row UPDATEs in that
append-only world — an update is written as a (state, +1) insert plus a
(previous state, -1) "cancel", and the engine folds pairs away at merge
time.  Query-time contract (CH docs, "CollapsingMergeTree"): aggregate
with ``sum(sign)`` / ``sum(x * sign)`` or read ``FINAL`` survivors.

Spark-first design: merges are NOT simulated row-by-row.  Both engines'
FINAL reads are exactly one hash aggregation:

- ``collapse_final``: group by the sort key; the survivor is the
  ``max_by(row, order)`` among sign=+1 rows, kept while ``sum(sign) > 0``.
  One shuffle on the key, map-side partials, no window, no join.
- ``versioned_collapse_final``: group by (key, version); cancel pairs
  annihilate inside ``sum(sign)`` no matter the arrival order (the whole
  point of the Versioned engine), groups with net 0 vanish.  Survivor
  multiplicity (an at-least-once producer re-sending a state) is
  preserved as ``net`` — CH keeps those copies too.

Both are mergeable partial aggregates, so they hold at 100 TB: the state
per key is one row + one long, never the row history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def collapse_final(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    sign_col: str = "sign",
    order_col: str = "seq",
) -> DataFrame:
    """FINAL read of a CollapsingMergeTree stream.

    Returns one row per key with ``net_sign > 0``: the latest (by
    ``order_col``) sign=+1 state row, plus ``net_sign``.  Rows whose
    inserts and cancels fully annihilate disappear, matching the
    engine's merge outcome.
    """
    state = F.struct(*[F.col(c) for c in value_cols])
    picked = F.max_by(state, F.when(F.col(sign_col) > 0, F.col(order_col)))
    out = df.groupBy(*keys).agg(
        F.sum(sign_col).cast("bigint").alias("net_sign"),
        picked.alias("_state"),
    )
    cols = [F.col(k) for k in keys]
    cols += [F.col(f"_state.{c}").alias(c) for c in value_cols]
    cols.append(F.col("net_sign"))
    return out.filter(F.col("net_sign") > 0).select(*cols)


def versioned_collapse_final(
    df: DataFrame,
    keys: list[str],
    version_col: str,
    value_cols: list[str],
    sign_col: str = "sign",
) -> DataFrame:
    """FINAL read of a VersionedCollapsingMergeTree stream.

    Cancels pair with inserts by (key, version) regardless of arrival
    order; a (key, version) group survives iff its signs don't sum to
    zero, carrying the surviving multiplicity as ``net``.
    """
    state = F.struct(*[F.col(c) for c in value_cols])
    out = df.groupBy(*keys, version_col).agg(
        F.sum(sign_col).cast("bigint").alias("net"),
        # prefer a +1 state row; an orphaned cancel (insert never arrived)
        # surfaces its own row, as CH would keep it
        F.max_by(state, F.col(sign_col)).alias("_state"),
    )
    cols = [F.col(k) for k in keys] + [F.col(version_col)]
    cols += [F.col(f"_state.{c}").alias(c) for c in value_cols]
    cols.append(F.col("net"))
    return out.filter(F.col("net") != 0).select(*cols)
