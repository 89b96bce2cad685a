"""Incremental materialized-view maintenance (sources/mv.py):
incremental == recompute, idempotent replay, state versioning."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.sources.mv import read_mv, refresh_mv
from syslog_handler_with_clickhouse_spark.sources.snapshots import latest_version


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "mv")
    data = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    for i in range(4):
        refresh_mv(data.filter(F.col("v") % 4 == i), path, ["k"], ["v"], batch_id=i)

    full = data.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")
    )
    assert _rows(read_mv(spark, path)) == _rows(full)


def test_duplicate_batch_is_not_double_counted(spark, tmp_path):
    path = str(tmp_path / "mv")
    data = spark.range(0, 100).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    refresh_mv(data, path, ["k"], ["v"], batch_id=0)
    before = _rows(read_mv(spark, path))
    v = latest_version(path)
    # foreachBatch redelivery after a crash between write and checkpoint
    assert refresh_mv(data, path, ["k"], ["v"], batch_id=0) == v
    assert _rows(read_mv(spark, path)) == before


def test_state_versions_time_travel(spark, tmp_path):
    path = str(tmp_path / "mv")
    a = spark.range(0, 10).select(F.lit("g").alias("k"), F.col("id").alias("v"))
    b = spark.range(10, 30).select(F.lit("g").alias("k"), F.col("id").alias("v"))
    refresh_mv(a, path, ["k"], ["v"])
    refresh_mv(b, path, ["k"], ["v"])

    (row,) = read_mv(spark, path).collect()
    assert (row["n"], row["sum_v"]) == (30, sum(range(30)))
    (old,) = read_mv(spark, path, version=1).collect()
    assert (old["n"], old["sum_v"]) == (10, sum(range(10)))


def test_new_groups_join_existing_state(spark, tmp_path):
    path = str(tmp_path / "mv")
    refresh_mv(
        spark.range(0, 5).select(F.lit("a").alias("k"), F.col("id").alias("v")),
        path,
        ["k"],
        ["v"],
    )
    refresh_mv(
        spark.range(0, 4).select(F.lit("b").alias("k"), F.col("id").alias("v")),
        path,
        ["k"],
        ["v"],
    )
    got = {r["k"]: (r["n"], r["sum_v"]) for r in read_mv(spark, path).collect()}
    assert got == {"a": (5, 10), "b": (4, 6)}


def test_changefeed_mv_matches_full_recompute(spark, tmp_path):
    """The changefeed-maintained MV must equal a from-scratch aggregate
    of the final source state after append + delete mutations,
    including a group deleted down to zero (dropped from state)."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.sources.mv import (
        read_mv,
        refresh_mv,
        refresh_mv_from_changefeed,
    )
    from syslog_handler_with_clickhouse_spark.sources.snapshots import (
        read_snapshot,
        rewrite_snapshot,
        write_snapshot,
    )

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    d1 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10), ("c", 100)], "k string, v long"
    )
    write_snapshot(d1, src)  # v1
    refresh_mv(d1, mv, ["k"], ["v"], batch_id=1)
    d2 = spark.createDataFrame([("a", 3), ("d", 7)], "k string, v long")
    write_snapshot(d2, src)  # v2
    refresh_mv_from_changefeed(spark, mv, src, ["k"], ["v"], 1, 2, batch_id=2)
    rewrite_snapshot(spark, src, lambda df: df.filter(F.col("k") != "c"))  # v3
    refresh_mv_from_changefeed(spark, mv, src, ["k"], ["v"], 2, 3, batch_id=3)

    got = {r.k: (r.n, r.sum_v) for r in read_mv(spark, mv).collect()}
    want = {
        r.k: (r.n, r.sum_v)
        for r in read_snapshot(spark, src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert got == want
    assert "c" not in got  # zero-count group dropped, not kept at n=0


def test_wide_state_erasure_recomputes_min_max_uniq(spark, tmp_path):
    """The non-invertible states must survive an erasure that deletes
    the group's CURRENT min, max, and one distinct member — exactly the
    case pure mergeable folding cannot handle (the bounded
    partial-rescan path must fire and produce recompute-exact state)."""
    from syslog_handler_with_clickhouse_spark.sources.mv import (
        finalize_uniq,
        read_mv,
        refresh_mv_wide,
        refresh_mv_wide_from_changefeed,
    )
    from syslog_handler_with_clickhouse_spark.sources.snapshots import (
        read_snapshot,
        rewrite_snapshot,
        write_snapshot,
    )

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    # group 'a': uid 1 holds BOTH the min (-100) and max (900) values;
    # group 'b' untouched by the later erasure
    d1 = spark.createDataFrame(
        [
            ("a", 1, -100.0),
            ("a", 1, 900.0),
            ("a", 2, 5.0),
            ("a", 3, 7.0),
            ("b", 9, 1.0),
        ],
        "k string, uid long, v double",
    )
    write_snapshot(d1, src)  # v1
    refresh_mv_wide(d1, mv, ["k"], ["v"], ["v"], ["uid"], batch_id=1)

    d2 = spark.createDataFrame(
        [("a", 4, 50.0), ("b", 9, 2.0)], "k string, uid long, v double"
    )
    write_snapshot(d2, src)  # v2 (append: mergeable path)
    refresh_mv_wide_from_changefeed(
        spark, mv, src, ["k"], ["v"], ["v"], ["uid"], 1, 2, batch_id=2
    )
    # v3: erase uid 1 -> removes min AND max AND one distinct of 'a'
    rewrite_snapshot(spark, src, lambda df: df.filter(F.col("uid") != 1))
    refresh_mv_wide_from_changefeed(
        spark, mv, src, ["k"], ["v"], ["v"], ["uid"], 2, 3, batch_id=3
    )

    state = read_mv(spark, mv)
    got = {
        r.k: (r.n, r.sum_v, r.min_v, r.max_v, r.uniq)
        for r in state.withColumn(
            "uniq", finalize_uniq(state, "uid")
        ).collect()
    }
    want = {
        r.k: (r.n, r.sum_v, r.min_v, r.max_v, float(r.uniq))
        for r in read_snapshot(spark, src)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.countDistinct("uid").alias("uniq"),
        )
        .collect()
    }
    assert got == want
    assert got["a"] == (3, 62.0, 5.0, 50.0, 3.0)


def test_wide_state_group_deleted_to_zero_dropped(spark, tmp_path):
    from syslog_handler_with_clickhouse_spark.sources.mv import (
        read_mv,
        refresh_mv_wide,
        refresh_mv_wide_from_changefeed,
    )
    from syslog_handler_with_clickhouse_spark.sources.snapshots import (
        rewrite_snapshot,
        write_snapshot,
    )

    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    d1 = spark.createDataFrame(
        [("gone", 1, 1.0), ("stay", 2, 2.0)], "k string, uid long, v double"
    )
    write_snapshot(d1, src)
    refresh_mv_wide(d1, mv, ["k"], ["v"], ["v"], ["uid"], batch_id=1)
    rewrite_snapshot(spark, src, lambda df: df.filter(F.col("k") != "gone"))
    refresh_mv_wide_from_changefeed(
        spark, mv, src, ["k"], ["v"], ["v"], ["uid"], 1, 2, batch_id=2
    )
    assert [r.k for r in read_mv(spark, mv).collect()] == ["stay"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.one_of(
            # insert batch: 1-4 rows of (key, uid, value)
            st.lists(
                st.tuples(
                    st.sampled_from(["a", "b", "c"]),
                    st.integers(min_value=1, max_value=6),
                    st.integers(min_value=-50, max_value=50),
                ),
                min_size=1,
                max_size=4,
            ),
            # delete: by uid (int) or by key (string)
            st.tuples(st.just("uid"), st.integers(min_value=1, max_value=6)),
            st.tuples(st.just("key"), st.sampled_from(["a", "b"])),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_wide_state_random_interleavings_match_recompute(spark, ops):
    """Round-7 verdict #8: hypothesis over random insert/delete
    interleavings — after EVERY version, the incrementally maintained
    wide state (count/sum algebraic fold + min/max/uniq bounded
    partial-rescan) must equal a full recompute of the source snapshot.
    Values are integer-valued doubles so float summation is exact."""
    import tempfile

    from syslog_handler_with_clickhouse_spark.sources.mv import (
        finalize_uniq,
        read_mv,
        refresh_mv_wide,
        refresh_mv_wide_from_changefeed,
    )
    from syslog_handler_with_clickhouse_spark.sources.snapshots import (
        read_snapshot,
        rewrite_snapshot,
        write_snapshot,
    )

    with tempfile.TemporaryDirectory() as td:
        src = f"{td}/src"
        mv = f"{td}/mv"
        # version 1: a fixed seed batch so the MV always initializes
        seed_rows = [("a", 1, 10.0), ("b", 2, -5.0), ("a", 3, 7.0)]
        d0 = spark.createDataFrame(seed_rows, "k string, uid long, v double")
        write_snapshot(d0, src)
        refresh_mv_wide(d0, mv, ["k"], ["v"], ["v"], ["uid"], batch_id=1)
        ver = 1
        for step, op in enumerate(ops):
            if isinstance(op, list):  # insert batch
                batch = spark.createDataFrame(
                    [(k, u, float(v)) for k, u, v in op],
                    "k string, uid long, v double",
                )
                write_snapshot(batch, src)
            else:  # delete
                kind, val = op
                if kind == "uid":
                    rewrite_snapshot(
                        spark, src, lambda df: df.filter(F.col("uid") != val)
                    )
                else:
                    rewrite_snapshot(
                        spark, src, lambda df: df.filter(F.col("k") != val)
                    )
            refresh_mv_wide_from_changefeed(
                spark, mv, src, ["k"], ["v"], ["v"], ["uid"],
                ver, ver + 1, batch_id=step + 2,
            )
            ver += 1
            state = read_mv(spark, mv)
            got = {
                r.k: (r.n, r.sum_v, r.min_v, r.max_v, float(r.uniq))
                for r in state.withColumn(
                    "uniq", finalize_uniq(state, "uid")
                ).collect()
            }
            want = {
                r.k: (r.n, r.sum_v, r.min_v, r.max_v, float(r.uniq))
                for r in read_snapshot(spark, src)
                .groupBy("k")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("v").alias("sum_v"),
                    F.min("v").alias("min_v"),
                    F.max("v").alias("max_v"),
                    F.countDistinct("uid").alias("uniq"),
                )
                .collect()
            }
            assert got == want, (step, op, got, want)


def test_join_mv_pending_release_and_orphans(spark, tmp_path):
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.sources.mv import (
        read_join_mv,
        read_join_mv_pending,
        refresh_join_mv_dim,
        refresh_join_mv_fact,
    )

    root = str(tmp_path / "jmv")
    fact1 = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (9, 7.0)], "k bigint, val double"
    )
    # no dim yet: everything pends
    refresh_join_mv_fact(fact1, root, "k", "grp", "val")
    assert read_join_mv_pending(spark, root).count() == 3  # keys 1,2,9
    # dim arrives for keys 1 and 2 (9 stays orphan)
    dim1 = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, grp string")
    refresh_join_mv_dim(dim1, root, "k", "grp")
    view = {r.grp: (r.n, float(r.s)) for r in read_join_mv(spark, root).collect()}
    assert view == {"a": (2, 30.0), "b": (1, 5.0)}
    pend = read_join_mv_pending(spark, root).collect()
    assert [(r.k, r.n) for r in pend] == [(9, 1)]
    # a second fact batch now folds straight through for known keys
    fact2 = spark.createDataFrame([(2, 1.0), (9, 2.0)], "k bigint, val double")
    refresh_join_mv_fact(fact2, root, "k", "grp", "val")
    view = {r.grp: (r.n, float(r.s)) for r in read_join_mv(spark, root).collect()}
    assert view["b"] == (2, 6.0)
    # re-sending key 1 in a dim batch must NOT double-release anything
    dim2 = spark.createDataFrame([(1, "a"), (9, "c")], "k bigint, grp string")
    refresh_join_mv_dim(dim2, root, "k", "grp")
    view = {r.grp: (r.n, float(r.s)) for r in read_join_mv(spark, root).collect()}
    assert view == {"a": (2, 30.0), "b": (2, 6.0), "c": (2, 9.0)}
    assert read_join_mv_pending(spark, root).count() == 0
