"""Exact compressed-bitmap aggregate family (operators/bitmaps.py) —
kernel properties, canonical form, merge-equals-monolithic, and the
hypothesis differential against Python set algebra."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from syslog_handler_with_clickhouse_spark.operators.bitmaps import (
    and_runs,
    andnot_runs,
    bitmap_set_algebra,
    group_bitmap,
    merge_runs,
    runs_cardinality,
    runs_from_values,
    xor_runs,
)


def _members(runs):
    out = set()
    for i in range(0, len(runs), 2):
        out.update(range(runs[i], runs[i + 1] + 1))
    return out


def _canonical(runs):
    """Canonical form: interleaved, lo<=hi, strictly separated runs."""
    pairs = [(runs[i], runs[i + 1]) for i in range(0, len(runs), 2)]
    assert all(lo <= hi for lo, hi in pairs)
    assert all(
        pairs[i][1] + 1 < pairs[i + 1][0] for i in range(len(pairs) - 1)
    )


sets = st.sets(st.integers(min_value=-500, max_value=500), max_size=80)


@settings(max_examples=200, deadline=None)
@given(sets, sets)
def test_run_algebra_matches_set_algebra(a, b):
    ra, rb = runs_from_values(a), runs_from_values(b)
    _canonical(ra)
    _canonical(rb)
    assert _members(ra) == a
    for runs, want in (
        (and_runs(ra, rb), a & b),
        (merge_runs([ra, rb]), a | b),
        (xor_runs(ra, rb), a ^ b),
        (andnot_runs(ra, rb), a - b),
    ):
        _canonical(runs)
        assert _members(runs) == want
        assert runs_cardinality(runs) == len(want)


@settings(max_examples=50, deadline=None)
@given(st.lists(sets, min_size=1, max_size=6))
def test_merge_order_free(parts):
    """Canonical encoding makes the k-way union independent of arrival
    order — the mergeability property the MV/AggregatingMergeTree
    analogue depends on."""
    run_lists = [runs_from_values(p) for p in parts]
    want = merge_runs(run_lists)
    rng = random.Random(7)
    for _ in range(3):
        rng.shuffle(run_lists)
        assert merge_runs(run_lists) == want
    assert _members(want) == set().union(*parts)


def test_runs_from_values_compresses_dense_ranges():
    runs = runs_from_values(list(range(1000)) + [5000] + list(range(1000)))
    assert runs == [0, 999, 5000, 5000]
    assert runs_cardinality(runs) == 1001


def test_group_bitmap_merge_equals_monolithic(spark):
    """The defining distributed property: the bitmap built from 32
    partitions is BIT-IDENTICAL (same canonical run array) to the one
    built from a single partition."""
    rows = [("g", (i * 37) % 2000) for i in range(30_000)] + [
        ("h", i % 50) for i in range(1_000)
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    one = {
        r.grp: (list(r.runs), r.cardinality)
        for r in group_bitmap(df.coalesce(1), "v", ["grp"]).collect()
    }
    many = {
        r.grp: (list(r.runs), r.cardinality)
        for r in group_bitmap(df.repartition(32), "v", ["grp"]).collect()
    }
    assert one == many
    assert many["g"][1] == 2000  # gcd(37, 2000)=1 -> full coverage
    assert many["h"] == ([0, 49], 50)


def test_group_bitmap_null_values_dropped(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2), ("g", None)], "grp string, v long"
    )
    out = group_bitmap(df, "v", ["grp"]).collect()[0]
    assert list(out.runs) == [1, 2] and out.cardinality == 2


def test_bitmap_set_algebra_exact(spark):
    a_vals = set(range(0, 150)) | {500, 700}
    b_vals = set(range(100, 250)) | {700, 900}
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(rows, "grp string, v long").repartition(8)
    states = group_bitmap(df, "v", ["grp"])
    out = bitmap_set_algebra(states, "grp", "a", "b").collect()[0]
    assert out.card_a == len(a_vals)
    assert out.card_b == len(b_vals)
    assert out.and_card == len(a_vals & b_vals)
    assert out.or_card == len(a_vals | b_vals)
    assert out.xor_card == len(a_vals ^ b_vals)
    assert out.andnot_card == len(a_vals - b_vals)


def test_group_bitmap_no_group_cols(spark):
    df = spark.createDataFrame([(v,) for v in (3, 1, 2, 9)], "v long")
    out = group_bitmap(df.repartition(4), "v", []).collect()
    assert len(out) == 1
    assert list(out[0].runs) == [1, 3, 9, 9]
    assert out[0].cardinality == 4


def test_group_bitmap_global_empty_input(spark):
    """ADVICE r8: an empty input to the global (no group cols) path must
    return the identity bitmap (runs=[], cardinality=0), not raise from
    pd.concat on an empty iterator."""
    df = spark.createDataFrame([], "v long")
    out = group_bitmap(df, "v", []).collect()
    assert len(out) == 1
    assert list(out[0].runs) == [] and out[0].cardinality == 0
    # all-NULL input reduces to the same identity
    df2 = spark.createDataFrame([(None,), (None,)], "v long")
    out2 = group_bitmap(df2.repartition(3), "v", []).collect()
    assert len(out2) == 1
    assert list(out2[0].runs) == [] and out2[0].cardinality == 0


@settings(max_examples=200, deadline=None)
@given(sets, sets, st.integers(min_value=-500, max_value=500))
def test_predicate_kernels_match_set_semantics(a, b, v):
    """bitmapHasAny == non-empty intersection; bitmapHasAll(a,b) ==
    b ⊆ a; bitmapContains == membership — differential against Python
    set algebra, including the empty-bitmap identities."""
    from syslog_handler_with_clickhouse_spark.operators.bitmaps import (
        runs_contains,
        runs_has_all,
        runs_has_any,
    )

    ra, rb = runs_from_values(a), runs_from_values(b)
    assert runs_has_any(ra, rb) == bool(a & b)
    assert runs_has_all(ra, rb) == (b <= a)
    assert runs_has_all(rb, ra) == (a <= b)
    assert runs_contains(ra, v) == (v in a)


def test_bitmap_predicate_matrix_distributed(spark):
    from syslog_handler_with_clickhouse_spark.operators.bitmaps import (
        bitmap_predicate_matrix,
    )

    data = {
        "a": set(range(0, 100)) | {500},
        "b": set(range(10, 50)),          # subset of a
        "c": set(range(90, 120)) | {900},  # overlaps a, not subset
        "d": {2000, 2001},                 # disjoint from all others
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, v long").repartition(6)
    states = group_bitmap(df, "v", ["grp"])
    out = {
        (r.grp_a, r.grp_b): r
        for r in bitmap_predicate_matrix(states, "grp", [500, 42]).collect()
    }
    for ga, sa in data.items():
        for gb, sb in data.items():
            r = out[(ga, gb)]
            assert r.has_any == bool(sa & sb), (ga, gb)
            assert r.has_all == (sb <= sa), (ga, gb)
            assert r.and_card == len(sa & sb), (ga, gb)
            assert r.contains_0 == (500 in sa)
            assert r.contains_1 == (42 in sa)
