"""Seeded SQL fuzz differential — the sqllogictest-style corpus the
reference lacks (SURVEY §5).

A deterministic generator composes ANSI-SQL statements from a grammar of
predicates, aggregates, and projections that BOTH engines parse, then the
IDENTICAL SQL text runs through spark.sql and DuckDB over the same events
fixture.  Results must agree row-for-row (columns sorted, rows sorted) —
any Catalyst/DuckDB semantic divergence in the covered surface fails a
concrete reproducible statement.

Determinism rules baked into the grammar (repo-wide oracle-parity rules):
decimal-exact sums cast to double AFTER aggregation, integer arithmetic
everywhere else, no floating literals except through exact decimals.
"""

from __future__ import annotations

import math
import random

import pytest

from conftest import SF_DIR

PREDICATES = [
    "value > 10.00",
    "value <= 3.50",
    "event_type = 'click'",
    "event_type <> 'error'",
    "event_type IN ('view', 'purchase')",
    "user_id % 7 = 3",
    "user_id BETWEEN 10 AND 60",
    "event_id % 2 = 0",
    "ts < TIMESTAMP '2024-01-10 00:00:00'",
    "ts >= TIMESTAMP '2024-01-05 12:00:00'",
]

GROUP_KEYS = [
    "event_type",
    "user_id % 10",
    "user_id % 3",
]

AGGS = [
    "COUNT(*) AS cnt",
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val",
    "MIN(event_id) AS min_id",
    "MAX(event_id) AS max_id",
    "MIN(user_id) AS min_uid",
    "MAX(user_id) AS max_uid",
    "COUNT(DISTINCT user_id) AS n_users",
    "COUNT(CASE WHEN value > 8.00 THEN 1 END) AS n_big",
]

PROJ_EXPRS = [
    "event_id",
    "user_id",
    "user_id * 3 + 1 AS uid3",
    "event_id % 97 AS bucket",
    "length(event_type) AS tlen",
    "upper(event_type) AS tup",
    "CASE WHEN value > 9.00 THEN 'hi' ELSE 'lo' END AS band",
]


WINDOW_EXPRS = [
    "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn",
    "RANK() OVER (PARTITION BY event_type ORDER BY event_id) AS rk",
    "LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id",
    "COUNT(*) OVER (PARTITION BY user_id) AS n_user",
    "SUM(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id"
    " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS run_sum",
]

# Window FRAME productions (round-4 verdict item 6): explicit ROWS/RANGE
# bounds, empty frames (.. AND 2 PRECEDING -> NULL), full-partition
# frames, offset/dist functions.  ORDER BY keys are total orders
# (ts, event_id unique) so every value is engine-deterministic; the only
# float output is PERCENT_RANK, which both engines compute as the same
# single (rank-1)/(n-1) division.
FRAME_EXPRS = [
    "SUM(event_id) OVER (PARTITION BY user_id % 5 ORDER BY ts, event_id"
    " ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS f_sum_rows",
    "MIN(event_id) OVER (PARTITION BY event_type ORDER BY event_id"
    " RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS f_min_range",
    "MAX(user_id) OVER (PARTITION BY event_type ORDER BY event_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) AS f_max_empty",
    "LAST_VALUE(event_id) OVER (PARTITION BY user_id % 3 ORDER BY ts, event_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS f_last_full",
    "FIRST_VALUE(event_id) OVER (PARTITION BY user_id % 7 ORDER BY ts, event_id"
    " ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS f_first_win",
    "COUNT(*) OVER (PARTITION BY event_type ORDER BY event_id"
    " RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING) AS f_cnt_range",
    "NTILE(7) OVER (ORDER BY event_id) AS f_ntile",
    "LEAD(event_id, 3, -1) OVER (PARTITION BY user_id % 4"
    " ORDER BY ts, event_id) AS f_lead_def",
    "DENSE_RANK() OVER (PARTITION BY event_type ORDER BY user_id) AS f_drank",
    "PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY event_id) AS f_prank",
]

# Array-function productions (round-4 verdict item 6).  Arrays are built
# with split() (the constructor both engines share — array()/[..]
# literals parse on only one engine each) and always REDUCED to scalars
# or compared whole (=) so no engine-specific array rendering reaches
# the comparator; array_distinct order is engine-specific, hence always
# wrapped in array_sort.  array_position is 1-based on both engines.
ARRAY_EXPRS = [
    "array_contains(split(event_type, 'i'), 'cl') AS a_contains",
    "array_position(array_sort(split(event_type, 'e')), 'v') AS a_pos",
    "array_position(split(event_type, 'c'), 'li') AS a_pos2",
    "array_contains(filter(split(event_type, 'u'), x -> length(x) > 2),"
    " 'rchase') AS a_filter",
    "array_sort(filter(split(event_type, 'r'), x -> x > 'c'))"
    " = array_sort(split(event_type, 'r')) AS a_filter_eq",
    "array_sort(array_distinct(split(event_type, 'e')))"
    " = array_sort(split(event_type, 'e')) AS a_distinct_eq",
    "array_contains(split(event_type, 'a'), 'p') AS a_contains2",
]


# JOIN productions (round-5 verdict #8): two-table equi-joins over the
# fixture FK pairs (orders.o_custkey → customer.c_custkey,
# customer.c_nationkey → nation.n_nationkey), in the four shapes the
# engine must agree on — inner, left-with-aggregated-dim (NULL padding),
# semi (IN over a non-null FK), and anti (NOT EXISTS, correlated).
# Aggregates stay COUNT/MIN/MAX (exact integers) or the decimal-exact
# SUM rule; join outputs need no ORDER BY because the comparator sorts.
ORDER_PREDICATES = [
    "o.o_totalprice > 150000.00",
    "o.o_totalprice <= 80000.00",
    "o.o_orderpriority = '1-URGENT'",
    "o.o_orderpriority <> '5-LOW'",
    "o.o_orderkey % 5 = 0",
    "o.o_orderdate >= DATE '1995-01-01'",
    "o.o_orderdate < DATE '1997-06-01'",
]

CUST_PREDICATES = [
    "c.c_mktsegment = 'BUILDING'",
    "c.c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')",
    "c.c_custkey % 3 = 1",
    "c.c_acctbal > 1000.00",
    "c.c_nationkey BETWEEN 5 AND 20",
]


# Window-over-join productions (round-6 verdict #8): rank/frame windows
# computed over the joined orders×customer frame — the partition key
# comes from the DIM side, the order key from the FACT side, so the
# window runs after the join shuffle.  ORDER BY keys are total orders
# (o_orderkey unique, or date tie-broken by it); only integer outputs
# reach the comparator (decimals stay inside ORDER BY).
WINDOW_JOIN_EXPRS = [
    "RANK() OVER (PARTITION BY c.c_mktsegment"
    " ORDER BY o.o_totalprice, o.o_orderkey) AS wj_rank",
    "ROW_NUMBER() OVER (PARTITION BY c.c_custkey"
    " ORDER BY o.o_orderdate, o.o_orderkey) AS wj_rn",
    "SUM(o.o_orderkey) OVER (PARTITION BY c.c_mktsegment"
    " ORDER BY o.o_orderkey"
    " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS wj_runsum",
    "LAG(o.o_orderkey) OVER (PARTITION BY c.c_nationkey"
    " ORDER BY o.o_orderdate, o.o_orderkey) AS wj_prev",
    "COUNT(*) OVER (PARTITION BY c.c_mktsegment ORDER BY o.o_orderkey"
    " RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS wj_cntrange",
    "DENSE_RANK() OVER (PARTITION BY c.c_nationkey"
    " ORDER BY o.o_custkey) AS wj_drank",
    "MAX(o.o_orderkey) OVER (PARTITION BY c.c_mktsegment"
    " ORDER BY o.o_orderkey"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wj_maxprec",
]


def _gen_join_statement(rng: random.Random) -> str:
    opred = " AND ".join(rng.sample(ORDER_PREDICATES, rng.randint(1, 2)))
    cpred = rng.choice(CUST_PREDICATES)
    form = rng.random()
    if form < 0.20:  # inner FK join, row-level output
        return (
            "SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            f"WHERE {opred} AND {cpred}"
        )
    if form < 0.68 and form >= 0.58:  # window over a joined frame
        wins = ", ".join(rng.sample(WINDOW_JOIN_EXPRS, rng.randint(1, 2)))
        return (
            f"SELECT o.o_orderkey, {wins} "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            f"WHERE {opred} AND {cpred}"
        )
    if form < 0.58 and form >= 0.50:  # 3-table chain + window over dim key
        win = rng.choice(
            [
                "ROW_NUMBER() OVER (PARTITION BY n.n_name"
                " ORDER BY o.o_orderkey) AS rn3",
                "RANK() OVER (PARTITION BY n.n_regionkey"
                " ORDER BY o.o_totalprice, o.o_orderkey) AS rk3",
                "SUM(c.c_nationkey) OVER (PARTITION BY n.n_name"
                " ORDER BY o.o_orderkey ROWS BETWEEN 1 PRECEDING"
                " AND 1 FOLLOWING) AS ws3",
            ]
        )
        return (
            f"SELECT o.o_orderkey, n.n_name, {win} "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            f"WHERE {opred} AND {cpred}"
        )
    if form < 0.45:  # inner join + group (the broadcast-dim agg shape)
        agg = rng.choice(
            [
                "COUNT(*) AS cnt",
                "MIN(o.o_orderkey) AS mn",
                "MAX(o.o_custkey) AS mx",
                "COUNT(DISTINCT c.c_custkey) AS n_cust",
            ]
        )
        return (
            f"SELECT c.c_mktsegment AS k, {agg} "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            f"WHERE {opred} GROUP BY c.c_mktsegment"
        )
    if form < 0.62:  # LEFT join against an aggregated dim (NULL padding)
        return (
            "SELECT c.c_custkey, d.n FROM customer c LEFT JOIN "
            f"(SELECT o_custkey, COUNT(*) AS n FROM orders o WHERE {opred} "
            "GROUP BY o_custkey) d ON c.c_custkey = d.o_custkey "
            f"WHERE {cpred}"
        )
    if form < 0.80:  # semi join: IN over the non-null FK
        return (
            "SELECT c.c_custkey, c.c_mktsegment FROM customer c "
            f"WHERE {cpred} AND c.c_custkey IN "
            f"(SELECT o.o_custkey FROM orders o WHERE {opred})"
        )
    if form < 0.92:  # anti join: correlated NOT EXISTS
        return (
            "SELECT c.c_custkey FROM customer c "
            f"WHERE {cpred} AND NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            f"AND {opred})"
        )
    # three-way with the tiny nation dim
    return (
        "SELECT n.n_name AS k, COUNT(*) AS cnt "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        f"WHERE {opred} GROUP BY n.n_name"
    )


# Interval/window-agg productions (round-7 verdict #6): the sweep-line
# (q333 intervalLengthSum) and max-intersections (q336) shapes share the
# subtle EXCLUSIVE-frame semantics (cummax over ROWS BETWEEN UNBOUNDED
# PRECEDING AND 1 PRECEDING; running sum over collapsed +1/-1 deltas) —
# the two most divergence-prone window idioms in the native families.
# Intervals are [lo, hi) built from integer columns so all outputs are
# exact integers; per-position delta collapse makes the running sum
# tie-free, and duplicate (lo, hi) rows are symmetric under the
# aggregate, so results are engine-deterministic without a total order.
INTERVAL_GROUPS = ["event_type", "user_id % 5", "event_id % 3"]
INTERVAL_WIDTHS = [
    "event_id % 7 + 1",
    "event_id % 13 + 1",
    "event_id % 29 + 1",
    "user_id % 11 + 2",
]


def _gen_interval_statement(rng: random.Random) -> str:
    g = rng.choice(INTERVAL_GROUPS)
    wexpr = rng.choice(INTERVAL_WIDTHS)
    pred = " AND ".join(rng.sample(PREDICATES, rng.randint(1, 2)))
    iv = (
        f"SELECT {g} AS g, user_id AS lo, user_id + {wexpr} AS hi "
        f"FROM events WHERE {pred}"
    )
    if rng.random() < 0.5:  # sweep-line union length + merged count
        return (
            "WITH iv AS (" + iv + "), sw AS ("
            " SELECT g, lo, hi,"
            " MAX(hi) OVER (PARTITION BY g ORDER BY lo, hi"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm"
            " FROM iv)"
            " SELECT g,"
            " CAST(SUM(GREATEST(hi - GREATEST(lo, COALESCE(pm, lo)), 0))"
            " AS BIGINT) AS union_len,"
            " CAST(SUM(CASE WHEN pm IS NULL OR lo > pm THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_merged"
            " FROM sw GROUP BY g"
        )
    # max-intersections / position of first maximum
    return (
        "WITH iv AS (" + iv + "), deltas AS ("
        " SELECT g, pos, SUM(d) AS dd FROM ("
        " SELECT g, lo AS pos, 1 AS d FROM iv"
        " UNION ALL SELECT g, hi AS pos, -1 AS d FROM iv) u"
        " GROUP BY g, pos), run AS ("
        " SELECT g, pos, SUM(dd) OVER (PARTITION BY g ORDER BY pos) AS cur"
        " FROM deltas)"
        " SELECT g, CAST(MAX(cur) AS BIGINT) AS max_conc,"
        " CAST(MIN(CASE WHEN cur = mx THEN pos END) AS BIGINT) AS max_pos"
        " FROM (SELECT g, pos, cur, MAX(cur) OVER (PARTITION BY g) AS mx"
        " FROM run) t GROUP BY g"
    )


def _gen_statement(rng: random.Random) -> str:
    r0 = rng.random()
    if r0 < 0.15:
        return _gen_join_statement(rng)
    if r0 < 0.24:
        return _gen_interval_statement(rng)
    where = " AND ".join(rng.sample(PREDICATES, rng.randint(1, 3)))
    if rng.random() < 0.3:
        extra = rng.choice(PREDICATES)
        where = f"({where}) OR ({extra})"
    form = rng.random()
    if form < 0.30:  # aggregate
        key = rng.choice(GROUP_KEYS)
        aggs = ", ".join(rng.sample(AGGS, rng.randint(1, 4)))
        return f"SELECT {key} AS k, {aggs} FROM events WHERE {where} GROUP BY {key}"
    if form < 0.42:  # window functions
        wins = ", ".join(rng.sample(WINDOW_EXPRS, rng.randint(1, 2)))
        return f"SELECT event_id, {wins} FROM events WHERE {where}"
    if form < 0.55:  # window FRAMES
        wins = ", ".join(rng.sample(FRAME_EXPRS, rng.randint(1, 3)))
        return f"SELECT event_id, {wins} FROM events WHERE {where}"
    if form < 0.62:  # array functions
        arrs = ", ".join(rng.sample(ARRAY_EXPRS, rng.randint(1, 3)))
        return f"SELECT event_id, {arrs} FROM events WHERE {where}"
    if form < 0.70:  # self-join dim: per-type stats joined back
        agg = rng.choice(
            ["COUNT(*) AS c", "MIN(event_id) AS c", "COUNT(DISTINCT user_id) AS c"]
        )
        return (
            f"SELECT e.event_id, d.c FROM events e JOIN "
            f"(SELECT event_type, {agg} FROM events GROUP BY event_type) d "
            f"ON e.event_type = d.event_type WHERE {where.replace('value', 'e.value').replace('user_id', 'e.user_id').replace('event_id', 'e.event_id').replace('event_type ', 'e.event_type ').replace('ts ', 'e.ts ')}"
        )
    if form < 0.85:  # total-order top-N
        return (
            f"SELECT event_id, user_id FROM events WHERE {where} "
            f"ORDER BY user_id, event_id LIMIT 50"
        )
    cols = ", ".join(rng.sample(PROJ_EXPRS, rng.randint(1, 4)))
    return f"SELECT {cols} FROM events WHERE {where}"


def _normalize(df):
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple(v.isoformat() if hasattr(v, "isoformat") else v for v in tup))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


@pytest.fixture(scope="module")
def events_view(spark, duck):
    from syslog_handler_with_clickhouse_spark.sources.testdata import load_table

    # events plus the FK-pair tables the JOIN productions reference
    for name in ("events", "orders", "customer", "nation"):
        load_table(spark, SF_DIR, name).createOrReplaceTempView(name)
    return None


def test_sql_fuzz_differential(spark, duck, events_view):
    """Fresh-seed 300-statement run per invocation (round-4 verdict
    item 6 — the one-off fresh-seed sweep is now the checked-in
    default).  Every run explores a new region of the grammar; a failure
    message carries the seed AND the exact statement, so any divergence
    is reproducible with SPARK_GRAFT_FUZZ_SEED."""
    import os

    seed_env = os.environ.get("SPARK_GRAFT_FUZZ_SEED")
    seed = int(seed_env) if seed_env else int.from_bytes(os.urandom(6), "big")
    n_stmts = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "300"))
    rng = random.Random(seed)
    failures = []
    for i in range(n_stmts):
        sql = _gen_statement(rng)
        sdf = spark.sql(sql).toPandas()
        odf = duck.execute(sql).df()
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((i, sql, "columns", sorted(sdf.columns), sorted(odf.columns)))
            continue
        if len(sdf) != len(odf):
            failures.append((i, sql, "rowcount", len(sdf), len(odf)))
            continue
        s_rows, o_rows = _normalize(sdf), _normalize(odf)
        for sr, orr in zip(s_rows, o_rows):
            if len(sr) != len(orr) or not all(_eq(a, b) for a, b in zip(sr, orr)):
                failures.append((i, sql, "values", sr, orr))
                break
    assert not failures, (
        f"{len(failures)} divergent statements (seed={seed}, "
        f"rerun with SPARK_GRAFT_FUZZ_SEED={seed}); first: {failures[0]}"
    )
