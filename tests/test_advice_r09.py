"""Round-9 ADVICE regression tests — one per advisor finding:

1. (medium) translate_ch_sql rewrote CH function patterns INSIDE string
   literals (``msg = 'call match(a, b) now'`` became regexp_like),
   silently changing literal values.  All rules — the call rewriter and
   the bare keyword/regex rules — now skip quoted spans
   (functions/ch_dialect.py:_literal_spans).
2. (medium) toStartOfWeek translated to date_trunc('week', x), which is
   Monday-based in Spark, while CH's default mode 0 is Sunday-based —
   every translated week bucket was shifted.  Now mode-aware Sunday /
   Monday date arithmetic returning a DATE.
3. (low) ANY JOIN's dedup window ordered by the partition keys
   themselves, so all rows tied and the kept row was nondeterministic.
   Now ordered by the full-row JSON serialization — a content-based
   total order.
4. (low) is_ipv6_string rejected '::' compressing a SINGLE zero group
   (e.g. '1:2:3:4:5:6:7::') though CH/inet_pton — and parse_ipv6
   itself — accept it.  Bound relaxed to target-1; RFC 5952's
   one-group rule still binds format_ipv6's OUTPUT only.
5. (low) uniq_up_to cast the counted column to long, silently dropping
   non-numeric values (string user ids -> NULL -> count 0).  Values now
   travel as their Spark string cast — injective for atomic types, so
   the count stays exact on any column type.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.functions.ch_dialect import (
    ChTranslationError,
    translate_ch_sql,
)


# ---------------------------------------------------------------- 1
def test_advice1_literals_never_rewritten():
    cases = [
        # the advisor's exact reproduction
        ("SELECT x FROM t WHERE msg = 'call match(a, b) now'",
         "'call match(a, b) now'"),
        ("SELECT count() FROM t WHERE msg != 'count() any(x) countIf(y)'",
         "'count() any(x) countIf(y)'"),
        ("SELECT splitByChar(',', csv) FROM t WHERE note = 'ARRAY JOIN x AS y'",
         "'ARRAY JOIN x AS y'"),
        ("SELECT x FROM t WHERE a = 'toStartOfWeek(ts) quantile(0.9)(v)'",
         "'toStartOfWeek(ts) quantile(0.9)(v)'"),
    ]
    for sql, lit in cases:
        out = translate_ch_sql(sql)
        assert lit in out, (sql, out)
    # bare-regex rules too: count() translated outside, preserved inside
    out = translate_ch_sql(
        "SELECT count() FROM t WHERE msg = 'count() here'"
    )
    assert out == "SELECT count(*) FROM t WHERE msg = 'count() here'"


def test_advice1_literal_escapes():
    # SQL doubled-quote and backslash escapes both delimit correctly
    out = translate_ch_sql(
        "SELECT count() FROM t WHERE a = 'it''s match(x, y)' "
        "AND b = 'p\\'q any(z)'"
    )
    assert "match(x, y)" in out and "any(z)" in out
    assert "regexp_like" not in out and "first(" not in out
    assert out.startswith("SELECT count(*)")


def test_advice1_clause_keywords_in_literals_do_not_fire():
    # SAMPLE/FINAL inside a literal must not raise; PREWHERE inside a
    # literal must not be rewritten
    out = translate_ch_sql(
        "SELECT count() FROM t WHERE msg = 'SAMPLE FINAL WITH TOTALS'"
    )
    assert "'SAMPLE FINAL WITH TOTALS'" in out
    out = translate_ch_sql("SELECT x FROM t WHERE m = 'PREWHERE y'")
    assert "'PREWHERE y'" in out
    # ...while the real clause still raises / rewrites
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT x FROM t FINAL")
    assert translate_ch_sql("SELECT x FROM t PREWHERE y > 0").endswith(
        "WHERE y > 0"
    )


# ---------------------------------------------------------------- 2
def test_advice2_to_start_of_week_sunday_default(spark):
    out = translate_ch_sql(
        "SELECT toStartOfWeek(d) AS w0, toStartOfWeek(d, 1) AS w1 FROM wk"
    )
    assert "date_trunc('week'" not in out
    rows = [
        ("2026-08-14",),  # Friday
        ("2026-08-09",),  # Sunday (fixed point of mode 0)
        ("2026-08-10",),  # Monday (fixed point of mode 1)
        ("2026-08-15",),  # Saturday
    ]
    spark.createDataFrame(rows, "d string").createOrReplaceTempView("wk")
    got = {r.d: (r.w0, r.w1) for r in spark.sql(
        out.replace("SELECT ", "SELECT d, ", 1)
    ).collect()}
    D = datetime.date
    assert got["2026-08-14"] == (D(2026, 8, 9), D(2026, 8, 10))
    assert got["2026-08-09"] == (D(2026, 8, 9), D(2026, 8, 3))
    assert got["2026-08-10"] == (D(2026, 8, 9), D(2026, 8, 10))
    assert got["2026-08-15"] == (D(2026, 8, 9), D(2026, 8, 10))
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT toStartOfWeek(d, 9) FROM t")
    with pytest.raises(ChTranslationError):
        translate_ch_sql("SELECT toStartOfWeek(d, mode_col) FROM t")


# ---------------------------------------------------------------- 3
def test_advice3_any_join_pick_is_deterministic(spark):
    # duplicate right-side keys whose rows differ; present the right
    # side in opposite physical orders — the kept row must not flap
    left = spark.createDataFrame([(1,), (2,)], "k int")
    rows = [(1, "b"), (1, "a"), (2, "z"), (2, "y")]
    sql = "SELECT k, v FROM lhs ANY LEFT JOIN rhs USING (k) ORDER BY k"
    out = translate_ch_sql(sql)
    assert "_ord_any" in out  # content-hash tiebreaker column
    results = []
    for order in (rows, rows[::-1]):
        left.createOrReplaceTempView("lhs")
        spark.createDataFrame(order, "k int, v string").repartition(
            4
        ).createOrReplaceTempView("rhs")
        results.append([tuple(r) for r in spark.sql(out).collect()])
    assert results[0] == results[1]
    # content-based pick (round-10 directive 8: xxhash64 over the row
    # struct replaced the per-row to_json serialization): the kept row
    # per key is the one with the minimum signed xxhash64(struct(*))
    best = {}
    for r in spark.createDataFrame(rows, "k int, v string").selectExpr(
        "k", "v", "xxhash64(struct(*)) AS h"
    ).collect():
        if r.k not in best or r.h < best[r.k][0]:
            best[r.k] = (r.h, r.v)
    assert results[0] == [(1, best[1][1]), (2, best[2][1])]


# ---------------------------------------------------------------- 4
def test_advice4_single_zero_group_compression_accepted(spark):
    from syslog_handler_with_clickhouse_spark.functions.ip6 import (
        is_ipv6_string,
        parse_ipv6,
    )

    accept = ["1:2:3:4:5:6:7::", "::2:3:4:5:6:7:8", "1::3:4:5:6:7:8",
              "1:2:3:4:5::6.7.8.9"]  # v4 tail: '::' = the one zero hextet
    reject = ["1:2:3:4:5:6:7:8::", "::1:2:3:4:5:6:7:8"]
    df = spark.createDataFrame(
        [(s, True) for s in accept] + [(s, False) for s in reject],
        "s string, want boolean",
    )
    bad = df.select(
        "s", "want", is_ipv6_string(F.col("s")).alias("got")
    ).filter(F.col("want") != F.col("got")).collect()
    assert bad == [], bad
    # validator and parser agree on the advisor's example
    r = spark.range(1).select(
        parse_ipv6(F.lit("1:2:3:4:5:6:7::")).alias("h")
    ).collect()[0]
    assert list(r.h) == [1, 2, 3, 4, 5, 6, 7, 0]


# ---------------------------------------------------------------- 5
def test_advice5_uniq_up_to_non_numeric(spark):
    from syslog_handler_with_clickhouse_spark.operators.sketches import (
        uniq_up_to,
    )

    rows = [("a", f"user{i % 7}") for i in range(40)] + [
        ("b", f"user{i}") for i in range(12)
    ]
    df = spark.createDataFrame(rows, "grp string, uid string").repartition(4)
    got = {
        r.grp: r.uniq_up_to
        for r in uniq_up_to(df, "uid", ["grp"], 10).collect()
    }
    assert got == {"a": 7, "b": 11}  # exact below cap, N+1 above
    # numeric columns still exact (regression guard for the old path)
    dfn = spark.createDataFrame(
        [("a", i % 5) for i in range(30)], "grp string, v int"
    )
    got = {
        r.grp: r.uniq_up_to for r in uniq_up_to(dfn, "v", ["grp"], 10).collect()
    }
    assert got == {"a": 5}
