"""Regression pins for the four round-10 ADVICE findings.

1. (medium) formatDateTime %M is setting-dependent on modern ClickHouse
   (minutes pre-23.4, full month name since 23.4's
   formatdatetime_parsedatetime_m_is_month_name=1 default) — the
   translator used to emit Spark 'mm' silently.  Now %M refuses loudly
   and %i (MySQL-compatible minutes, unambiguous in CH) translates.
2. (low) the -State/-Merge combinator guard matched case-insensitively
   on any identifier ending in state/merge, rejecting user UDFs like
   update_state(...).  Now it requires the camelCase combinator shape.
3. (low) _split_top_args/_find_call toggled on bare quotes without the
   backslash/doubled-quote escape rules of _literal_spans, so a literal
   like 'it\\'s (x' corrupted paren depth / comma splits.  All lexers
   now share _scan_literal_end.
4. (low) clustering_coefficients canonicalized edges + computed degrees
   and then triangle_counts redid both.  The frames are now built once
   and shared.
"""

import pytest
from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.functions.ch_dialect import (
    ChTranslationError,
    _split_top_args,
    translate_ch_sql,
)


# ---------------------------------------------------------------- 1
def test_advice1_format_datetime_minute_codes(spark):
    # %M refuses: minutes vs month-name depends on the CH version/setting
    with pytest.raises(ChTranslationError, match="%i"):
        translate_ch_sql("SELECT formatDateTime(ts, '%H:%M:%S') FROM t")
    # %i is the unambiguous minutes code — translates and evaluates
    out = translate_ch_sql(
        "SELECT formatDateTime(ts, '%H:%i:%S') AS hms FROM t"
    )
    assert "date_format" in out and "'HH:mm:ss'" in out
    spark.createDataFrame(
        [("2026-08-15 07:09:03",)], "s string"
    ).selectExpr("CAST(s AS TIMESTAMP) AS ts").createOrReplaceTempView("t")
    assert spark.sql(out).collect()[0].hms == "07:09:03"


# ---------------------------------------------------------------- 2
def test_advice2_state_merge_guard_is_shape_aware():
    # genuine CH combinators still refuse, with the pointer message
    for bad in ("sumState(v)", "uniqMerge(st)", "quantileTDigestState(v)"):
        with pytest.raises(ChTranslationError, match="State/-Merge"):
            translate_ch_sql(f"SELECT {bad} FROM t")
    # user identifiers merely ENDING in state/merge pass through
    for ok in ("update_state(v)", "device_state(v)", "DO_MERGE(v)"):
        out = translate_ch_sql(f"SELECT {ok} FROM t")
        assert ok in out


# ---------------------------------------------------------------- 3
def test_advice3_arg_lexers_honor_literal_escapes():
    # backslash-escaped quote inside an arg: one argument, not two,
    # and the unbalanced-looking '(' inside the literal is data
    assert _split_top_args(r"'it\'s (x, y'") == [r"'it\'s (x, y'"]
    assert _split_top_args(r"'a\'b', c") == [r"'a\'b'", "c"]
    # doubled-quote escape, same rules
    assert _split_top_args("'it''s (x, y'") == ["'it''s (x, y'"]
    # end-to-end through a rewritten call: the literal survives intact
    out = translate_ch_sql(r"SELECT base64Encode('it\'s (x, y') FROM t")
    assert out == r"SELECT base64('it\'s (x, y') FROM t"
    out2 = translate_ch_sql("SELECT base64Encode('it''s (x, y') FROM t")
    assert out2 == "SELECT base64('it''s (x, y') FROM t"


# ---------------------------------------------------------------- 4
def test_advice4_clustering_shares_canonical_edges(spark, monkeypatch):
    from syslog_handler_with_clickhouse_spark.operators import graph

    calls = {"canon": 0, "deg": 0}
    real_canon, real_deg = graph._canonical_undirected, graph._degrees

    def canon(edges):
        calls["canon"] += 1
        return real_canon(edges)

    def degrees(und):
        calls["deg"] += 1
        return real_deg(und)

    monkeypatch.setattr(graph, "_canonical_undirected", canon)
    monkeypatch.setattr(graph, "_degrees", degrees)

    # triangle 1-2-3 plus pendant 3-4 (both directions present to
    # exercise canonicalization)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4)], "src int, dst int"
    )
    cc = graph.clustering_coefficients(edges)
    # one canonicalization, one degree aggregate — not two of each
    assert calls == {"canon": 1, "deg": 1}
    got = {r.node: (r.deg, r.tri_cnt, r.cc_ppm) for r in cc.collect()}
    assert got[1] == (2, 1, 1000000)
    assert got[2] == (2, 1, 1000000)
    assert got[3] == (3, 1, 333333)  # 2*1e6 // (3*2)
    assert got[4] == (1, 0, 0)
