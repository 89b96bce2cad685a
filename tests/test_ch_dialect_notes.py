"""Round-12 (verdict directive 7): the dialect's NOTES channel —
``translate_ch_sql_with_notes`` returns ``(spark_sql, notes)`` where
notes carry correct-but-worth-knowing trades (expand-plan distincts,
DOUBLE accumulation, the deterministic same-second funnel stance), so
migrating users see them instead of finding a code comment later."""

from __future__ import annotations

from syslog_handler_with_clickhouse_spark.functions.ch_dialect import (
    translate_ch_sql,
    translate_ch_sql_with_notes,
)


def test_notes_empty_for_plain_queries():
    sql, notes = translate_ch_sql_with_notes(
        "SELECT toStartOfHour(ts) AS h, count() AS n FROM t GROUP BY h"
    )
    assert notes == []
    assert "date_trunc" in sql.lower()


def test_uniq_up_to_emits_expand_plan_note():
    sql, notes = translate_ch_sql_with_notes(
        "SELECT uniqUpTo(10)(x) FROM t"
    )
    assert "least(count(DISTINCT x), CAST(11 AS BIGINT))" in sql
    assert len(notes) == 1
    assert "expand plan" in notes[0] and "q342" in notes[0]


def test_array_reduce_sum_avg_emit_double_note():
    sql, notes = translate_ch_sql_with_notes(
        "SELECT arrayReduce('sum', xs), arrayReduce('avg', xs), "
        "arrayReduce('max', xs) FROM t"
    )
    assert "DOUBLE" in sql
    kinds = [n for n in notes if "DOUBLE" in n]
    assert len(kinds) == 2  # sum + avg; max is exact, no note
    assert any("'sum'" in n for n in kinds)
    assert any("'avg'" in n for n in kinds)


def test_window_funnel_default_mode_notes_same_second_stance():
    sql, notes = translate_ch_sql_with_notes(
        "SELECT windowFunnel(3600)(ts, a, b) FROM t GROUP BY u"
    )
    assert "aggregate(" in sql
    assert any("same epoch second" in n for n in notes)
    # explicit strict_increase mode IS this module's stance: no note
    _, notes2 = translate_ch_sql_with_notes(
        "SELECT windowFunnel(3600, 'strict_increase')(ts, a, b) "
        "FROM t GROUP BY u"
    )
    assert notes2 == []


def test_plain_wrapper_returns_string_only():
    out = translate_ch_sql("SELECT uniqUpTo(10)(x) FROM t")
    assert isinstance(out, str)
    assert "least(count(DISTINCT x)" in out
