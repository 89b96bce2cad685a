"""Golden tests for the P1-P8 parse pipeline (FIXTURES.md §A).

Expected values derive from `lib/lopParse.go:29-81` semantics, including
the three edge cases SURVEY §5 calls out: space-free datagram (reference
panics — we emit the fallback), unknown severity token (appended to
Categories), and a two-token header (empty topics[2:]).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.functions.parse import (
    parsed_logs,
    with_severity_name,
)

CLOCK = datetime.datetime(2024, 1, 1, 0, 0, 0)

# (raw, expected_severity, expected_categories, expected_message)
GOLDEN = [
    ("firewall,error,forward dropped packet from 1.2.3.4", 3, ["firewall", "forward"], "dropped packet from 1.2.3.4"),
    ("system,info router rebooted", 6, ["system"], "router rebooted"),
    ("wireless,warning,wlan1 signal weak", 4, ["wireless", "wlan1"], "signal weak"),
    ("dhcp,fatal lease db corrupt", 0, ["dhcp"], "lease db corrupt"),
    ("ppp,packet,debugdump raw frame", 7, ["ppp", "debugdump"], "raw frame"),
    # unknown severity token → Severity=6 AND token appended (`lopParse.go:69-71`)
    ("vpn,weird,x tunnel up", 6, ["vpn", "x", "weird"], "tunnel up"),
    # README.md:121 example — header has no comma → fallback
    ("<166>1 2023-10-27T10:00:00+00:00 MyDevice this is a test", 6, ["unknown"],
     "<166>1 2023-10-27T10:00:00+00:00 MyDevice this is a test"),
    # space-free datagram — reference panics (`lopParse.go:33-34`); we fall back
    ("nospace", 6, ["unknown"], "nospace"),
    # two-token header → topics[2:] empty
    ("a,error msg", 3, ["a"], "msg"),
    # emergency keyword shares level 0 with fatal
    ("x,emergency down", 0, ["x"], "down"),
    ("x,raw dump", 7, ["x"], "dump"),
]


def test_parse_golden(spark):
    rows = [(raw, "10.0.0.1:5514", CLOCK) for raw, *_ in GOLDEN]
    df = spark.createDataFrame(rows, "raw string, device string, clock timestamp")
    out = parsed_logs(df, clock_col="clock").collect()
    for row, (raw, sev, cats, msg) in zip(out, GOLDEN):
        assert row.Severity == sev, raw
        assert row.Categories == cats, raw
        assert row.Message == msg, raw
        assert row.Device == "10.0.0.1:5514"
        assert row.Timestamp == CLOCK


def test_parse_schema(spark):
    df = spark.createDataFrame(
        [("a,error b", "d", CLOCK)], "raw string, device string, clock timestamp"
    )
    out = parsed_logs(df, clock_col="clock")
    assert [f.name for f in out.schema.fields] == [
        "Timestamp", "Device", "Severity", "Categories", "Message",
    ]
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["Severity"] == "tinyint"
    assert types["Categories"] == "array<string>"
    assert types["Timestamp"] == "timestamp"


def test_parse_is_codegen_native(spark):
    """The parse must stay JVM-side: no Python UDF (BatchEvalPython) nodes."""
    df = spark.createDataFrame(
        [("a,error b", "d", CLOCK)], "raw string, device string, clock timestamp"
    )
    plan = parsed_logs(df, clock_col="clock")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_severity_name(spark):
    df = spark.createDataFrame(
        [("a,error b", "d", CLOCK)], "raw string, device string, clock timestamp"
    )
    out = with_severity_name(parsed_logs(df, clock_col="clock")).collect()[0]
    assert out.SeverityName == "Error"
