"""Property-based differential test for the parse pipeline.

A direct Python transliteration of ``ParseLog`` (`lib/lopParse.go:29-81`,
minus the parts[1] panic — SURVEY §5 deviation) is the oracle; hypothesis
generates adversarial datagrams (commas, repeated spaces, empty tokens,
severity keywords in odd positions) and the Spark projection must agree
on every field for every line.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from syslog_handler_with_clickhouse_spark.functions.parse import parsed_logs
from syslog_handler_with_clickhouse_spark.schema import (
    DEFAULT_SEVERITY,
    SEVERITY_KEYWORDS,
)

CLOCK = datetime.datetime(2024, 1, 1, 0, 0, 0)


def py_parse(raw: str) -> tuple[int, list[str], str]:
    """Reference semantics, line by line from `lib/lopParse.go:29-81`."""
    parts = raw.split(" ", 1)
    if len(parts) < 2 or len(parts[0].split(",")) < 2:
        return DEFAULT_SEVERITY, ["unknown"], raw
    header, message = parts
    topics = header.split(",")
    categories = [topics[0]] + topics[2:]
    token = topics[1]
    if token in SEVERITY_KEYWORDS:
        severity = SEVERITY_KEYWORDS[token]
    else:
        severity = DEFAULT_SEVERITY
        categories = categories + [token]  # `lopParse.go:69-71`
    return severity, categories, message


# Datagram-ish text: words that are sometimes severity keywords, sometimes
# comma-joined headers, sometimes empty (consecutive separators).
_word = st.one_of(
    st.sampled_from(sorted(SEVERITY_KEYWORDS) + ["firewall", "wlan1", "x", ""]),
    st.text(alphabet="abz19.<>-", max_size=5),
)
_header = st.lists(_word, min_size=1, max_size=4).map(",".join)
_line = st.one_of(
    st.builds(lambda h, m: f"{h} {m}", _header, st.text(alphabet="abc ,", max_size=20)),
    _header,  # no space at all → fallback row
)


@settings(max_examples=12, deadline=None)
@given(st.lists(_line, min_size=1, max_size=25))
def test_spark_parse_matches_reference_semantics(spark, lines):
    rows = [(ln, "10.0.0.1:5514", CLOCK) for ln in lines]
    df = spark.createDataFrame(rows, "raw string, device string, clock timestamp")
    out = parsed_logs(df, clock_col="clock").collect()
    assert len(out) == len(lines)
    for row, ln in zip(out, lines):
        sev, cats, msg = py_parse(ln)
        assert row.Severity == sev, repr(ln)
        assert row.Categories == cats, repr(ln)
        assert row.Message == msg, repr(ln)
        assert row.Device == "10.0.0.1:5514"
        assert 0 <= row.Severity <= 7
