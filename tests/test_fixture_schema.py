"""Regression gate for driver-side fixture regenerations.

The driver has regenerated the ``events`` fixture with different parquet
timestamp physical types across rounds (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)
NTZ).  Every ``ts`` consumer assumes session-TZ TimestampType; the
normalization lives in one place (``sources/testdata.normalize_events_ts``)
and this test makes the NEXT regeneration fail loudly here instead of in 17
scattered queries (round-3 verdict, directive #5).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import TimestampType

from syslog_handler_with_clickhouse_spark.sources.testdata import (
    load_table,
    normalize_events_ts,
)

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_session_tz_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"{sf_dir}/events.parquet: ts surfaced as {df.schema['ts'].dataType}; "
        "extend normalize_events_ts for this fixture generation"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_stream_ts_is_session_tz_timestamp(spark, sf_dir):
    # The streaming twin of the batch loader — the round-3 regression hit
    # exactly the path the batch fix missed.
    from syslog_handler_with_clickhouse_spark.queries import _events_stream

    df = _events_stream(spark, sf_dir)
    assert df.isStreaming
    assert isinstance(df.schema["ts"].dataType, TimestampType)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_normalize_is_idempotent(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    again = normalize_events_ts(df)
    assert again.schema == df.schema
