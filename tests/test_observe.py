"""df.observe() metrics — the batch analogue of the reference's per-flush
console accounting (`lib/cacheManage.go:63`): row/value counters collected
as a side effect of the normal action, no second scan."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from conftest import SF_DIR

from syslog_handler_with_clickhouse_spark.sources.testdata import load_table


def test_observe_collects_metrics_without_second_scan(spark):
    ev = load_table(spark, SF_DIR, "events")
    obs = Observation("ingest_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        F.max("ts").alias("max_ts"),
    )
    # one action drives both the query result and the metrics
    out = observed.filter(F.col("event_type") == "error").count()
    m = obs.get
    assert m["n_rows"] == ev.count()
    assert m["n_errors"] == out
    assert m["max_ts"] is not None
