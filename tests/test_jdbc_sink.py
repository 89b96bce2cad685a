"""Round-trip test for the JDBC sink path (SURVEY §2.1 S5).

No ClickHouse server exists in this sandbox, so the writer is exercised
against embedded Derby — already on the Spark classpath (pyspark bundles
derby*.jar for the Hive metastore) — with the reference's connection
settings: pool of 5 → numPartitions (`main.go:48-51`), 10 s deadline →
queryTimeout (`lib/cacheManage.go:37`), batch 1000 (`main.go:19`).
Embedded Derby accepts concurrent same-JVM connections, so the
5-partition concurrent INSERT path runs for real.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.sources.sinks import (
    jdbc_sink_options,
    read_logs_jdbc,
    write_logs_jdbc,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _options(table: str) -> dict[str, str]:
    db = tempfile.mkdtemp(prefix="derby_") + "/logs_db"
    opts = jdbc_sink_options(
        url=f"jdbc:derby:{db};create=true", table=table, user="app", password=""
    )
    opts["driver"] = DERBY_DRIVER
    return opts


def test_jdbc_round_trip_with_pool_settings(spark):
    logs = spark.range(0, 2000).select(
        F.col("id").cast("bigint").alias("event_id"),
        F.concat(F.lit("192.168.0."), (F.col("id") % 250).cast("string")).alias(
            "device"
        ),
        (F.col("id") % 8).cast("int").alias("severity"),
        F.concat(F.lit("msg "), F.col("id").cast("string")).alias("message"),
    )
    opts = _options("mikrotik_logs")
    # 5 partitions → 5 concurrent connections, the reference's pool size
    write_logs_jdbc(logs.repartition(5), opts)

    back = read_logs_jdbc(spark, opts)
    assert back.count() == 2000
    assert sorted(back.columns) == sorted(logs.columns)
    got = {r.event_id: (r.device, r.severity, r.message) for r in back.collect()}
    assert got[7] == ("192.168.0.7", 7, "msg 7")
    assert got[1999] == ("192.168.0.249", 7, "msg 1999")


def test_jdbc_append_accumulates(spark):
    df = spark.range(0, 10).select(
        F.col("id").alias("event_id"),
        F.lit("10.0.0.1").alias("device"),
        F.lit(3).cast("int").alias("severity"),
        F.lit("x").alias("message"),
    )
    opts = _options("append_logs")
    write_logs_jdbc(df, opts)
    write_logs_jdbc(df, opts)  # second micro-batch appends, not replaces
    assert read_logs_jdbc(spark, opts).count() == 20
