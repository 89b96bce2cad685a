"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 step 1): errors per device per minute.

    The reference's raison d'être — the time-series severity query the
    `mikrotik_logs` ClickHouse table exists to answer — run over the
    events fixture (event_type='error' standing in for Severity<=3).
    """
    from syslog_handler_with_clickhouse_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.window("ts", "1 minute").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("minute"),
            F.col("user_id").alias("device"),
            "n_errors",
        )
        .orderBy(F.col("minute"), F.col("device"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from syslog_handler_with_clickhouse_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from syslog_handler_with_clickhouse_spark.queries import all_oracle_sql

    return all_oracle_sql()
