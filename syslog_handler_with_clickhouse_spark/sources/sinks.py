"""Sinks: the at-rest log store.

Reference: batched ClickHouse INSERT into `mikrotik_logs`
(`lib/cacheManage.go:35-65`, 10 s deadline, at-most-once).  Spark-first
re-expression: date-partitioned Parquet appends — columnar at rest,
partition-pruned on Timestamp date, exactly-once under streaming
checkpointing (a documented upgrade over the reference's drop-on-error,
`lib/cacheManage.go:60-62`).

An optional JDBC path mirrors the ClickHouse target when a server exists;
it is config only — no engine code depends on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOGS_PARTITION_COL = "log_date"


def write_logs_batch(df: DataFrame, path: str, mode: str = "append") -> None:
    """Date-partitioned Parquet append of a logs-schema DataFrame.

    Partitioning by to_date(Timestamp) gives partition pruning for the
    time-range queries the store exists to serve (SURVEY §1.2); at 100 TB
    this is the difference between scanning a day and scanning the fleet's
    history.
    """
    (
        df.withColumn(LOGS_PARTITION_COL, F.to_date("Timestamp"))
        .write.mode(mode)
        .partitionBy(LOGS_PARTITION_COL)
        .parquet(path)
    )


def read_logs(spark, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(LOGS_PARTITION_COL)


def jdbc_sink_options(url: str, table: str, user: str, password: str) -> dict[str, str]:
    """ClickHouse-over-JDBC options mirroring the reference's connection
    settings: pool of 5 (`main.go:48-51`) → numPartitions; 10 s insert
    deadline (`lib/cacheManage.go:37`) → queryTimeout."""
    return {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "numPartitions": "5",
        "queryTimeout": "10",
        "batchsize": "1000",  # CacheSize, `main.go:19`
    }
