"""Loaders for the driver-generated fixture tables (TESTDATA.md).

Batch scans of columnar parquet — the Spark analogue of querying the
ClickHouse table the reference feeds (`lib/cacheManage.go:40`).  Reading via
``spark.read.parquet`` keeps predicate pushdown / column pruning available
to every downstream query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schema import TESTDATA_TABLES
from ..session import apply_runtime_conf

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; one of {TESTDATA_TABLES}")
    apply_runtime_conf(spark)  # UTC session time for oracle parity
    if name == "events":
        # Some fixture generations store ts as TIMESTAMP(NANOS), which
        # Spark 4 rejects ([PARQUET_TYPE_ILLEGAL]); with nanosAsLong those
        # columns surface as int64 nanos, truncated here to microseconds —
        # DuckDB's reader truncates ns → µs identically, so oracle parity
        # is exact.  Generations that store TIMESTAMP(MICROS) read as a
        # proper timestamp (the conf is a no-op for them) and pass through.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}
