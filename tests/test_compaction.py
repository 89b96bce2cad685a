"""compact_parquet: file-count and losslessness contracts."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from conftest import SF_DIR

from syslog_handler_with_clickhouse_spark.sources.sinks import compact_parquet
from syslog_handler_with_clickhouse_spark.sources.testdata import load_table


def _parquet_files(path: str) -> list[str]:
    return glob.glob(f"{path}/**/*.parquet", recursive=True)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    store = str(tmp_path / "store")
    ev.repartition(32).write.parquet(store)
    assert len(_parquet_files(store)) == 32
    before = ev.count()

    n = compact_parquet(spark, store, target_bytes=1 << 30)
    assert n == 1
    assert len(_parquet_files(store)) == 1
    back = spark.read.parquet(store)
    assert back.count() == before
    assert sorted(back.columns) == ["event_id", "event_type", "value"]


def test_compaction_partitioned_store(spark, tmp_path):
    ev = (
        load_table(spark, SF_DIR, "events")
        .withColumn("day", F.to_date("ts"))
        .select("event_id", "day")
    )
    store = str(tmp_path / "pstore")
    ev.repartition(16).write.partitionBy("day").parquet(store)
    n_before = len(_parquet_files(store))
    before = ev.count()

    compact_parquet(spark, store, target_bytes=1 << 30, partition_col="day")
    assert len(_parquet_files(store)) < n_before
    assert spark.read.parquet(store).count() == before
