"""Z-order layout: row-group stats must be narrow on BOTH key columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.operators.layout import (
    row_group_ranges,
    write_zordered,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(zorder_key(F.col("a"), F.col("b"), bits=3).alias("z")).collect()[0].z
    # a bits (1,0,1) at even positions, b bits (1,1,0) at odd:
    # z = a0 + 2*b0 + 4*a1 + 8*b1 + 16*a2 + 32*b2 = 1 + 2 + 0 + 8 + 16 + 0
    assert z == 0b011011


def test_zorder_narrows_rowgroups_on_both_columns(spark, tmp_path):
    """Sorted-by-a layout gives narrow row-group ranges only for a;
    z-ordered layout must be dramatically narrower for b while staying
    far narrower than full-range for a."""
    n = 40_000
    df = spark.range(n).select(
        (F.col("id") * 48271 % n).alias("a"),
        (F.col("id") * 69621 % n).alias("b"),
    )
    by_a = str(tmp_path / "by_a")
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.parquet(by_a)
    )
    by_z = str(tmp_path / "by_z")
    write_zordered(df, by_z, "a", "b", bits=12, n_files=8)

    def avg_width(path, col):
        rngs = row_group_ranges(path, col)
        assert rngs, path
        return sum(hi - lo for lo, hi in rngs) / len(rngs)

    full = n - 1
    # sorted-by-a: a ranges tiny, b ranges ~full
    assert avg_width(by_a, "a") < full * 0.25
    assert avg_width(by_a, "b") > full * 0.8
    # z-ordered: BOTH columns' ranges well below full
    za, zb = avg_width(by_z, "a"), avg_width(by_z, "b")
    assert za < full * 0.7, za
    assert zb < full * 0.7, zb
    # and b specifically is far better than the single-column layout
    assert zb < avg_width(by_a, "b") * 0.8

    # losslessness
    back = spark.read.parquet(by_z)
    assert back.count() == n
    assert back.agg(F.sum("a")).collect()[0][0] == df.agg(F.sum("a")).collect()[0][0]
