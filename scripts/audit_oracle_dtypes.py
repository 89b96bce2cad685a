"""Audit every oracle for driver-hash dtype mismatches WITHOUT running the
Spark queries: compare the Spark plan's analyzed output schema (cheap — no
job) against the dtypes DuckDB actually materializes into pandas.

The driver's value-hash treats int64 4979 and float64 4979.0 as different,
so any column where Spark says integral and DuckDB's pandas frame says
float (or vice versa) is a latent hash FAIL (VERDICT r1, What's wrong #1).

Run: python scripts/audit_oracle_dtypes.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

INT_SPARK = {"tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"}
FLOAT_SPARK = {"float", "double"}


def spark_group(dt: str) -> str:
    if dt in INT_SPARK:
        return "int"
    if dt in FLOAT_SPARK:
        return "float"
    return "other:" + dt


def duck_group(type_name: str) -> str:
    """Group DuckDB's DECLARED column type by how pandas will materialize it.

    HUGEINT always becomes float64 (pandas has no int128) — that is the
    driver-hash killer. Plain BIGINT becomes float64 only when NULLs are
    present, and Spark's toPandas does the same for nullable longs, so the
    two engines stay consistent and BIGINT is safe to group as int.
    """
    t = type_name.upper()
    if t in {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER"}:
        return "int"
    if t in {"HUGEINT", "UHUGEINT", "UBIGINT", "DOUBLE", "FLOAT", "REAL"} or t.startswith(
        "DECIMAL"
    ):
        return "float"
    return "other:" + t


def main() -> int:
    import duckdb

    from syslog_handler_with_clickhouse_spark.queries import ORACLE, QUERIES
    from syslog_handler_with_clickhouse_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("oracle-dtype-audit")
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")

    bad = []
    for name in sorted(ORACLE):
        try:
            sdt = dict(QUERIES[name](spark, SF_DIR).dtypes)  # analysis only, no job
            rel = con.sql(ORACLE[name])
            odt = dict(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as e:  # noqa: BLE001
            bad.append((name, "ERROR", str(e).splitlines()[0][:160]))
            continue
        for col in sdt:
            if col not in odt:
                bad.append((name, col, f"missing in oracle ({sorted(odt)})"))
                continue
            sg, og = spark_group(sdt[col]), duck_group(str(odt[col]))
            if sg != og and {sg, og} <= {"int", "float"}:
                bad.append((name, col, f"spark={sdt[col]} duckdb={odt[col]}"))
    for row in bad:
        print("MISMATCH" if row[1] != "ERROR" else "ERROR   ", *row)
    print(f"\n{len(bad)} problem(s) across {len(ORACLE)} oracles")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
