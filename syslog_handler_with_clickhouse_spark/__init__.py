"""PySpark-native analytics engine with the capabilities of
``MuhammedOzby/syslog-handler-with-clickhouse``.

The reference (read-only at /root/reference) is a Go UDP syslog collector
that parses datagrams into a 5-column record and bulk-inserts micro-batches
into ClickHouse (`main.go:27-90`, `lib/lopParse.go:29-81`,
`lib/cacheManage.go:12-65`).  This package re-expresses that capability
surface Spark-first:

- ``functions.parse``  — the syslog parse pipeline (P1-P8) as native columns
- ``sources``          — testdata loaders, raw-line sources, parquet sinks
- ``streaming``        — Structured Streaming ingest (micro-batch semantics)
- ``operators``        — the analytical query surface (filters, joins, aggs,
                         windows, dedup, similarity, text analysis)
- ``queries``          — the named query registry + DuckDB oracle SQL
"""

__version__ = "0.1.0"
