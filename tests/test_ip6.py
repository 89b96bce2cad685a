"""IPv6 function family (functions/ip6.py): RFC 5952 formatting vectors,
parse round trips incl. compression and the dotted-v4 tail, validator
accept/reject vectors — all as native expressions (Python-free plans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.functions.ip6 import (
    format_ipv6,
    is_ipv6_string,
    mask_ipv6,
    parse_ipv6,
)

FORMAT_VECTORS = [
    # RFC 5952 §4 vectors + tie-break/maximality cases
    ([0x2001, 0xDB8, 0, 0, 0, 0, 2, 1], "2001:db8::2:1"),
    ([0x2001, 0xDB8, 0, 1, 1, 1, 1, 1], "2001:db8:0:1:1:1:1:1"),  # lone 0 NOT ::
    ([0x2001, 0, 0, 1, 0, 0, 0, 1], "2001:0:0:1::1"),  # longest run wins
    ([0x2001, 0xDB8, 0, 0, 1, 0, 0, 1], "2001:db8::1:0:0:1"),  # leftmost tie
    ([0, 0, 0, 0, 0, 0, 0, 0], "::"),
    ([0, 0, 0, 0, 0, 0, 0, 1], "::1"),
    ([0xFE80, 0, 0, 0, 0, 0, 0, 0], "fe80::"),
    ([1, 2, 3, 4, 5, 6, 7, 8], "1:2:3:4:5:6:7:8"),
    ([0, 1, 0, 0, 2, 0, 0, 0], "0:1:0:0:2::"),  # longer right run wins
]

PARSE_VECTORS = [
    ("2001:db8::2:1", [0x2001, 0xDB8, 0, 0, 0, 0, 2, 1]),
    ("2001:0DB8:0000:0001:0001:0001:0001:0001", [0x2001, 0xDB8, 0, 1, 1, 1, 1, 1]),
    ("::", [0] * 8),
    ("::1", [0, 0, 0, 0, 0, 0, 0, 1]),
    ("fe80::", [0xFE80, 0, 0, 0, 0, 0, 0, 0]),
    ("::ffff:192.168.1.1", [0, 0, 0, 0, 0, 0xFFFF, 0xC0A8, 0x0101]),
    ("64:ff9b::255.0.0.255", [0x64, 0xFF9B, 0, 0, 0, 0, 0xFF00, 0x00FF]),
    ("1:2:3:4:5:6:7.8.9.10", [1, 2, 3, 4, 5, 6, 0x0708, 0x090A]),
]

VALID = [
    "2001:db8::2:1", "::", "::1", "fe80::", "1:2:3:4:5:6:7:8",
    "::ffff:192.168.1.1", "64:ff9b::1.2.3.4", "2001:DB8::8a2e:370:7334",
]
INVALID = [
    "", "1:2:3", "1:2:3:4:5:6:7:8:9", "1::2::3", ":::", "1:::2",
    "1::2:", ":1::2", "g::1", "1:2:3:4:5:6:7:8.9.10.11",
    "::ffff:300.1.1.1", "1.2.3.4", "12345::", "not an ip",
]


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_format_rfc5952_vectors(spark):
    df = spark.createDataFrame([(v,) for v, _ in FORMAT_VECTORS], "h array<int>")
    got = [r.s for r in df.select(format_ipv6(F.col("h")).alias("s")).collect()]
    assert got == [s for _, s in FORMAT_VECTORS]


def test_parse_vectors_and_roundtrip(spark):
    df = spark.createDataFrame([(s,) for s, _ in PARSE_VECTORS], "s string")
    got = [list(r.h) for r in df.select(parse_ipv6(F.col("s")).alias("h")).collect()]
    assert got == [h for _, h in PARSE_VECTORS]
    # format(parse(x)) is canonical; parse(format(h)) == h for all vectors
    df2 = spark.createDataFrame([(h,) for _, h in PARSE_VECTORS], "h array<int>")
    rt = df2.select(
        parse_ipv6(format_ipv6(F.col("h"))).alias("h2"), "h"
    ).collect()
    for r in rt:
        assert list(r.h2) == list(r.h)


def test_validator_vectors(spark):
    df = spark.createDataFrame(
        [(s, True) for s in VALID] + [(s, False) for s in INVALID],
        "s string, want boolean",
    )
    bad = df.select(
        "s", "want", is_ipv6_string(F.col("s")).alias("got")
    ).filter(F.col("want") != F.col("got")).collect()
    assert bad == [], bad


def test_mask_and_plan_python_free(spark):
    from syslog_handler_with_clickhouse_spark.plans.explain import (
        python_eval_nodes,
    )

    df = spark.createDataFrame(
        [([0x2001, 0xDB8, 0xAA, 0xBB, 1, 2, 3, 4],)], "h array<int>"
    )
    out = df.select(
        format_ipv6(mask_ipv6(F.col("h"), 4)).alias("net"),
        is_ipv6_string(F.lit("::1")).alias("ok"),
        parse_ipv6(F.lit("::2")).alias("p"),
    )
    r = out.collect()[0]
    assert r.net == "2001:db8:aa:bb::"
    assert r.ok and list(r.p) == [0, 0, 0, 0, 0, 0, 0, 2]
    assert python_eval_nodes(out) == []


def test_format_parse_roundtrip_property(spark):
    """parse(format(h)) == h over 400 seeded random hextet vectors in
    ONE Spark job — zero runs land anywhere (60% zero bias), including
    ties, full-zero, and no-compression cases; every canonical string
    also validates."""
    import random

    rng = random.Random(424242)
    vecs = [
        [0 if rng.random() < 0.6 else rng.randint(0, 65535)
         for _ in range(8)]
        for _ in range(400)
    ]
    vecs += [[0] * 8, [1] * 8, [0, 0, 1, 0, 0, 1, 0, 0]]
    df = spark.createDataFrame([(v,) for v in vecs], "h array<int>")
    rows = df.select(
        "h",
        parse_ipv6(format_ipv6(F.col("h"))).alias("p"),
        is_ipv6_string(format_ipv6(F.col("h"))).alias("ok"),
    ).collect()
    for r in rows:
        assert list(r.p) == list(r.h), list(r.h)
        assert r.ok, list(r.h)
