"""Unit tests for functions/geo.py — the exactness claims, edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.functions import geo

SQUARE = [(0, 0), (10, 0), (10, 10), (0, 10)]
PENTAGON = [(0, 950), (904, 294), (559, -769), (-559, -769), (-904, 294)]


def _inside(spark, pts, poly):
    df = spark.createDataFrame(pts, "px long, py long")
    rows = df.select(
        "px", "py", geo.point_in_polygon(F.col("px"), F.col("py"), poly).alias("i")
    ).collect()
    return {(r.px, r.py): r.i for r in rows}


def test_point_in_polygon_square(spark):
    got = _inside(
        spark,
        [(5, 5), (15, 5), (-1, 5), (5, 15), (5, -1), (0, 5), (10, 5)],
        SQUARE,
    )
    assert got[(5, 5)] is True
    assert got[(15, 5)] is False and got[(-1, 5)] is False
    assert got[(5, 15)] is False and got[(5, -1)] is False
    # boundary points follow the half-open rule consistently: left edge
    # in, right edge out (crossing parity of the rightward ray)
    assert got[(0, 5)] is True
    assert got[(10, 5)] is False


def test_point_in_polygon_matches_shapely_free_reference(spark):
    """Cross-check against a plain-Python ray caster (same half-open
    semantics) on a deterministic grid."""

    def ref(px, py, poly):
        inside = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                d = y2 - y1
                lhs, rhs = px * d, x1 * d + (x2 - x1) * (py - y1)
                if (d > 0 and lhs < rhs) or (d < 0 and lhs > rhs):
                    inside = not inside
        return inside

    pts = [(x, y) for x in range(-1000, 1001, 250) for y in range(-1000, 1001, 250)]
    got = _inside(spark, pts, PENTAGON)
    for p in pts:
        assert got[p] == ref(*p, PENTAGON), p


def test_sql_and_column_agree(spark):
    """The generated SQL and the Column must make identical decisions —
    they come from one vertex list, but prove it end-to-end."""
    pts = [(x, y) for x in range(-900, 901, 300) for y in range(-900, 901, 300)]
    df = spark.createDataFrame(pts, "px long, py long")
    df.createOrReplaceTempView("geo_pts")
    via_sql = {
        (r.px, r.py): r.i
        for r in spark.sql(
            "SELECT px, py, "
            + geo.sql_point_in_polygon("px", "py", PENTAGON)
            + " AS i FROM geo_pts"
        ).collect()
    }
    assert via_sql == _inside(spark, pts, PENTAGON)


def test_haversine_known_distance(spark):
    # Paris -> London ~343.5 km
    df = spark.createDataFrame([(48.8566, 2.3522, 51.5074, -0.1278)],
                               "a double, b double, c double, d double")
    km = df.select(
        geo.haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).first().km
    assert math.isclose(km, 343.5, rel_tol=0.01)


def test_geohash_encode_canonical_vectors(spark):
    """The closed-form geohash must reproduce the canonical test vectors
    (u4pruydqqvj for 57.64911,10.40744 and 6gkzwgjz for the Curitiba
    point) — pinning the bit formula against the published algorithm,
    independent of the oracle."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.functions.geo import (
        geohash_encode,
    )

    df = spark.createDataFrame(
        [(57.64911, 10.40744), (-25.382708, -49.265506), (48.8566, 2.3522)],
        "lat double, lon double",
    )
    got = [
        r.g
        for r in df.select(
            geohash_encode(F.col("lat"), F.col("lon"), 11).alias("g")
        ).collect()
    ]
    assert got[0] == "u4pruydqqvj"
    assert got[1].startswith("6gkzwgjz")
    assert got[2].startswith("u09tvw0f6")


def test_geohash_sql_twin_agrees(spark, duck):
    """Spark Column and generated SQL run the same bit formula — verify
    on a grid of points including cell-boundary-adjacent ones."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.functions.geo import (
        geohash_encode,
        sql_geohash_encode,
    )

    pts = [
        (lat / 7.0, lon / 11.0)
        for lat in range(-600, 601, 97)
        for lon in range(-1900, 1901, 211)
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    s = sorted(
        r.g
        for r in df.select(
            geohash_encode(F.col("lat"), F.col("lon"), 9).alias("g")
        ).collect()
    )
    sql = sql_geohash_encode("lat", "lon", 9)
    rows = ", ".join(
        f"(CAST({a!r} AS DOUBLE), CAST({b!r} AS DOUBLE))" for a, b in pts
    )
    o = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT {sql} AS g FROM (VALUES {rows}) t(lat, lon)"
        ).fetchall()
    )
    assert s == o
