"""Geo functions (ClickHouse greatCircleDistance / pointInPolygon family)
as native Column expressions — no UDFs.

Cross-engine determinism:

- ``point_in_polygon`` is EXACT: the ray-casting crossing test is
  multiplied through by the edge's Δy so it never divides — pure integer
  comparisons, bit-identical on any engine.  The Spark Column and the
  oracle SQL are generated from the same vertex list by the same code, so
  the two sides cannot drift.
- ``haversine_km`` is trig-heavy; engines' libm implementations differ in
  the last ulp, so consumers must round the result (6 dp ≈ mm) before
  comparing — the q193 cross-libm rule.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance (ClickHouse greatCircleDistance, km).

    Fixed-order scalar expression; round to ≤6 dp before cross-engine
    comparison (libm ulp differences)."""
    rad = math.pi / 180.0
    dlat = (lat2 - lat1) * rad / 2.0
    dlon = (lon2 - lon1) * rad / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def sql_haversine_km(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The identical expression as ANSI SQL for the DuckDB oracle."""
    rad = math.pi / 180.0
    dlat = f"(({lat2}) - ({lat1})) * {rad!r} / 2.0"
    dlon = f"(({lon2}) - ({lon1})) * {rad!r} / 2.0"
    a = (
        f"sin({dlat}) * sin({dlat})"
        f" + cos(({lat1}) * {rad!r}) * cos(({lat2}) * {rad!r})"
        f" * sin({dlon}) * sin({dlon})"
    )
    return f"{2.0 * EARTH_RADIUS_KM!r} * asin(sqrt({a}))"


def _edges(vertices: list[tuple[int, int]]) -> list[tuple[int, int, int, int]]:
    n = len(vertices)
    return [(*vertices[i], *vertices[(i + 1) % n]) for i in range(n)]


def point_in_polygon(
    px: Column, py: Column, vertices: list[tuple[int, int]]
) -> Column:
    """Ray casting with INTEGER coordinates, division-free.

    For edge (x1,y1)→(x2,y2) a rightward ray from (px,py) crosses iff the
    edge straddles py AND px is left of the intersection; the intersection
    comparison ``px < x1 + (x2-x1)(py-y1)/(y2-y1)`` is multiplied through
    by Δy (sign-corrected) so everything stays in exact integers.  Odd
    crossing count = inside.  Points exactly on an edge follow the
    half-open straddle rule (consistent on both engines — exact ints).

    DEVIATION from ClickHouse pointInPolygon (documented in
    COVERAGE/SURVEY next to the family entry): boundary points resolve
    by the half-open rule (left/bottom edges count as inside, right/top
    as outside, horizontal edges skipped), not by CH's boundary
    handling.  Interior and exterior points agree exactly; only points
    lying ON an edge can differ from CH."""
    crossings: Column = F.lit(0)
    for x1, y1, x2, y2 in _edges(vertices):
        d = y2 - y1
        if d == 0:
            continue  # horizontal edge never straddles py strictly
        straddle = (F.lit(y1) > py) != (F.lit(y2) > py)
        lhs = px * F.lit(d)
        rhs = F.lit(x1 * d) + F.lit(x2 - x1) * (py - F.lit(y1))
        crosses = straddle & ((lhs < rhs) if d > 0 else (lhs > rhs))
        crossings = crossings + F.when(crosses, 1).otherwise(0)
    return crossings % 2 == 1


def sql_point_in_polygon(px: str, py: str, vertices: list[tuple[int, int]]) -> str:
    """The identical crossing test as SQL, generated from the SAME vertex
    list — the two engines cannot disagree."""
    terms = []
    for x1, y1, x2, y2 in _edges(vertices):
        d = y2 - y1
        if d == 0:
            continue
        cmp_op = "<" if d > 0 else ">"
        terms.append(
            f"(CASE WHEN ({y1} > ({py})) <> ({y2} > ({py}))"
            f" AND ({px}) * ({d}) {cmp_op} {x1 * d} + ({x2 - x1}) * (({py}) - {y1})"
            f" THEN 1 ELSE 0 END)"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"


GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 9) -> Column:
    """ClickHouse ``geohashEncode`` as a CLOSED-FORM native expression —
    no fold, no UDF.

    The classic algorithm bisects [-180,180]×[-90,90] bit by bit, but
    each bit has a direct formula: the k-th longitude bit is
    ``floor((lon+180)/360 · 2^(k+1)) mod 2`` (and likewise latitude
    over 180), because k bisections of the unit interval land the point
    in cell ``floor(frac · 2^k)`` and the next bit is that cell index's
    parity.  Global bit m (even → longitude bit m/2, odd → latitude bit
    (m−1)/2) and base32 chunking then assemble each character as a
    5-bit integer.  All arithmetic is IEEE double identical across
    engines (validated against the canonical test vectors
    u4pruydqqvj / 6gkzwgjz in tests/test_geo.py), so the SQL twin
    below is generated from the same bit formula.
    """
    fl = (lon + F.lit(180.0)) / F.lit(360.0)
    fa = (lat + F.lit(90.0)) / F.lit(180.0)

    def bit(m: int) -> Column:
        if m % 2 == 0:
            frac, k = fl, m // 2
        else:
            frac, k = fa, (m - 1) // 2
        return (
            F.floor(frac * F.lit(float(2 ** (k + 1)))).cast("bigint")
            % 2
        )

    chars = []
    for j in range(precision):
        v: Column = F.lit(0).cast("bigint")
        for b in range(5):
            v = v * 2 + bit(5 * j + b)
        chars.append(F.substr(F.lit(GEOHASH_B32), v + 1, F.lit(1)))
    return F.concat(*chars)


def sql_geohash_encode(lat: str, lon: str, precision: int = 9) -> str:
    """The identical closed-form bit assembly as SQL text (DuckDB),
    generated from the same formula so the engines cannot disagree."""

    def bit(m: int) -> str:
        if m % 2 == 0:
            frac, k = f"(({lon}) + 180.0) / 360.0", m // 2
        else:
            frac, k = f"(({lat}) + 90.0) / 180.0", (m - 1) // 2
        return f"(CAST(floor(({frac}) * {float(2 ** (k + 1))}) AS BIGINT) % 2)"

    chars = []
    for j in range(precision):
        v = " + ".join(
            f"{2 ** (4 - b)} * {bit(5 * j + b)}" for b in range(5)
        )
        chars.append(
            f"substring('{GEOHASH_B32}', CAST(({v}) AS INT) + 1, 1)"
        )
    return " || ".join(chars)


def geohash_decode(gh: Column, precision: int = 9) -> tuple[Column, Column]:
    """ClickHouse ``geohashDecode`` — closed-form inverse of
    :func:`geohash_encode`: re-assemble the interleaved bits into the
    longitude/latitude cell indices and return the CELL CENTER,
    ``(lat, lon)``.  Character values come from a map literal (the
    base32 alphabet is fixed); bit b of character j is
    ``floor(v_j / 2^(4-b)) mod 2``; the k-th longitude/latitude bit is
    global bit 2k / 2k+1.  Pure projection, like the encoder."""
    cmap = F.create_map(
        *[x for i, c in enumerate(GEOHASH_B32) for x in (F.lit(c), F.lit(i))]
    )
    vals = [
        F.element_at(cmap, F.substring(gh, j + 1, 1)) for j in range(precision)
    ]

    def bit(m: int) -> Column:
        j, b = divmod(m, 5)
        return F.floor(vals[j] / F.lit(2 ** (4 - b))).cast("bigint") % 2

    n_bits = 5 * precision
    n_lon = (n_bits + 1) // 2
    n_lat = n_bits // 2
    lon_idx: Column = F.lit(0).cast("bigint")
    for k in range(n_lon):
        lon_idx = lon_idx * 2 + bit(2 * k)
    lat_idx: Column = F.lit(0).cast("bigint")
    for k in range(n_lat):
        lat_idx = lat_idx * 2 + bit(2 * k + 1)
    lon = (
        F.lit(-180.0)
        + (lon_idx.cast("double") + F.lit(0.5)) * F.lit(360.0 / 2 ** n_lon)
    )
    lat = (
        F.lit(-90.0)
        + (lat_idx.cast("double") + F.lit(0.5)) * F.lit(180.0 / 2 ** n_lat)
    )
    return lat, lon


def sql_geohash_decode(gh: str, precision: int = 9) -> tuple[str, str]:
    """SQL twin of :func:`geohash_decode`, same formula (DuckDB:
    strpos is 1-based, hence the −1)."""

    def val(j: int) -> str:
        return f"(strpos('{GEOHASH_B32}', substring({gh}, {j + 1}, 1)) - 1)"

    def bit(m: int) -> str:
        j, b = divmod(m, 5)
        return f"(CAST(floor({val(j)} / {2 ** (4 - b)}.0) AS BIGINT) % 2)"

    n_bits = 5 * precision
    n_lon = (n_bits + 1) // 2
    n_lat = n_bits // 2
    lon_idx = " + ".join(
        f"{2 ** (n_lon - 1 - k)} * {bit(2 * k)}" for k in range(n_lon)
    )
    lat_idx = " + ".join(
        f"{2 ** (n_lat - 1 - k)} * {bit(2 * k + 1)}" for k in range(n_lat)
    )
    lon = (
        f"(-180.0 + (CAST({lon_idx} AS DOUBLE) + 0.5) * {360.0 / 2 ** n_lon!r})"
    )
    lat = (
        f"(-90.0 + (CAST({lat_idx} AS DOUBLE) + 0.5) * {180.0 / 2 ** n_lat!r})"
    )
    return lat, lon
