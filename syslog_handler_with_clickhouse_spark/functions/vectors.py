"""Vector math over ``array<float>`` embedding columns — native columns.

Sequential left-fold aggregation (F.aggregate) gives a deterministic
summation order, matching DuckDB's list_reduce fold in the oracle SQL.
Everything is computed in double precision after an explicit cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Coarse LSH bucket: sign pattern of the first ``bits`` dimensions.

    A deterministic, data-independent partitioning usable as an IVF-style
    candidate prune: query probes only its own bucket.  ~2^bits buckets.
    """
    return F.concat_ws(
        "",
        F.transform(
            F.slice(vec, 1, bits),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )
