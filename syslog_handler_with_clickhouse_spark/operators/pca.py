"""Principal-direction extraction over the embeddings table: the top
component of the (uncentered) second-moment matrix by power iteration,
in EXACT integer arithmetic so both engines agree to the last bit.

Quantization & overflow budget: embeddings quantize to qv = round(x *
1000) (|qv| ~ 2e3); a Gram entry is Σ qv_i·qv_j ≤ 4e6 per vector —
2e11 at 50 k vectors, 4e16 at 1e10 vectors, inside int64 either way.
A mat-vec entry is ≤ 64 · m · 1e3; the rescale divisor m1000 =
max|u| div 1000 + 1 keeps every intermediate under ~1.3e16.  Negative
division never happens (we divide |u| and reapply the sign), so Spark's
truncating DIV and DuckDB's flooring // cannot disagree.

Scale shape: ONE corpus pass builds the d×d Gram — the per-vector
outer product is a native higher-order transform (d² rows per vector
map-side, partially aggregated before the only wide exchange, which
carries ≤ d² rows per partition).  Every iteration after that touches
only the d²-row Gram and the d-row vector: broadcast-sized, corpus
never revisited.  (At extreme d one would swap the outer-product
explode for a numpy Gram inside mapInPandas; the aggregate shape is
identical.)

The uncentered moment matrix (not the mean-centered covariance) is
deliberate: centering under N-scaling overflows int64 at corpus scale,
and the top uncentered component is exactly the top right singular
vector of the raw matrix — the quantity ANN pre-rotation actually
uses.  Documented deviation from textbook PCA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantized_gram(emb: DataFrame, dim: int) -> DataFrame:
    """(i, j, m): the d×d integer Gram matrix Σ qv·qvᵀ over
    qv = round(embedding * 1000)."""
    q = emb.select(
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000).cast("bigint")
        ).alias("qv")
    )
    pairs = q.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("qv"),
                    lambda x, i: F.transform(
                        F.col("qv"),
                        lambda y, j: F.struct(
                            i.alias("i"), j.alias("j"), (x * y).alias("p")
                        ),
                    ),
                )
            )
        ).alias("e")
    )
    return pairs.groupBy(
        F.col("e.i").alias("i"), F.col("e.j").alias("j")
    ).agg(F.sum("e.p").cast("bigint").alias("m"))


def _matvec(gram: DataFrame, v: DataFrame) -> DataFrame:
    """u = G·v on the (i, j, m) × (j, v) frames."""
    return (
        gram.join(v.select(F.col("i").alias("j"), "v"), "j")
        .groupBy("i")
        .agg(F.sum(F.col("m") * F.col("v")).cast("bigint").alias("u"))
    )


def _rescale(u: DataFrame) -> DataFrame:
    """v' = sign(u) · (|u| div (max|u| div 1000 + 1)) — the nonnegative-
    only division that keeps DIV (trunc) and // (floor) identical."""
    s = u.agg(
        (F.expr("max(abs(u)) DIV 1000") + 1).alias("m1000")
    )
    return u.join(F.broadcast(s)).select(
        "i",
        (
            F.when(F.col("u") < 0, -F.lit(1)).otherwise(F.lit(1))
            * F.expr("abs(u) DIV m1000")
        )
        .cast("bigint")
        .alias("v"),
    )


def power_iteration_top_component(
    emb: DataFrame, *, dim: int = 64, iters: int = 4
) -> DataFrame:
    """Run ``iters`` integer power-iteration rounds from the all-ones
    start vector; returns (dim, v, mv) — the final direction (scaled to
    max-abs ≈ 1000) and its exact mat-vec image, so the oracle pins
    both the vector AND one extra multiplication by the Gram."""
    spark = emb.sparkSession
    gram = quantized_gram(emb, dim).localCheckpoint(eager=True)
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("i"), F.lit(1000).cast("bigint").alias("v")
    )
    for _ in range(iters):
        v = _rescale(_matvec(gram, v)).localCheckpoint(eager=True)
    mv = _matvec(gram, v)
    return (
        v.join(mv, "i")
        .select(
            F.col("i").cast("int").alias("dim"),
            F.col("v").alias("v"),
            F.col("u").alias("mv"),
        )
    )
