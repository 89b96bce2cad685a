"""Multi-changepoint detection by binary segmentation, exact-integer.

Extends the single-split CUSUM statistic (q424): each round, every
current segment computes |n_loc * S_k - k * S_n_loc| over its own rows
(the integer rescaling of the classic CUSUM curve, so the argmax is
exact), splits at the best k when the RELATIVE statistic clears a ppm
threshold — ``g * 1e6 >= thr_ppm * n_loc * S_n_loc`` keeps the
acceptance test in pure integers too — and both sides keep at least
``min_len`` points.  Rounds are a static plan composition (depth is a
small constant), each round two window passes over (key, segment):
work stays proportional to rows × depth, never rows², and every
exchange keys on the series key — the shape that survives 100 TB of
daily rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binary_segmentation(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    depth: int = 2,
    min_len: int = 3,
    thr_ppm: int = 20000,
) -> DataFrame:
    """Segment each key's ordered integer series into up to 2**depth
    pieces.  Returns one row per (key, segment): seg_idx (1-based in
    series order), start/end order values, n_points, mean_ppm
    (floor(1e6 * sum / n))."""
    cur = df.withColumn("_bs_seg", F.lit(0))
    for _ in range(depth):
        wseg = Window.partitionBy(*key_cols, "_bs_seg").orderBy(order_col)
        wall = Window.partitionBy(*key_cols, "_bs_seg")
        s = (
            cur.withColumn("_bs_k", F.row_number().over(wseg))
            .withColumn("_bs_sk", F.sum(value_col).over(wseg))
            .withColumn("_bs_n", F.count(F.lit(1)).over(wall))
            .withColumn("_bs_sn", F.sum(value_col).over(wall))
        )
        g = F.when(
            (F.col("_bs_k") >= min_len) & (F.col("_bs_k") <= F.col("_bs_n") - min_len),
            F.abs(F.col("_bs_n") * F.col("_bs_sk") - F.col("_bs_k") * F.col("_bs_sn")),
        ).otherwise(F.lit(-1))
        s = s.withColumn("_bs_g", g)
        # best split per segment: max g, tie to the earliest point —
        # two more unbounded window passes (no self-join), phrased so
        # the DuckDB oracle can replay them verbatim
        s = s.withColumn("_bs_gmax", F.max("_bs_g").over(wall))
        s = (
            s.withColumn(
                "_bs_cp",
                F.min(
                    F.when(F.col("_bs_g") == F.col("_bs_gmax"), F.col("_bs_k"))
                ).over(wall),
            )
            .withColumn(
                "_bs_accept",
                (F.col("_bs_gmax") > 0)
                & (
                    F.col("_bs_gmax") * F.lit(1000000)
                    >= F.lit(thr_ppm) * F.col("_bs_n") * F.col("_bs_sn")
                ),
            )
        )
        cur = s.withColumn(
            "_bs_seg",
            F.when(
                F.col("_bs_accept"),
                F.col("_bs_seg") * 2 + (F.col("_bs_k") > F.col("_bs_cp")).cast("int"),
            ).otherwise(F.col("_bs_seg") * 2),
        ).select(*key_cols, order_col, value_col, "_bs_seg")
    out = cur.groupBy(*key_cols, "_bs_seg").agg(
        F.min(order_col).alias("start"),
        F.max(order_col).alias("end"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.expr(f"1000000 * SUM({value_col}) DIV COUNT(*)")
        .cast("bigint")
        .alias("mean_ppm"),
    )
    idx = Window.partitionBy(*key_cols).orderBy("start")
    return out.withColumn("seg_idx", F.row_number().over(idx)).drop("_bs_seg")
