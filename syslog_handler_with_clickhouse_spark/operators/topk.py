"""Top-K operators (ClickHouse ``topK`` / ``ORDER BY .. LIMIT`` analogues).

Defined EXACT (window + row_number with a total tiebreak) so the DuckDB
oracle matches deterministically — SURVEY §7 watch-outs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Exact top-k rows per group.

    Physical: one shuffle on group_cols; AQE handles group skew.  At scale
    prefer pre-aggregation before ranking when ranking aggregated values.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rnk")
    )


def global_top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k → Catalyst plans TakeOrderedAndProject: per-partition
    heap + single driver merge of k·P rows, no global sort."""
    return df.orderBy(*order_cols).limit(k)
