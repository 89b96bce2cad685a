"""Forecasting recurrences over grouped series.

Holt's linear (double-exponential) smoothing is the everyday
level+trend forecaster dashboards run on counter series.  Like the
ADPCM decoders (q376/q392), the recurrence is inherently sequential
per series, so the Spark shape is the sanctioned one for stateful
scans: groupBy(series).applyInPandas — each series' state is O(1),
groups process in parallel, Arrow moves the batches, and NOTHING is
sequential across groups.  At 100 TB the parallelism is the number of
series, which is exactly how this operator is used (one series per
device/metric), and each group's points fit a pandas frame by
construction (bounded time range).

Parity contract: exact integers in milli-units with rational smoothing
constants α = 1/4, β = 1/2 and SIGN-SPLIT truncating division
(trend is routinely negative; |x| div d with the sign reapplied is the
only division both Spark/Python (trunc) and DuckDB (floor) agree on).
The DuckDB oracle replays the same recurrence as a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tdiv(x: int, d: int) -> int:
    return -((-x) // d) if x < 0 else x // d


def holt_linear(
    series: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Holt linear smoothing in exact milli-integers.

    Init: L₁ = 1000·y₁, B₁ = 1000·(y₂ − y₁).  For t ≥ 2:
        Lₜ = tdiv(1000·yₜ + 3·(Lₜ₋₁ + Bₜ₋₁), 4)        (α = 1/4)
        Bₜ = tdiv((Lₜ − Lₜ₋₁) + Bₜ₋₁, 2)               (β = 1/2)
    and the one-step-ahead absolute error |1000·yₜ − (Lₜ₋₁ + Bₜ₋₁)|
    accumulates into sae_milli, pinning every intermediate state.

    Groups with fewer than two points are dropped (no trend exists).
    Returns (group, n_points, level_milli, trend_milli, forecast_milli,
    sae_milli).
    """
    import pandas as pd

    schema = (
        f"{group_col} string, n_points bigint, level_milli bigint, "
        "trend_milli bigint, forecast_milli bigint, sae_milli bigint"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        ys = [int(v) * 1000 for v in pdf[value_col]]
        if len(ys) < 2:
            return pd.DataFrame(
                columns=[
                    group_col, "n_points", "level_milli", "trend_milli",
                    "forecast_milli", "sae_milli",
                ]
            )
        lev, tr = ys[0], ys[1] - ys[0]
        sae = 0
        for y in ys[1:]:
            pred = lev + tr
            sae += abs(y - pred)
            prev = lev
            lev = _tdiv(y + 3 * (lev + tr), 4)
            tr = _tdiv((lev - prev) + tr, 2)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_points": [len(ys)],
                "level_milli": [lev],
                "trend_milli": [tr],
                "forecast_milli": [lev + tr],
                "sae_milli": [sae],
            }
        )

    return series.groupBy(group_col).applyInPandas(run, schema)
