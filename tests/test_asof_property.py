"""Differential test for the as-of join against DuckDB's native ASOF JOIN.

SURVEY §7 watch-out: "As-of join … test against DuckDB ``ASOF JOIN``".
Sixty seeded-random cases — duplicate timestamps, keys with no right
rows, right rows after every left row, empty right sides — are folded
into ONE composite-keyed table (case_id ⊗ key), so the whole comparison
is a single Spark job and a single DuckDB ASOF LEFT JOIN on identical
data.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from syslog_handler_with_clickhouse_spark.operators.joins import asof_join


def _cases(n_cases: int = 60, seed: int = 42):
    rng = random.Random(seed)
    left, right = [], []
    for case in range(n_cases):
        # composite key: case * 10 + local key keeps cases independent
        n_keys = rng.randint(1, 3)
        for lk in range(n_keys):
            k = case * 10 + lk
            for _ in range(rng.randint(1, 6)):
                left.append((k, rng.randint(0, 30)))
            # some keys intentionally get NO right rows
            if rng.random() < 0.25:
                continue
            seen = set()
            for _ in range(rng.randint(1, 6)):
                ts = rng.randint(0, 30)
                if ts in seen:  # unique (k, ts): "latest at ts" must be well-defined
                    continue
                seen.add(ts)
                right.append((k, ts, rng.randint(-100, 100)))
    # unique left rows: one output row per left row
    return sorted(set(left)), sorted(right)


@pytest.mark.parametrize("direction,op", [("backward", ">="), ("forward", "<=")])
def test_asof_join_matches_duckdb(spark, direction, op):
    left, right = _cases()
    ldf = spark.createDataFrame(left, "k long, lts long")
    rdf = spark.createDataFrame(right, "k long, rts long, v long")

    got = (
        asof_join(
            ldf,
            rdf,
            on="k",
            left_ts="lts",
            right_ts="rts",
            value_cols=["v"],
            direction=direction,
        )
        .toPandas()
        .sort_values(["k", "lts"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("l", pd.DataFrame(left, columns=["k", "lts"]))
    con.register("r", pd.DataFrame(right, columns=["k", "rts", "v"]))
    want = con.execute(
        f"""
        SELECT l.k, l.lts, r.v AS v_asof
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.lts {op} r.rts
        ORDER BY l.k, l.lts
        """
    ).df()

    assert len(got) == len(want) == len(left)
    bad = []
    for (_, g), (_, w) in zip(got.iterrows(), want.iterrows()):
        assert g["k"] == w["k"] and g["lts"] == w["lts"]
        gv = None if pd.isna(g["v_asof"]) else int(g["v_asof"])
        wv = None if pd.isna(w["v_asof"]) else int(w["v_asof"])
        if gv != wv:
            bad.append((int(g["k"]), int(g["lts"]), gv, wv))
    assert not bad, f"{len(bad)} mismatches, first 5: {bad[:5]}"
