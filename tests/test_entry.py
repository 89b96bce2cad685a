"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import importlib.util
import os


def _load_entry_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["minute", "device", "n_errors"]


def test_queries_oracle_keys_align(spark):
    mod = _load_entry_module()
    q = mod.queries()
    o = mod.oracle_sql()
    assert len(q) >= 59
    # every oracle key must have a query; rows-only queries are allowed
    assert set(o) <= set(q)
    missing_oracle = sorted(set(q) - set(o))
    # every registered query now carries a full value oracle (sketch ops
    # emit exact values + a within-tolerance boolean the oracle pins TRUE)
    assert missing_oracle == [], missing_oracle
