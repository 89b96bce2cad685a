"""Rotating sf0.1 value-check lane (round-12 verdict directive 7).

The dtype-strict parity mirror runs all registered queries at sf0.01;
this lane value-checks a rotating sample of K queries per round at
sf0.1 — ten times the rows — so every query eventually gets a
larger-scale value check without the full registry sweep becoming a
10× test bill.  The sample is seeded by the ROUND NUMBER (derived from
the driver's CORRECTNESS_r{N}.json files, overridable via
SPARK_GRAFT_ROTATION_ROUND), so each round covers a different slice
and the choice is reproducible after the fact.

The full multi-scale sweep remains available as before:
`SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 pytest -m sweep`.
"""

from __future__ import annotations

import glob
import os
import random

import pytest

from syslog_handler_with_clickhouse_spark.queries import ORACLE, QUERIES

from test_oracle_parity import _dtype_group, _normalize, _values_equal

SF01_DIR = "/root/testdata/sf0.1"
K = 10

# Round 14 (verdict directive 6): the HEAVY LLM-tier queries rotate
# through the lane FASTER than the uniform sample would visit them —
# each round takes K_HEAVY of these round-robin, on top of the K
# uniform picks.  These are the queries whose sf0.1 behavior the
# 100 TB story leans on (dedup funnel, BM25/RRF, DSIR, the round-14
# incremental/rewrite contracts).
HEAVY_POOL = [
    "q334_dedup_components",
    "q394_bm25_retrieval",
    "q413_rrf_hybrid_retrieval",
    "q454_dsir_importance",
    "q39_minhash_lsh",
    "q446_curation_funnel",
    "q453_gopher_repetition",
    "q431_c4_line_filters",
    "q458_rrf_hybrid_capped",
    "q459_incremental_dedup_labels",
    "q460_exact_substring_rewrite",
    "q455_quality_canonical",
    # round 15: the maintained-index family — exactly the operators
    # whose state arithmetic could drift at scale (verdict directive 7)
    "q461_bm25_incremental_index",
    "q462_incremental_quality_canonical",
    "q464_ivfpq_incremental_insert",
    "q465_bm25_store_index",
    "q466_ivfpq_store_index",
    "q467_bm25_absolute_df_cap",
    # round 17 (r16 verdict directive 3): the stored-index LIFECYCLE
    # queries (init / guarded inserts / auto-compact / serve) and the
    # zstd ingestion seam — the three new surfaces whose sf0.1
    # behavior the round-16/17 lifecycle story leans on
    "q469_bm25_store_auto_compact",
    "q470_ivfpq_store_sampled_train",
    "q476_zstd_corpus_ingest",
]
K_HEAVY = 4

# Queries excluded from the sf0.1 lane, each with the reason — keep this
# SHORT and justified; an entry here still gets its sf0.01 value check.
DENYLIST: dict[str, str] = {}


def _round_number() -> int:
    env = os.environ.get("SPARK_GRAFT_ROTATION_ROUND")
    if env:
        return int(env)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return len(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))) + 1


def _rotation() -> list[str]:
    rnd = _round_number()
    heavy = [h for h in HEAVY_POOL if h in ORACLE and h not in DENYLIST]
    picked = [
        heavy[(rnd * K_HEAVY + i) % len(heavy)] for i in range(K_HEAVY)
    ] if heavy else []
    pool = sorted(set(ORACLE) - set(DENYLIST) - set(picked))
    rng = random.Random(rnd)
    return sorted(set(picked) | set(rng.sample(pool, min(K, len(pool)))))


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF01_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _rotation())
def test_sf01_rotation_value_check(name, spark, duck01):
    sdf = QUERIES[name](spark, SF01_DIR).toPandas()
    odf = duck01.execute(ORACLE[name]).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}@sf0.1: column mismatch spark={sorted(sdf.columns)} "
        f"oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}@sf0.1: rowcount spark={len(sdf)} oracle={len(odf)}"
    )
    for col in sorted(sdf.columns):
        sg, og = _dtype_group(sdf[col].dtype), _dtype_group(odf[col].dtype)
        assert sg == og, (
            f"{name}@sf0.1: dtype-kind mismatch on {col!r}: "
            f"spark={sdf[col].dtype} ({sg}) oracle={odf[col].dtype} ({og})"
        )
    s_rows = _normalize(sdf)
    o_rows = _normalize(odf)
    n_bad = 0
    first_bad = None
    for i, (sr, orr) in enumerate(zip(s_rows, o_rows)):
        if len(sr) != len(orr) or not all(
            _values_equal(a, b) for a, b in zip(sr, orr)
        ):
            n_bad += 1
            if first_bad is None:
                first_bad = (i, sr, orr)
    assert n_bad == 0, (
        f"{name}@sf0.1: {n_bad}/{len(s_rows)} rows differ; first: {first_bad}"
    )
