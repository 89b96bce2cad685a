"""k-means / SemDeDup / embedding-compression unit tests (q369–q372).

The oracle-parity sweep already value-checks the four queries end to
end; these tests pin the properties parity can't see: the zero-shuffle
assignment plan, partitioning-invariance of the training loop, the
drop-the-junior-copy dedup contract, and signature bit-packing edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.operators import clustering
from syslog_handler_with_clickhouse_spark.sources.testdata import load_table

from conftest import SF_SMALL


def _toy(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_assignment_is_a_projection_no_corpus_shuffle(spark):
    """The argmin assignment must not shuffle the corpus: the centroid
    set rides in as ONE broadcast row, so the only exchange in the plan
    is the broadcast itself — no hash partitioning anywhere."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    v = clustering.quantize_vectors(emb)
    cent = v.filter(F.col("vid") < 4).select(
        F.col("vid").alias("cell"), F.col("qv").alias("cv")
    )
    from syslog_handler_with_clickhouse_spark.plans.explain import formatted_plan

    plan = formatted_plan(clustering.assign_nearest(v, cent))
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kmeans_partitioning_invariant(spark):
    """Exact integer arithmetic ⇒ identical assignments regardless of
    input partitioning (the determinism contract the oracle relies on)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    a = clustering.kmeans_assignments(emb, k=4, iters=2).collect()
    b = clustering.kmeans_assignments(emb.repartition(13), k=4, iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == emb.count()


def test_kmeans_empty_cell_drops(spark):
    """A seed centroid that captures no members disappears after one
    refinement (GROUP BY semantics) instead of surfacing NaNs."""
    rows = [
        (0, [0.0, 0.0]),  # seed A
        (1, [100.0, 100.0]),  # seed B — all mass lands here
        (2, [100.0, 101.0]),
        (3, [101.0, 100.0]),
        (4, [99.0, 100.0]),
        # seed A keeps only itself; after re-centering, everything is
        # closer to B's refined centroid than to A's (which stays at 0).
    ]
    out = clustering.kmeans_assignments(_toy(spark, rows), k=2, iters=1).collect()
    clusters = {r.vid: r.cluster for r in out}
    assert clusters[2] == clusters[3] == clusters[4] == 1
    assert clusters[0] == 0  # the origin vector stays on its own centroid


def test_semantic_dedup_drops_junior_copies(spark):
    """Exact copies land in the same cluster; the higher-id copy is
    dropped, the senior survives; unrelated vectors all survive."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (10, [1.0, 0.0, 0.0]),  # copy of 0
        (11, [0.0, 1.0, 0.0]),  # copy of 1
    ]
    out = clustering.semantic_dedup(_toy(spark, rows), k=3, iters=1, tau=0.99)
    survivors = sorted(r.vec_id for r in out.collect())
    assert survivors == [0, 1, 2]


def test_semantic_dedup_threshold_respected(spark):
    """Orthogonal vectors (cos = 0) never dedup even in one cluster."""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = clustering.semantic_dedup(_toy(spark, rows), k=1, iters=0, tau=0.99)
    assert sorted(r.vec_id for r in out.collect()) == [0, 1]


@pytest.mark.parametrize(
    "vec,expected",
    [
        ([1.0] * 32, (1 << 32) - 1),  # all positive → all bits set
        ([-1.0] * 32, 0),  # all negative → zero
        ([1.0] + [-1.0] * 31, 1 << 31),  # MSB = first dimension
        ([-1.0] * 31 + [0.0], 1),  # zero counts as non-negative
    ],
)
def test_sign_signature_packing(spark, vec, expected):
    df = _toy(spark, [(0, vec)])
    sig = F.aggregate(
        F.slice(F.transform(F.col("embedding"), lambda x: x.cast("double")), 1, 32),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc * 2 + F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    assert df.select(sig.alias("h")).first().h == expected


def _py_lloyd(vecs, k, iters):
    """Independent pure-Python Lloyd with the module's determinism
    contract: integer quantized inputs, exact integer d2, lower-cell
    argmin tiebreak, half-away-from-zero integer means — shares NO code
    with the Spark implementation."""

    def rnd_div(s, c):  # round(s/c) half away from zero, exact integers
        return (2 * abs(s) + c) // (2 * c) * (1 if s >= 0 else -1)

    q = {vid: [round(x * 1000) for x in v] for vid, v in vecs}
    cent = {vid: q[vid][:] for vid, _ in vecs if vid < k}
    for _ in range(iters):
        assign = {}
        for vid, qv in q.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(qv, cv)), cell)
                for cell, cv in cent.items()
            )
            assign[vid] = best[1]
        new = {}
        for cell in set(assign.values()):
            members = [q[vid] for vid, c in assign.items() if c == cell]
            new[cell] = [
                rnd_div(sum(col), len(members)) for col in zip(*members)
            ]
        cent = new
    out = {}
    for vid, qv in q.items():
        d2, cell = min(
            (sum((a - b) ** 2 for a, b in zip(qv, cv)), cell)
            for cell, cv in cent.items()
        )
        out[vid] = (cell, d2)
    return out


def test_kmeans_matches_independent_python_lloyd(spark):
    """Cross-implementation differential: the whole Spark training loop
    (quantize → 2 refinements → assign) equals an independently written
    Python Lloyd on randomized small corpora."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vec = st.lists(
        st.integers(-50, 50).map(lambda n: n / 10.0), min_size=4, max_size=4
    )

    @settings(max_examples=10, deadline=None)
    @given(st.lists(vec, min_size=4, max_size=14, unique_by=tuple))
    def check(vs):
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vs)]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        got = {
            r.vid: (r.cluster, r.d2)
            for r in clustering.kmeans_assignments(df, k=3, iters=2).collect()
        }
        exp = _py_lloyd(rows, 3, 2)
        assert got == exp

    check()
