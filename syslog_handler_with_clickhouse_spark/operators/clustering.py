"""Distributed k-means clustering and semantic deduplication (tier X).

K-means (Lloyd) over embedding columns as pure DataFrame algebra — the
clustering primitive behind SemDeDup-style training-data curation
(Abbas et al. 2023, arXiv:2303.09540: cluster the corpus, then compare
pairs only WITHIN a cluster, never corpus-wide).

Determinism contract (what lets a DuckDB oracle replay the whole
iteration unrolled):
- vectors are integer-quantized — ``round(x * 1000)`` per component,
  the same convention as the PQ codec in ``similarity.py`` — so every
  distance is an exact ``bigint`` and every centroid mean is exact
  ``decimal`` arithmetic re-rounded to ``bigint``.  No float
  accumulation order anywhere in the training loop.
- argmin ties break on the lower cell id; means round half-away-from-
  zero in both engines.

Scale shape (the part that matters at 100 TB):
- the k centroids are collapsed into ONE broadcast row holding an
  ``array<struct<cell, cv>>`` (k × dim bigints — a few KB), so the
  assignment step is a pure projection: a higher-order fold over the
  centroid array computes the exact argmin per corpus row with ZERO
  corpus shuffle and no per-(row, centroid) blow-up ever materializing.
- refinement shuffles only the (cell, pos, val) long form with map-side
  partial aggregation into k × dim groups — the corpus itself never
  re-partitions between iterations.
- at 100 TB you train on a sample (Lloyd needs a representative slice,
  not every row) and run the projection-only assignment once over the
  full corpus; both steps here already have that shape.

Reference parity: the reference engine (a syslog→ClickHouse pipeline,
``main.go:27-101``) has no clustering surface; this module is part of
the LLM-training-data extension tier mandated by SURVEY §0/§2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import to_double


def quantize_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vid, qv) with qv = round(x·1000) per component as bigint —
    exact integer arithmetic downstream, any partitioning."""
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1000).cast("bigint")
    )
    return emb.select(F.col(id_col).alias("vid"), qv.alias("qv"))


def _d2(a, b):
    """Exact integer squared L2 between two bigint arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _centroid_array(cent: DataFrame) -> DataFrame:
    """Collapse the (cell, cv) centroid set into one broadcastable row
    holding array<struct<cell, cv>> sorted by cell (struct sort order is
    field order, and cell is unique — deterministic)."""
    return cent.agg(
        F.array_sort(F.collect_list(F.struct("cell", "cv"))).alias("cents")
    )


def assign_nearest(v: DataFrame, cent: DataFrame) -> DataFrame:
    """(vid, cluster, d2): exact-argmin assignment as a PROJECTION.

    The centroid set rides in as one broadcast row; a higher-order
    ``transform`` scores each centroid ONCE into a (d2, cell) struct and
    ``array_min``'s lexicographic struct ordering delivers the argmin
    with the lower-cell tiebreak.  No shuffle of ``v``, no |v|×k
    intermediate rows, each distance computed exactly once.
    """
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            _d2(F.col("qv"), c.cv).alias("d2"),
            c.cell.cast("bigint").alias("cell"),
        ),
    )
    best = F.array_min(scored)
    return (
        v.crossJoin(F.broadcast(_centroid_array(cent)))
        .withColumn("best", best)
        .select(
            "vid",
            F.col("best.cell").alias("cluster"),
            F.col("best.d2").alias("d2"),
            "qv",
        )
    )


def refine_step(assigned: DataFrame) -> DataFrame:
    """New centroids = per-component exact means of the members.

    (cell, pos, val) long form, partial-agg groupBy into k×dim groups;
    mean = round(sum::decimal / count) re-quantized to bigint — the
    same half-away-from-zero convention as the oracle's round().
    Empty cells simply drop out (GROUP BY semantics, both engines).
    """
    mem = assigned.select(
        F.col("cluster").alias("cell"), F.posexplode("qv").alias("pos", "val")
    )
    means = mem.groupBy("cell", "pos").agg(
        F.round(F.sum("val").cast("decimal(28,6)") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("cval")
    )
    return means.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s.cval,
        ).alias("cv")
    )


def kmeans_assignments(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full deterministic Lloyd loop → final (vid, cluster, d2).

    Seeding: the vectors with ``id < k`` (the IVF/PQ convention used
    throughout this tier).  ``iters`` refinement passes, then one final
    assignment against the refined centroids.

    Each pass's centroid frame (k rows of k×dim bigints) is eagerly
    checkpointed (round 17): lazily, iteration i's centroids embed the
    FULL corpus pipeline of every earlier iteration inside their
    broadcast subtree — Catalyst does not CSE across broadcast
    boundaries, so the unrolled q369 plan re-scanned and re-assigned
    the corpus 8× for iters=2 (plans/r17/q369_kmeans_clusters_before
    .txt: 8 parquet scans).  Materializing the k-row state makes each
    iteration exactly ONE corpus pass (assign + refine aggregate) and
    the final plan one more — 3 scans total, values bit-identical
    (checkpointing is pure materialization; the arithmetic is exact
    integers either way).
    """
    v = quantize_vectors(emb, id_col, vec_col)
    cent = v.filter(F.col("vid") < k).select(
        F.col("vid").alias("cell"), F.col("qv").alias("cv")
    )
    for _ in range(iters):
        cent = refine_step(assign_nearest(v, cent)).localCheckpoint(
            eager=True
        )
    return assign_nearest(v, cent).select("vid", "cluster", "d2")


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: k-means cluster, then drop every vector that has a
    more-senior (lower-id) cosine-near-duplicate INSIDE its cluster.

    The pair join is an equi-join on the cluster id — candidates scale
    with cluster size, never corpus².  Cosine is computed on the
    ORIGINAL float vectors (cast double, 6 dp — the tier-wide cosine
    contract), so the keep/drop decision is about real geometry, not
    the quantized training view.  Returns the survivors
    (vec_id, cluster).
    """
    assign = kmeans_assignments(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    from .similarity import _cos, _with_norm

    vecs = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    tagged = assign.join(vecs, "vid")
    a = tagged.select(
        F.col("vid").alias("id_a"), F.col("cluster"), F.col("vec").alias("qvec")
    )
    b = tagged.select(
        F.col("vid").alias("id_b"), F.col("cluster"), F.col("vec").alias("nvec")
    )
    dups = (
        _with_norm(a, "qvec", "qn")
        .join(_with_norm(b, "nvec", "nn"), "cluster")
        .filter(F.col("id_b") < F.col("id_a"))
        .withColumn("cos_sim", _cos("qvec", "nvec", "qn", "nn"))
        .filter(F.col("cos_sim") >= tau)
        .select(F.col("id_a").alias("vid"))
        .distinct()
    )
    return (
        assign.join(dups, "vid", "left_anti")
        .select(F.col("vid").alias(id_col), "cluster")
    )


def maximin_seeds(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic furthest-point (maximin) k-means initialization —
    the quality-init alternative to first-k seeding: start from the
    minimum id, then repeatedly pick the point whose distance to its
    NEAREST chosen seed is largest (exact integer d2, lower-vid
    tiebreak).  k−1 projection-only corpus scans (the same broadcast
    array + higher-order argmin shape as :func:`assign_nearest`), each
    ending in one TakeOrdered(1) — no driver collect, no corpus
    shuffle.  Returns (pick_order, vid, min_d2) with min_d2 = the
    maximin distance at pick time (0 for the seed)."""
    v = quantize_vectors(emb, id_col, vec_col)
    first = (
        v.orderBy("vid")
        .limit(1)
        .select(
            F.lit(0).alias("pick_order"),
            "vid",
            F.lit(0).cast("bigint").alias("min_d2"),
            "qv",
        )
    )
    chosen = first
    for i in range(1, k):
        cent = chosen.select(F.col("vid").alias("cell"), F.col("qv").alias("cv"))
        scored = assign_nearest(v, cent).join(
            chosen.select("vid"), "vid", "left_anti"
        )
        pick = (
            scored.orderBy(F.col("d2").desc(), F.col("vid"))
            .limit(1)
            .select(
                F.lit(i).alias("pick_order"),
                "vid",
                F.col("d2").alias("min_d2"),
                "qv",
            )
        )
        # ≤k rows — checkpoint per pick (round 17): lazily, pick i's
        # TakeOrdered subtree embeds every earlier pick's corpus scan,
        # compounding to O(k²) scans by the last seed; materialized,
        # each pick is exactly one projection-only corpus pass
        chosen = chosen.unionByName(pick).localCheckpoint(eager=True)
    return chosen.select("pick_order", "vid", "min_d2")
