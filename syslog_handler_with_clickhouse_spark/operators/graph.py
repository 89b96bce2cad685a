"""Fixed-iteration PageRank — the damped power-iteration companion to
BFS (q273) and connected components (q334) in the graph family.

Spark-first shape: each iteration is ONE edges⋈ranks equi-join (keyed
on src) + a dst-keyed sum — identical cost structure to the q334
round, all native (no Python in the loop), partial aggregation before
every exchange.  Out-degrees are computed once and joined into the
edge list up front, so the per-iteration work is join + agg only.
``localCheckpoint`` truncates lineage each round (the standard
iterative guard).

Semantics (the classic formulation): PR_{t+1}(v) = (1-d)/N +
d * Σ_{u→v} PR_t(u)/outdeg(u) over the DISTINCT edge set; nodes with
no in-links settle at (1-d)/N; dangling nodes contribute nothing (no
redistribution — the variant the q351 oracle mirrors exactly).
Fixed iteration count keeps the result closed-form reproducible; a
convergence-probe variant would reuse the q334 control-loop pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    tol: float | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """``edges`` must have (src, dst) columns; returns (node, pr).

    Two stopping modes: fixed ``iters`` (deterministic, the
    oracle-friendly q351 form) or ``tol`` — iterate until
    max |pr_t - pr_{t-1}| < tol (capped at ``max_iter``, raising on
    non-convergence like ``dedup_components``).  The convergence probe
    is a 1-row driver scalar per round — control flow, not a data
    collect."""
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # weight each edge once: contribution factor 1/outdeg(src)
    weighted = edges.join(outdeg, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    if tol is None:
        for _ in range(iters):
            ranks = _pr_round(
                weighted, nodes, ranks, damping, n_nodes
            ).localCheckpoint(eager=True)
        return ranks
    for _ in range(max_iter):
        new = _pr_round(
            weighted, nodes, ranks, damping, n_nodes
        ).localCheckpoint(eager=True)
        delta = (
            new.join(
                ranks.select("node", F.col("pr").alias("opr")), "node"
            )
            .agg(F.max(F.abs(F.col("pr") - F.col("opr"))).alias("d"))
            .collect()[0]
            .d
        )
        old = ranks
        ranks = new
        old.unpersist()
        if delta is not None and delta < tol:
            return ranks
    raise RuntimeError(f"pagerank did not converge in {max_iter} rounds")


def _pr_round(
    weighted: DataFrame,
    nodes: DataFrame,
    ranks: DataFrame,
    damping: float,
    n_nodes: int,
) -> DataFrame:
    """One power-iteration round (un-checkpointed so its plan can be
    pinned): src-keyed edge⋈rank join, dst-keyed partial-agg sum,
    node-keyed fold with the (1-d)/N base."""
    base = F.lit((1.0 - damping) / n_nodes)
    contrib = (
        weighted.join(ranks.select(F.col("node").alias("src"), "pr"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("pr") / F.col("deg")).alias("s"))
    )
    return nodes.join(contrib, "node", "left").select(
        "node",
        (base + F.lit(damping) * F.coalesce("s", F.lit(0.0))).alias("pr"),
    )


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """Distinct undirected (u < v) edges, self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _degrees(und: DataFrame) -> DataFrame:
    """(node, deg) over a canonical undirected edge frame."""
    return (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )


def triangle_counts(
    edges: DataFrame, *, _canon: DataFrame = None, _deg: DataFrame = None
) -> DataFrame:
    """Per-node triangle counts on an undirected simple graph.

    ``edges`` is any (src, dst) frame; it is canonicalized to distinct
    undirected edges first (self-loops dropped).  The algorithm is the
    classic degree-ordered orientation (Chiba–Nishizeki / the
    'compact-forward' join): orient every edge from the (degree, id)-
    smaller endpoint to the larger, so each triangle is counted exactly
    once at its unique smallest vertex, and — the 100 TB property —
    the wedge join's fan-out per node is bounded by its OUT-degree
    under the orientation, which is O(sqrt(m)) on any graph (arboricity
    bound) instead of the raw degree.  A hub with 10 M neighbors
    contributes no 10 M² wedge blow-up: almost all its edges point IN.

    Plan shape: one degree aggregate, one self-join on the wedge apex,
    one equi-join probing the closing edge on (b, c) — all key-local
    shuffles, no cross join, no driver loop.

    Returns (node, tri_cnt) for nodes participating in ≥1 triangle.

    ``_canon``/``_deg`` let a caller that has ALREADY canonicalized the
    edge set and computed degrees (clustering_coefficients) share those
    frames instead of re-deriving them — the shared subplans are
    byte-identical, so ReuseExchange collapses the distinct/union/
    groupBy shuffles to one execution each.
    """
    und = _canon if _canon is not None else _canonical_undirected(edges)
    deg = _deg if _deg is not None else _degrees(und)
    # orientation key: (deg, node) lexicographic
    e = (
        und.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(
                    F.col("u").alias("a"),
                    F.col("v").alias("b"),
                    F.col("du").alias("da"),
                    F.col("dv").alias("db"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("a"),
                    F.col("u").alias("b"),
                    F.col("dv").alias("da"),
                    F.col("du").alias("db"),
                )
            )
            .alias("o")
        )
        .select("o.a", "o.b", "o.da", "o.db")
    )
    e1 = e.select(F.col("a"), F.col("b"), F.col("db").alias("kb"))
    e2 = e.select(F.col("a"), F.col("b").alias("c"), F.col("db").alias("kc"))
    wedges = e1.join(e2, "a").filter(
        (F.col("kb") < F.col("kc"))
        | ((F.col("kb") == F.col("kc")) & (F.col("b") < F.col("c")))
    )
    closing = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    return (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tri_cnt"))
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node in exact ppm:
    cc = 2·tri / (deg·(deg−1)), computed as (2 000 000·tri) div
    (deg·(deg−1)) — the neighborhood-density score built on
    :func:`triangle_counts`.  Nodes of degree < 2 report 0 (no
    potential wedge).  Returns (node, deg, tri_cnt, cc_ppm) for every
    node of the canonical simple graph.

    Canonicalization and the degree aggregate are computed ONCE and
    shared with :func:`triangle_counts` (round-10 advice 4: the
    previous version re-derived both inside the call, executing the
    distinct + union + groupBy shuffles twice per run)."""
    und = _canonical_undirected(edges)
    deg = _degrees(und)
    tri = triangle_counts(None, _canon=und, _deg=deg)
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("tri_cnt", F.lit(0)).cast("bigint").alias("tri_cnt"),
            F.when(F.col("deg") < 2, F.lit(0))
            .otherwise(
                F.expr(
                    "coalesce(tri_cnt, 0) * 2000000 DIV (deg * (deg - 1))"
                )
            )
            .cast("bigint")
            .alias("cc_ppm"),
        )
    )
