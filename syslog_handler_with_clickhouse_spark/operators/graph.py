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
