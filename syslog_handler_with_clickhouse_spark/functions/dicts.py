"""ClickHouse external-dictionary functions re-expressed Spark-first.

CH dictionaries (``dictGet`` / ``dictGetOrDefault`` / ``dictHas`` /
``dictGetHierarchy``) are point lookups into a server-resident key-value
table.  The idiomatic Spark equivalent is a BROADCAST LEFT JOIN against
the dimension frame: Catalyst ships the dictionary to every executor
once and the "lookup" becomes a hash probe inside whole-stage codegen —
the same O(1)-per-row cost as CH's in-memory dictionary, but planned,
pruned, and spilled by the engine instead of a bespoke cache.  At
100 TB the fact side never shuffles for a lookup; only the (small by
definition) dictionary moves.

Every function takes the fact frame plus a ``(dim, dim_key)`` pair and
returns the fact frame with one added column, so lookups chain like CH
calls.  Reference semantics: dictGet raises on a missing key in CH only
for non-nullable layouts; here missing keys yield NULL (dict_get) or
the supplied default (dict_get_or_default), matching the
``dictGetOrNull``/``dictGetOrDefault`` pair users actually deploy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tmp_name(taken, base: str) -> str:
    """Collision-free temp column name: ``base`` unless a user column
    already claims it, else ``base_2``, ``base_3``, … — so a fact frame
    that legitimately has a ``__fk``/``__h0_name`` column is never
    clobbered or dropped."""
    name, i = base, 1
    while name in taken:
        i += 1
        name = f"{base}_{i}"
    return name


def _probe(
    facts: DataFrame,
    key: str | Column,
    dim: DataFrame,
    dim_key: str,
    attrs: list[str],
    out_names: list[str],
) -> DataFrame:
    """Broadcast left join of ``dim[attrs]`` onto ``facts`` keyed by
    ``key`` == ``dim[dim_key]``.  The join key columns are temporary
    (collision-free vs both frames) and dropped; attr columns are
    renamed to ``out_names``."""
    k = F.col(key) if isinstance(key, str) else key
    taken = set(facts.columns) | set(out_names)
    fk = _tmp_name(taken, "__fk")
    dk = _tmp_name(taken | {fk}, "__dk")
    probe = dim.select(
        F.col(dim_key).alias(dk),
        *[F.col(a).alias(o) for a, o in zip(attrs, out_names)],
    )
    return (
        facts.withColumn(fk, k)
        .join(F.broadcast(probe), F.col(fk) == F.col(dk), "left")
        .drop(fk, dk)
    )


def dict_get(
    facts: DataFrame,
    key: str | Column,
    dim: DataFrame,
    dim_key: str,
    attr: str,
    out: str | None = None,
) -> DataFrame:
    """``dictGetOrNull('dim', 'attr', key)``: NULL on a missing key."""
    return _probe(facts, key, dim, dim_key, [attr], [out or attr])


def dict_get_or_default(
    facts: DataFrame,
    key: str | Column,
    dim: DataFrame,
    dim_key: str,
    attr: str,
    default,
    out: str | None = None,
) -> DataFrame:
    """``dictGetOrDefault``: the default fills missing keys."""
    name = out or attr
    got = _probe(facts, key, dim, dim_key, [attr], [name])
    return got.withColumn(name, F.coalesce(F.col(name), F.lit(default)))


def dict_has(
    facts: DataFrame,
    key: str | Column,
    dim: DataFrame,
    dim_key: str,
    out: str = "has",
) -> DataFrame:
    """``dictHas``: boolean key-presence probe (same broadcast shape —
    a left join on a 1-column dictionary projection)."""
    taken = set(facts.columns) | {out}
    fk = _tmp_name(taken, "__fk")
    hk = _tmp_name(taken | {fk}, "__hk")
    present = _tmp_name(taken | {fk, hk}, "__present")
    marked = dim.select(F.col(dim_key).alias(hk)).withColumn(
        present, F.lit(True)
    )
    k = F.col(key) if isinstance(key, str) else key
    return (
        facts.withColumn(fk, k)
        .join(F.broadcast(marked), F.col(fk) == F.col(hk), "left")
        .withColumn(out, F.coalesce(F.col(present), F.lit(False)))
        .drop(fk, hk, present)
    )


def dict_get_hierarchy(
    facts: DataFrame,
    key: str | Column,
    levels: list[tuple[DataFrame, str, str, str]],
    out: str = "hierarchy",
) -> DataFrame:
    """``dictGetHierarchy``: walk a parent chain and return the names
    along it as an array, child first.  ``levels`` is an ordered list of
    ``(dim, dim_key, name_attr, parent_attr)``; each level's lookup key
    is the previous level's parent attribute.  The walk is a fixed chain
    of broadcast joins — depth is schema-bounded (here 2: nation →
    region), so the plan stays static, no iteration."""
    cur = key
    out_cols = []
    tmp_cols = []  # exact temp names created here — the ONLY ones dropped
    work = facts
    for i, (dim, dim_key, name_attr, parent_attr) in enumerate(levels):
        taken = set(work.columns) | set(tmp_cols) | {out}
        ncol = _tmp_name(taken, f"__h{i}_name")
        pcol = _tmp_name(taken | {ncol}, f"__h{i}_parent")
        attrs, outs = [name_attr], [ncol]
        if parent_attr is not None:
            attrs.append(parent_attr)
            outs.append(pcol)
            tmp_cols.append(pcol)
        work = _probe(work, cur, dim, dim_key, attrs, outs)
        out_cols.append(ncol)
        tmp_cols.append(ncol)
        cur = F.col(pcol) if parent_attr is not None else None
    arr = F.filter(
        F.array(*[F.col(c) for c in out_cols]), lambda x: x.isNotNull()
    )
    work = work.withColumn(out, arr)
    return work.drop(*tmp_cols)
