"""One-pass table compaction via alternating physical names (round 18).

The round-15/16 compaction snapshots a table with ``localCheckpoint``
and overwrites it in place — Spark refuses to overwrite a table it is
reading from, so every compact pays a FULL extra materialization (write
the snapshot blocks, read them back) before the rewrite: each row moves
twice.  Round 17 probed the obvious fix (write to a temp table, catalog
RENAME over the original) and found repeated managed-table renames
silently stop relocating the data directory on this Spark build
(documented in OPTIMIZATION_r17.md).  This module routes around both:

* each logical table ``t`` is backed by ONE of two physical tables,
  ``t`` or ``t__alt`` — :func:`current_table` resolves which (the base
  name wins when both exist);
* :func:`compact_swap` writes the compacted data DIRECTLY from a scan
  of the current physical table into the other name (no snapshot — one
  read, one write), then drops the old one.

Crash windows are all value-safe because compaction is pure layout:

* crash mid-write → the target either never enters the catalog or is
  dropped-and-overwritten by the next compact (``compact_swap``
  pre-cleans the target name AND its leftover directory);
* crash between write and drop → both physical tables exist and the
  resolver's deterministic preference picks one complete, value-correct
  table (possibly the pre-compact layout, in which case the compaction
  work is simply redone later); the orphan is reclaimed by the next
  compact's pre-clean.

External tables (init with an explicit ``location``) keep their root:
the new generation is written to ``<parent-of-current-location>/<target
name>`` and the dropped generation's files are removed explicitly
(DROP TABLE leaves external files behind).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from contextlib import contextmanager


@contextmanager
def forced_bucketed_scan(spark):
    """Scope ``autoBucketedScan.enabled=false`` around compact writes.

    SQL confs are SESSION-wide (not thread-local), so the orchestrator
    wraps this around the WHOLE concurrent compact batch — per-swap
    scoping would race: the first finisher restores the conf while a
    sibling is still planning.  Same caveat as dedup_components' width
    scoping: a concurrent query on the same session plans its bucketed
    scans un-elided for the duration (correct, possibly a few more scan
    tasks)."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _alt(name: str) -> str:
    return f"{name}__alt"


def current_table(spark, name: str) -> str:
    """The physical table currently backing logical ``name``: the base
    name when it exists, else the ``__alt`` generation.  (A store that
    was never compacted — the common case — resolves to the base name
    with one catalog probe.)"""
    if spark.catalog.tableExists(name):
        return name
    return _alt(name)


def _table_meta(spark, table: str):
    jcat = spark._jsparkSession.sessionState().catalog()
    ident = spark._jvm.org.apache.spark.sql.catalyst.TableIdentifier(table)
    return jcat.getTableMetadata(ident)


def _strip_uri(loc: str) -> str:
    if loc.startswith("file:"):
        loc = loc[len("file:") :]
        while loc.startswith("//"):
            loc = loc[1:]
    return loc


def compact_swap(
    spark,
    name: str,
    write: Callable[[object, str, str | None], None],
) -> None:
    """One-pass compaction of logical table ``name``: call
    ``write(reader_frame, target_table, path)`` to persist the
    compacted form of the CURRENT physical table under the other
    physical name, then drop the old one.  ``reader_frame`` is a scan
    of the current physical table taken with bucketed reading FORCED ON
    — on this Spark build a bucketed-write-from-same-spec-bucketed-scan
    otherwise plans a non-bucketed scan AND elides the aligning
    repartition (probed round 18: a 128-file table compacted to 79
    files, depth ~20), while the forced bucketed scan gives one task
    per bucket, zero exchange, and exactly one output file per bucket.

    ``write`` must create ``target`` with ``mode("overwrite")`` and,
    when ``path`` is not None (external store), pass it as the writer's
    ``path`` option so the new generation stays under the store's
    root.  Callers run the swap (or the whole concurrent batch of
    swaps) inside :func:`forced_bucketed_scan`."""
    cur = current_table(spark, name)
    nxt = _alt(name) if cur == name else name
    meta = _table_meta(spark, cur)
    external = meta.tableType().name() == "EXTERNAL"
    cur_loc = _strip_uri(meta.location().toString())
    parent = os.path.dirname(cur_loc.rstrip("/"))

    # pre-clean any orphan of the target name (a crashed earlier
    # compact): catalog entry, then leftover files at the managed or
    # external location — a dirty location fails CTAS loudly
    spark.sql(f"DROP TABLE IF EXISTS {nxt}")
    tgt_loc = os.path.join(parent, nxt)
    shutil.rmtree(tgt_loc, ignore_errors=True)

    write(spark.table(cur), nxt, tgt_loc if external else None)

    spark.sql(f"DROP TABLE {cur}")
    if external:
        shutil.rmtree(cur_loc, ignore_errors=True)
