"""Concurrent driver actions for independent Spark jobs (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially.  The stored-index maintenance paths (bm25_store_*,
ivfpq_store_*, incremental dedup) end each insert/compact in several
table writes that are INDEPENDENT once their shared input is
materialized — running them from a small thread pool lets one job's
tasks back-fill executors freed by another job's straggler tail, and
overlaps the driver-side planning/commit gaps that dominate small
appends (measured round 17: the four store lifecycle queries spend
2.8-4.4 s of their wall purely BETWEEN jobs).

Safety rules encoded here:
- every thunk must target a DIFFERENT table/path (concurrent writers to
  one table share a staging dir — never parallelize same-table writes);
- ``pyspark.inheritable_thread_target`` propagates the caller's
  thread-local JVM properties (job description/group, scheduler pool)
  into the worker threads so concurrent jobs stay labelled correctly;
- the first failure propagates after all in-flight thunks finish
  (table writes are job-atomic, so a failed sibling leaves no torn
  partial file set for the crash-consistency story to mis-read).
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor


def run_actions(*thunks: Callable[[], None]) -> None:
    """Run independent Spark actions concurrently; re-raise the first
    failure after every submitted thunk has finished."""
    thunks = tuple(t for t in thunks if t is not None)
    if len(thunks) == 1:
        thunks[0]()
        return
    if not thunks:
        return
    from pyspark import inheritable_thread_target
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    wrap = (
        (lambda t: inheritable_thread_target(sess)(t))
        if sess is not None
        else inheritable_thread_target
    )
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futs = [pool.submit(wrap(t)) for t in thunks]
        errs = []
        for f in futs:
            try:
                f.result()
            except Exception as e:  # noqa: PERF203 — collect, raise first
                errs.append(e)
        if errs:
            # surface SIBLING failures too (round-18 ADVICE): the first
            # error propagates, the rest ride along as __notes__ so a
            # multi-write failure isn't diagnosed from one table alone
            for other in errs[1:]:
                errs[0].add_note(
                    f"concurrent sibling action also failed: {other!r}"
                )
            raise errs[0]
