"""Task-level metric probes via the Spark UI REST status API.

Plan-shape assertions (tests/test_plans.py) prove a join is salted or a
filter is pushed down, but skew resilience is a RUNTIME property: the
proof is per-task shuffle-read distribution — a hot key shows up as one
task reading many times the median.  The UI status API exposes exactly
that (`/stages/{id}/{attempt}/taskSummary`), so these helpers run a
DataFrame to the noop sink and report max-vs-median task input for the
heaviest shuffle stage of THAT job only (stages from earlier jobs in
the session are excluded by stage-id watermark).

Requires ``spark.ui.enabled`` (the session factory's default; headless
runs can set SPARK_GRAFT_UI=false and skip the probes).
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession


def _api(spark: SparkSession, path: str):
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    with urllib.request.urlopen(f"{base}{path}") as resp:
        return json.load(resp)


def _completed_stages(spark: SparkSession):
    return _api(spark, "/stages?status=complete")


def shuffle_skew_probe(spark: SparkSession, df: DataFrame) -> dict:
    """Execute ``df`` (noop sink) and return the per-task shuffle-read
    distribution of the job's heaviest shuffle-read stage:

    ``{"stage_id", "shuffle_read_bytes", "records_min", "records_median",
    "records_max", "skew_ratio"}`` where ``skew_ratio`` =
    max/median task shuffle-read RECORDS (records, not bytes: compressed
    block sizes vary with content, row counts don't).
    """
    before = {s["stageId"] for s in _completed_stages(spark)}
    df.write.format("noop").mode("overwrite").save()
    stages = [
        s for s in _completed_stages(spark) if s["stageId"] not in before
    ]
    if not stages:
        raise RuntimeError("no new completed stages after running the job")
    st = max(stages, key=lambda s: s.get("shuffleReadBytes", 0) or 0)
    summary = _api(
        spark,
        f"/stages/{st['stageId']}/{st['attemptId']}/taskSummary"
        "?quantiles=0.0,0.5,1.0",
    )
    rec = summary["shuffleReadMetrics"]["readRecords"]
    lo, med, hi = (float(x) for x in rec)
    return {
        "stage_id": st["stageId"],
        "shuffle_read_bytes": int(st.get("shuffleReadBytes", 0) or 0),
        "records_min": lo,
        "records_median": med,
        "records_max": hi,
        "skew_ratio": (hi / med) if med > 0 else float("inf"),
    }
