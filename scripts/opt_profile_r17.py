"""Round-17 optimization profiling harness (guide §1: measure first).

Per bench query (HEADLINE + LLM tier), this captures

* ``.explain("formatted")`` of the returned frame →
  ``plans/r17/<name>_<tag>.txt`` (lazy queries only — the store
  lifecycle queries do their work eagerly inside the callable, so their
  returned checkpoint scan has no informative plan; for those the
  interesting artifact is the per-JOB breakdown below);
* one timed noop-sink run with a per-query breakdown of every Spark JOB
  the query submitted (job id, duration, description) read back from
  the UI REST status API — the lifecycle queries are sequences of
  dozens of small jobs, and THIS is where their wall clock hides.

Run:  python scripts/opt_profile_r17.py [tag] [query ...] 2>/dev/null
      tag defaults to "before"; with no query names, profiles the whole
      bench surface.  Writes plans/r17/ and prints one JSON line per
      query with {"name", "wall_s", "jobs": [[desc, sec], ...]}.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r17")

# queries whose callable runs eager work (stores, checkpoint outputs):
# the explain of the returned frame is a checkpoint scan, skip it
EAGER = {
    "q465_bm25_store_index",
    "q466_ivfpq_store_index",
    "q469_bm25_store_auto_compact",
    "q470_ivfpq_store_sampled_train",
}


def _api(spark, path):
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    with urllib.request.urlopen(f"{base}{path}") as resp:
        return json.load(resp)


def _jobs(spark):
    return _api(spark, "/jobs")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(PLANS_DIR, exist_ok=True)

    from bench import HEADLINE, LLM_TIER

    from syslog_handler_with_clickhouse_spark.queries import QUERIES
    from syslog_handler_with_clickhouse_spark.session import get_spark

    spark = get_spark("opt-profile-r17")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    names = list(dict.fromkeys(HEADLINE + LLM_TIER))
    if only:
        names = [n for n in names if n in only] + sorted(
            q for q in only if q not in names
        )

    for name in names:
        fn = QUERIES[name]
        before_jobs = {j["jobId"] for j in _jobs(spark)}
        spark.sparkContext.setJobDescription(f"{name} [{tag}]")
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t_build = time.time() - t0
        if name not in EAGER:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            with open(
                os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w"
            ) as f:
                f.write(plan)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j for j in _jobs(spark) if j["jobId"] not in before_jobs
        ]
        jobs.sort(key=lambda j: j["jobId"])
        out = {
            "name": name,
            "tag": tag,
            "wall_s": round(wall, 3),
            "build_s": round(t_build, 3),
            "n_jobs": len(jobs),
            "jobs": [
                [
                    j.get("description", "")[:110],
                    round(
                        (
                            time.mktime(time.strptime(
                                j["completionTime"][:19],
                                "%Y-%m-%dT%H:%M:%S"))
                            + float(j["completionTime"][20:23] or 0) / 1000
                            - time.mktime(time.strptime(
                                j["submissionTime"][:19],
                                "%Y-%m-%dT%H:%M:%S"))
                            - float(j["submissionTime"][20:23] or 0) / 1000
                        )
                        if j.get("completionTime")
                        else -1.0,
                        3,
                    ),
                    sum(j.get("numTasks", 0) for _ in (0,)),
                ]
                for j in jobs
            ],
        }
        print(json.dumps(out), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
