"""Round-15 directive-4 probe: which stage spills during a 10 M-corpus
incremental-dedup store insert, per-stage from the Spark REST metrics.
Run plain (reproduces the r14 ~900 MB spill: the SMJ sorting the stored
buckets scan) or with the session default
spark.sql.legacy.bucketedTableScan.outputOrdering=true + a one-file-per-
bucket table (post-bootstrap/compact), which elides that sort entirely —
measured spill 913 MB -> 0, wall 45-70 s -> 38 s (PERF.md round 15).

Run: SPARK_GRAFT_DRIVER_MEM=16g python scripts/store_spill_probe.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from scripts.scale_bench import synth_corpus
from syslog_handler_with_clickhouse_spark.metrics import _completed_stages
from syslog_handler_with_clickhouse_spark.operators.dedup import (
    incremental_dedup_store_init, incremental_dedup_store_insert)
from syslog_handler_with_clickhouse_spark.session import get_spark
import tempfile, shutil

spark = get_spark("spill-probe")
spark.sparkContext.setLogLevel("ERROR")
n, b = 10_000_000, 100_000
docs = synth_corpus(spark, n + b).repartition(64).localCheckpoint(eager=True)
loc = tempfile.mkdtemp(prefix="spillprobe_")
incremental_dedup_store_init(spark, "spillp", num_buckets=64, location=loc)
try:
    incremental_dedup_store_insert(spark, "spillp", docs.filter(F.col("doc_id") < n))
    seen = {s["stageId"] for s in _completed_stages(spark)}
    batch = docs.filter(F.col("doc_id") >= n).localCheckpoint(eager=True)
    incremental_dedup_store_insert(spark, "spillp", batch)
    stages = [s for s in _completed_stages(spark) if s["stageId"] not in seen]
    stages.sort(key=lambda s: -s.get("diskBytesSpilled", 0))
    for s in stages[:8]:
        print(round(s.get("diskBytesSpilled",0)/1e6,1), "MB spill |",
              round(s.get("memoryBytesSpilled",0)/1e6,1), "MB memspill |",
              round(s.get("shuffleReadBytes",0)/1e6,1), "shufR |",
              round(s.get("shuffleWriteBytes",0)/1e6,1), "shufW |",
              s.get("numTasks"), "tasks |", s.get("name","")[:90])
finally:
    for t in ("spillp_buckets","spillp_labels","spillp_relabel"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(loc, ignore_errors=True)
