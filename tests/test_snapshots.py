"""Manifest snapshot store: atomic publish, snapshot isolation, time
travel, transactional rewrite, vacuum."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from syslog_handler_with_clickhouse_spark.sources.snapshots import (
    latest_version,
    read_snapshot,
    rewrite_snapshot,
    vacuum,
    write_snapshot,
)


def test_append_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "snap")
    df1 = spark.range(0, 10).withColumnRenamed("id", "x")
    df2 = spark.range(10, 15).withColumnRenamed("id", "x")

    assert write_snapshot(df1, path) == 1
    assert write_snapshot(df2, path) == 2
    assert latest_version(path) == 2

    assert read_snapshot(spark, path).count() == 15  # latest
    assert read_snapshot(spark, path, version=1).count() == 10  # time travel


def test_reader_isolated_from_concurrent_commit(spark, tmp_path):
    path = str(tmp_path / "iso")
    write_snapshot(spark.range(0, 100).withColumnRenamed("id", "x"), path)

    reader = read_snapshot(spark, path)  # resolves v1's file list NOW
    # a concurrent overwrite commits v2 while the reader is in flight
    write_snapshot(
        spark.range(0, 3).withColumnRenamed("id", "x"), path, mode="overwrite"
    )
    assert reader.count() == 100  # still sees v1, not a half state
    assert read_snapshot(spark, path).count() == 3  # new readers see v2


def test_transactional_rewrite_keeps_old_snapshot(spark, tmp_path):
    path = str(tmp_path / "rw")
    write_snapshot(spark.range(0, 20).withColumnRenamed("id", "x"), path)
    v2 = rewrite_snapshot(spark, path, lambda df: df.filter(F.col("x") % 2 == 0))
    assert v2 == 2
    assert read_snapshot(spark, path).count() == 10
    assert read_snapshot(spark, path, version=1).count() == 20


def test_vacuum_removes_dead_files(spark, tmp_path):
    path = str(tmp_path / "vac")
    write_snapshot(spark.range(0, 20).withColumnRenamed("id", "x"), path)
    rewrite_snapshot(spark, path, lambda df: df.filter(F.col("x") < 5))
    n_before = len(glob.glob(f"{path}/data/*.parquet"))
    removed = vacuum(path, keep_last=1)
    assert removed > 0
    assert len(glob.glob(f"{path}/data/*.parquet")) == n_before - removed
    assert read_snapshot(spark, path).count() == 5  # latest still intact


def test_manifest_stats_prune_files(spark, tmp_path):
    """Files whose [min,max] can't intersect the predicate are dropped
    from the read BEFORE Spark opens them."""
    path = str(tmp_path / "stats")
    # three disjoint ranges → three separate commits → ≥3 files
    for lo in (0, 100, 200):
        write_snapshot(
            spark.range(lo, lo + 50).withColumnRenamed("id", "x").coalesce(1),
            path,
            stat_cols=["x"],
        )
    full = read_snapshot(spark, path)
    pruned = read_snapshot(spark, path, prune=("x", 100, 149))
    assert full.count() == 150
    assert pruned.count() == 50  # only the middle file's rows
    # the pruned scan reads strictly fewer files
    n_full = len(full.inputFiles())
    n_pruned = len(pruned.inputFiles())
    assert n_pruned < n_full, (n_pruned, n_full)
    # everything-pruned edge: empty frame, schema intact
    none = read_snapshot(spark, path, prune=("x", 10_000, 20_000))
    assert none.count() == 0
    assert none.columns == ["x"]


def test_batch_id_makes_commit_idempotent(spark, tmp_path):
    """Replaying a foreachBatch delivery with the same batch_id must not
    duplicate rows — exactly-once into the snapshot store."""
    path = str(tmp_path / "eo")
    df = spark.range(0, 10).withColumnRenamed("id", "x")
    v1 = write_snapshot(df, path, batch_id=0)
    v_dup = write_snapshot(df, path, batch_id=0)  # retry of batch 0
    assert v_dup == v1  # no new snapshot
    assert read_snapshot(spark, path).count() == 10
    v2 = write_snapshot(df, path, batch_id=1)
    assert v2 == v1 + 1
    assert read_snapshot(spark, path).count() == 20


def test_bloom_prunes_files_and_preserves_results(spark, tmp_path):
    """Equality pruning via per-file blooms: uniformly-spread keys make
    min/max ranges useless (every file overlaps), but blooms prune — and
    never drop a file that actually holds the value."""
    from syslog_handler_with_clickhouse_spark.sources import snapshots as sn

    store = str(tmp_path / "bloomstore")
    # 4 appends = 4+ files; keys uniformly spread so ranges all overlap
    for part in range(4):
        df = spark.createDataFrame(
            [(part * 1000 + i * 7, f"k{part}_{i}") for i in range(200)],
            "id long, key string",
        ).coalesce(1)
        sn.write_snapshot(df, store, stat_cols=["id"], bloom_cols=["key"])

    target = "k2_55"
    full = sn.read_snapshot(spark, store)
    pruned = sn.read_snapshot(spark, store, bloom=("key", target))
    n_full = len(full.inputFiles())
    n_pruned = len(pruned.inputFiles())
    assert n_pruned < n_full, (n_pruned, n_full)
    # correctness: pruned read + real filter == full read + real filter
    from pyspark.sql import functions as F

    a = sorted(r.id for r in pruned.filter(F.col("key") == target).collect())
    b = sorted(r.id for r in full.filter(F.col("key") == target).collect())
    assert a == b and len(a) == 1

    # absent value: everything pruned (with overwhelming probability at
    # 200 keys/file vs 8192-bit k=6 blooms), empty result, schema kept
    gone = sn.read_snapshot(spark, store, bloom=("key", "no_such_key"))
    assert gone.count() == 0


def test_bloom_no_false_negative_exhaustive(spark, tmp_path):
    """EVERY present key must survive bloom pruning of its own file."""
    from syslog_handler_with_clickhouse_spark.sources import snapshots as sn

    keys = [f"user{i}" for i in range(300)]
    store = str(tmp_path / "bs2")
    df = spark.createDataFrame([(i, k) for i, k in enumerate(keys)],
                               "id long, key string").coalesce(1)
    sn.write_snapshot(df, store, bloom_cols=["key"])
    m = sn._read_manifest(store, sn.latest_version(store))
    hexbits = m["files"][0]["blooms"]["key"]
    for k in keys:
        assert sn._bloom_may_contain(hexbits, k), k


def test_vacuum_retention_guard_and_clear_error(spark, tmp_path):
    """vacuum refuses keep_last below min_versions_to_keep, and a
    time-travel read of a vacuumed-away version raises a clear error."""
    import pytest

    from syslog_handler_with_clickhouse_spark.sources import snapshots as sn

    path = str(tmp_path / "vac")
    for i in range(3):
        sn.write_snapshot(
            spark.createDataFrame([(i,)], "v long"), path, mode="append"
        )
    assert sn.latest_version(path) == 3

    with pytest.raises(ValueError, match="min_versions_to_keep"):
        sn.vacuum(path, keep_last=0)

    sn.vacuum(path, keep_last=1)
    # latest still reads fine
    assert sn.read_snapshot(spark, path).count() == 3
    # vacuumed-away version raises a clear, named error
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        sn.read_snapshot(spark, path, version=1)


def test_bloom_integral_column_no_false_negative(spark, tmp_path):
    """Bloom over a BIGINT key column must hash int values identically on
    the write (Spark job, pandas) and read (python int) sides — guards
    the pandas float64-for-nullable-int coercion trap."""
    from syslog_handler_with_clickhouse_spark.sources import snapshots as sn

    store = str(tmp_path / "bi")
    rows = [(i, i * 1000 + 7) for i in range(200)] + [(200, None)]
    df = spark.createDataFrame(rows, "id long, key long").coalesce(1)
    sn.write_snapshot(df, store, bloom_cols=["key"])
    m = sn._read_manifest(store, sn.latest_version(store))
    hexbits = m["files"][0]["blooms"]["key"]
    for i in range(200):
        assert sn._bloom_may_contain(hexbits, i * 1000 + 7), i
    # and the pruning read path agrees
    got = sn.read_snapshot(spark, store, bloom=("key", 42 * 1000 + 7))
    assert got.count() == 201  # file kept (value present)


def test_snapshot_diff_reads_only_changed_files(spark, tmp_path):
    """The CDC diff must (a) produce exactly the inserted/deleted rows
    and (b) prove the file-level skip: appending a slice leaves v1's
    files untouched, so diff(v1, v2) reads ONLY the new files."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.sources.snapshots import (
        _read_manifest,
        snapshot_diff,
        write_snapshot,
    )

    path = str(tmp_path / "store")
    df1 = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df2 = spark.range(100, 130).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_snapshot(df1, path)
    write_snapshot(df2, path)
    m1 = {e["name"] for e in _read_manifest(path, 1)["files"]}
    m2 = {e["name"] for e in _read_manifest(path, 2)["files"]}
    assert m1 < m2  # append keeps v1 files — immutability
    feed = snapshot_diff(spark, path, 1, 2)
    rows = feed.collect()
    assert all(r._change_type == "insert" for r in rows)
    assert sorted(r.k for r in rows) == list(range(100, 130))


def test_snapshot_diff_rewrite_emits_delete_only_for_erased(spark, tmp_path):
    """A rewrite copies survivors into new files; the row-level
    exceptAll must trim them so only truly-erased rows appear as
    deletes (and nothing as insert)."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.sources.snapshots import (
        rewrite_snapshot,
        snapshot_diff,
        write_snapshot,
    )

    path = str(tmp_path / "store")
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    write_snapshot(df, path)
    rewrite_snapshot(spark, path, lambda d: d.filter(F.col("k") % 10 != 0))
    feed = snapshot_diff(spark, path, 1, 2).collect()
    assert all(r._change_type == "delete" for r in feed)
    assert sorted(r.k for r in feed) == [0, 10, 20, 30, 40]


def test_token_bloom_prunes_files_and_never_false_negatives(spark, tmp_path):
    """tokenbf_v1 analogue: per-file token blooms over a text column —
    a containment search for a word unique to one file must read FEWER
    files, and every word present anywhere must never be pruned away
    (write/read share the tokenizer + hash)."""
    from pyspark.sql import functions as F

    from syslog_handler_with_clickhouse_spark.sources.snapshots import (
        read_snapshot,
        write_snapshot,
    )

    path = str(tmp_path / "snap")
    # 4 files; file k carries the unique marker word zebraK
    for k in range(4):
        df = spark.createDataFrame(
            [(k * 100 + i, f"common words zebra{k} filler{i}")
             for i in range(50)],
            "id long, text string",
        ).coalesce(1)
        write_snapshot(df, path, token_bloom_cols=["text"])

    def files_read(**kw):
        d = read_snapshot(spark, path, **kw)
        return d.select(F.input_file_name().alias("f")).distinct().count(), d

    all_files, _ = files_read()
    assert all_files == 4
    hit_files, d = files_read(token=("text", "zebra2"))
    assert hit_files < 4
    got = d.filter(F.col("text").contains("zebra2")).count()
    assert got == 50
    # no false negatives: every marker + a common token
    for word in ["zebra0", "zebra1", "zebra2", "zebra3", "common"]:
        _, dw = files_read(token=("text", word))
        assert dw.filter(F.col("text").contains(word)).count() == 50 * (
            4 if word == "common" else 1
        ), word
    # tokenization is case/punct-insensitive on the probe side
    _, dq = files_read(token=("text", "  ZEBRA3!"))
    assert dq.filter(F.col("text").contains("zebra3")).count() == 50
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ONE"):
        read_snapshot(spark, path, token=("text", "two words"))
