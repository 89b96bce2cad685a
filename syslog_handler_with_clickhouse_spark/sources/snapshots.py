"""Manifest-based snapshot store: minimal transactional layer over Parquet.

The maintenance ops in :mod:`.sinks` (compaction, upsert, TTL, mutations)
swap directories with rename — readers racing a swap can see a half state.
This module closes that gap the way table formats (Delta/Iceberg) do, in
its smallest honest form:

- data files are immutable Parquet files with unique names;
- a numbered manifest (``_manifests/v{N}.json``) lists the files that
  constitute snapshot N;
- a commit is: write new data files, then atomically publish the next
  manifest via ``os.rename`` (POSIX rename is atomic within a filesystem);
- readers resolve the latest manifest ONCE and then read only the files it
  names — they never observe a half-written snapshot, and concurrent
  commits never disturb an in-flight read (snapshot isolation);
- old snapshots remain readable (time travel) until vacuumed.

At 100 TB the same design holds: manifests carry per-file stats for
pruning and live in an object store where rename-or-put-if-absent provides
the same single-writer publish point.  Cited caveat this replaces:
``sinks.compact_parquet`` docstring ("readers racing the swap should
retry").
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _data_dir(path: str) -> str:
    return os.path.join(path, "data")


def latest_version(path: str) -> int:
    """Highest committed snapshot version, or 0 if none."""
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=0)


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version}.json")) as f:
        return json.load(f)


def _commit(path: str, version: int, files: list[str], note: str) -> None:
    """Publish manifest ``version`` atomically (write temp + rename)."""
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    manifest = {"version": version, "files": sorted(files), "note": note}
    tmp = os.path.join(mdir, f".v{version}.json.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    final = os.path.join(mdir, f"v{version}.json")
    if os.path.exists(final):  # lost the single-writer race
        os.remove(tmp)
        raise FileExistsError(f"snapshot v{version} already committed")
    os.rename(tmp, final)


def _write_data_files(df: DataFrame, path: str) -> list[str]:
    """Write df's rows as new immutable files; return their relative names."""
    ddir = _data_dir(path)
    os.makedirs(ddir, exist_ok=True)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    out = []
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet"):
            new = f"{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(staging, f), os.path.join(ddir, new))
            out.append(new)
    import shutil

    shutil.rmtree(staging)
    return out


def write_snapshot(df: DataFrame, path: str, mode: str = "append") -> int:
    """Commit df as the next snapshot.  ``append`` keeps prior files;
    ``overwrite`` starts the file list fresh.  Returns the new version."""
    base = latest_version(path)
    files = [] if mode == "overwrite" or base == 0 else _read_manifest(path, base)["files"]
    new_files = _write_data_files(df, path)
    version = base + 1
    _commit(path, version, files + new_files, note=mode)
    return version


def read_snapshot(spark, path: str, version: int | None = None) -> DataFrame:
    """Read snapshot ``version`` (default: latest).  The file list is
    resolved ONCE here — concurrent commits cannot change what this
    DataFrame reads."""
    v = latest_version(path) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no snapshots at {path}")
    files = _read_manifest(path, v)["files"]
    ddir = _data_dir(path)
    return spark.read.parquet(*[os.path.join(ddir, f) for f in files])


def rewrite_snapshot(spark, path: str, transform) -> int:
    """Full-table transactional rewrite (compaction / delete / update):
    read latest, apply ``transform(df) -> df``, write new files, publish.
    The previous snapshot stays intact and readable throughout."""
    cur = read_snapshot(spark, path)
    new_files = _write_data_files(transform(cur), path)
    version = latest_version(path) + 1
    _commit(path, version, new_files, note="rewrite")
    return version


def vacuum(path: str, keep_last: int = 1) -> int:
    """Delete data files referenced ONLY by snapshots older than the last
    ``keep_last`` versions, and their manifests.  Returns files removed."""
    latest = latest_version(path)
    if latest == 0:
        return 0
    keep_versions = set(range(max(1, latest - keep_last + 1), latest + 1))
    live: set[str] = set()
    for v in keep_versions:
        live.update(_read_manifest(path, v)["files"])
    removed = 0
    ddir = _data_dir(path)
    for f in os.listdir(ddir):
        if f.endswith(".parquet") and f not in live:
            os.remove(os.path.join(ddir, f))
            removed += 1
    mdir = _manifest_dir(path)
    for f in list(os.listdir(mdir)):
        if f.startswith("v") and f.endswith(".json") and int(f[1:-5]) not in keep_versions:
            os.remove(os.path.join(mdir, f))
    return removed
