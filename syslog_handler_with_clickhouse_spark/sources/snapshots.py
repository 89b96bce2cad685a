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


def _commit(
    path: str,
    version: int,
    files: list[dict],
    note: str,
    batch_ids: list[int] | None = None,
) -> None:
    """Publish manifest ``version`` atomically (write temp + rename)."""
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    manifest = {
        "version": version,
        "files": sorted(files, key=lambda e: e["name"]),
        "note": note,
        "batch_ids": batch_ids or [],
    }
    tmp = os.path.join(mdir, f".v{version}.json.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    final = os.path.join(mdir, f"v{version}.json")
    if os.path.exists(final):  # lost the single-writer race
        os.remove(tmp)
        raise FileExistsError(f"snapshot v{version} already committed")
    os.rename(tmp, final)


def _file_stats(fpath: str, stat_cols: list[str]) -> dict:
    """Per-file min/max for ``stat_cols`` from the parquet footer only —
    no data pages are read."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fpath).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    stats: dict = {}
    for col in stat_cols:
        if col not in idx:
            continue
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx[col]).statistics
            if s is None or not s.has_min_max:
                return {}  # stats unavailable → never prune on this file
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        if lo is None:  # zero row groups (empty file) → no usable range
            continue
        stats[col] = [lo, hi]
    return stats


_BLOOM_BITS = 8192  # 1 KiB per column per file
_BLOOM_HASHES = 6  # k; ~1% FPR at ~850 distinct values per file


def _bloom_hashes(value) -> list[int]:
    """k bit positions for a value via double hashing over md5 — the
    write AND read side share this exact function, so false negatives are
    impossible.  Values are canonicalized as str(); intended for point
    lookups on int/string key columns (floats: don't)."""
    import hashlib

    h = hashlib.md5(str(value).encode("utf-8")).digest()
    h1 = int.from_bytes(h[:8], "big")
    h2 = int.from_bytes(h[8:], "big") | 1
    return [(h1 + i * h2) % _BLOOM_BITS for i in range(_BLOOM_HASHES)]


def _file_bloom(fpath: str, col: str) -> str | None:
    """Hex-encoded per-file bloom bitset over ``col``'s values — the
    ClickHouse ``bloom_filter`` skipping-index analogue, stored in the
    manifest.  Reads only that one column (columnar), never full rows."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(fpath)
    if col not in pf.schema_arrow.names:
        return None
    bits = bytearray(_BLOOM_BITS // 8)
    for batch in pf.iter_batches(columns=[col]):
        for v in batch.column(0):
            v = v.as_py()
            if v is None:
                continue
            for pos in _bloom_hashes(v):
                bits[pos // 8] |= 1 << (pos % 8)
    return bytes(bits).hex()


def _bloom_may_contain(hex_bits: str, value) -> bool:
    bits = bytes.fromhex(hex_bits)
    return all(bits[p // 8] & (1 << (p % 8)) for p in _bloom_hashes(value))


def _write_data_files(
    df: DataFrame,
    path: str,
    stat_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> list[dict]:
    """Write df's rows as new immutable files; return manifest entries
    ``{"name": ..., "stats": {col: [min, max]}, "blooms": {col: hex}}``."""
    ddir = _data_dir(path)
    os.makedirs(ddir, exist_ok=True)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    out = []
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet"):
            new = f"{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(staging, f), os.path.join(ddir, new))
            entry = {"name": new}
            if stat_cols:
                entry["stats"] = _file_stats(os.path.join(ddir, new), stat_cols)
            if bloom_cols:
                blooms = {}
                for c in bloom_cols:
                    b = _file_bloom(os.path.join(ddir, new), c)
                    if b is not None:
                        blooms[c] = b
                if blooms:
                    entry["blooms"] = blooms
            out.append(entry)
    import shutil

    shutil.rmtree(staging)
    return out


def write_snapshot(
    df: DataFrame,
    path: str,
    mode: str = "append",
    stat_cols: list[str] | None = None,
    batch_id: int | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Commit df as the next snapshot.  ``append`` keeps prior files;
    ``overwrite`` starts the file list fresh.  ``stat_cols`` records
    per-file min/max in the manifest for read-time file pruning;
    ``bloom_cols`` additionally records a 1 KiB per-file bloom bitset for
    EQUALITY pruning on high-cardinality key columns where ranges overlap
    everywhere (the ClickHouse ``bloom_filter`` skipping-index analogue).
    ``batch_id`` makes the commit IDEMPOTENT: if a prior snapshot already
    recorded this id (a foreachBatch retry after a crash between write
    and checkpoint), the commit is skipped — exactly-once into this store.
    Returns the (possibly unchanged) latest version."""
    base = latest_version(path)
    prior_ids: list[int] = []
    files: list[dict] = []
    if base > 0:
        m = _read_manifest(path, base)
        prior_ids = m.get("batch_ids", [])
        if batch_id is not None and batch_id in prior_ids:
            return base  # duplicate delivery — already committed
        if mode != "overwrite":
            files = m["files"]
    new_files = _write_data_files(df, path, stat_cols, bloom_cols)
    version = base + 1
    ids = prior_ids + ([batch_id] if batch_id is not None else [])
    _commit(path, version, files + new_files, note=mode, batch_ids=ids)
    return version


def read_snapshot(
    spark,
    path: str,
    version: int | None = None,
    prune: tuple[str, object, object] | None = None,
    bloom: tuple[str, object] | None = None,
) -> DataFrame:
    """Read snapshot ``version`` (default: latest).  The file list is
    resolved ONCE here — concurrent commits cannot change what this
    DataFrame reads.  ``prune=(col, lo, hi)`` drops files whose manifest
    [min,max] range cannot intersect [lo,hi] BEFORE Spark ever opens them
    — at 100 TB this is the difference between listing 10^6 files and
    reading the 10 that matter.  ``bloom=(col, value)`` drops files whose
    bloom bitset proves the value absent — equality pruning that works
    where ranges don't (uniformly distributed keys overlap every file's
    [min,max]).  False negatives are impossible (write/read share the
    hash function); false positives only cost an extra file read.
    Pruning is advisory: apply the real filter on the returned frame."""
    v = latest_version(path) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"no snapshots at {path}")
    all_entries = _read_manifest(path, v)["files"]
    entries = all_entries
    if prune is not None:
        col, lo, hi = prune
        entries = [
            e
            for e in all_entries
            if (s := e.get("stats", {}).get(col)) is None
            or s[0] is None
            or (s[0] <= hi and lo <= s[1])
        ]  # unknown/degenerate stats → must read
    if bloom is not None:
        bcol, bval = bloom
        entries = [
            e
            for e in entries
            if (b := e.get("blooms", {}).get(bcol)) is None
            or _bloom_may_contain(b, bval)
        ]  # no bloom recorded → must read
    ddir = _data_dir(path)
    if not entries:
        if not all_entries:
            raise FileNotFoundError(f"snapshot v{v} at {path} has no data files")
        # everything pruned: empty frame with the snapshot's schema
        return spark.read.parquet(
            *[os.path.join(ddir, e["name"]) for e in all_entries]
        ).limit(0)
    return spark.read.parquet(*[os.path.join(ddir, e["name"]) for e in entries])


def rewrite_snapshot(spark, path: str, transform, stat_cols: list[str] | None = None) -> int:
    """Full-table transactional rewrite (compaction / delete / update):
    read latest, apply ``transform(df) -> df``, write new files, publish.
    The previous snapshot stays intact and readable throughout."""
    base = latest_version(path)
    cur = read_snapshot(spark, path)
    new_files = _write_data_files(transform(cur), path, stat_cols)
    version = base + 1
    _commit(
        path,
        version,
        new_files,
        note="rewrite",
        batch_ids=_read_manifest(path, base).get("batch_ids", []),
    )
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
        live.update(e["name"] for e in _read_manifest(path, v)["files"])
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
