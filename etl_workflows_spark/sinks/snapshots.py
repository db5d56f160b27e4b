"""Snapshot-versioned parquet tables: atomic commit, time travel, rollback,
idempotent retries — without a table-format dependency.

The reference hands durability to BigQuery (load_csv/main.py:158-169 —
WRITE_TRUNCATE jobs are atomic server-side) and its workflow retries lean
on that atomicity. Plain ``spark.write.parquet`` has no such contract: a
crashed overwrite leaves a half-written directory, and a retried append
duplicates rows. This module supplies the missing contract with the same
design Delta/Iceberg use, reduced to its core:

* **immutable data files** under ``<dir>/data/`` — a commit never rewrites
  or deletes a live file, it only adds files and publishes a new manifest;
* **manifest-per-version** under ``<dir>/_snapshots/v{n:08d}.json`` — the
  file list, schema, op, parent, and an optional ``commit_key``;
* **atomicity = one ``O_CREAT|O_EXCL`` create** of the next version file.
  Readers only ever see fully-published manifests; a loser of a commit
  race gets EEXIST and retries against the new latest. (On S3-class
  stores, swap the O_EXCL create for a conditional PUT — the protocol is
  unchanged.)

Scale posture: all driver-side work here is O(files-per-commit) metadata —
never O(rows). Data still moves through executor-parallel
``DataFrameWriter``; the driver renames finished part-files (a pure
metadata op on HDFS-class stores) and writes one small JSON.

``commit_key`` gives exactly-once sinks: a retried commit carrying the
same key is recognized and returns the already-published version — the
snapshot twin of sinks/writer.py ``append_if_absent`` and the natural
``foreachBatch(batch_id)`` target (streaming/incremental.py).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"
_MAX_COMMIT_RETRIES = 20


def _snap_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _SNAP_DIR, f"v{version:08d}.json")


def versions(table_dir: str) -> list[int]:
    """Published versions, ascending (empty list: not a snapshot table)."""
    d = os.path.join(table_dir, _SNAP_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load_manifest(table_dir: str, version: int) -> dict:
    with open(_snap_path(table_dir, version)) as f:
        return json.load(f)


def _latest(table_dir: str) -> int | None:
    vs = versions(table_dir)
    return vs[-1] if vs else None


def _write_data_files(df: DataFrame, table_dir: str) -> list[str]:
    """Executor-parallel write into a staging dir, then rename the part
    files under ``data/`` with a commit-unique prefix. Returns paths
    relative to ``table_dir``. Files are live only once a manifest names
    them — a crash here leaves unreferenced files for vacuum, never a
    corrupt table."""
    tag = uuid.uuid4().hex
    staging = os.path.join(table_dir, f"_staging_{tag}")
    df.write.mode("overwrite").option("compression", "zstd").parquet(staging)
    data_dir = os.path.join(table_dir, _DATA_DIR)
    os.makedirs(data_dir, exist_ok=True)
    rel_paths = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        dst = f"{tag}-{f}"
        os.rename(os.path.join(staging, f), os.path.join(data_dir, dst))
        rel_paths.append(f"{_DATA_DIR}/{dst}")
    shutil.rmtree(staging)
    return rel_paths


def _find_commit_key(table_dir: str, key: str) -> int | None:
    for v in reversed(versions(table_dir)):
        if _load_manifest(table_dir, v).get("commit_key") == key:
            return v
    return None


def commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    commit_key: str | None = None,
) -> int:
    """Publish ``df`` as a new snapshot; returns the published version.

    ``mode='append'`` keeps the parent's files and adds the new ones;
    ``mode='overwrite'`` publishes only the new files (old files stay on
    disk for time travel until ``vacuum``). With ``commit_key`` set, a
    commit whose key is already published is a no-op returning the
    existing version — idempotent retries, no data written twice.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if commit_key is not None:
        existing = _find_commit_key(table_dir, commit_key)
        if existing is not None:
            return existing
    os.makedirs(os.path.join(table_dir, _SNAP_DIR), exist_ok=True)
    new_files = _write_data_files(df, table_dir)
    for _ in range(_MAX_COMMIT_RETRIES):
        parent = _latest(table_dir)
        if commit_key is not None and parent is not None:
            # the race we retry on may have been our own key's winner
            existing = _find_commit_key(table_dir, commit_key)
            if existing is not None:
                return existing
        files = list(new_files)
        if mode == "append" and parent is not None:
            files = _load_manifest(table_dir, parent)["files"] + files
        manifest = {
            "version": (parent or 0) + 1 if parent is not None else 1,
            "parent": parent,
            "op": mode,
            "files": files,
            "schema": df.schema.json(),
            "commit_key": commit_key,
        }
        try:
            fd = os.open(
                _snap_path(table_dir, manifest["version"]),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            continue  # lost the race — re-read latest and retry
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        return manifest["version"]
    raise RuntimeError(
        f"commit to {table_dir} lost {_MAX_COMMIT_RETRIES} races — aborting"
    )


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot (default: latest). An empty file list yields an
    empty-but-typed DataFrame from the manifest's stored schema."""
    v = _latest(table_dir) if version is None else version
    if v is None or not os.path.exists(_snap_path(table_dir, v)):
        raise ValueError(f"no snapshot v{version} under {table_dir}")
    m = _load_manifest(table_dir, v)
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    if not m["files"]:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table_dir, f) for f in m["files"]]
    # schema pinned from the manifest: time travel must return the
    # schema AS OF that version even after later evolution
    return spark.read.schema(schema).parquet(*paths)


def diff_snapshots(
    spark: SparkSession, table_dir: str, v_from: int, v_to: int | None = None
) -> DataFrame:
    """Rows ADDED between ``v_from`` (exclusive) and ``v_to`` (inclusive,
    default latest) — the incremental-consumption primitive: a downstream
    job checkpoints the last version it processed and reads only the new
    files, never re-scanning the table. At 100 TB this is the difference
    between a nightly full rescan and touching one day's files.

    Data files are immutable, so "added files" is an exact set difference
    of two manifests — pure metadata. Raises if ``v_from``'s files are not
    a subset of ``v_to``'s (an overwrite/rollback happened in between:
    the delta is not expressible as additions, the consumer must rescan).
    """
    v = _latest(table_dir) if v_to is None else v_to
    if v is None:
        raise ValueError(f"{table_dir} has no snapshots")
    for x in (v_from, v):
        if not os.path.exists(_snap_path(table_dir, x)):
            raise ValueError(f"no snapshot v{x} under {table_dir}")
    old = set(_load_manifest(table_dir, v_from)["files"])
    new_m = _load_manifest(table_dir, v)
    new = set(new_m["files"])
    if not old <= new:
        raise ValueError(
            f"v{v_from}..v{v} is not append-only ({len(old - new)} file(s) "
            "removed) — incremental read impossible, rescan the snapshot"
        )
    schema = T.StructType.fromJson(json.loads(new_m["schema"]))
    added = sorted(new - old)
    if not added:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(table_dir, f) for f in added]
    )


def rollback(table_dir: str, version: int) -> int:
    """Publish a NEW version whose file list is ``version``'s — history
    stays append-only (an audit can still see the bad snapshots)."""
    if version not in versions(table_dir):
        raise ValueError(f"cannot roll back to unknown version {version}")
    src = _load_manifest(table_dir, version)
    for _ in range(_MAX_COMMIT_RETRIES):
        parent = _latest(table_dir)
        manifest = {
            "version": parent + 1,
            "parent": parent,
            "op": f"rollback_to_{version}",
            "files": src["files"],
            "schema": src["schema"],
            "commit_key": None,
        }
        try:
            fd = os.open(
                _snap_path(table_dir, manifest["version"]),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        return manifest["version"]
    raise RuntimeError("rollback lost too many commit races")


def vacuum(table_dir: str, keep_last: int = 1) -> list[str]:
    """Delete data files referenced by NO kept version (the newest
    ``keep_last`` snapshots survive; older manifests are dropped too).
    Also sweeps unreferenced files from crashed commits. Returns deleted
    paths (relative)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (never vacuum the head)")
    vs = versions(table_dir)
    if not vs:
        return []
    keep_vs = vs[-keep_last:]
    live: set[str] = set()
    for v in keep_vs:
        live.update(_load_manifest(table_dir, v)["files"])
    deleted = []
    data_dir = os.path.join(table_dir, _DATA_DIR)
    if os.path.isdir(data_dir):
        for f in sorted(os.listdir(data_dir)):
            rel = f"{_DATA_DIR}/{f}"
            if rel not in live:
                os.remove(os.path.join(data_dir, f))
                deleted.append(rel)
    for v in vs[:-keep_last]:
        os.remove(_snap_path(table_dir, v))
    return deleted
