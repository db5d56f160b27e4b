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
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL

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


_MANIFEST_CACHE: dict[str, tuple] = {}
_MANIFEST_CACHE_MAX = 4096


def _load_manifest(table_dir: str, version: int) -> dict:
    """Manifests are immutable once published (vacuum only ever deletes
    them), so an in-process cache is always coherent — it turns the
    per-keyed-commit history scan (``_find_commit_key``) from repeated
    disk JSON parses into dict lookups. Bounded FIFO to stay small."""
    p = os.path.abspath(_snap_path(table_dir, version))
    st = os.stat(p)
    sig = (st.st_mtime_ns, st.st_size)  # one stat beats a JSON parse;
    # the signature also catches out-of-band edits (tests, manual ops)
    hit = _MANIFEST_CACHE.get(p)
    if hit is not None and hit[0] == sig:
        return hit[1]
    with open(p) as f:
        m = json.load(f)
    if len(_MANIFEST_CACHE) >= _MANIFEST_CACHE_MAX:
        _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)))
    _MANIFEST_CACHE[p] = (sig, m)
    return m


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


def _file_stats(
    table_dir: str, rel_paths: list[str], cols: list[str]
) -> dict[str, dict[str, list]]:
    """Per-file [min, max] for ``cols`` from parquet FOOTERS (pyarrow,
    row-group statistics) — O(files) metadata reads, zero data rows.
    The Iceberg trick: persist these in the manifest at commit time so
    later MERGE/point-lookup pruning is a pure manifest read."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    for rel in rel_paths:
        md = pq.ParquetFile(os.path.join(table_dir, rel)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, list] = {}
        for c in cols:
            if c not in idx:
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx[c]).statistics
                if s is None or not s.has_min_max:
                    lo = hi = None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            # manifests are JSON: only primitive-typed bounds are stored;
            # anything else (timestamps, bytes) just forgoes pruning
            if lo is not None and all(
                isinstance(x, (int, float, str, bool)) for x in (lo, hi)
            ):
                stats[c] = [lo, hi]
        out[rel] = stats
    return out


def _publish(
    table_dir: str,
    op: str,
    schema_json: str,
    files_fn,
    commit_key: str | None = None,
) -> int:
    """Atomically publish a manifest; ``files_fn(parent_manifest|None)``
    returns the file list — or ``(files, stats[, blooms])`` — computed
    AGAINST THE CURRENT PARENT so a lost race recomputes on the winner's
    state instead of silently dropping it."""
    os.makedirs(os.path.join(table_dir, _SNAP_DIR), exist_ok=True)
    for _ in range(_MAX_COMMIT_RETRIES):
        parent = _latest(table_dir)
        if commit_key is not None:
            # the race we lost may have been our own key's earlier winner
            existing = _find_commit_key(table_dir, commit_key)
            if existing is not None:
                return existing
        parent_m = _load_manifest(table_dir, parent) if parent is not None else None
        built = files_fn(parent_m)
        if not isinstance(built, tuple):
            built = (built,)
        built = built + ({},) * (3 - len(built))
        files, stats, blooms = built
        manifest = {
            "version": (parent + 1) if parent is not None else 1,
            "parent": parent,
            "op": op,
            "files": files,
            "stats": stats,
            "blooms": blooms,
            "schema": schema_json,
            "commit_key": commit_key,
            "created_at": time.time(),
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


def _build_blooms(
    spark: SparkSession,
    table_dir: str,
    rel_paths: list[str],
    conf: dict[str, dict],
) -> dict[str, dict[str, dict]]:
    """Per-file Bloom position sets for ``conf = {col: {m, k}}`` — built
    EXECUTOR-SIDE (one column-pruned scan of the new files per column,
    map-side collect_set of ``pmod(xxhash64(value, seed), m)``), so the
    driver only ever sees ≤ m small ints per (file, column). The
    manifest-level twin of parquet's row-group bloom filters: this one
    skips WHOLE FILES at planning time, before any scan is launched."""
    if not conf or not rel_paths:
        return {}
    from pyspark.sql import functions as F

    paths = {os.path.basename(p): p for p in rel_paths}
    df = spark.read.parquet(
        *[os.path.join(table_dir, p) for p in rel_paths]
    ).select(F.input_file_name().alias("__f"), *conf.keys())
    # canonicalize hashable types: integral columns are widened to
    # bigint so the build hash is Spark's 8-byte long fold — the SAME
    # fold the driver-side probe replays (IntegerType columns would
    # otherwise hash through the 4-byte path and never match a probe)
    for c, dtype in df.dtypes:
        if c == "__f":
            continue
        if dtype in ("tinyint", "smallint", "int", "bigint"):
            df = df.withColumn(c, F.col(c).cast("bigint"))
        elif dtype != "string":
            raise ValueError(
                f"bloom_cols supports integral/string columns; {c} is {dtype}"
            )
    out: dict[str, dict[str, dict]] = {p: {} for p in rel_paths}
    for col, mk in conf.items():
        m, k = int(mk["m"]), int(mk["k"])
        # seed literal cast to bigint: Spark folds IntegerType literals
        # as 4-byte hashes — the driver-side probe replays the 8-byte
        # long fold, so the build must hash the seed as a long too
        positions = F.array(
            *[
                F.pmod(
                    F.xxhash64(F.col(col), F.lit(seed).cast("bigint")),
                    F.lit(m),
                )
                for seed in range(k)
            ]
        )
        rows = (
            df.select("__f", F.explode(positions).alias("p"))
            .groupBy("__f")
            .agg(F.sort_array(F.collect_set("p")).alias("bits"))
            .collect()
        )
        for r in rows:
            base = os.path.basename(r["__f"])
            if base in paths:
                out[paths[base]][col] = {
                    "m": m,
                    "k": k,
                    "bits": [int(x) for x in r["bits"]],
                }
    return out


def _bloom_conf_of(manifest: dict) -> dict[str, dict]:
    """Recover {col: {m, k}} from any per-file bloom entry (uniform by
    construction) — lets rewriting ops rebuild blooms for new files."""
    for per_file in manifest.get("blooms", {}).values():
        if per_file:
            return {c: {"m": b["m"], "k": b["k"]} for c, b in per_file.items()}
    return {}


_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int) -> int:
    """XXH64 (Collet's public spec) in pure Python — bit-identical to
    Spark's ``xxhash64`` so Bloom probes need NO Spark job: build hashes
    executor-side, probe hashes driver-side, parity pinned in tests."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            v1 = (
                _rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _XXP2) & _M64, 31)
                * _XXP1
            ) & _M64
            v2 = (
                _rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _XXP2) & _M64, 31)
                * _XXP1
            ) & _M64
            v3 = (
                _rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _XXP2) & _M64, 31)
                * _XXP1
            ) & _M64
            v4 = (
                _rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _XXP2) & _M64, 31)
                * _XXP1
            ) & _M64
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = ((h * _XXP1) + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k1 = (
            _rotl((int.from_bytes(data[i : i + 8], "little") * _XXP2) & _M64, 31)
            * _XXP1
        ) & _M64
        h = ((_rotl(h ^ k1, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XXP1) & _M64
        h = ((_rotl(h, 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def _spark_xxhash64(value, seed_col: int) -> int:
    """Replicates ``F.xxhash64(F.lit(value), F.lit(seed_col))``: Spark
    folds columns left to right with the running hash as the seed
    (initial 42), longs as 8 LE bytes, strings as UTF-8 bytes. Returns
    the SIGNED 64-bit value Spark produces."""
    if isinstance(value, bool):
        raise TypeError("bloom columns must be long or string")
    if isinstance(value, int):
        h = _xxh64(value.to_bytes(8, "little", signed=True), 42)
    elif isinstance(value, str):
        h = _xxh64(value.encode("utf-8"), 42)
    else:
        raise TypeError(
            f"bloom probe supports long/string values, got {type(value)}"
        )
    h = _xxh64(int(seed_col).to_bytes(8, "little", signed=True), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def _bloom_positions(spark: SparkSession, value, conf: dict) -> list[int]:
    """The k positions of a literal under the SAME hash as the executor-
    side build — computed driver-side with the pure-Python XXH64 (no
    Spark job per probe; parity with ``F.xxhash64`` pinned in tests)."""
    m, k = int(conf["m"]), int(conf["k"])
    return [_spark_xxhash64(value, seed) % m for seed in range(k)]


def commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    commit_key: str | None = None,
    stat_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 1024,
    bloom_hashes: int = 3,
) -> int:
    """Publish ``df`` as a new snapshot; returns the published version.

    ``mode='append'`` keeps the parent's files and adds the new ones;
    ``mode='overwrite'`` publishes only the new files (old files stay on
    disk for time travel until ``vacuum``). With ``commit_key`` set, a
    commit whose key is already published is a no-op returning the
    existing version — idempotent retries, no data written twice.

    ``stat_cols``: record per-file [min, max] of these columns in the
    manifest (footer metadata reads, no data scan) — fuel for
    ``merge_into_snapshot``'s file-level pruning and range-predicate
    skips. ``bloom_cols``: additionally record a per-file Bloom position
    set (m=``bloom_bits``, k=``bloom_hashes``) for planning-time file
    skipping on EQUALITY predicates over high-cardinality, unordered
    columns — where min/max ranges can't exclude anything.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if commit_key is not None:
        existing = _find_commit_key(table_dir, commit_key)
        if existing is not None:
            return existing
    new_files = _write_data_files(df, table_dir)
    new_stats = _file_stats(table_dir, new_files, stat_cols) if stat_cols else {}
    bconf = {
        c: {"m": bloom_bits, "k": bloom_hashes} for c in (bloom_cols or [])
    }
    new_blooms = _build_blooms(df.sparkSession, table_dir, new_files, bconf)

    def files_fn(parent_m):
        if mode == "append" and parent_m is not None:
            # evolution guard: the append's schema becomes the table's
            # and is applied to EVERY file at read time, so it may only
            # ADD nullable columns — a renamed/retyped/dropped parent
            # column would silently null out or break old data
            parent_fields = {
                f["name"]: f["type"]
                for f in json.loads(parent_m["schema"])["fields"]
            }
            new_fields = {
                f["name"]: f["type"]
                for f in json.loads(df.schema.json())["fields"]
            }
            for pname, ptype in parent_fields.items():
                if pname not in new_fields:
                    raise ValueError(
                        f"append drops column {pname!r} — appends may only "
                        "add columns (use mode='overwrite' to reshape)"
                    )
                if new_fields[pname] != ptype:
                    raise ValueError(
                        f"append changes column {pname!r} type "
                        f"{ptype!r} -> {new_fields[pname]!r} — appends may "
                        "only add columns (use mode='overwrite' to reshape)"
                    )
            stats = dict(parent_m.get("stats", {}))
            stats.update(new_stats)
            blooms = dict(parent_m.get("blooms", {}))
            blooms.update(new_blooms)
            return parent_m["files"] + new_files, stats, blooms
        return list(new_files), dict(new_stats), dict(new_blooms)

    return _publish(table_dir, mode, df.schema.json(), files_fn, commit_key)


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    predicates: dict[str, tuple] | None = None,
    equals: dict | None = None,
    as_of: float | None = None,
) -> DataFrame:
    """Read a snapshot (default: latest; ``version=`` for an explicit
    one; ``as_of=<unix ts>`` for the newest snapshot published at or
    before that time). An empty file list yields an empty-but-typed
    DataFrame from the manifest's stored schema.

    Two layers of planning-time file skipping, both advisory (a file
    without the metadata always survives — pruning can only skip work,
    never rows), both re-applied as exact row filters:

    * ``predicates`` — ``{col: (lo, hi)}`` — range pruning off the
      manifest's per-file [min, max] stats (``commit(stat_cols=...)``);
      the tool for clustered/ordered columns.
    * ``equals`` — ``{col: value}`` — Bloom pruning off the manifest's
      per-file position sets (``commit(bloom_cols=...)``); the tool for
      point lookups on high-cardinality UNORDERED columns, where every
      file's [min, max] spans the whole domain and ranges exclude
      nothing. A needle-in-100-TB id lookup opens only the files whose
      Bloom admits the value (false positives just read one extra file).
    """
    if version is not None and as_of is not None:
        raise ValueError("pass version OR as_of, not both")
    if as_of is not None:
        version = version_as_of(table_dir, as_of)
    v = _latest(table_dir) if version is None else version
    if v is None or not os.path.exists(_snap_path(table_dir, v)):
        raise ValueError(f"no snapshot v{version} under {table_dir}")
    m = _load_manifest(table_dir, v)
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    files = m["files"]
    if predicates:
        stats = m.get("stats", {})

        def survives(rel: str) -> bool:
            for c, (lo, hi) in predicates.items():
                rng = stats.get(rel, {}).get(c)
                if rng is not None and (rng[1] < lo or rng[0] > hi):
                    return False
            return True

        files = [f for f in files if survives(f)]
    if equals:
        blooms = m.get("blooms", {})
        # positions are computed PER (column, m, k): files bloomed under
        # different geometries (bloom_bits changed between appends) each
        # get probes under their own modulus — never another file's
        pos: dict[tuple, set[int]] = {}

        def survives_bloom(rel: str) -> bool:
            for c, val in equals.items():
                b = blooms.get(rel, {}).get(c)
                if b is None:
                    continue
                key = (c, b["m"], b["k"])
                if key not in pos:
                    pos[key] = set(_bloom_positions(spark, val, b))
                if not pos[key] <= set(b["bits"]):
                    return False
            return True

        files = [f for f in files if survives_bloom(f)]
    if not files:
        out = spark.createDataFrame([], schema)
    else:
        # schema pinned from the manifest: time travel must return the
        # schema AS OF that version even after later evolution
        out = spark.read.schema(schema).parquet(
            *[os.path.join(table_dir, f) for f in files]
        )
    from pyspark.sql import functions as F

    for c, (lo, hi) in (predicates or {}).items():
        out = out.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    for c, val in (equals or {}).items():
        out = out.filter(F.col(c) == val)
    return out


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


def version_as_of(table_dir: str, ts: float) -> int:
    """Newest version whose publish time is <= ``ts`` (manifests without
    a recorded time — pre-timestamp tables — count as infinitely old)."""
    best = None
    for v in versions(table_dir):
        if _load_manifest(table_dir, v).get("created_at", 0.0) <= ts:
            best = v
    if best is None:
        raise ValueError(f"no snapshot under {table_dir} existed at {ts}")
    return best


def vacuum_expired(
    table_dir: str, retain_seconds: float, min_age_seconds: float = 600.0
) -> list[str]:
    """Time-based retention: keep the head plus every snapshot published
    within the last ``retain_seconds``; vacuum the rest. The GDPR
    companion to ``delete_from_snapshot`` — erasure completes once the
    deleting commit's predecessors age out of this window."""
    vs = versions(table_dir)
    if not vs:
        return []
    cutoff = time.time() - retain_seconds
    keep = [
        v
        for v in vs
        if _load_manifest(table_dir, v).get("created_at", 0.0) >= cutoff
    ]
    keep_last = max(len(keep), 1)  # never vacuum the head
    return vacuum(
        table_dir, keep_last=keep_last, min_age_seconds=min_age_seconds
    )


def rollback(table_dir: str, version: int) -> int:
    """Publish a NEW version whose file list is ``version``'s — history
    stays append-only (an audit can still see the bad snapshots)."""
    if version not in versions(table_dir):
        raise ValueError(f"cannot roll back to unknown version {version}")
    src = _load_manifest(table_dir, version)
    return _publish(
        table_dir,
        f"rollback_to_{version}",
        src["schema"],
        lambda parent_m: (
            src["files"],
            src.get("stats", {}),
            src.get("blooms", {}),
        ),
    )


# Keyed-DML pruning knobs: below _EXACT_PRUNE_MAX_KEYS distinct source
# keys the driver collects the exact key set (tightest possible file
# pruning, bounded memory); above it, pruning runs off <= _PRUNE_BUCKETS
# per-bucket [min, max] covering intervals computed IN-PLAN — a
# backfill-scale merge (10^7-10^8 distinct keys) never lands the full key
# set on the driver. _BROADCAST_MAX_KEYS gates F.broadcast on the
# semi/anti joins; larger sources fall back to a shuffle join.
_EXACT_PRUNE_MAX_KEYS = 100_000
_PRUNE_BUCKETS = 128
_BROADCAST_MAX_KEYS = 1_000_000


def _source_prune_intervals(keys: DataFrame, prune_col: str) -> list:
    """Bounded covering intervals [(lo, hi), ...] of the source's
    ``prune_col``, sorted by lo. Exact distinct values (zero-width
    intervals) when the approximate distinct count is small; otherwise
    per-uniform-bucket [min, max] intervals for numeric/temporal keys
    (one groupBy, <= _PRUNE_BUCKETS rows to the driver) or the single
    global [min, max] for other types. Every path is CONSERVATIVE: the
    union of intervals covers all source keys, so interval pruning can
    only mark extra files affected, never skip a matching one."""
    from pyspark.sql import functions as F

    row = keys.agg(
        F.min(prune_col).alias("lo"),
        F.max(prune_col).alias("hi"),
        F.approx_count_distinct(prune_col).alias("n"),
    ).collect()[0]
    if row["lo"] is None:
        return []
    if row["n"] <= _EXACT_PRUNE_MAX_KEYS:
        vals = sorted(
            r[0] for r in keys.select(prune_col).distinct().collect()
        )
        return [(v, v) for v in vals]
    lo, hi = row["lo"], row["hi"]
    dt = dict(keys.dtypes)[prune_col]
    if dt == "date":
        num = F.datediff(F.col(prune_col), F.lit(lo)).cast("double")
        span = float((hi - lo).days)
    elif dt == "timestamp":
        num = F.col(prune_col).cast("double") - F.lit(lo).cast(
            "timestamp"
        ).cast("double")
        span = (hi - lo).total_seconds()
    elif dt in ("tinyint", "smallint", "int", "bigint", "float", "double") \
            or dt.startswith("decimal"):
        num = F.col(prune_col).cast("double") - float(lo)
        span = float(hi) - float(lo)
    else:
        return [(lo, hi)]  # non-numeric: plain global range pruning
    if not span > 0:
        return [(lo, hi)]
    bucket = F.least(
        F.lit(_PRUNE_BUCKETS - 1),
        F.floor(num / span * _PRUNE_BUCKETS),
    )
    rows = (
        keys.groupBy(bucket.alias("__b"))
        .agg(F.min(prune_col).alias("lo"), F.max(prune_col).alias("hi"))
        .collect()
    )
    return sorted((r["lo"], r["hi"]) for r in rows)


def _prune_by_key_range(
    m: dict, prune_col: str, intervals: list
) -> tuple[list[str], list[str]]:
    """(affected, kept) split of a manifest's files: a file is affected
    iff its recorded [min, max] for ``prune_col`` intersects any of the
    lo-sorted covering ``intervals`` — or it has no stats (conservative).
    """
    from bisect import bisect_left

    starts = [iv[0] for iv in intervals]
    stats = m.get("stats", {})
    affected, kept = [], []
    for rel in m["files"]:
        rng = stats.get(rel, {}).get(prune_col)
        if rng is None:
            affected.append(rel)  # no stats → cannot exclude
            continue
        lo, hi = rng
        # candidate intervals: the first with start > hi can't intersect;
        # the one just before it may straddle [lo, hi] from the left
        i = bisect_left(starts, lo)
        hit = (i < len(intervals) and intervals[i][0] <= hi) or (
            i > 0 and intervals[i - 1][1] >= lo
        )
        (affected if hit else kept).append(rel)
    return affected, kept


def _rewrite_files_fn(
    table_dir: str,
    m: dict,
    op: str,
    kept: list[str],
    new_files: list[str],
    new_stats: dict,
    new_blooms: dict,
):
    """files_fn for a keyed rewrite (MERGE/DELETE): carries the kept
    files' stats/blooms forward, appends the rewrite's, and aborts if
    the head moved since planning (a concurrent writer's files must not
    be silently dropped)."""
    kept_set = set(kept)

    def files_fn(parent_m):
        if parent_m is not None and parent_m["version"] != m["version"]:
            raise RuntimeError(
                f"concurrent write to {table_dir}: {op} planned against "
                f"v{m['version']} but head is v{parent_m['version']} — rerun"
            )
        stats_out = {
            rel: s for rel, s in m.get("stats", {}).items() if rel in kept_set
        }
        stats_out.update(new_stats)
        blooms_out = {
            rel: b
            for rel, b in m.get("blooms", {}).items()
            if rel in kept_set
        }
        blooms_out.update(new_blooms)
        return kept + new_files, stats_out, blooms_out

    return files_fn


def _reject_null_keys(keys: DataFrame, key_cols: list[str], op: str) -> None:
    """NULL keys make keyed DML ambiguous twice over: SQL null-join
    semantics never match them (the anti-join would keep the old row AND
    insert the new), and range pruning can't order them. Refuse loudly."""
    from pyspark.sql import functions as F

    cond = None
    for c in key_cols:
        cond = F.col(c).isNull() if cond is None else cond | F.col(c).isNull()
    if keys.filter(cond).limit(1).count():
        raise ValueError(
            f"{op} keys must be non-null: null values in {key_cols} never "
            "match under SQL join semantics and would duplicate rows"
        )


def merge_into_snapshot(
    spark: SparkSession,
    source: DataFrame,
    table_dir: str,
    key_cols: list[str],
    commit_key: str | None = None,
) -> dict:
    """File-level copy-on-write MERGE (upsert by ``key_cols``): rewrite
    ONLY the data files whose key range can contain a source key; every
    other live file is carried into the new snapshot untouched.

    Pruning runs off the manifest's per-file [min, max] stats for
    ``key_cols[0]`` (``commit(stat_cols=...)``) — a file without recorded
    stats is conservatively treated as affected, so pruning can only
    skip work, never rows. At 100 TB with date- or id-clustered files
    (sinks/layout.py), a small upsert touches a handful of files instead
    of rewriting the table — the Iceberg/Delta MERGE cost model on plain
    parquet.

    Scale shape: driver traffic is BOUNDED regardless of source size —
    pruning collects the exact distinct key set only below
    ``_EXACT_PRUNE_MAX_KEYS`` and otherwise <= ``_PRUNE_BUCKETS``
    per-bucket [min, max] covering intervals computed in-plan; the
    semi/anti joins broadcast the keys only below
    ``_BROADCAST_MAX_KEYS`` rows and shuffle-join beyond that. A
    CDC-sized upsert keeps the old tight plan; a backfill-scale merge
    (10^7+ distinct keys) degrades gracefully instead of landing the key
    set on the driver. Returns
    ``{version, matched, inserted, files_rewritten, files_total}``.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    head = _latest(table_dir)
    if head is None:
        v = commit(source, table_dir, mode="append", commit_key=commit_key,
                   stat_cols=[key_cols[0]])
        return {
            "version": v,
            "matched": 0,
            "inserted": source.count(),
            "files_rewritten": 0,
            "files_total": len(_load_manifest(table_dir, v)["files"]),
        }
    m = _load_manifest(table_dir, head)
    target_cols = [
        f["name"] for f in json.loads(m["schema"])["fields"]
    ]
    if set(source.columns) != set(target_cols):
        raise ValueError(
            f"source columns {sorted(source.columns)} must match target "
            f"{sorted(target_cols)}"
        )
    dupes = source.groupBy(*key_cols).count().filter("count > 1")
    if dupes.limit(1).count():
        raise ValueError("source has multiple rows per merge key (ambiguous MERGE)")
    if commit_key is not None:
        existing = _find_commit_key(table_dir, commit_key)
        if existing is not None:
            return {"version": existing, "matched": 0, "inserted": 0,
                    "files_rewritten": 0, "files_total": len(m["files"]),
                    "idempotent_skip": True}

    src = source.select(*target_cols).localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    n_src = src.count()
    keys = src.select(*key_cols)
    _reject_null_keys(keys, key_cols, "MERGE")
    prune_col = key_cols[0]
    intervals = _source_prune_intervals(keys, prune_col)
    affected, kept = _prune_by_key_range(m, prune_col, intervals)

    from pyspark.sql import functions as F

    schema = T.StructType.fromJson(json.loads(m["schema"]))
    if affected:
        # size-gated broadcast: CDC-batch sources hash-broadcast into the
        # semi/anti joins; a backfill-scale source falls back to a
        # shuffle join rather than shipping GBs to every task
        jk = F.broadcast(keys) if n_src <= _BROADCAST_MAX_KEYS else keys
        hit = spark.read.schema(schema).parquet(
            *[os.path.join(table_dir, f) for f in affected]
        )
        matched = hit.join(jk, key_cols, "leftsemi").count()
        survivors = hit.join(jk, key_cols, "leftanti")
        rewritten = survivors.select(*target_cols).unionByName(src)
    else:
        matched = 0
        rewritten = src
    new_files = _write_data_files(rewritten, table_dir)
    new_stats = _file_stats(table_dir, new_files, [prune_col])
    new_blooms = _build_blooms(
        spark, table_dir, new_files, _bloom_conf_of(m)
    )
    files_fn = _rewrite_files_fn(
        table_dir, m, "MERGE", kept, new_files, new_stats, new_blooms
    )
    v = _publish(table_dir, "merge", m["schema"], files_fn, commit_key)
    return {
        "version": v,
        "matched": matched,
        "inserted": n_src - matched,
        "files_rewritten": len(affected),
        "files_total": len(m["files"]),
    }


def delete_from_snapshot(
    spark: SparkSession,
    source_keys: DataFrame,
    table_dir: str,
    key_cols: list[str],
    commit_key: str | None = None,
) -> dict:
    """File-level copy-on-write DELETE by key: rewrite only files whose
    key range can contain a doomed key (manifest-stats pruning, same
    machinery as ``merge_into_snapshot``); untouched files carry over.
    The snapshot-native right-to-be-forgotten primitive (the managed-
    table twin is sinks/forget.py) — and because old versions survive
    until ``vacuum``, GDPR erasure is only complete after vacuuming past
    the deleting commit, which this returns the version of.
    """
    from pyspark.sql import functions as F

    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    head = _latest(table_dir)
    if head is None:
        raise ValueError(f"{table_dir} has no snapshots")
    m = _load_manifest(table_dir, head)
    if commit_key is not None:
        existing = _find_commit_key(table_dir, commit_key)
        if existing is not None:
            return {"version": existing, "deleted": 0, "files_rewritten": 0,
                    "files_total": len(m["files"]), "idempotent_skip": True}
    keys = source_keys.select(*key_cols).distinct().localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    n_keys = keys.count()
    _reject_null_keys(keys, key_cols, "DELETE")
    prune_col = key_cols[0]
    intervals = _source_prune_intervals(keys, prune_col)
    affected, kept = _prune_by_key_range(m, prune_col, intervals)
    if not affected:
        return {"version": head, "deleted": 0, "files_rewritten": 0,
                "files_total": len(m["files"])}
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    hit = spark.read.schema(schema).parquet(
        *[os.path.join(table_dir, f) for f in affected]
    )
    jk = F.broadcast(keys) if n_keys <= _BROADCAST_MAX_KEYS else keys
    doomed = hit.join(jk, key_cols, "leftsemi").count()
    survivors = hit.join(jk, key_cols, "leftanti")
    new_files = _write_data_files(survivors, table_dir)
    new_stats = _file_stats(table_dir, new_files, [prune_col])
    new_blooms = _build_blooms(
        spark, table_dir, new_files, _bloom_conf_of(m)
    )
    files_fn = _rewrite_files_fn(
        table_dir, m, "DELETE", kept, new_files, new_stats, new_blooms
    )

    v = _publish(table_dir, "delete", m["schema"], files_fn, commit_key)
    return {
        "version": v,
        "deleted": doomed,
        "files_rewritten": len(affected),
        "files_total": len(m["files"]),
    }


def compact_snapshot(
    spark: SparkSession, table_dir: str, target_file_mb: int = 128
) -> dict:
    """Publish a compacted snapshot: same rows, ~size/target files.
    Small-file pathology is the #1 silent killer of 100 TB scans (one
    task + one open() per file); compaction here is just read-latest →
    repartition → commit(overwrite) — readers on old versions are
    untouched, vacuum reclaims the small files later."""
    head = _latest(table_dir)
    if head is None:
        raise ValueError(f"{table_dir} has no snapshots")
    m = _load_manifest(table_dir, head)
    total = sum(
        os.path.getsize(os.path.join(table_dir, f)) for f in m["files"]
    )
    n = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = read_snapshot(spark, table_dir).repartition(int(n))
    stat_cols = sorted(
        {c for s in m.get("stats", {}).values() for c in s}
    ) or None
    bconf = _bloom_conf_of(m)
    first = next(iter(bconf.values()), {"m": 1024, "k": 3})
    v = commit(
        df,
        table_dir,
        mode="overwrite",
        stat_cols=stat_cols,
        bloom_cols=sorted(bconf) or None,
        bloom_bits=int(first["m"]),
        bloom_hashes=int(first["k"]),
    )
    return {
        "version": v,
        "files_before": len(m["files"]),
        "files_after": len(_load_manifest(table_dir, v)["files"]),
    }


_STAGED_DIR = "_staged"


def _staged_path(table_dir: str, name: str) -> str:
    if not re.fullmatch(r"[A-Za-z0-9_.-]+", name):
        raise ValueError(f"staged name must be [A-Za-z0-9_.-]+, got {name!r}")
    return os.path.join(table_dir, _STAGED_DIR, f"{name}.json")


def stage(
    df: DataFrame,
    table_dir: str,
    name: str,
    mode: str = "append",
    stat_cols: list[str] | None = None,
) -> str:
    """Write-Audit-Publish step 1: land ``df``'s data files and park the
    would-be manifest under ``_staged/<name>.json`` — INVISIBLE to every
    reader until ``publish_staged``. The audit job reads the staged view
    (``read_staged``), runs its checks (operators/expectations.py), and
    either publishes or drops; a dropped batch never existed as far as
    consumers are concerned, and its files are vacuum-swept.

    The heavy work (the executor-parallel write) happens here; publish
    is a pure metadata flip — so the audit window adds zero data-write
    latency to the happy path."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    p = _staged_path(table_dir, name)
    if os.path.exists(p):
        raise ValueError(f"staged batch {name!r} already exists — drop it first")
    files = _write_data_files(df, table_dir)
    stats = _file_stats(table_dir, files, stat_cols) if stat_cols else {}
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        json.dump(
            {"name": name, "mode": mode, "files": files, "stats": stats,
             "schema": df.schema.json()},
            f,
        )
    return p


def read_staged(
    spark: SparkSession,
    table_dir: str,
    name: str,
    include_head: bool = True,
) -> DataFrame:
    """What the table WOULD be if ``name`` were published now: the staged
    files, plus (append mode) the current head's files.
    ``include_head=False`` reads the staged batch ALONE — for audits whose
    checks are about the batch itself (row yield, batch-level invariants)
    rather than the post-publish table state."""
    p = _staged_path(table_dir, name)
    if not os.path.exists(p):
        raise ValueError(f"no staged batch {name!r} under {table_dir}")
    with open(p) as f:
        st = json.load(f)
    files = list(st["files"])
    if st["mode"] == "append" and include_head:
        head = _latest(table_dir)
        if head is not None:
            files = _load_manifest(table_dir, head)["files"] + files
    schema = T.StructType.fromJson(json.loads(st["schema"]))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(table_dir, f) for f in files]
    )


def publish_staged(
    table_dir: str, name: str, commit_key: str | None = None
) -> int:
    """WAP step 3: atomically promote the staged batch into the version
    chain (same O_EXCL publish as commit — concurrent appends that
    landed since staging are preserved under append mode). The staged
    marker is removed on success.

    Idempotent by default: the publish carries ``commit_key =
    "staged:<name>"`` unless overridden, so a crash between publish and
    marker removal (or a concurrent double publish) re-resolves to the
    already-published version instead of appending the same files twice.
    """
    p = _staged_path(table_dir, name)
    key = commit_key if commit_key is not None else f"staged:{name}"
    if not os.path.exists(p):
        # marker already consumed — a completed publish (possibly ours,
        # retried after a crash) is fine; anything else is an error
        existing = _find_commit_key(table_dir, key)
        if existing is not None:
            return existing
        raise ValueError(f"no staged batch {name!r} under {table_dir}")
    with open(p) as f:
        st = json.load(f)
    if _find_commit_key(table_dir, key) is not None:
        raise ValueError(
            f"batch name {name!r} was already published once — staged names "
            "must be unique per publish (or pass an explicit commit_key)"
        )

    def files_fn(parent_m):
        if st["mode"] == "append" and parent_m is not None:
            stats = dict(parent_m.get("stats", {}))
            stats.update(st.get("stats", {}))
            # staged batches carry no blooms; parent files keep theirs
            return parent_m["files"] + st["files"], stats, dict(
                parent_m.get("blooms", {})
            )
        return list(st["files"]), dict(st.get("stats", {}))

    v = _publish(table_dir, f"publish_{st['mode']}", st["schema"], files_fn, key)
    try:
        os.remove(p)
    except FileNotFoundError:
        pass  # concurrent publisher of the same batch already cleaned up
    return v


def drop_staged(table_dir: str, name: str) -> None:
    """WAP abort: forget the staged batch (its data files are swept by
    the next ``vacuum`` — they were never referenced by any manifest)."""
    p = _staged_path(table_dir, name)
    if not os.path.exists(p):
        raise ValueError(f"no staged batch {name!r} under {table_dir}")
    os.remove(p)


def vacuum(
    table_dir: str, keep_last: int = 1, min_age_seconds: float = 600.0
) -> list[str]:
    """Delete data files referenced by NO kept version and no staged
    (pre-publish) batch — the newest ``keep_last`` snapshots survive;
    older manifests are dropped too. Also sweeps unreferenced files from
    crashed commits (including orphaned ``_staging_*`` dirs) and dropped
    WAP batches. Returns deleted paths (relative).

    ``min_age_seconds``: an unreferenced file younger than this is left
    alone — it may belong to an IN-FLIGHT commit whose data files are
    already renamed into ``data/`` but whose manifest hasn't published
    yet (the same writer/vacuum race Delta guards with its retention
    window). Pass 0 only when no writer can be active.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (never vacuum the head)")
    vs = versions(table_dir)
    if not vs:
        return []
    keep_vs = vs[-keep_last:]
    live: set[str] = set()
    for v in keep_vs:
        live.update(_load_manifest(table_dir, v)["files"])
    staged_dir = os.path.join(table_dir, _STAGED_DIR)
    if os.path.isdir(staged_dir):
        for f in os.listdir(staged_dir):
            if f.endswith(".json"):
                with open(os.path.join(staged_dir, f)) as fh:
                    live.update(json.load(fh)["files"])
    cutoff = time.time() - min_age_seconds
    deleted = []
    data_dir = os.path.join(table_dir, _DATA_DIR)
    if os.path.isdir(data_dir):
        for f in sorted(os.listdir(data_dir)):
            rel = f"{_DATA_DIR}/{f}"
            full = os.path.join(data_dir, f)
            if rel not in live and os.path.getmtime(full) <= cutoff:
                os.remove(full)
                deleted.append(rel)
    for entry in os.listdir(table_dir):
        full = os.path.join(table_dir, entry)
        if (
            entry.startswith("_staging_")
            and os.path.isdir(full)
            and os.path.getmtime(full) <= cutoff
        ):
            shutil.rmtree(full)
            deleted.append(entry)
    for v in vs[:-keep_last]:
        os.remove(_snap_path(table_dir, v))
    return deleted
