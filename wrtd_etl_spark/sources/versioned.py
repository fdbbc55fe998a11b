"""Versioned parquet tables: manifest-pinned snapshots with time travel.

The reference's state tables are Postgres rows, so readers always see a
transactionally consistent table (functions.py:178-183). Our
swap-on-rename parquet tables (operators/upsert.py) are crash-atomic but
still expose exactly one version, and a reader that lists the directory
during a writer's swap can observe a mixed file set. The
lakehouse-standard fix (the Delta/Iceberg log design, distilled) is to
make the FILE LIST itself the unit of commit:

* data files are immutable, written once under ``data/<snapshot-uuid>/``;
* a manifest ``_manifests/v{N}.json`` names the exact files of version N
  plus schema and lineage metadata;
* ``_latest`` is a one-line pointer file, replaced with the POSIX
  atomic-rename idiom (write tmp → ``os.replace``) — commit is a single
  metadata operation, and any reader that already loaded a manifest keeps
  a consistent snapshot no matter what writers do.

Consequences, each tested:

* crash before the pointer swap leaves the previous version intact and
  the table readable (the torn-write test);
* time travel: ``read_snapshot(..., version=N)``;
* rollback is NON-destructive: a new version whose file list equals the
  old one (history is preserved, matching ``RESTORE TABLE`` semantics);
* ``vacuum`` deletes only files no retained manifest references.

Manifest I/O is driver-side ``os``/``json`` — the same scale shape as any
metastore commit: O(#files) metadata, never data-sized. Data moves only
through executor-parallel ``df.write.parquet``.

Concurrency contract: SINGLE WRITER, many readers. Readers are always
consistent (a manifest never references in-flight files). Two racing
writers degrade to last-write-wins on the version number — the losing
commit's files are orphaned (reclaimed by ``vacuum``), never mixed into
the winner's manifest; a serializable multi-writer log needs a
put-if-absent commit primitive (the Delta/Iceberg catalog-service role),
which a bare POSIX directory cannot provide.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_LATEST = "_latest"


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFESTS, f"v{version}.json")


def _read_pointer(table: str) -> int | None:
    try:
        with open(os.path.join(table, _LATEST)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _read_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as f:
        return json.load(f)


def latest_version(table: str) -> int | None:
    return _read_pointer(table)


def manifest_info(table: str, version: int | None = None) -> dict:
    """The (latest unless given) manifest minus the file list — version,
    mode, parent, schema, committed_at, and caller ``extra``."""
    if version is None:
        version = _read_pointer(table)
        if version is None:
            raise FileNotFoundError(f"no committed version in {table}")
    m = dict(_read_manifest(table, version))
    m.pop("files", None)
    return m


def write_snapshot(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    extra: dict | None = None,
) -> int:
    """Commit ``df`` as a new version; returns the version number.

    ``mode='append'`` carries the previous version's files forward;
    ``'overwrite'`` starts the file list fresh. Either way old data
    files are untouched (immutable) until ``vacuum``. ``extra`` is
    JSON-serializable caller metadata stored in the manifest (e.g. the
    source versions a materialized view was built from)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode: {mode!r}")
    os.makedirs(os.path.join(table, _MANIFESTS), exist_ok=True)
    snap_id = uuid.uuid4().hex
    data_dir = os.path.join(table, "data", snap_id)
    df.write.parquet(data_dir)
    new_files = sorted(
        os.path.join("data", snap_id, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )

    prev = _read_pointer(table)
    files = list(new_files)
    evolved = False
    if mode == "append" and prev is not None:
        prev_manifest = _read_manifest(table, prev)
        files = prev_manifest["files"] + files
        # schema evolution: an append whose schema differs from the
        # previous version's marks the manifest, and read_snapshot turns
        # on parquet mergeSchema ONLY then (footer-merging every read of
        # every table would be pure overhead at 100 TB)
        evolved = bool(prev_manifest.get("schema_evolved")) or (
            prev_manifest["schema"] != df.schema.jsonValue()
        )
    version = 0 if prev is None else prev + 1
    manifest = {
        "version": version,
        "mode": mode,
        "parent": prev,
        "files": files,
        "schema": df.schema.jsonValue(),
        "schema_evolved": evolved,
        "committed_at": time.time(),
        "extra": extra or {},
    }
    # write order IS the crash contract: data files exist, then the
    # manifest, then the pointer swap; a crash anywhere before os.replace
    # leaves the previous version fully intact
    mpath = _manifest_path(table, version)
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    ppath = os.path.join(table, _LATEST)
    with open(ppath + ".tmp", "w") as f:
        f.write(str(version))
    os.replace(ppath + ".tmp", ppath)
    return version


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """DataFrame pinned to one manifest (the latest unless ``version``)."""
    if version is None:
        version = _read_pointer(table)
        if version is None:
            raise FileNotFoundError(f"no committed version in {table}")
    manifest = _read_manifest(table, version)
    paths = [os.path.join(table, f) for f in manifest["files"]]
    if not paths:
        return spark.createDataFrame(
            [], schema="struct<>"  # pragma: no cover - empty commit edge
        )
    reader = spark.read
    if manifest.get("schema_evolved"):
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def history(table: str) -> list[dict]:
    """Commit log, newest first (version, mode, parent, n_files, ts)."""
    latest = _read_pointer(table)
    if latest is None:
        return []
    out = []
    for v in range(latest, -1, -1):
        m = _read_manifest(table, v)
        out.append(
            {
                "version": m["version"],
                "mode": m["mode"],
                "parent": m["parent"],
                "n_files": len(m["files"]),
                "committed_at": m["committed_at"],
            }
        )
    return out


def rollback(table: str, version: int) -> int:
    """RESTORE semantics: commit a NEW version whose file list is the
    target's — history stays intact, vacuum keeps shared files alive.

    The restore carries the target's FULL read metadata, not just its
    files: ``schema_evolved`` (restoring an append-evolved version must
    keep mergeSchema on, or the evolved columns silently vanish — and a
    later append would inherit evolved=False and bake the bug in) and
    ``extra`` (consumers like materialized.is_stale index into it)."""
    target = _read_manifest(table, version)
    prev = _read_pointer(table)
    new_version = prev + 1
    manifest = {
        "version": new_version,
        "mode": f"rollback:{version}",
        "parent": prev,
        "files": target["files"],
        "schema": target["schema"],
        "schema_evolved": bool(target.get("schema_evolved")),
        "committed_at": time.time(),
        "extra": target.get("extra", {}),
    }
    mpath = _manifest_path(table, new_version)
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    ppath = os.path.join(table, _LATEST)
    with open(ppath + ".tmp", "w") as f:
        f.write(str(new_version))
    os.replace(ppath + ".tmp", ppath)
    return new_version


def vacuum(table: str, keep_last: int = 1) -> list[str]:
    """Delete data files referenced by NO retained manifest (the newest
    ``keep_last`` versions are retained; older manifests stay as history
    but their exclusive files go). Returns the deleted relative paths."""
    latest = _read_pointer(table)
    if latest is None:
        return []
    keep_from = max(0, latest - keep_last + 1)
    live: set[str] = set()
    for v in range(keep_from, latest + 1):
        live.update(_read_manifest(table, v)["files"])
    deleted = []
    data_root = os.path.join(table, "data")
    for snap in os.listdir(data_root) if os.path.isdir(data_root) else []:
        snap_dir = os.path.join(data_root, snap)
        for f in os.listdir(snap_dir):
            rel = os.path.join("data", snap, f)
            if f.endswith(".parquet") and rel not in live:
                os.remove(os.path.join(table, rel))
                deleted.append(rel)
        if not any(f.endswith(".parquet") for f in os.listdir(snap_dir)):
            shutil.rmtree(snap_dir)
    return sorted(deleted)


def compact(
    spark: SparkSession, table: str, target_files: int = 1
) -> int:
    """OPTIMIZE: rewrite the LATEST version's data into ``target_files``
    coalesced files and commit the rewrite as a new version.

    Append-heavy tables (one file set per micro-batch under
    streaming/cdc.py) accumulate small files until scan planning is
    dominated by per-file overhead — the standard lakehouse fix is a
    background rewrite that changes the FILE LAYOUT but not the rows.
    Readers are never disturbed: the rewrite commits through the same
    manifest pointer swap, old versions still reference the old files
    (time travel intact), and ``vacuum`` reclaims them once retention
    allows."""
    df = read_snapshot(spark, table)
    snap_id = uuid.uuid4().hex
    data_dir = os.path.join(table, "data", snap_id)
    df.coalesce(target_files).write.parquet(data_dir)
    files = sorted(
        os.path.join("data", snap_id, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    prev = _read_pointer(table)
    version = prev + 1
    manifest = {
        "version": version,
        "mode": "compact",
        "parent": prev,
        "files": files,
        "schema": df.schema.jsonValue(),
        # the rewrite materializes ONE uniform (merged) schema, so the
        # compacted version no longer needs mergeSchema even if its
        # ancestors did
        "schema_evolved": False,
        "committed_at": time.time(),
        "extra": {},
    }
    mpath = _manifest_path(table, version)
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mpath + ".tmp", mpath)
    ppath = os.path.join(table, _LATEST)
    with open(ppath + ".tmp", "w") as f:
        f.write(str(version))
    os.replace(ppath + ".tmp", ppath)
    return version


def data_file_count(table: str, version: int | None = None) -> int:
    """Number of data files the (latest unless given) manifest references."""
    if version is None:
        version = _read_pointer(table)
    return len(_read_manifest(table, version)["files"])
