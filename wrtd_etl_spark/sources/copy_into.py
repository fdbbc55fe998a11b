"""COPY INTO — Delta's idempotent bulk file ingest, re-expressed on the
versioned-table commit protocol.

The reference ingests by re-running loader scripts against whatever is
in a landing directory (botrun.py's fetch-then-load shape); the failure
mode is double-ingest on retry. Delta's answer is ``COPY INTO``: load
only files never loaded before, tracked in the transaction log. Here
the loaded-file ledger lives in the manifest's ``extra`` (the same
place the streaming sink keeps its exactly-once batch-id ledger), so a
re-run after ANY crash point is a no-op for already-committed files:
the ledger and the data land in ONE atomic commit.

Scale shape: file listing is one driver-side directory walk (O(#files)
metadata, no data I/O); the actual read is ``spark.read`` over exactly
the new files — executor-parallel, schema from the format; the commit
is one ordinary append (stats/blooms/layout/constraints all apply).
The ledger costs O(total files ever loaded) bytes in the root manifest
— the honest ceiling of name-based idempotence; a landing zone that
accumulates millions of files wants the streaming source (checkpoint
offsets) instead, and ``reset_ledger=True`` truncates the ledger once
a zone is known-drained.

Files are assumed immutable once landed (Delta's contract: skipping is
by NAME); a file that shrank or grew after load is reported via the
``changed`` key of :func:`copy_status`, never silently re-ingested.
Concurrency: two racing COPY INTOs from the same zone may double-load
a file that neither's ledger contained (same as Delta, which
serializes via the txn log) — run one loader per zone.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import SparkSession

from . import versioned as V

__all__ = ["copy_into", "copy_status"]

_DEFAULT_PATTERNS = {
    "parquet": "**/*.parquet",
    "json": "**/*.json*",
    "csv": "**/*.csv*",
    "text": "**/*",
}

_LEDGER_KEY = "copy_into_ledger"


def _list_source(source: str, file_format: str, pattern: str | None):
    if os.path.isfile(source):
        return [os.path.abspath(source)]
    pat = pattern or _DEFAULT_PATTERNS.get(file_format, "**/*")
    hits = _glob.glob(os.path.join(source, pat), recursive=True)
    return sorted(os.path.abspath(f) for f in hits if os.path.isfile(f))


def copy_into(
    spark: SparkSession,
    table: str,
    source: str,
    file_format: str = "parquet",
    pattern: str | None = None,
    options: "dict[str, str] | None" = None,
    reset_ledger: bool = False,
) -> "int | None":
    """Load files from ``source`` (a file, or a directory searched with
    ``pattern`` — default per-format glob) that the table has never
    loaded, as ONE append commit carrying the updated ledger; returns
    the committed version, or None when everything was already loaded
    (the idempotent re-run). The table is created on first load."""
    files = _list_source(source, file_format, pattern)
    if not files:
        return None
    p = V._read_pointer(table)
    extra: dict = {}
    ledger: dict = {}
    if p is not None:
        extra = dict(V._read_manifest_root(table, p).get("extra") or {})
        ledger = dict(extra.get(_LEDGER_KEY) or {}) if not reset_ledger else {}
    new_files = [f for f in files if f not in ledger]
    if not new_files:
        if reset_ledger and p is not None:
            V._commit_props(table, {"extra": {**extra, _LEDGER_KEY: ledger}})
        return None
    # pin sizes at LISTING time, before the lazy read materializes:
    # a file appended-to between listing and job execution must commit
    # the PRE-read size so copy_status's 'changed' (immutability
    # violation) check flags it instead of matching the mutated bytes
    for f in new_files:
        ledger[f] = os.path.getsize(f)
    reader = spark.read.format(file_format)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load(new_files)
    return V.write_snapshot(
        df,
        table,
        mode="append" if p is not None else "overwrite",
        extra={**extra, _LEDGER_KEY: ledger},
    )


def copy_status(table: str, source: str, file_format: str = "parquet",
                pattern: str | None = None) -> dict:
    """What a COPY INTO would do now: ``{"loaded": n, "pending": [...],
    "changed": [...]}`` — ``changed`` lists ledgered files whose
    on-disk size no longer matches (the immutability contract broke;
    they are NEVER silently re-ingested)."""
    files = _list_source(source, file_format, pattern)
    p = V._read_pointer(table)
    ledger = {}
    if p is not None:
        ledger = V._read_manifest_root(table, p).get("extra", {}).get(
            _LEDGER_KEY
        ) or {}
    pending = [f for f in files if f not in ledger]
    changed = [
        f
        for f in files
        if f in ledger
        and os.path.exists(f)
        and os.path.getsize(f) != ledger[f]
    ]
    return {"loaded": len(ledger), "pending": pending, "changed": changed}
