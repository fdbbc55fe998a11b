"""Structured-Streaming read of a versioned table's change feed.

``table_changes`` (sources/versioned.py) is batch-only: each caller must
remember its last version and poll. This module turns the commit log
itself into a streaming SOURCE — offsets ARE version numbers, each
micro-batch is the file-level diff of a commit range, and the checkpoint
makes consumption exactly-once — so incremental maintainers (the
materialized-view refresher, the text-index refresher, a downstream
enrichment sink) subscribe to deltas instead of polling. The reference
capability being scaled is the outbox poll loop (bot/botrun.py:295-309):
"wake up, read what's new, remember where I stopped" — here Spark's
offset log does the remembering.

Semantics: per version, files ADDED since the parent manifest stream as
``_change_type='insert'`` rows and files REMOVED stream as ``'delete'``
rows — exact row-level multiset deltas, because data files are
immutable. Folding the feed (apply deletes, then inserts) reproduces any
snapshot; for append-only ranges the feed is identical to batch
``table_changes``. A compaction streams as delete+insert of the same
rows (physical noise, logical no-op under the fold) — consumers that
only want logical changes can filter on ``_commit_mode``.

Retention contract: ``vacuum`` must retain versions at least as old as
the slowest subscriber's offset, or a restarted stream will find its
next batch's files reclaimed (same rule as Delta CDF).

Scale shape: one ``InputPartition`` per changed file — read parallelism
equals changed-file count, planning is manifest-only (no data I/O on the
driver), and an idle table produces empty batches for free since
``latestOffset`` just reads the pointer.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from .versioned import _read_manifest, _read_pointer


class ChangeFile(InputPartition):
    """One changed data file: read it, tag every row."""

    def __init__(
        self,
        table: str,
        file: str,
        change_type: str,
        version: int,
        mode: str,
        col_map: list[tuple[str, str | None]],
    ):
        self.table = table
        self.file = file
        self.change_type = change_type
        self.version = version
        self.mode = mode
        # (target_name, file_column_or_None) per output field — resolved
        # on the DRIVER against the manifest's alias map, so executors
        # need no manifest access
        self.col_map = col_map


def _target_schema(table: str):
    from pyspark.sql.types import StructType

    latest = _read_pointer(table)
    if latest is None:
        raise FileNotFoundError(f"no committed version in {table}")
    manifest = _read_manifest(table, latest)
    return StructType.fromJson(manifest["schema"]), manifest


class VersionedChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.table = options["path"]
        start = options.get("startingVersion", "-1")
        if start == "latest":
            p = _read_pointer(self.table)
            self.start_v = p if p is not None else -1
        else:
            self.start_v = int(start)
        target, manifest = _target_schema(self.table)
        self.fields = [f["name"] for f in manifest["schema"]["fields"]]
        # Arrow fast path: pre-resolve the declared output schema to its
        # Arrow form ONCE on the driver; executors then hand Spark whole
        # RecordBatches instead of per-row Python tuples — the difference
        # between a backfill streaming a 100 TB table through a Python
        # loop and through Arrow's columnar transfer. Falls back to
        # row-tuple yields if the conversion isn't available.
        self._arrow_schema = None
        try:
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
            )

            full = StructType(
                list(target.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                    StructField("_commit_mode", StringType()),
                ]
            )
            schema = to_arrow_schema(full)
            # Spark's Arrow deserializer for Python-source batches expects
            # timezone-naive timestamps; normalize tz-annotated fields
            fields = [
                pa.field(f.name, pa.timestamp(f.type.unit))
                if pa.types.is_timestamp(f.type) and f.type.tz is not None
                else f
                for f in schema
            ]
            self._arrow_schema = pa.schema(fields)
        except Exception:
            self._arrow_schema = None

    def initialOffset(self) -> dict:
        return {"version": self.start_v}

    def latestOffset(self) -> dict:
        p = _read_pointer(self.table)
        return {"version": p if p is not None else self.start_v}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        a, b = start["version"], end["version"]
        # the END manifest's alias map composes every historical rename,
        # so any older file's columns resolve to current names through it
        end_manifest = _read_manifest(self.table, b)
        aliases = end_manifest.get("aliases", {})

        def col_map(seg_schema: dict) -> list[tuple[str, str | None]]:
            by_current = {
                aliases.get(f["name"], f["name"]): f["name"]
                for f in seg_schema.get("fields", [])
            }
            return [(t, by_current.get(t)) for t in self.fields]

        parts: list[InputPartition] = []
        for v in range(max(a, -1) + 1, b + 1):
            m = _read_manifest(self.table, v)
            prev_files: set[str] = set()
            prev_m = None
            if v > 0:
                prev_m = _read_manifest(self.table, v - 1)
                prev_files = set(prev_m["files"])
            file_seg = {}
            for seg in m.get("segments", [{"files": m["files"], "schema": m["schema"]}]):
                for f in seg["files"]:
                    file_seg[f] = seg
            for f in m["files"]:
                if f not in prev_files:
                    parts.append(
                        ChangeFile(
                            self.table, f, "insert", v, m["mode"],
                            col_map(file_seg[f]["schema"]),
                        )
                    )
            if prev_m is not None:
                prev_file_seg = {}
                for seg in prev_m.get(
                    "segments",
                    [{"files": prev_m["files"], "schema": prev_m["schema"]}],
                ):
                    for f in seg["files"]:
                        prev_file_seg[f] = seg
                cur_files = set(m["files"])
                for f in prev_m["files"]:
                    if f not in cur_files:
                        parts.append(
                            ChangeFile(
                                self.table, f, "delete", v, m["mode"],
                                col_map(prev_file_seg[f]["schema"]),
                            )
                        )
        return parts

    def read(self, partition: ChangeFile) -> Iterator[tuple]:
        # executor-side: plain pyarrow file read, projected and re-ordered
        # to the declared schema
        import pyarrow.parquet as pq

        path = os.path.join(partition.table, partition.file)
        want = [s for _, s in partition.col_map if s is not None]
        tbl = pq.read_table(path, columns=want)
        n = tbl.num_rows
        if self._arrow_schema is not None:
            import pyarrow as pa

            sch = self._arrow_schema
            arrays = []
            for tgt, src in partition.col_map:
                ftype = sch.field(tgt).type
                if src is None:
                    arrays.append(pa.nulls(n, type=ftype))
                else:
                    # cast covers widened columns (int32 file -> long
                    # table) and tz normalization; lossless by the
                    # manifest's widening rules
                    arrays.append(
                        tbl.column(src).cast(ftype).combine_chunks()
                    )
            arrays.append(pa.array([partition.change_type] * n, pa.string()))
            arrays.append(pa.array([partition.version] * n, pa.int64()))
            arrays.append(pa.array([partition.mode] * n, pa.string()))
            yield pa.RecordBatch.from_arrays(arrays, schema=sch)
            return
        # fallback: per-row python tuples (values coerce as natives)
        cols = {}
        for tgt, src in partition.col_map:
            cols[tgt] = (
                tbl.column(src).to_pylist() if src is not None else [None] * n
            )
        tail = (partition.change_type, partition.version, partition.mode)
        names = [t for t, _ in partition.col_map]
        for i in range(n):
            yield tuple(cols[t][i] for t in names) + tail

    def commit(self, end: dict) -> None:
        pass  # the checkpoint offset log is the ledger; nothing to ack


class VersionedChangesDataSource(DataSource):
    """``spark.readStream.format("versioned_changes").option("path", t)``.

    Options: ``path`` (table root, required), ``startingVersion``
    (int, default -1 = stream the full history including version 0's
    snapshot; ``"latest"`` = only commits after stream start)."""

    @classmethod
    def name(cls) -> str:
        return "versioned_changes"

    def schema(self):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
        )

        target, _ = _target_schema(self.options["path"])
        return target.add(
            StructField("_change_type", StringType())
        ).add(StructField("_commit_version", LongType())).add(
            StructField("_commit_mode", StringType())
        )

    def streamReader(self, schema) -> VersionedChangesStreamReader:
        # keep the CaseInsensitiveDict: a plain dict() copy would
        # lower-case the keys and silently drop camelCase option lookups
        return VersionedChangesStreamReader(self.options)


def read_changes_stream(
    spark: SparkSession, table: str, starting_version: int | str = -1
) -> DataFrame:
    """Streaming DataFrame over the table's change feed (registers the
    data source on first use). Columns = table schema +
    ``_change_type`` / ``_commit_version`` / ``_commit_mode``."""
    spark.dataSource.register(VersionedChangesDataSource)
    return (
        spark.readStream.format("versioned_changes")
        .option("path", table)
        .option("startingVersion", str(starting_version))
        .load()
    )
