"""Materialized views over versioned tables: refresh only when stale.

The reference recomputes every aggregate on every poll (queries.py runs
from scratch each minute); ``operators/rollup_merge.py`` fixed the
incremental-aggregation half, this fixes the ORCHESTRATION half: a
materialized view records, in its own commit manifest, the exact source
versions it was built from (``write_snapshot(..., extra=...)``), and
``refresh_materialized`` rebuilds ONLY when some source has advanced.

At 100 TB the staleness check is what matters: it reads two manifest
JSONs per source — no data is touched on the (overwhelmingly common)
already-fresh path. The rebuild itself is the caller's ``build_fn``,
which can be a full recompute or a rollup_merge-style incremental fold;
either way the result commits through the same atomic pointer swap, so
readers of the view see old-or-new, never partial.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.versioned import (
    delta_files,
    latest_version,
    manifest_info,
    read_snapshot,
    write_snapshot,
)


def source_versions(sources: dict[str, str]) -> dict[str, int | None]:
    """name → latest committed version for each source table path."""
    return {name: latest_version(path) for name, path in sources.items()}


def is_stale(view_table: str, sources: dict[str, str]) -> bool:
    """True when the view doesn't exist yet or any source advanced past
    the versions recorded at the view's last build."""
    if latest_version(view_table) is None:
        return True
    built_from = manifest_info(view_table)["extra"].get("source_versions")
    return built_from != {
        name: v for name, v in source_versions(sources).items()
    }


def refresh_materialized(
    spark: SparkSession,
    view_table: str,
    sources: dict[str, str],
    build_fn: Callable[[SparkSession], DataFrame],
) -> tuple[int, bool]:
    """(view version, rebuilt?): rebuild via ``build_fn`` iff stale.

    The source versions are pinned BEFORE the build so a source commit
    racing the rebuild marks the view stale again next refresh (the
    view is then at-most-one-version behind, never silently frozen)."""
    if not is_stale(view_table, sources):
        return latest_version(view_table), False
    pinned = source_versions(sources)
    df = build_fn(spark)
    v = write_snapshot(
        df, view_table, extra={"source_versions": pinned}
    )
    return v, True


def refresh_rollup_incremental(
    spark: SparkSession,
    view_table: str,
    source_table: str,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
    prepare: Callable[[DataFrame], DataFrame] | None = None,
) -> tuple[int, str]:
    """(view version, action ∈ {fresh, incremental, rebuild}): maintain a
    rollup_merge-style materialized aggregate by folding ONLY the
    source's DELTA since the last build.

    ``refresh_materialized`` fixed WHEN to rebuild; this fixes HOW MUCH:
    the source's versioned manifests record exactly which files each
    append added (``delta_files``), so a refresh aggregates the new files
    and merges them into the stored partials (operators/rollup_merge.py)
    — per-refresh cost scales with the delta and the live groups, never
    with history. A non-append commit in the range (overwrite, compact,
    rollback) or a schema-evolving append makes the delta undefined and
    falls back to one full rebuild; ``prepare`` (projection/derivation)
    is applied identically on both paths so fold ≡ rebuild holds by
    construction (property-tested).

    History is literally never re-read on the incremental path — the
    no-history-rescan test deletes the source's old data files and the
    refresh still succeeds."""
    src_now = latest_version(source_table)
    if src_now is None:
        raise FileNotFoundError(f"no committed version in {source_table}")
    built_from = None
    if latest_version(view_table) is not None:
        built_from = manifest_info(view_table)["extra"].get(
            "rollup_source_version"
        )
        if built_from == src_now:
            return latest_version(view_table), "fresh"

    from .rollup_merge import aggregate_batch, merge_rollup

    delta = (
        delta_files(source_table, built_from, src_now)
        if built_from is not None
        else None
    )
    if delta is None:
        base = read_snapshot(spark, source_table, version=src_now)
        if prepare is not None:
            base = prepare(base)
        rolled = aggregate_batch(base, keys, metrics)
        action = "rebuild"
    else:
        if delta:
            ddf = spark.read.parquet(
                *[os.path.join(source_table, f) for f in delta]
            )
        else:  # versions advanced but added no files: fold nothing
            from pyspark.sql.types import StructType

            ddf = spark.createDataFrame(
                [],
                StructType.fromJson(
                    manifest_info(source_table, src_now)["schema"]
                ),
            )
        if prepare is not None:
            ddf = prepare(ddf)
        rolled = merge_rollup(
            read_snapshot(spark, view_table),
            aggregate_batch(ddf, keys, metrics),
            keys,
            metrics,
        )
        action = "incremental"
    v = write_snapshot(
        rolled, view_table, extra={"rollup_source_version": src_now}
    )
    return v, action
