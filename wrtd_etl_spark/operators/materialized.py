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
from pyspark.sql import functions as F

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
    retract: bool = False,
) -> tuple[int, str]:
    """(view version, action ∈ {fresh, incremental, cdc_fold, rebuild}):
    maintain a rollup_merge-style materialized aggregate by folding ONLY
    the source's DELTA since the last build.

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
    refresh still succeeds.

    ``retract=True`` (requires every metric kind retractable — count/
    sum): a range containing REWRITES no longer forces the rebuild.
    The view carries a ``__rows`` liveness component (stored in the
    view table; once present it is maintained by EVERY subsequent
    refresh, retract or not, so the view schema never flip-flops and a
    later retract=True resumes folding without a rebuild), and the
    refresh folds the row-tracking CHANGE FEED (sources/versioned.
    table_changes — O(changed rows) across compact/DV/CoW since r9):
    inserts merge in, deletes retract out, groups whose ``__rows``
    reaches 0 leave the view. A maintenance compaction folds to an
    EMPTY delta — zero work where the default path re-aggregated the
    world. Float sums retract with float arithmetic (exact under the
    integer-sum idiom); min/max/distinct metrics keep the honest
    rebuild."""
    from .rollup_merge import RETRACTABLE

    src_now = latest_version(source_table)
    if src_now is None:
        raise FileNotFoundError(f"no committed version in {source_table}")
    view_v = latest_version(view_table)
    view_has_rows = view_v is not None and "__rows" in [
        f["name"] for f in manifest_info(view_table)["schema"]["fields"]
    ]
    if retract or view_has_rows:
        # once the stored view carries the liveness component, keep
        # maintaining it on EVERY refresh — a retract=False refresh
        # that dropped it would flip the view schema and force the
        # next retract=True call into a full rebuild
        metrics = {**metrics, "__rows": ("rows", keys[0])}
    built_from = None
    if view_v is not None:
        built_from = manifest_info(view_table)["extra"].get(
            "rollup_source_version"
        )
        if built_from == src_now:
            return view_v, "fresh"
        if retract and not view_has_rows:
            # a view built before retract=True lacks the liveness
            # component: one rebuild migrates it, folds resume after
            built_from = None

    from .rollup_merge import aggregate_batch, merge_rollup

    delta = (
        delta_files(source_table, built_from, src_now)
        if built_from is not None
        else None
    )
    if (
        delta is None
        and built_from is not None
        and retract
        and all(kind in RETRACTABLE for kind, _ in metrics.values())
    ):
        from ..sources.versioned import table_changes
        from .rollup_merge import (
            aggregate_batch,
            merge_rollup,
            retract_rollup,
        )

        changes = table_changes(spark, source_table, built_from, src_now)
        ins = changes.filter(F.col("_change_type") == "insert").drop(
            "_change_type"
        )
        dels = changes.filter(F.col("_change_type") == "delete").drop(
            "_change_type"
        )
        if prepare is not None:
            # applied identically to both signs, so fold ≡ rebuild by
            # construction (same contract as the append path)
            ins, dels = prepare(ins), prepare(dels)
        rolled = merge_rollup(
            read_snapshot(spark, view_table),
            aggregate_batch(ins, keys, metrics),
            keys,
            metrics,
        )
        rolled = retract_rollup(
            rolled, aggregate_batch(dels, keys, metrics), keys, metrics
        )
        v = write_snapshot(
            rolled, view_table, extra={"rollup_source_version": src_now}
        )
        return v, "cdc_fold"
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
