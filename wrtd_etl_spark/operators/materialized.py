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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.versioned import latest_version, manifest_info, write_snapshot


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
