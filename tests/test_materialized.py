"""Materialized-view refresh (operators/materialized.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wrtd_etl_spark.operators.materialized import (
    is_stale,
    refresh_materialized,
)
from wrtd_etl_spark.sources.versioned import read_snapshot, write_snapshot


def test_refresh_only_when_source_advances(spark, tmp_path):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, g string"),
        src,
    )
    builds = []

    def build(s):
        builds.append(1)
        return (
            read_snapshot(s, src)
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    sources = {"src": src}
    assert is_stale(view, sources)  # view doesn't exist yet
    v, rebuilt = refresh_materialized(spark, view, sources, build)
    assert (v, rebuilt, len(builds)) == (0, True, 1)
    assert {r.g: r.n for r in read_snapshot(spark, view).collect()} == {
        "a": 2,
        "b": 1,
    }

    # fresh: second refresh touches NO data and runs no build
    v, rebuilt = refresh_materialized(spark, view, sources, build)
    assert (v, rebuilt, len(builds)) == (0, False, 1)
    assert not is_stale(view, sources)

    # source advances -> stale -> one rebuild picks up the new rows
    write_snapshot(
        spark.createDataFrame([(4, "b")], "id long, g string"), src, mode="append"
    )
    assert is_stale(view, sources)
    v, rebuilt = refresh_materialized(spark, view, sources, build)
    assert (v, rebuilt, len(builds)) == (1, True, 2)
    assert {r.g: r.n for r in read_snapshot(spark, view).collect()} == {
        "a": 2,
        "b": 2,
    }


def _rollup_vals(spark, view):
    return {
        r.g: (r.n, r.total, r.mx)
        for r in read_snapshot(spark, view).collect()
    }


def test_incremental_refresh_equals_rebuild_over_three_advances(
    spark, tmp_path
):
    """Property: fold-the-delta ≡ recompute-from-scratch after each of 3
    append advances; a non-append commit falls back to one rebuild."""
    from wrtd_etl_spark.operators.materialized import (
        refresh_rollup_incremental,
    )
    from wrtd_etl_spark.operators.rollup_merge import aggregate_batch

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    keys = ["g"]
    metrics = {"n": ("count", "x"), "total": ("sum", "x"), "mx": ("max", "x")}
    batches = [
        [("a", 1), ("a", 2), ("b", 3)],
        [("b", 4), ("c", 5)],
        [("a", 10), ("c", 1)],
    ]
    write_snapshot(spark.createDataFrame(batches[0], "g string, x long"), src)
    v, action = refresh_rollup_incremental(spark, view, src, keys, metrics)
    assert (v, action) == (0, "rebuild")  # first build is a full one
    for i, b in enumerate(batches[1:], start=1):
        write_snapshot(
            spark.createDataFrame(b, "g string, x long"), src, mode="append"
        )
        v, action = refresh_rollup_incremental(spark, view, src, keys, metrics)
        assert action == "incremental", i
        want = {
            r.g: (r.n, r.total, r.mx)
            for r in aggregate_batch(
                read_snapshot(spark, src), keys, metrics
            ).collect()
        }
        assert _rollup_vals(spark, view) == want
    # fresh: no source advance, no new view version
    assert refresh_rollup_incremental(spark, view, src, keys, metrics)[1] == "fresh"
    # an overwrite makes the delta undefined -> one rebuild, still correct
    write_snapshot(
        spark.createDataFrame([("z", 7)], "g string, x long"), src
    )
    v, action = refresh_rollup_incremental(spark, view, src, keys, metrics)
    assert action == "rebuild"
    assert _rollup_vals(spark, view) == {"z": (1, 7, 7)}


def test_incremental_refresh_never_rescans_history(spark, tmp_path):
    """The strongest no-history-rescan proof: DELETE the source's old
    data files after the first build — the incremental refresh must
    still succeed (it only reads the delta) and produce the fold of
    old partials + new rows."""
    import os

    from wrtd_etl_spark.operators.materialized import (
        refresh_rollup_incremental,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    keys = ["g"]
    metrics = {"n": ("count", "x"), "total": ("sum", "x"), "mx": ("max", "x")}
    write_snapshot(
        spark.createDataFrame([("a", 1), ("b", 3)], "g string, x long"), src
    )
    refresh_rollup_incremental(spark, view, src, keys, metrics)
    # history vanishes (a vacuumed / archived source)
    import glob

    v0_files = glob.glob(os.path.join(src, "data", "*", "*.parquet"))
    assert v0_files
    write_snapshot(
        spark.createDataFrame([("a", 9)], "g string, x long"),
        src,
        mode="append",
    )
    for f in v0_files:
        os.remove(f)
    v, action = refresh_rollup_incremental(spark, view, src, keys, metrics)
    assert action == "incremental"
    assert _rollup_vals(spark, view) == {"a": (2, 10, 9), "b": (1, 3, 3)}


def _mv(spark, view):
    return {
        (r.g,): (r.n, r.s)
        for r in read_snapshot(spark, view).select("g", "n", "s").collect()
    }


def test_retractable_cdc_fold_across_rewrites(spark, tmp_path):
    """retract=True: a range containing DV deletes, a CoW update, and a
    compaction folds the CHANGE FEED into the rollup instead of
    rebuilding — result identical to a from-scratch aggregate, dead
    groups leave the view, and a maintenance-only range folds an empty
    delta."""
    from wrtd_etl_spark.operators.materialized import (
        refresh_rollup_incremental,
    )
    from wrtd_etl_spark.sources.versioned import (
        compact,
        delete_where,
        update_where,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    write_snapshot(
        spark.createDataFrame(
            [(i, "g%d" % (i % 5), i) for i in range(500)],
            "id long, g string, x long",
        ),
        src,
    )
    metrics = {"n": ("count", "id"), "s": ("sum", "x")}
    v, action = refresh_rollup_incremental(
        spark, view, src, ["g"], metrics, retract=True
    )
    assert action == "rebuild"
    assert "__rows" in read_snapshot(spark, view).columns

    # append-only advance still takes the delta-files path
    write_snapshot(
        spark.createDataFrame([(1000, "g0", 7)], "id long, g string, x long"),
        src,
        mode="append",
    )
    _, action = refresh_rollup_incremental(
        spark, view, src, ["g"], metrics, retract=True
    )
    assert action == "incremental"

    # rewrites: DV delete of ALL of g1 (group death), CoW update of g2,
    # and a compaction — the fold must match a from-scratch aggregate
    delete_where(spark, src, F.col("g") == "g1", strategy="dv")
    update_where(spark, src, F.col("g") == "g2", {"x": F.col("x") + 100})
    compact(spark, src)
    _, action = refresh_rollup_incremental(
        spark, view, src, ["g"], metrics, retract=True
    )
    assert action == "cdc_fold"
    want = {
        (r.g,): (r.n, r.s)
        for r in read_snapshot(spark, src)
        .groupBy("g")
        .agg(F.count("id").alias("n"), F.sum("x").alias("s"))
        .collect()
    }
    assert _mv(spark, view) == want
    assert ("g1",) not in _mv(spark, view)  # dead group left the view

    # maintenance-only range: compaction folds an EMPTY delta
    compact(spark, src)
    _, action = refresh_rollup_incremental(
        spark, view, src, ["g"], metrics, retract=True
    )
    assert action == "cdc_fold"
    assert _mv(spark, view) == want


def test_non_retractable_metrics_keep_the_rebuild(spark, tmp_path):
    from wrtd_etl_spark.operators.materialized import (
        refresh_rollup_incremental,
    )
    from wrtd_etl_spark.sources.versioned import delete_where

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    write_snapshot(
        spark.createDataFrame(
            [(i, "g%d" % (i % 3), i) for i in range(60)],
            "id long, g string, x long",
        ),
        src,
    )
    metrics = {"n": ("count", "id"), "mx": ("max", "x")}
    refresh_rollup_incremental(
        spark, view, src, ["g"], metrics, retract=True
    )
    delete_where(spark, src, F.col("x") >= 57)  # removes some maxes
    _, action = refresh_rollup_incremental(
        spark, view, src, ["g"], metrics, retract=True
    )
    assert action == "rebuild"  # max is not retractable: honest rescan
    want = {
        (r.g,): (r.n, r.mx)
        for r in read_snapshot(spark, src)
        .groupBy("g")
        .agg(F.count("id").alias("n"), F.max("x").alias("mx"))
        .collect()
    }
    got = {
        (r.g,): (r.n, r.mx)
        for r in read_snapshot(spark, view).select("g", "n", "mx").collect()
    }
    assert got == want


def test_liveness_component_survives_mixed_retract_modes(spark, tmp_path):
    """Once a view carries __rows, a retract=False refresh must keep
    maintaining it (not silently drop the column): the view schema
    stays stable across mixed-mode refreshes and a later retract=True
    refresh resumes CDC-folding WITHOUT a migration rebuild."""
    from wrtd_etl_spark.operators.materialized import (
        refresh_rollup_incremental,
    )
    from wrtd_etl_spark.sources.versioned import delete_where

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    write_snapshot(
        spark.createDataFrame(
            [(i, "g%d" % (i % 3), i) for i in range(300)],
            "id long, g string, x long",
        ),
        src,
    )
    metrics = {"n": ("count", "id"), "s": ("sum", "x")}
    _, action = refresh_rollup_incremental(
        spark, view, src, ["g"], metrics, retract=True
    )
    assert action == "rebuild"
    cols0 = set(read_snapshot(spark, view).columns)
    assert "__rows" in cols0

    # append + refresh WITHOUT retract: __rows must survive
    write_snapshot(
        spark.createDataFrame([(900, "g0", 4)], "id long, g string, x long"),
        src,
        mode="append",
    )
    _, action = refresh_rollup_incremental(
        spark, view, src, ["g"], metrics, retract=False
    )
    assert action == "incremental"
    assert set(read_snapshot(spark, view).columns) == cols0

    # a rewrite + retract=True refresh folds (no migration rebuild)
    delete_where(spark, src, F.col("g") == "g1", strategy="dv")
    _, action = refresh_rollup_incremental(
        spark, view, src, ["g"], metrics, retract=True
    )
    assert action == "cdc_fold"
    want = {
        (r.g,): (r.n, r.s)
        for r in read_snapshot(spark, src)
        .groupBy("g")
        .agg(F.count("id").alias("n"), F.sum("x").alias("s"))
        .collect()
    }
    assert _mv(spark, view) == want
