"""Metadata-only ALTER TABLE ADD/DROP COLUMN on versioned tables
(sources/versioned.py): schema changes without touching data files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    add_check_constraint,
    add_unique_constraint,
    alter_add_column,
    alter_drop_column,
    compact,
    latest_version,
    read_snapshot,
    write_snapshot,
)


def _base(spark, t, **kw):
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "k long, v string"
        ),
        t,
        **kw,
    )


def test_add_column_null_fills_and_accepts_appends(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    v0 = latest_version(t)
    alter_add_column(spark, t, "score", "double")
    df = read_snapshot(spark, t)
    assert df.columns == ["k", "v", "score"]
    assert df.filter(F.col("score").isNotNull()).count() == 0
    # appends may now carry the column
    write_snapshot(
        spark.createDataFrame([(100, "x", 1.5)], "k long, v string, score double"),
        t,
        mode="append",
    )
    got = {r.k: r.score for r in read_snapshot(spark, t).collect()}
    assert got[100] == 1.5 and got[0] is None
    # time travel: the pre-alter version never shows the column
    assert read_snapshot(spark, t, version=v0).columns == ["k", "v"]
    with pytest.raises(ValueError, match="already exists"):
        alter_add_column(spark, t, "score", "double")


def test_add_refuses_reborn_renamed_name(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    write_snapshot(
        spark.createDataFrame([(7, "y")], "k long, val string"),
        t,
        mode="append",
        renames={"v": "val"},
    )
    with pytest.raises(ValueError, match="renamed away"):
        alter_add_column(spark, t, "v", "string")


def test_drop_column_hides_then_sheds_then_readds_as_null(spark, tmp_path):
    import pyarrow.parquet as pq

    t = str(tmp_path / "tbl")
    _base(spark, t, stats_cols=["v"])
    v0 = latest_version(t)
    alter_drop_column(t, "v")
    assert read_snapshot(spark, t).columns == ["k"]
    # time travel still sees it
    assert read_snapshot(spark, t, version=v0).columns == ["k", "v"]
    # re-adding the same name yields NULLs, never the old values
    alter_add_column(spark, t, "v", "string")
    assert (
        read_snapshot(spark, t).filter(F.col("v").isNotNull()).count() == 0
    )
    # compact physically sheds the dropped bytes
    alter_drop_column(t, "v")
    compact(spark, t, target_files=1)
    from wrtd_etl_spark.sources.versioned import files_for_read

    files, _ = files_for_read(t)
    for f in files:
        names = pq.read_schema(os.path.join(t, f)).names
        assert "v" not in names


def test_drop_refused_while_referenced(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}", float(i)) for i in range(6)],
            "k long, v string, score double",
        ),
        t,
        layout_by=["k"],
    )
    add_unique_constraint(spark, t, "pk", ["k"])
    add_check_constraint(spark, t, "pos", "score >= 0")
    with pytest.raises(ValueError, match="clustered-layout"):
        alter_drop_column(t, "k")
    with pytest.raises(ValueError, match="CHECK"):
        alter_drop_column(t, "score")
    from wrtd_etl_spark.sources.versioned import (
        drop_check_constraint,
        drop_unique_constraint,
    )

    drop_check_constraint(t, "pos")
    alter_drop_column(t, "score")
    with pytest.raises(ValueError, match="no column"):
        alter_drop_column(t, "score")
    drop_unique_constraint(t, "pk")
    with pytest.raises(ValueError, match="clustered-layout"):
        alter_drop_column(t, "k")  # layout still pins it


def test_datasource_read_matches_after_alters(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned_table import (
        VersionedTableDataSource,
    )

    spark.dataSource.register(VersionedTableDataSource)
    t = str(tmp_path / "tbl")
    _base(spark, t)
    alter_add_column(spark, t, "score", "double")
    write_snapshot(
        spark.createDataFrame([(9, "z", 2.0)], "k long, v string, score double"),
        t,
        mode="append",
    )
    alter_drop_column(t, "v")
    api = read_snapshot(spark, t)
    fmt = spark.read.format("versioned_table").option("path", t).load()
    assert fmt.schema == api.schema
    key = lambda r: (r.k, r.score)
    assert sorted(map(key, fmt.collect())) == sorted(map(key, api.collect()))


def test_drop_column_leaves_detail_sidecars_in_place(spark, tmp_path):
    """r8: ALTER DROP is O(root). Every segment detail sidecar keeps its
    inode (zero restage); the head records the dropped physical names in
    ``drop`` and resolved segments surface scrubbed stats/blooms; stats
    pruning on the survivor columns keeps working."""
    import wrtd_etl_spark.sources.versioned as V

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, i * 2, f"v{i}") for i in range(4000)],
            "k long, g long, v string",
        ).repartition(6),
        t,
        stats_cols=["k", "g"],
        bloom_cols=["g"],
    )
    write_snapshot(
        spark.createDataFrame(
            [(i, i, "x") for i in range(4000, 4100)],
            "k long, g long, v string",
        ),
        t,
        mode="append",
        stats_cols=["k", "g"],
    )
    p = V._read_pointer(t)
    root = V._read_manifest_root(t, p)
    refs = {
        s["ref"]: os.stat(
            os.path.join(t, "_manifests", s["ref"])
        ).st_ino
        for s in V._segments(root)
        if V._is_seg_head(s)
    }
    assert refs  # sharded heads exist
    alter_drop_column(t, "g")
    p2 = V._read_pointer(t)
    root2 = V._read_manifest_root(t, p2)
    heads2 = [s for s in V._segments(root2) if V._is_seg_head(s)]
    # every detail sidecar carried BY REF, inode-stable — zero restage
    assert {h["ref"] for h in heads2} == set(refs)
    for h in heads2:
        assert (
            os.stat(os.path.join(t, "_manifests", h["ref"])).st_ino
            == refs[h["ref"]]
        )
        assert "g" in h.get("drop", []), h
        assert "g" not in h.get("summary", {})
        assert "g" not in h.get("stats_cols", [])
        assert "g" not in h.get("bloom_cols", [])
    # resolved form is scrubbed exactly like the old eager rewrite
    for h in heads2:
        seg = V._resolve_seg(t, h)
        for st in seg["stats"].values():
            assert "g" not in st
        for bl in seg.get("blooms", {}).values():
            assert "g" not in bl
    df = read_snapshot(spark, t)
    assert df.columns == ["k", "v"]
    assert df.count() == 4100
    # survivor-column pruning still works post-drop
    cand, total = V.files_for_read(t, skip_filter={"k": (0, 10)})
    assert len(cand) < total
    # compact still physically sheds the bytes afterwards
    compact(spark, t, target_files=1)
    assert read_snapshot(spark, t).columns == ["k", "v"]
    assert read_snapshot(spark, t).count() == 4100


def test_alter_cluster_by_metadata_only_then_compact_applies(
    spark, tmp_path
):
    """r8: CLUSTER BY redeclaration (Delta liquid-clustering shape) is a
    metadata-only commit — zero data movement; appends record stats on
    the new keys, and the next compact physically re-clusters so range
    pruning becomes effective. Validation mirrors a fresh layout_by."""
    import glob

    import wrtd_etl_spark.sources.versioned as V
    from wrtd_etl_spark.sources.versioned import alter_cluster_by

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, i % 97, f"s{i}") for i in range(8000)],
            "k long, g long, s string",
        ).repartition(6),
        t,
    )
    files_before = {
        p: os.stat(p).st_ino
        for p in glob.glob(os.path.join(t, "data", "*", "*.parquet"))
    }
    alter_cluster_by(t, ["k"], files=4)
    # metadata only: same files, same inodes
    assert {
        p: os.stat(p).st_ino
        for p in glob.glob(os.path.join(t, "data", "*", "*.parquet"))
    } == files_before
    m = V._read_manifest_root(t, V._read_pointer(t))
    assert m["layout"] == {"by": ["k"], "files": 4}
    # appends now record stats on the declared key
    write_snapshot(
        spark.createDataFrame([(9000, 1, "x")], "k long, g long, s string"),
        t,
        mode="append",
    )
    m2 = V._read_manifest_root(t, V._read_pointer(t))
    tail = V._resolve_seg(t, V._segments(m2)[-1])
    assert all("k" in st for st in tail["stats"].values())
    # compact applies the clustering: a narrow range now prunes files
    compact(spark, t)
    cand, total = V.files_for_read(t, skip_filter={"k": (0, 100)})
    assert total >= 4 and len(cand) < total
    assert read_snapshot(spark, t).count() == 8001
    # re-declare to another key, then uncluster
    alter_cluster_by(t, ["g"])
    assert V._read_manifest_root(t, V._read_pointer(t))["layout"] == {
        "by": ["g"]
    }
    alter_cluster_by(t, None)
    assert (
        V._read_manifest_root(t, V._read_pointer(t)).get("layout") is None
    )
    with pytest.raises(ValueError, match="no clustered layout"):
        alter_cluster_by(t, None)
    with pytest.raises(ValueError, match="not in"):
        alter_cluster_by(t, ["nope"])
    # string keys VALIDATE since r9 (byte-prefix rank); compact applies
    alter_cluster_by(t, ["s"])
    assert V._read_manifest_root(t, V._read_pointer(t))["layout"] == {
        "by": ["s"]
    }


def test_widen_column_metadata_only(spark, tmp_path):
    """ALTER type widening (r10): int->long and float->double are pure
    metadata; old files keep their narrow bytes, reads cast per
    segment, skip_filter pruning and DML keep working, and time travel
    shows the narrow type."""
    import os

    from wrtd_etl_spark.sources.versioned import (
        alter_widen_column,
        files_for_read,
        update_where,
    )

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, float(i)) for i in range(1000)], "k int, x float"
        ).repartition(1).sortWithinPartitions("k"),
        t,
        stats_cols=["k"],
    )
    files0 = {
        f: os.path.getmtime(os.path.join(t, f))
        for f in files_for_read(t)[0]
    }
    alter_widen_column(spark, t, "k", "long")
    alter_widen_column(spark, t, "x", "double")
    df = read_snapshot(spark, t)
    assert dict(df.dtypes) == {"k": "bigint", "x": "double"}
    assert df.count() == 1000
    # zero data movement
    assert {
        f: os.path.getmtime(os.path.join(t, f))
        for f in files_for_read(t)[0]
    } == files0
    # pruning still works against the narrow files' recorded stats
    write_snapshot(
        spark.createDataFrame(
            [(10_000_000_000, 1.5)], "k long, x double"
        ),
        t,
        mode="append",
        stats_cols=["k"],
    )  # a value only the WIDE type can hold
    kept, total = files_for_read(t, skip_filter={"k": (100, 200)})
    assert total == 2 and len(kept) == 1
    got = {r.k: r.x for r in read_snapshot(spark, t).collect()}
    assert got[10_000_000_000] == 1.5 and got[7] == 7.0
    # DML across the mixed encodings
    update_where(spark, t, F.col("k") == 7, {"x": F.lit(77.0)})
    assert {
        r.k: r.x for r in read_snapshot(spark, t).collect()
    }[7] == 77.0
    # time travel: the pre-widen version keeps the narrow type
    assert dict(read_snapshot(spark, t, version=0).dtypes) == {
        "k": "int", "x": "float"
    }


def test_widen_refuses_narrowing_and_noops(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned import alter_widen_column

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame([(1, 1.0)], "k long, x double"), t
    )
    with pytest.raises(ValueError, match="not a lossless widening"):
        alter_widen_column(spark, t, "k", "int")
    with pytest.raises(ValueError, match="already has type"):
        alter_widen_column(spark, t, "k", "long")
    with pytest.raises(ValueError, match="no column"):
        alter_widen_column(spark, t, "zz", "long")
    with pytest.raises(ValueError, match="not a lossless widening"):
        alter_widen_column(spark, t, "x", "string")


def test_widen_then_datasource_and_cdc(spark, tmp_path):
    """The widened table reads identically through the Arrow DataSource,
    and a diff whose endpoints straddle the widening casts old rows to
    the wide type — carried rows cancel."""
    from wrtd_etl_spark.sources.versioned import (
        alter_widen_column,
        compact,
        table_changes,
    )
    from wrtd_etl_spark.sources.versioned_table import read_versioned

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, i * 10) for i in range(100)], "k int, v int"
        ),
        t,
        stats_cols=["k"],
    )
    alter_widen_column(spark, t, "v", "long")  # v1
    compact(spark, t)  # v2 re-types the bytes
    assert table_changes(spark, t, 0, 2).count() == 0
    jvm = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    ds = {r.k: r.v for r in read_versioned(spark, t).collect()}
    assert ds == jvm and len(ds) == 100
