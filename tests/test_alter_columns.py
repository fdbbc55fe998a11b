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


def test_widen_refuses_long_to_double(spark, tmp_path):
    """ADVICE r10 (medium): long->double is NOT lossless — float64's
    53-bit mantissa rounds 9007199254740993 to ...992 — so both the
    ALTER guard and the append path's schema merge refuse it, exactly
    as Delta's type-widening feature does. The small ints still widen."""
    from wrtd_etl_spark.sources.versioned import alter_widen_column

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(9007199254740993, 1)], "k long, j int"
        ),
        t,
    )
    with pytest.raises(ValueError, match="not a lossless widening"):
        alter_widen_column(spark, t, "k", "double")
    # append-path twin: a double batch for a long column must refuse too
    with pytest.raises(ValueError, match="incompatible type change"):
        write_snapshot(
            spark.createDataFrame([(1.5, 1)], "k double, j int"),
            t,
            mode="append",
        )
    # byte/short/int -> double remain lossless and allowed
    alter_widen_column(spark, t, "j", "double")
    got = read_snapshot(spark, t).head()
    assert got.j == 1.0 and got.k == 9007199254740993


def test_widen_decimal_precision_growth(spark, tmp_path):
    """decimal(p,s) -> decimal(p+k,s) (Delta/Iceberg-v3 widening):
    metadata-only (inodes stable), mixed-encoding appends read as the
    wide type, stats pruning + bloom point pruning survive the change,
    DML works across encodings, time travel keeps the narrow type."""
    from decimal import Decimal

    from wrtd_etl_spark.sources.versioned import (
        alter_widen_column,
        files_for_read,
        update_where,
    )

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, Decimal(i) + Decimal("0.25")) for i in range(1000)],
            "k int, amt decimal(10,2)",
        ).repartition(1).sortWithinPartitions("k"),
        t,
        stats_cols=["amt"],
        bloom_cols=["amt"],
    )
    inodes0 = {
        f: os.path.getmtime(os.path.join(t, f)) for f in files_for_read(t)[0]
    }
    alter_widen_column(spark, t, "amt", "decimal(14,2)")
    df = read_snapshot(spark, t)
    assert dict(df.dtypes)["amt"] == "decimal(14,2)"
    assert {
        f: os.path.getmtime(os.path.join(t, f)) for f in files_for_read(t)[0]
    } == inodes0  # zero data movement
    # a value only the WIDE precision can hold, in a second encoding
    write_snapshot(
        spark.createDataFrame(
            [(10**6, Decimal("999999999999.25"))],
            "k int, amt decimal(14,2)",
        ),
        t,
        mode="append",
        stats_cols=["amt"],
        bloom_cols=["amt"],
    )
    # range pruning against the NARROW files' recorded stats
    kept, total = files_for_read(
        t, skip_filter={"amt": (Decimal("2000.00"), Decimal("3000.00"))}
    )
    assert total == 2 and len(kept) == 0
    kept, _ = files_for_read(
        t, skip_filter={"amt": (Decimal("5.00"), Decimal("6.00"))}
    )
    assert len(kept) == 1
    # bloom point pruning: tokens are value-canonical across the widen
    kept, _ = files_for_read(t, point_filter={"amt": [Decimal("5.25")]})
    assert len(kept) == 1
    kept, _ = files_for_read(
        t, point_filter={"amt": [Decimal("999999999999.25")]}
    )
    assert len(kept) == 1
    got = {r.k: r.amt for r in read_snapshot(spark, t).collect()}
    assert got[10**6] == Decimal("999999999999.25")
    assert got[7] == Decimal("7.25")
    # DML across the mixed encodings
    update_where(
        spark, t, F.col("k") == 7, {"amt": F.lit(Decimal("77.25"))}
    )
    assert {
        r.k: r.amt for r in read_snapshot(spark, t).collect()
    }[7] == Decimal("77.25")
    # time travel: the pre-widen version keeps the narrow type
    assert (
        dict(read_snapshot(spark, t, version=0).dtypes)["amt"]
        == "decimal(10,2)"
    )


def test_widen_decimal_refusals_and_datasource(spark, tmp_path):
    """Scale changes and precision narrowing refuse; the Arrow
    DataSource reads the widened table identically to the JVM path."""
    from decimal import Decimal

    from wrtd_etl_spark.sources.versioned import alter_widen_column
    from wrtd_etl_spark.sources.versioned_table import read_versioned

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, Decimal(i)) for i in range(50)], "k int, amt decimal(10,2)"
        ),
        t,
    )
    with pytest.raises(ValueError, match="not a lossless widening"):
        alter_widen_column(spark, t, "amt", "decimal(14,4)")  # scale change
    with pytest.raises(ValueError, match="not a lossless widening"):
        alter_widen_column(spark, t, "amt", "decimal(8,2)")  # narrowing
    with pytest.raises(ValueError, match="not a lossless widening"):
        alter_widen_column(spark, t, "amt", "double")  # family change
    alter_widen_column(spark, t, "amt", "decimal(20,2)")
    jvm = {r.k: r.amt for r in read_snapshot(spark, t).collect()}
    ds = {r.k: r.amt for r in read_versioned(spark, t).collect()}
    assert ds == jvm and len(ds) == 50
    # append-path twin: narrow-encoded batches still merge after ALTER
    write_snapshot(
        spark.createDataFrame(
            [(100, Decimal("1.50"))], "k int, amt decimal(10,2)"
        ),
        t,
        mode="append",
    )
    assert read_snapshot(spark, t).count() == 51


def test_add_column_default_validates_cast(spark, tmp_path):
    """ADVICE r10 (low): a default that cannot cast to the declared
    type is rejected AT ALTER TIME (it used to read back NULL on the
    JVM path and raise ArrowInvalid on the DataSource path); valid
    defaults are stored pre-coerced so both read surfaces agree."""
    from decimal import Decimal

    from wrtd_etl_spark.sources.versioned import alter_add_column
    from wrtd_etl_spark.sources.versioned_table import read_versioned

    t = str(tmp_path / "tbl")
    _base(spark, t)
    with pytest.raises(ValueError, match="does not cast"):
        alter_add_column(spark, t, "score", "double", default="oops")
    with pytest.raises(ValueError, match="does not cast"):
        alter_add_column(spark, t, "d", "date", default="not-a-date")
    # int default on a double column coerces to 5.0; decimal + date
    # defaults store their exact JSON forms
    alter_add_column(spark, t, "score", "double", default=5)
    alter_add_column(spark, t, "amt", "decimal(12,2)", default="1.50")
    alter_add_column(spark, t, "d", "date", default="2021-03-04")
    jvm = read_snapshot(spark, t).select("score", "amt", "d").head()
    ds = read_versioned(spark, t).select("score", "amt", "d").head()
    import datetime

    for row in (jvm, ds):
        assert row.score == 5.0
        assert row.amt == Decimal("1.50")
        assert row.d == datetime.date(2021, 3, 4)


def test_alter_rename_column_metadata_only(spark, tmp_path):
    """r11: standalone metadata-only RENAME COLUMN — inode-stable,
    older segments re-resolve through the alias map (reads, stats
    pruning, blooms), the clustered layout and declared DEFAULT follow,
    CDC across the rename folds carried rows, and the DataSource
    surface agrees."""
    from wrtd_etl_spark.sources.versioned import (
        alter_add_column,
        alter_rename_column,
        compact,
        files_for_read,
        table_changes,
        update_where,
    )
    from wrtd_etl_spark.sources.versioned_table import read_versioned

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, i * 10) for i in range(1000)], "k int, v int"
        ).repartition(1).sortWithinPartitions("k"),
        t,
        stats_cols=["k"],
        bloom_cols=["k"],
        layout_by=["k"],
        layout_files=4,
    )
    alter_add_column(spark, t, "note", "string", default="n/a")
    inodes0 = {
        f: os.path.getmtime(os.path.join(t, f)) for f in files_for_read(t)[0]
    }
    v_pre = latest_version(t)
    alter_rename_column(t, "k", "key")
    df = read_snapshot(spark, t)
    assert df.columns == ["key", "v", "note"]
    assert {
        f: os.path.getmtime(os.path.join(t, f)) for f in files_for_read(t)[0]
    } == inodes0  # zero data movement
    # stats + bloom pruning resolve the NEW name onto old physical stats
    kept, total = files_for_read(t, skip_filter={"key": (10, 20)})
    assert total >= 4 and len(kept) == 1
    kept, _ = files_for_read(t, point_filter={"key": [500]})
    assert len(kept) == 1
    # default followed the rename (metadata column untouched)
    assert df.filter(F.col("note") == "n/a").count() == 1000
    # layout followed: maintenance re-clusters under the new name
    from wrtd_etl_spark.sources.versioned import _read_manifest_root

    assert _read_manifest_root(t, latest_version(t))["layout"]["by"] == ["key"]
    # appends under the new name compose; the old name is reborn-guarded
    write_snapshot(
        spark.createDataFrame([(5000, 1, "x")], "key int, v int, note string"),
        t,
        mode="append",
    )
    with pytest.raises(ValueError, match="renamed away"):
        write_snapshot(
            spark.createDataFrame([(1, 2, "y", 3)], "key int, v int, note string, k int"),
            t,
            mode="append",
        )
    # DataSource parity + CDC across the rename cancels carried rows
    jvm = {(r.key, r.v) for r in read_snapshot(spark, t).collect()}
    ds = {(r.key, r.v) for r in read_versioned(spark, t).collect()}
    assert ds == jvm and len(ds) == 1001
    v_mid = latest_version(t)
    compact(spark, t)
    assert table_changes(spark, t, v_mid, latest_version(t)).count() == 0
    # DML under the new name, pruned
    update_where(
        spark, t, F.col("key") == 7, {"v": F.lit(-1)}, prune={"key": (7, 7)}
    )
    assert {r.v for r in read_snapshot(spark, t).filter(F.col("key") == 7).collect()} == {-1}
    # time travel shows the pre-rename name
    assert read_snapshot(spark, t, version=v_pre).columns == ["k", "v", "note"]


def test_alter_rename_refusals(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned import (
        add_check_constraint,
        add_identity_column,
        add_unique_constraint,
        alter_rename_column,
    )

    t = str(tmp_path / "tbl")
    _base(spark, t)
    with pytest.raises(ValueError, match="no column"):
        alter_rename_column(t, "zz", "a")
    with pytest.raises(ValueError, match="already exists"):
        alter_rename_column(t, "k", "v")
    with pytest.raises(ValueError, match="itself"):
        alter_rename_column(t, "k", "k")
    add_check_constraint(spark, t, "c1", "k >= 0")
    with pytest.raises(ValueError, match="CHECK"):
        alter_rename_column(t, "k", "key")
    from wrtd_etl_spark.sources.versioned import drop_check_constraint

    drop_check_constraint(t, "c1")
    add_unique_constraint(spark, t, "u1", ["v"])
    with pytest.raises(ValueError, match="UNIQUE"):
        alter_rename_column(t, "v", "val")
    # rename back to a renamed-away name is refused
    alter_rename_column(t, "k", "key")
    from wrtd_etl_spark.sources.versioned import alter_add_column

    alter_add_column(spark, t, "extra", "int")
    with pytest.raises(ValueError, match="renamed away"):
        alter_rename_column(t, "extra", "k")
    # identity columns refuse (engine-assigned by name)
    t2 = str(tmp_path / "tbl2")
    write_snapshot(
        spark.createDataFrame([], "a long, b string"), t2
    )
    add_identity_column(t2, "rid")
    with pytest.raises(ValueError, match="IDENTITY"):
        alter_rename_column(t2, "rid", "row_id")


def test_append_rename_keeps_defaults_and_guards_generated(spark, tmp_path):
    """r11 latent-bug fixes on the APPEND rename path: a renamed
    defaulted column keeps its default under the new name (it used to
    be silently dropped — pre-ALTER segments read NULL again), and
    renaming a column referenced by a GENERATED expression refuses."""
    from wrtd_etl_spark.sources.versioned import (
        add_generated_column,
        alter_add_column,
    )

    t = str(tmp_path / "tbl")
    _base(spark, t)
    alter_add_column(spark, t, "score", "double", default=5)
    write_snapshot(
        spark.createDataFrame([(100, "x", 1.0)], "k long, v string, sc double"),
        t,
        mode="append",
        renames={"score": "sc"},
    )
    df = read_snapshot(spark, t)
    got = {r.k: r.sc for r in df.collect()}
    assert got[0] == 5.0 and got[100] == 1.0  # default survived as `sc`
    t2 = str(tmp_path / "tbl2")
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}", i * 2) for i in range(6)],
            "k long, v string, k2 long",
        ),
        t2,
    )
    add_generated_column(spark, t2, "k2", "k * 2")
    # (the write_snapshot pre-gate surfaces it as the synthetic CHECK
    # `generated_k2`; the commit-protocol guard says GENERATED — either
    # way the rename refuses before anything stages)
    with pytest.raises(ValueError, match="GENERATED|generated_k2"):
        write_snapshot(
            spark.createDataFrame([(1, "a", 2)], "kk long, v string, k2 long"),
            t2,
            mode="append",
            renames={"k": "kk"},
        )


def test_widen_date_to_timestamp_ntz(spark, tmp_path):
    """date -> timestamp_ntz (Delta's temporal widening, r12 VERDICT
    ask #6): metadata-only (inodes stable), old files read back as
    midnight wall-clock timestamps on BOTH read paths, mixed-encoding
    appends merge, stats pruning stays exact across the date-shaped /
    timestamp-shaped encoding boundary, bloom point pruning survives
    (a DATE and its midnight TIMESTAMP hash identically), DML works,
    time travel keeps the narrow type."""
    import datetime as dt

    from wrtd_etl_spark.sources.versioned import (
        alter_widen_column,
        files_for_read,
        update_where,
    )
    from wrtd_etl_spark.sources.versioned_table import read_versioned

    t = str(tmp_path / "tbl")
    d0 = dt.date(2023, 5, 1)
    write_snapshot(
        spark.createDataFrame(
            [(i, d0 + dt.timedelta(days=i)) for i in range(30)],
            "k int, d date",
        ).repartition(1).sortWithinPartitions("k"),
        t,
        stats_cols=["d"],
        bloom_cols=["d"],
    )
    inodes0 = {
        f: os.path.getmtime(os.path.join(t, f)) for f in files_for_read(t)[0]
    }
    with pytest.raises(ValueError, match="timestamp_ntz instead"):
        alter_widen_column(spark, t, "d", "timestamp")  # ltz: session-tz
    alter_widen_column(spark, t, "d", "timestamp_ntz")
    df = read_snapshot(spark, t)
    assert dict(df.dtypes)["d"] == "timestamp_ntz"
    assert {
        f: os.path.getmtime(os.path.join(t, f)) for f in files_for_read(t)[0]
    } == inodes0  # zero data movement
    # old rows read as midnight wall time, identically on both paths
    jvm = {r.k: r.d for r in df.collect()}
    assert jvm[3] == dt.datetime(2023, 5, 4, 0, 0, 0)
    ds = {r.k: r.d for r in read_versioned(spark, t).collect()}
    assert ds == jvm
    # second encoding: a non-midnight timestamp only the wide type holds
    write_snapshot(
        spark.createDataFrame(
            [(100, dt.datetime(2024, 1, 1, 12, 30, 45))],
            "k int, d timestamp_ntz",
        ),
        t,
        mode="append",
        stats_cols=["d"],
        bloom_cols=["d"],
    )
    # range pruning across the encoding boundary — the old file's stats
    # are date-shaped strings; midnight-extension keeps them exact:
    # an upper bound of exactly the last date's midnight must KEEP the
    # old file (its max row IS that midnight)...
    # (without the extension, the old file's smax string '2023-05-30'
    # sorts BELOW the bound string '2023-05-30T00:00:00' and the file
    # holding the matching row would be skipped — a semantic prune)
    kept, total = files_for_read(
        t,
        skip_filter={
            "d": (dt.datetime(2023, 5, 30, 0, 0, 0), None)
        },
    )
    assert total == 2 and len(kept) == 2
    # ...one second past it must prune
    kept, _ = files_for_read(
        t,
        skip_filter={
            "d": (dt.datetime(2023, 5, 30, 0, 0, 1), None)
        },
    )
    assert {f for f in kept} == {
        f for f in files_for_read(
            t, skip_filter={"d": (dt.datetime(2024, 1, 1), None)}
        )[0]
    } and len(kept) == 1
    # a date-typed bound still prunes both encodings correctly
    kept, _ = files_for_read(
        t, skip_filter={"d": (dt.date(2024, 1, 1), None)}
    )
    assert len(kept) == 1
    # bloom point pruning: DATE and midnight TIMESTAMP are one token
    kept, _ = files_for_read(
        t, point_filter={"d": [dt.datetime(2023, 5, 4, 0, 0, 0)]}
    )
    assert len(kept) == 1
    kept, _ = files_for_read(t, point_filter={"d": [dt.date(2023, 5, 4)]})
    assert len(kept) == 1
    kept, _ = files_for_read(
        t, point_filter={"d": [dt.datetime(2024, 1, 1, 12, 30, 45)]}
    )
    assert len(kept) == 1
    # DML across the mixed encodings
    update_where(
        spark,
        t,
        F.col("k") == 3,
        {"d": F.lit(dt.datetime(2025, 6, 1, 1, 2, 3))},
    )
    assert {r.k: r.d for r in read_snapshot(spark, t).collect()}[3] == (
        dt.datetime(2025, 6, 1, 1, 2, 3)
    )
    # time travel: the pre-widen version keeps DATE
    assert dict(read_snapshot(spark, t, version=0).dtypes)["d"] == "date"
    # refusals: the reverse narrowing in both spellings
    with pytest.raises(ValueError, match="not a lossless widening"):
        alter_widen_column(spark, t, "d", "date")
    t2 = str(tmp_path / "ts")
    write_snapshot(
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1))], "k int, d timestamp_ntz"
        ),
        t2,
    )
    with pytest.raises(ValueError, match="not a lossless widening"):
        alter_widen_column(spark, t2, "d", "date")


def test_widen_date_append_path_schema_merge(spark, tmp_path):
    """The append path's schema merge accepts the same temporal
    widening: appending a timestamp_ntz batch onto a date column widens
    the table, and a later date-encoded batch still merges (reads back
    at midnight)."""
    import datetime as dt

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(1, dt.date(2023, 1, 1))], "k int, d date"
        ),
        t,
    )
    write_snapshot(
        spark.createDataFrame(
            [(2, dt.datetime(2023, 1, 2, 6, 0, 0))],
            "k int, d timestamp_ntz",
        ),
        t,
        mode="append",
    )
    assert dict(read_snapshot(spark, t).dtypes)["d"] == "timestamp_ntz"
    write_snapshot(
        spark.createDataFrame(
            [(3, dt.date(2023, 1, 3))], "k int, d date"
        ),
        t,
        mode="append",
    )
    got = {r.k: r.d for r in read_snapshot(spark, t).collect()}
    assert got == {
        1: dt.datetime(2023, 1, 1),
        2: dt.datetime(2023, 1, 2, 6, 0, 0),
        3: dt.datetime(2023, 1, 3),
    }
    # ltz timestamp batch on a date column refuses (session-tz hazard)
    with pytest.raises(ValueError, match="incompatible type change"):
        write_snapshot(
            spark.createDataFrame(
                [(4, dt.datetime(2023, 1, 4))], "k int, d timestamp"
            ),
            t,
            mode="append",
        )
