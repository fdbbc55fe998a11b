"""GENERATED ALWAYS AS columns (sources/versioned.py): computed when a
batch omits them, verified via the CHECK gate when supplied — stored
values can never drift from their formula."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    QualityGateViolation,
    add_generated_column,
    alter_drop_column,
    drop_generated_column,
    generated_columns,
    latest_version,
    read_snapshot,
    update_where,
    write_snapshot,
)


def _base(spark, t):
    write_snapshot(
        spark.createDataFrame(
            [(i, float(i), float(i) * 2) for i in range(6)],
            "k long, v double, v2 double",
        ),
        t,
    )


def test_declare_validates_then_computes_and_verifies(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    with pytest.raises(ValueError, match="diverges"):
        add_generated_column(spark, t, "v2", "v * 3")
    with pytest.raises(ValueError, match="does not exist"):
        add_generated_column(spark, t, "v9", "v * 2")
    add_generated_column(spark, t, "v2", "v * 2")
    assert generated_columns(t) == {"v2": "v * 2"}
    # a batch OMITTING the column gets it computed
    write_snapshot(
        spark.createDataFrame([(100, 7.0)], "k long, v double"),
        t,
        mode="append",
    )
    got = {r.k: r.v2 for r in read_snapshot(spark, t).collect()}
    assert got[100] == 14.0
    # a batch SUPPLYING a stale value is refused (quarantined like CHECK)
    v = latest_version(t)
    with pytest.raises(QualityGateViolation, match="generated_v2"):
        write_snapshot(
            spark.createDataFrame(
                [(101, 1.0, 99.0)], "k long, v double, v2 double"
            ),
            t,
            mode="append",
        )
    assert latest_version(t) == v
    # a correct supplied value is accepted
    write_snapshot(
        spark.createDataFrame(
            [(101, 1.0, 2.0)], "k long, v double, v2 double"
        ),
        t,
        mode="append",
    )
    assert read_snapshot(spark, t).count() == 8


def test_rewrites_cannot_leave_stale_generated_values(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    add_generated_column(spark, t, "v2", "v * 2")
    v = latest_version(t)
    # updating the INPUT without the derived column goes stale → refused
    with pytest.raises(QualityGateViolation, match="generated_v2"):
        update_where(spark, t, F.col("k") == 1, {"v": F.lit(50.0)})
    assert latest_version(t) == v
    # updating both consistently is fine
    update_where(
        spark, t, F.col("k") == 1, {"v": F.lit(50.0), "v2": F.lit(100.0)}
    )
    got = {r.k: (r.v, r.v2) for r in read_snapshot(spark, t).collect()}
    assert got[1] == (50.0, 100.0)


def test_drop_property_and_column_interlocks(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    add_generated_column(spark, t, "v2", "v * 2")
    with pytest.raises(ValueError, match="generated"):
        alter_drop_column(t, "v")  # input of a generated column
    with pytest.raises(ValueError, match="generated"):
        alter_drop_column(t, "v2")  # the generated column itself
    drop_generated_column(t, "v2")
    assert generated_columns(t) == {}
    write_snapshot(  # no longer computed: plain nullable column
        spark.createDataFrame([(200, 1.0)], "k long, v double"),
        t,
        mode="append",
    )
    row = [r for r in read_snapshot(spark, t).collect() if r.k == 200][0]
    assert row.v2 is None
    with pytest.raises(ValueError, match="no generated"):
        drop_generated_column(t, "v2")


def test_datasource_write_verifies_generated(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned_table import (
        VersionedTableDataSource,
    )

    spark.dataSource.register(VersionedTableDataSource)
    t = str(tmp_path / "tbl")
    _base(spark, t)
    add_generated_column(spark, t, "v2", "v * 2")
    v = latest_version(t)
    bad = spark.createDataFrame(
        [(300, 3.0, 7.0)], "k long, v double, v2 double"
    )
    with pytest.raises(Exception, match="generated_v2"):
        bad.write.format("versioned_table").mode("append").option(
            "path", t
        ).save()
    assert latest_version(t) == v
    ok = spark.createDataFrame(
        [(300, 3.0, 6.0)], "k long, v double, v2 double"
    )
    ok.write.format("versioned_table").mode("append").option("path", t).save()
    assert read_snapshot(spark, t).count() == 7
