"""Data-quality suite (operators/quality.py): violation counting on
deliberately dirty data, single-scan plan shape, fail-fast gate."""

from __future__ import annotations

import pytest

from wrtd_etl_spark.operators.quality import (
    accepted_values,
    assert_checks,
    foreign_key,
    in_range,
    matches,
    not_null,
    run_checks,
    unique,
)


def _dirty(spark):
    rows = [
        (1, "A", 10.0, "a@x.io"),
        (1, "A", -5.0, "b@x.io"),   # dup id, negative value
        (2, "Z", 50.0, "nope"),     # bad status, bad email
        (None, "B", 20.0, None),    # null id, null email
    ]
    return spark.createDataFrame(rows, "id long, status string, v double, email string")


def test_run_checks_counts_violations(spark):
    df = _dirty(spark)
    ref = spark.createDataFrame([(1,)], "k long")
    report = {
        r.check: (r.violations, r.total, r.passed)
        for r in run_checks(
            df,
            [
                not_null("id"),
                accepted_values("status", ["A", "B"]),
                in_range("v", lo=0.0),
                matches("email", r"^[^@]+@[^@]+$"),
                unique(["id"]),
                foreign_key("id", ref, "k"),
            ],
        ).collect()
    }
    assert report["not_null(id)"] == (1, 4, False)
    assert report["accepted_values(status)"] == (1, 4, False)
    assert report["in_range(v)"] == (1, 4, False)
    # bad email + NULL email both violate the pattern check
    assert report["matches(email)"] == (2, 4, False)
    # both rows of the duplicated id count as violations
    assert report["unique(id)"] == (2, 4, False)
    # id=2 has no reference row; NULL id is excluded from FK by convention
    assert report["foreign_key(id)"] == (1, 4, False)


def test_row_checks_are_single_scan(spark):
    df = _dirty(spark)
    plan = (
        run_checks(
            df,
            [not_null("id"), in_range("v", lo=0.0), accepted_values("status", ["A"])],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ") <= 1, plan


def test_assert_checks_gate(spark):
    df = _dirty(spark)
    clean = df.filter("id = 1 and v > 0")
    # passing gate returns the report
    report = assert_checks(clean, [not_null("id"), in_range("v", lo=0.0)])
    assert all(r.passed for r in report.collect())
    with pytest.raises(ValueError, match=r"not_null\(id\): 1/4"):
        assert_checks(df, [not_null("id")])


def test_violating_rows_tags_every_failure(spark):
    from wrtd_etl_spark.operators.quality import violating_rows

    df = _dirty(spark)
    ref = spark.createDataFrame([(1,)], "k long")
    bad = violating_rows(
        df,
        [not_null("id"), in_range("v", lo=0.0), unique(["id"]),
         foreign_key("id", ref, "k")],
    ).collect()
    tags = {(r.id, r["__violation"]) for r in bad}
    assert (None, "not_null(id)") in tags
    assert (1, "in_range(v)") in tags
    assert sum(1 for i, t in tags if t == "unique(id)") == 1  # both rows id=1
    assert sum(1 for r in bad if r["__violation"] == "unique(id)") == 2
    assert (2, "foreign_key(id)") in tags


def test_write_gate_refuses_dirty_batch_and_quarantines(spark, tmp_path):
    """write_snapshot(checks=...): a dirty batch must NOT commit any
    version; its violating rows land in a Spark-readable quarantine
    (itself a versioned table); a clean batch commits unchanged."""
    from wrtd_etl_spark.sources.versioned import (
        QualityGateViolation,
        latest_version,
        read_snapshot,
        write_snapshot,
    )

    t = str(tmp_path / "tbl")
    gate = [not_null("id"), in_range("v", lo=0.0)]
    clean = _dirty(spark).filter("id = 1 and v > 0")
    assert write_snapshot(clean, t, checks=gate) == 0
    assert read_snapshot(spark, t).count() == 1

    with pytest.raises(QualityGateViolation, match="quarantined"):
        write_snapshot(_dirty(spark), t, mode="append", checks=gate)
    # no version advanced, table contents untouched
    assert latest_version(t) == 0
    assert read_snapshot(spark, t).count() == 1
    # the quarantine holds the tagged rows and is itself versioned
    q = read_snapshot(spark, t + "__quarantine")
    rows = {(r.id, r["__violation"]) for r in q.collect()}
    assert (None, "not_null(id)") in rows
    assert (1, "in_range(v)") in rows
    # a second dirty batch APPENDS to the quarantine
    with pytest.raises(QualityGateViolation):
        write_snapshot(_dirty(spark), t, mode="append", checks=gate)
    assert latest_version(t + "__quarantine") == 1


def test_quality_gate_registry_query_counts_match_plants(spark):
    """The registry entry's quarantine counts equal the planted
    violation counts computed directly from the table."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.plans import REGISTRY
    from wrtd_etl_spark.plans import testdata_queries  # noqa: F401

    from .conftest import SF_SMOKE

    got = {
        r["__violation"]: r.n_rows
        for r in REGISTRY["quality_gate_quarantine"].fn(spark, SF_SMOKE).collect()
    }
    cust = load_table(spark, SF_SMOKE, "customer")
    import pyspark.sql.functions as F

    n_null = cust.filter(F.col("c_custkey") % 97 == 0).count()
    n_low = cust.filter(
        (F.col("c_acctbal") < -999.0) & ~(F.col("c_custkey") % 97 == 0)
    ).count() + cust.filter(
        (F.col("c_acctbal") < -999.0) & (F.col("c_custkey") % 97 == 0)
    ).count()
    assert got.get("not_null(c_custkey)", 0) == n_null
    assert got.get("in_range(c_acctbal)", 0) == n_low
    assert n_null > 0  # the plant is non-vacuous at this SF
