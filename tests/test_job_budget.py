"""Spark-job budgets for the versioned commit paths.

The lake-lifecycle bench tail is dominated by a ~0.25-0.3 s-per-job
scheduling floor, not data (OPTIMIZATION_r13/r14 profiling), so the r13/r14
optimization rounds fused the per-commit probe/gate jobs — dup-ambiguity
checks, auto-prune ranges and point-membership key lists now ride the same
action via ``observe()`` + one capped distinct collect. These tests pin the
fused job COUNTS with a ``setJobGroup`` + ``statusTracker`` listener so a
refactor that quietly re-splits a probe into extra jobs fails loudly.

Budgets are the counts measured after the r14 fusion (r13 values in
comments); they are ceilings, not exact pins, so an extra adaptive stage
retry doesn't flake the suite.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    add_unique_constraint,
    delete_where,
    merge_into,
    update_where,
    write_snapshot,
)

from .conftest import SF_CORRECT


def _count_jobs(spark, fn):
    gid = f"budget_{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    sc.setJobGroup(gid, "job-budget test")
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(gid))


@pytest.fixture(scope="module")
def base(spark, tmp_path_factory):
    cust = spark.read.parquet(os.path.join(SF_CORRECT, "customer.parquet"))
    return cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )


def test_write_snapshot_is_one_job(spark, base, tmp_path):
    t = str(tmp_path / "t")
    assert _count_jobs(spark, lambda: write_snapshot(base, t, stats_cols=["k"])) <= 1
    assert (
        _count_jobs(
            spark,
            lambda: write_snapshot(
                base.withColumn("k", F.col("k") + 500_000),
                t,
                mode="append",
                stats_cols=["k"],
            ),
        )
        <= 1
    )


def test_merge_commit_job_budget(spark, base, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(base, t, stats_cols=["k"])
    src = base.filter("k % 100 = 0").withColumn("bal", F.col("bal") + 1)
    # r13: 8 jobs (probe agg + distinct collect + blooms + rewrite chain)
    assert _count_jobs(spark, lambda: merge_into(spark, t, src, ["k"])) <= 5
    # r13: 13 jobs — the DV path additionally paid per-segment DV pulls
    src2 = src.withColumn("bal", F.col("bal") + 2)
    assert (
        _count_jobs(
            spark, lambda: merge_into(spark, t, src2, ["k"], strategy="dv")
        )
        <= 6
    )


def test_update_delete_job_budget(spark, base, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(base, t, stats_cols=["k"])
    assert (
        _count_jobs(
            spark,
            lambda: update_where(
                spark, t, F.col("k") % 111 == 0, {"bal": F.col("bal") + 1}
            ),
        )
        <= 2
    )
    # r13: 3 jobs (DV position pull + probe + count)
    assert (
        _count_jobs(
            spark,
            lambda: delete_where(spark, t, F.col("k") % 113 == 0, strategy="dv"),
        )
        <= 1
    )


def test_pure_insert_merge_job_budget(spark, base, tmp_path):
    """All source keys prune away -> no candidate files -> the merge is
    pure insert and must skip the vestigial anti-join/union against the
    RDD-backed empty probe frame (r14: was 6 jobs with a SortMergeJoin
    of the source against a provably-empty relation)."""
    t = str(tmp_path / "t")
    write_snapshot(base, t, stats_cols=["k"])
    src = base.filter("k % 50 = 0").withColumn("k", F.col("k") + 5_000_000)
    assert _count_jobs(spark, lambda: merge_into(spark, t, src, ["k"])) <= 3


def test_unique_gated_append_job_budget(spark, base, tmp_path):
    t = str(tmp_path / "t")
    write_snapshot(base, t, stats_cols=["k"])
    add_unique_constraint(spark, t, "pk", ["k"])
    fresh = base.withColumn("k", F.col("k") + 1_000_000)
    # r13: 7 jobs (dup agg + distinct collect + bloom jobs + write)
    assert (
        _count_jobs(
            spark,
            lambda: write_snapshot(fresh, t, mode="append", stats_cols=["k"]),
        )
        <= 4
    )
