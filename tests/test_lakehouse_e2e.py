"""Day-in-the-life integration of the round-6 lake layer: one table
operated the way a production pipeline would — constrained, generated,
CDC-merged, maintained, cloned, and retention-trimmed — with the final
state checked against a plain Python truth model at every stage.

Each feature has its own focused suite; THIS test exists because the
features compose: a constraint must survive a merge that races
maintenance, a clone must inherit the gates, retention must not disturb
any of it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    QualityGateViolation,
    UniqueConstraintViolation,
    add_check_constraint,
    add_generated_column,
    add_unique_constraint,
    clone_table,
    expire_history,
    files_for_read,
    history,
    latest_version,
    read_snapshot,
    unique_constraints,
    write_snapshot,
)
from wrtd_etl_spark.streaming.feed_refresh import (
    run_table_maintenance_stream,
)
from wrtd_etl_spark.streaming.versioned_sink import (
    make_versioned_merge_sink,
)

SCHEMA = "k long, v long, band long, seq long, op string"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_operated_table_end_to_end(spark, tmp_path):
    t = str(tmp_path / "tbl")

    # bootstrap: clustered, bloomed, constrained, with a derived column
    write_snapshot(
        spark.createDataFrame(
            [(k, k * 10, (k * 10) // 100) for k in range(40)],
            "k long, v long, band long",
        ),
        t,
        layout_by=["k"],
        layout_files=4,
        bloom_cols=["k"],
    )
    add_unique_constraint(spark, t, "pk", ["k"])
    add_check_constraint(spark, t, "v_nonneg", "v >= 0")
    add_generated_column(spark, t, "band", "CAST(FLOOR(v / 100) AS BIGINT)")
    truth = {k: k * 10 for k in range(40)}

    # CDC stream: three merge batches with churn (update/delete/insert;
    # within-batch latest-seq wins); band is supplied — and must agree
    sink = make_versioned_merge_sink(
        t,
        ["k"],
        delete_when=F.col("op") == "D",
        order_by=["seq"],
        source_meta_cols=("seq", "op"),
    )
    batches = [
        [(1, 111, 1, 1, "U"), (2, 0, 0, 2, "D"), (100, 1000, 10, 3, "I")],
        [(1, 222, 2, 4, "U"), (1, 333, 3, 5, "U"), (100, 0, 0, 6, "D")],
        [(2, 555, 5, 7, "I"), (101, 999, 9, 8, "I")],
    ]
    for i, rows in enumerate(batches):
        sink(_batch(spark, rows), i)
        last = {}
        for k, v, band, seq, op in rows:
            if k not in last or seq > last[k][0]:
                last[k] = (seq, v, op)
        for k, (_, v, op) in last.items():
            if op == "D":
                truth.pop(k, None)
            else:
                truth[k] = v

    def state():
        return {r.k: r.v for r in read_snapshot(spark, t).collect()}

    assert state() == truth
    # the generated column never drifted
    assert (
        read_snapshot(spark, t)
        .filter(F.col("band") != F.expr("CAST(FLOOR(v / 100) AS BIGINT)"))
        .count()
        == 0
    )

    # the gates hold mid-pipeline
    with pytest.raises(UniqueConstraintViolation):
        write_snapshot(
            spark.createDataFrame([(1, 1, 0)], "k long, v long, band long"),
            t,
            mode="append",
        )
    with pytest.raises(QualityGateViolation):
        write_snapshot(
            spark.createDataFrame([(500, -5, 0)], "k long, v long, band long"),
            t,
            mode="append",
        )

    # a batch omitting the generated column gets it computed
    write_snapshot(
        spark.createDataFrame([(500, 730)], "k long, v long"),
        t,
        mode="append",
    )
    truth[500] = 730
    row = [r for r in read_snapshot(spark, t).collect() if r.k == 500][0]
    assert row.band == 7

    # clone BEFORE maintenance: a frozen, independently-writable fork
    # that inherits every gate
    dst = str(tmp_path / "fork")
    clone_table(t, dst)
    assert unique_constraints(dst) == {"pk": ["k"]}
    with pytest.raises(UniqueConstraintViolation):
        write_snapshot(
            spark.createDataFrame([(1, 1, 0)], "k long, v long, band long"),
            dst,
            mode="append",
        )

    # maintenance: bin-pack the merge/append tail, trim the log, vacuum
    pre_versions = latest_version(t)
    run_table_maintenance_stream(
        spark,
        t,
        str(tmp_path / "ck"),
        compact_above=3,
        small_bytes=1 << 20,
        target_bytes=1 << 30,
        expire_keep_last=3,
        vacuum_keep_last=1,
        vacuum_tmp_age_s=0.0,
    )
    assert state() == truth  # rows untouched by maintenance
    assert len(history(t)) <= 3  # log trimmed
    assert latest_version(t) > pre_versions  # the pack committed
    # the pack re-recorded stats: an out-of-range read prunes to zero
    # (at this tiny SF everything bin-packs into one file, so the proof
    # of surviving stats is the empty candidate set, not a ratio)
    kept, total = files_for_read(t, skip_filter={"k": (10_000, 20_000)})
    assert total >= 1 and kept == []
    # constraints and the generated column survived maintenance
    assert unique_constraints(t) == {"pk": ["k"]}
    with pytest.raises(QualityGateViolation):
        write_snapshot(
            spark.createDataFrame([(600, -1, 0)], "k long, v long, band long"),
            t,
            mode="append",
        )

    # the clone never noticed any of it (vacuum reclaimed the source's
    # pre-pack files; the clone's hardlinks keep its bytes)
    clone_state = {r.k: r.v for r in read_snapshot(spark, dst).collect()}
    assert clone_state == truth  # frozen at the pre-maintenance state
    assert latest_version(dst) == 0

    # retention did not break further expiry or ingest
    expire_history(t, keep_last=1)
    write_snapshot(
        spark.createDataFrame([(700, 70)], "k long, v long"),
        t,
        mode="append",
    )
    truth[700] = 70
    assert state() == truth
