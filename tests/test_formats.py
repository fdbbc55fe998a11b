"""Text-format round-trips: CSV and JSON-lines must preserve values and
types under explicit schemas (the no-inference rule of SURVEY §1.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.sinks import read_csv, read_jsonl, write_csv, write_jsonl

from .conftest import SF_SMOKE


def _orders_sample(spark):
    return load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


def test_csv_round_trip(spark, tmp_path):
    df = _orders_sample(spark)
    p = str(tmp_path / "orders_csv")
    write_csv(df, p)
    back = read_csv(spark, p, df.schema)
    assert back.schema == df.schema
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jsonl_round_trip_with_nested(spark, tmp_path):
    df = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.sort_array(F.collect_list("event_type")).alias("types"),
            F.max("ts").alias("last_ts"),
        )
    )
    p = str(tmp_path / "events_jsonl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, df.schema)
    # a file read legitimately relaxes aggregate non-nullability —
    # compare names + types, not nullability flags
    got = [(f.name, f.dataType.simpleString()) for f in back.schema]
    want = [(f.name, f.dataType.simpleString()) for f in df.schema]
    assert got == want
    a = sorted((r.user_id, tuple(r.types), r.last_ts) for r in df.collect())
    b = sorted((r.user_id, tuple(r.types), r.last_ts) for r in back.collect())
    assert a == b


def test_jsonl_permissive_quarantines_corrupt_rows(spark, tmp_path):
    from wrtd_etl_spark.sinks import read_jsonl_permissive

    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "good row"}\n'
        '{"doc_id": "not-a-number", "text": "bad type"}\n'
        "this is not json at all\n"
        '{"doc_id": 3, "text": "another good row"}\n'
    )
    schema = "doc_id long, text string"
    from pyspark.sql import types as T

    df = read_jsonl_permissive(
        spark, str(p), T.StructType.fromDDL(schema)
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.doc_id for r in good} == {1, 3}
    assert len(bad) == 2
    # quarantined rows keep the raw text for the dead-letter path
    assert any("not json" in r._corrupt_record for r in bad)


def test_parquet_merge_schema_evolution(spark, tmp_path):
    from wrtd_etl_spark.sinks import read_parquet_merged

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "append"
    ).parquet(p)
    # v2 of the pipeline adds a column
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)
    df = read_parquet_merged(spark, p)
    assert set(df.columns) == {"id", "v", "score"}
    got = {r.id: r.score for r in df.collect()}
    assert got[1] is None and got[2] == 9.5


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC round-trips values AND supports predicate pushdown like
    parquet (the plan must show the pushed filter on the ORC scan)."""
    import contextlib
    import io

    from wrtd_etl_spark.sinks import read_orc, write_orc

    df = _orders_sample(spark)
    p = str(tmp_path / "orders_orc")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))

    filtered = back.filter(F.col("o_orderkey") == 42).select("o_orderkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:120]
