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
