"""The Spark SQL surface: registered views + spark.sql produce the same
plans/results as the DataFrame API (Catalyst parity), plus property tests
for the expression library."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from wrtd_etl_spark.catalog import register_views

from .conftest import SF_SMOKE


def test_sql_view_surface_matches_dataframe_api(spark):
    from wrtd_etl_spark.plans.registry import REGISTRY
    import wrtd_etl_spark.plans.testdata_queries  # noqa: F401

    register_views(spark, SF_SMOKE)
    via_sql = spark.sql(
        """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY returnflag, linestatus
        """
    ).collect()
    via_df = [
        (r.returnflag, r.linestatus, r.count_order)
        for r in REGISTRY["pricing_summary"].fn(spark, SF_SMOKE).collect()
    ]
    assert [(r.returnflag, r.linestatus, r.count_order) for r in via_sql] == via_df


_texts = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs"), whitelist_characters=".,!?"
        ),
        min_size=1,
        max_size=80,
    ).filter(lambda s: s.strip()),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(_texts)
def test_text_expression_properties(spark, texts):
    """quality ∈ [0,1]; token_count == Python whitespace split count;
    fingerprint invariant under case + whitespace collapsing."""
    from wrtd_etl_spark.functions import text as TX

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select(
        "i",
        "t",
        TX.token_count(F.col("t")).alias("n"),
        TX.quality_score(F.col("t")).alias("q"),
        TX.fingerprint(F.col("t")).alias("fp"),
        # invariant: lower-idempotent + whitespace-collapse insensitive.
        # (NOT full case round-trip: hypothesis found 'ŉ', whose upper()
        # is the two-char "ʼN" — Unicode special casing.)
        TX.fingerprint(F.lower(F.regexp_replace("t", " ", "   "))).alias("fp2"),
    ).collect()
    import re

    for r in rows:
        # mirror Java \s (which, unlike Python str.split, excludes NBSP —
        # hypothesis found '0\xa00'; Spark and DuckDB agree with each other)
        java_trimmed = r.t.strip(" \t\n\x0b\x0c\r")
        expected = len(re.split(r"[ \t\n\x0b\x0c\r]+", java_trimmed))
        assert r.n == expected, (r.t, r.n, expected)
        assert 0.0 <= r.q <= 1.0
        assert r.fp == r.fp2  # lower-idempotent + whitespace-collapse invariant


def test_survivors_union_victims_covers_players(spark):
    """Property (SURVEY §5.2.4): per-replay survivors ∪ victims ⊇ players
    of that replay, and survivors ∩ victims = ∅ (per-replay variant)."""
    from wrtd_etl_spark.plans.replay_queries import REPLAY, _frags, _players
    from wrtd_etl_spark.plans.replay_core import q_survivors
    from wrtd_etl_spark.plans.replay_queries import _d_players

    players = {
        r.id_from_json
        for r in _players(spark, SF_SMOKE)
        .filter(F.col("replay_number") == REPLAY)
        .collect()
    }
    victims = {
        r.victim
        for r in _frags(spark, SF_SMOKE)
        .filter(F.col("replay_number") == REPLAY)
        .collect()
    }
    survivors = {
        r.id_from_json
        for r in q_survivors(
            _players(spark, SF_SMOKE),
            _d_players(spark, SF_SMOKE),
            _frags(spark, SF_SMOKE),
            REPLAY,
            cross_replay=False,
        ).collect()
    }
    assert survivors.isdisjoint(victims)
    assert players <= (survivors | victims)
