"""The reference's eight analytics queries, literally (parity proof).

Reference: docker/airflow/dags/tasks/queries.py:4-74 — fs_vehicles,
fs_cutlets, fs_tks, fs_fb, fs_lh, fs_ls, fs_survivors, fs_survivors_group.

To make these driver-gradable (the harness only has the TPC-H-ish tables),
the replay-domain tables are DERIVED deterministically from the driver's
tables with pure integer-mod arithmetic — bit-identical in Spark and
DuckDB — and the literal query shapes run on top:

* ``d_players``  := customer (c_custkey → id_from_json, c_name → nickname)
* ``players``    := distinct (user, replay) pairs from events; side/slot
  are mod functions of user_id; replay_number := event_id % 4
* ``frags``      := events; victim := user_id % 100 (so ids 100-149 never
  die → survivors are non-trivial), killer nullable (% 11), distance
  nullable (% 19), is_tk := event_id % 5 = 0, time := 'HH:mm:ss' of ts
* ``vehicles``   := lineitem with name/type as mod-buckets

Faithfully preserved reference semantics:
* the survivors NOT IN subquery scans frags of ALL replays
  (queries.py:59,72 — quirk §4.3.1);
* ``posted IS NOT TRUE``-style 3-valued logic elsewhere;
* dense_rank over the grouped count with no PARTITION BY (queries.py:11).

Documented divergences (SURVEY §4.3.2): every LIMIT gets a deterministic
tiebreaker appended, and computed columns are aliased (Postgres would name
them ``count``/``rank``/``time``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register
from .replay_core import (
    q_cutlets,
    q_frag_detail,
    q_survivors,
    q_survivors_group,
    q_vehicles,
    q_vehicles_grouped,
)

REPLAY = 1  # the {replay_number} parameter of every reference query

# --- derivation, SQL side (CTE prefix shared by all oracles) ---------------

_DERIVE_SQL = f"""
    WITH d_players AS (
        SELECT c_custkey AS id_from_json, c_name AS nickname FROM customer
    ), players AS (
        SELECT DISTINCT user_id AS id_from_json,
               event_id % 4 AS replay_number,
               1 + user_id % 4 AS side,
               'slot_' || CAST(user_id % 10 AS VARCHAR) AS slot
        FROM events
    ), frags AS (
        SELECT event_id AS id,
               event_id % 4 AS replay_number,
               strftime(ts, '%H:%M:%S') AS time,
               user_id % 100 AS victim,
               CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE 'veh_' || CAST(event_id % 5 AS VARCHAR) END AS victim_vehicle,
               CASE WHEN event_id % 11 = 0 THEN NULL
                    ELSE (user_id * 7 + event_id) % 150 END AS killer,
               CASE WHEN event_id % 13 = 0 THEN NULL
                    ELSE 'veh_' || CAST(event_id % 6 AS VARCHAR) END AS killer_vehicle,
               CASE WHEN event_id % 17 = 0 THEN NULL
                    ELSE 'gun_' || CAST(event_id % 9 AS VARCHAR) END AS gun,
               CASE WHEN event_id % 19 = 0 THEN NULL
                    ELSE (event_id * 37) % 2000 END AS distance,
               (event_id % 5 = 0) AS is_tk
        FROM events
    ), vehicles AS (
        SELECT l_orderkey % 4 AS replay_number,
               'veh_' || CAST(l_partkey % 7 AS VARCHAR) AS name,
               'type_' || CAST(l_suppkey % 5 AS VARCHAR) AS type
        FROM lineitem
    )
"""

# --- derivation, Spark side ------------------------------------------------


def _d_players(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id_from_json"), F.col("c_name").alias("nickname")
    )


def _players(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").alias("id_from_json"),
        (F.col("event_id") % 4).alias("replay_number"),
        (1 + F.col("user_id") % 4).alias("side"),
        F.concat(F.lit("slot_"), (F.col("user_id") % 10).cast("string")).alias(
            "slot"
        ),
    ).distinct()


def _nullable(cond_mod: F.Column, value: F.Column) -> F.Column:
    return F.when(cond_mod == 0, F.lit(None)).otherwise(value)


def _frags(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return e.select(
        eid.alias("id"),
        (eid % 4).alias("replay_number"),
        F.date_format("ts", "HH:mm:ss").alias("time"),
        (F.col("user_id") % 100).alias("victim"),
        _nullable(
            eid % 7, F.concat(F.lit("veh_"), (eid % 5).cast("string"))
        ).alias("victim_vehicle"),
        _nullable(eid % 11, (F.col("user_id") * 7 + eid) % 150).alias("killer"),
        _nullable(
            eid % 13, F.concat(F.lit("veh_"), (eid % 6).cast("string"))
        ).alias("killer_vehicle"),
        _nullable(eid % 17, F.concat(F.lit("gun_"), (eid % 9).cast("string"))).alias(
            "gun"
        ),
        _nullable(eid % 19, (eid * 37) % 2000).alias("distance"),
        (eid % 5 == 0).alias("is_tk"),
    )


def _vehicles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") % 4).alias("replay_number"),
        F.concat(F.lit("veh_"), (F.col("l_partkey") % 7).cast("string")).alias(
            "name"
        ),
        F.concat(F.lit("type_"), (F.col("l_suppkey") % 5).cast("string")).alias(
            "type"
        ),
    )


# --- the eight queries ------------------------------------------------------


@register(
    "fs_vehicles",
    _DERIVE_SQL
    + f"""
    SELECT v.name, v.type, COUNT(*) AS cnt
    FROM vehicles v
    WHERE replay_number = {REPLAY}
    GROUP BY v.name, v.type
    ORDER BY v.type, v.name
    """,
)
def fs_vehicles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vehicle roster: 2-key grouped count, 2-key sort (queries.py:4-8)."""
    return q_vehicles(_vehicles(spark, sf_dir), REPLAY)


# display mapping over the derived type domain — 'type_4' deliberately
# unmapped to exercise the passthrough (functions.py:227)
_DERIVED_TYPE_MAPPING = {
    "type_0": "Танк",
    "type_1": "Вертолет",
    "type_2": "Автомобиль",
    "type_3": "Авиация",
}


@register(
    "fs_vehicles_grouped",
    _DERIVE_SQL
    + f"""
    , counted AS (
        SELECT v.name, v.type, COUNT(*) AS cnt
        FROM vehicles v WHERE replay_number = {REPLAY}
        GROUP BY v.name, v.type
    )
    SELECT CASE type WHEN 'type_0' THEN 'Танк' WHEN 'type_1' THEN 'Вертолет'
                WHEN 'type_2' THEN 'Автомобиль' WHEN 'type_3' THEN 'Авиация'
                ELSE type END AS display_type,
           string_agg(name || ':' || CAST(cnt AS VARCHAR), ','
                      ORDER BY name || ':' || CAST(cnt AS VARCHAR)) AS items
    FROM counted
    GROUP BY display_type
    ORDER BY display_type
    """,
)
def fs_vehicles_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vehicle embed grouping: display-name map lookup w/ passthrough +
    sorted group-collect (functions.py:208-231; bot/botrun.py:225-229)."""
    return q_vehicles_grouped(
        _vehicles(spark, sf_dir), REPLAY, mapping=_DERIVED_TYPE_MAPPING
    )


_CUTLETS_SQL = (
    _DERIVE_SQL
    + """
    , agg AS (
        SELECT f.killer, dp.nickname, COUNT(killer) AS kills,
               DENSE_RANK() OVER (ORDER BY COUNT(f.killer) DESC) AS rank
        FROM frags f
        JOIN d_players dp ON f.killer = dp.id_from_json
        WHERE is_tk = {IS_TK} AND f.replay_number = {REPLAY}
        GROUP BY f.killer, dp.nickname
    )
    SELECT killer, nickname, kills, rank FROM agg
    ORDER BY rank, killer
    LIMIT 5
"""
)


def _cutlets(spark: SparkSession, sf_dir: str, is_tk: bool) -> DataFrame:
    return q_cutlets(_frags(spark, sf_dir), _d_players(spark, sf_dir), REPLAY, is_tk)


@register("fs_cutlets", _CUTLETS_SQL.format(IS_TK="FALSE", REPLAY=REPLAY))
def fs_cutlets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 killers: join, grouped count, global dense_rank
    (queries.py:11-17; deterministic tiebreaker added, §4.3.2)."""
    return _cutlets(spark, sf_dir, is_tk=False)


@register("fs_tks", _CUTLETS_SQL.format(IS_TK="TRUE", REPLAY=REPLAY))
def fs_tks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 teamkillers (queries.py:20-26)."""
    return _cutlets(spark, sf_dir, is_tk=True)


_FRAG_DETAIL_SQL = (
    _DERIVE_SQL
    + """
    SELECT CAST(f.time AS VARCHAR) AS time, f.killer, f.victim,
           dp.nickname AS killer_nickname, dp2.nickname AS victim_nickname,
           killer_vehicle, victim_vehicle, distance, f.is_tk, gun
    FROM frags f
    LEFT JOIN d_players dp  ON f.killer = dp.id_from_json
    LEFT JOIN d_players dp2 ON f.victim = dp2.id_from_json
    WHERE f.replay_number = {REPLAY}
    ORDER BY {ORDER}, f.id
    LIMIT 1
"""
)


def _frag_detail(spark: SparkSession, sf_dir: str, order) -> DataFrame:
    return q_frag_detail(_frags(spark, sf_dir), _d_players(spark, sf_dir), REPLAY, order)


@register("fs_fb", _FRAG_DETAIL_SQL.format(REPLAY=REPLAY, ORDER="f.time"))
def fs_fb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First blood: double left join on the role-playing dim, min-by time
    (queries.py:29-35)."""
    # asc() is NULLS FIRST in Spark; the oracle's plain ASC is NULLS LAST
    # in DuckDB — pin NULLS LAST so a NULL time can't flip the LIMIT 1.
    return _frag_detail(spark, sf_dir, [F.col("time").asc_nulls_last()])


@register("fs_lh", _FRAG_DETAIL_SQL.format(REPLAY=REPLAY, ORDER="f.time DESC"))
def fs_lh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last hit: max-by time (queries.py:38-44)."""
    return _frag_detail(spark, sf_dir, [F.col("time").desc()])


@register(
    "fs_ls",
    _FRAG_DETAIL_SQL.format(REPLAY=REPLAY, ORDER="distance IS NULL, distance DESC"),
)
def fs_ls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest shot: the NULLS-LAST idiom ``ORDER BY distance IS NULL,
    distance DESC`` (queries.py:47-53) → desc_nulls_last."""
    return _frag_detail(spark, sf_dir, [F.col("distance").desc_nulls_last()])


_SURVIVORS_SQL = (
    _DERIVE_SQL
    + f"""
    SELECT p.id_from_json, dp.nickname, side
    FROM players p
    JOIN d_players dp ON p.id_from_json = dp.id_from_json
    WHERE p.id_from_json NOT IN (SELECT victim FROM frags f)
      AND p.replay_number = {REPLAY}
"""
)


def _survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT IN with a non-null subquery ≡ left_anti (victims are never NULL
    # in this derivation, matching create_tables.sql:57 NOT NULL)
    return q_survivors(
        _players(spark, sf_dir),
        _d_players(spark, sf_dir),
        _frags(spark, sf_dir),
        REPLAY,
        cross_replay=True,
    )


@register("fs_survivors", _SURVIVORS_SQL)
def fs_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors: anti-join via uncorrelated NOT IN whose subquery scans
    frags of ALL replays — the reference's literal semantics
    (queries.py:56-59, quirk §4.3.1 preserved)."""
    return _survivors(spark, sf_dir)


@register(
    "fs_survivors_fixed",
    _DERIVE_SQL
    + f"""
    SELECT p.id_from_json, dp.nickname, side
    FROM players p
    JOIN d_players dp ON p.id_from_json = dp.id_from_json
    WHERE p.id_from_json NOT IN
          (SELECT victim FROM frags f WHERE f.replay_number = {REPLAY})
      AND p.replay_number = {REPLAY}
    """,
)
def fs_survivors_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corrected per-replay variant behind a 'flag' (SURVEY §4.3.1:
    implement literal semantics AND expose the fix)."""
    return q_survivors(
        _players(spark, sf_dir),
        _d_players(spark, sf_dir),
        _frags(spark, sf_dir),
        REPLAY,
        cross_replay=False,
    )


@register(
    "fs_survivors_group",
    _SURVIVORS_SQL.replace(
        "SELECT p.id_from_json, dp.nickname, side",
        """SELECT CASE
            WHEN side = 1 THEN ':red_square: EAST'
            WHEN side = 2 THEN ':blue_square: WEST'
            WHEN side = 3 THEN ':green_square: GUER'
            WHEN side = 4 THEN ':purple_square: CIV'
            END AS side_label,
           COUNT(p.id_from_json) AS cnt""",
    )
    + """
    GROUP BY side_label
    ORDER BY cnt DESC, side_label
    """,
)
def fs_survivors_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors grouped by CASE-mapped side label with emoji markers
    (queries.py:62-74; deterministic tiebreaker on the label added)."""
    return q_survivors_group(
        _players(spark, sf_dir),
        _d_players(spark, sf_dir),
        _frags(spark, sf_dir),
        REPLAY,
        cross_replay=True,
    )
