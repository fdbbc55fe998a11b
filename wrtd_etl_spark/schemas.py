"""Explicit schemas for the replay domain (no inference in pipeline paths).

Storage schemas mirror /root/reference/create_tables.sql:2-68; ingest
document schemas mirror the positional JSON shapes consumed by
/root/reference/docker/airflow/dags/tasks/functions.py:136-205.

Type decisions (SURVEY.md §1.2): Postgres ``time`` columns become
zero-padded ``'HH:mm:ss'`` strings (lexicographic order == temporal order,
which is all the reference's ORDER BYs need); ``serial`` surrogates become
deterministic row_numbers at load time.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- storage tables (create_tables.sql) -----------------------------------

REPLAY_MAIN = T.StructType(
    [
        T.StructField("replay_number", T.LongType(), False),
        T.StructField("start_time", T.StringType(), True),  # 'HH:mm:ss'
        T.StructField("end_time", T.StringType(), True),
        T.StructField("date", T.DateType(), True),
        T.StructField("duration", T.StringType(), True),
        T.StructField("name_mission", T.StringType(), True),
        T.StructField("island", T.StringType(), True),
        T.StructField("commander_east", T.StringType(), True),
        T.StructField("commander_west", T.StringType(), True),
        T.StructField("commander_guer", T.StringType(), True),
        T.StructField("commander_civ", T.StringType(), True),
        T.StructField("winner", T.StringType(), True),
        T.StructField("count_players_east", T.LongType(), True),
        T.StructField("count_players_west", T.LongType(), True),
        T.StructField("count_players_guer", T.LongType(), True),
        T.StructField("count_players_civ", T.LongType(), True),
        T.StructField("count_players_slots", T.LongType(), True),
        T.StructField("count_players_active", T.LongType(), True),
        T.StructField("replay_url", T.StringType(), True),
    ]
)

VEHICLES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("replay_number", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
    ]
)

PLAYERS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("id_from_json", T.LongType(), False),
        T.StructField("replay_number", T.LongType(), False),
        T.StructField("side", T.LongType(), True),
        T.StructField("slot", T.StringType(), True),
    ]
)

D_PLAYERS = T.StructType(
    [
        T.StructField("id_from_json", T.LongType(), False),
        T.StructField("nickname", T.StringType(), True),
    ]
)

FRAGS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("replay_number", T.LongType(), False),
        T.StructField("time", T.StringType(), True),  # 'HH:mm:ss'
        T.StructField("victim", T.LongType(), True),
        T.StructField("victim_vehicle", T.StringType(), True),
        T.StructField("killer", T.LongType(), True),
        T.StructField("killer_vehicle", T.StringType(), True),
        T.StructField("gun", T.StringType(), True),
        T.StructField("distance", T.LongType(), True),
        T.StructField("is_tk", T.BooleanType(), True),
    ]
)

MESSAGES = T.StructType(
    [
        T.StructField("replay_number", T.LongType(), False),
        T.StructField("message", T.StringType(), True),
        T.StructField("text_data", T.StringType(), True),
        T.StructField("posted", T.BooleanType(), True),
    ]
)

# --- ingest document (replay-data.json, functions.py:136-145) -------------
# Positional arrays hold mixed int/string/null values; they are parsed as
# string arrays and cast at flatten time (the reference does the same with
# Python tuple positions).

REPLAY_JSON = T.StructType(
    [
        T.StructField(
            "factions", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True
        ),
        T.StructField(
            "vehiclesUnits",
            T.MapType(T.StringType(), T.ArrayType(T.StringType())),
            True,
        ),
        T.StructField(
            "players", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True
        ),
        T.StructField(
            "playersDead",
            T.MapType(
                T.StringType(),
                T.MapType(T.StringType(), T.ArrayType(T.StringType())),
            ),
            True,
        ),
    ]
)
