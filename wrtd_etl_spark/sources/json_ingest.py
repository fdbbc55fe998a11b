"""Flatten the replay-data JSON document into the fact tables (S2).

Reference: functions.py:124-145 fetches the document and keeps 4 sections;
functions.py:163-205 loads them with positional tuple indexing:

* ``vehiclesUnits[id] = [type, name]``          (functions.py:165)
* ``players[id]      = [side, nickname, slot, squad]``  (functions.py:175)
* ``playersDead[epoch][victim] = [victim_vehicle, killer, killer_vehicle,
  gun, distance, tk_flag]``  — double loop (functions.py:196-205)
* ``factions[id][2]  = player count``           (functions.py:138-141)

Spark shape: ``from_json`` with the explicit nested MapType schema
(schemas.REPLAY_JSON), then ``explode`` per section — the double Python
loop becomes two nested explodes, and the positional mapping becomes array
indexing. The quote-stripping the reference applies as SQL-injection
armor (functions.py:166,176) is intentionally dropped: DataFrame values
are never string-interpolated (documented divergence, SURVEY §4.2).

Surrogate ``id`` columns (Postgres ``serial``) are deterministic:
``replay_number * 1_000_000 + row_number-within-replay`` — the window is
PARTITIONED by replay (per-replay cardinality is tiny), so id assignment
never funnels the corpus through a single partition the way a global
``Window.orderBy`` would at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import REPLAY_JSON


def parse_replay_json(df: DataFrame, json_col: str, replay_col: str) -> DataFrame:
    """(replay_number, doc struct) from a raw JSON-string column."""
    return df.select(
        F.col(replay_col).alias("replay_number"),
        F.from_json(F.col(json_col), REPLAY_JSON).alias("doc"),
    )


def flatten_vehicles(parsed: DataFrame) -> DataFrame:
    """vehiclesUnits map → vehicles rows (functions.py:163-172)."""
    exploded = parsed.select(
        "replay_number", F.explode("doc.vehiclesUnits").alias("vid", "arr")
    )
    w = Window.partitionBy("replay_number").orderBy(F.col("vid").cast("long"))
    return exploded.select(
        (F.col("replay_number") * 1_000_000 + F.row_number().over(w))
        .cast("long")
        .alias("id"),
        "replay_number",
        F.col("arr").getItem(1).alias("name"),
        F.col("arr").getItem(0).alias("type"),
    )


def flatten_players(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """players map → (players fact rows, d_players dimension updates).

    Reference: functions.py:174-193 — the same section feeds the
    ``d_players`` upsert (id→nickname) and the per-replay ``players`` fact
    (id, side, slot)."""
    exploded = parsed.select(
        "replay_number", F.explode("doc.players").alias("pid", "arr")
    ).select(
        "replay_number",
        F.col("pid").cast("long").alias("id_from_json"),
        F.col("arr").getItem(0).cast("long").alias("side"),
        F.col("arr").getItem(1).alias("nickname"),
        F.col("arr").getItem(2).alias("slot"),
    )
    w = Window.partitionBy("replay_number").orderBy("id_from_json")
    players = exploded.select(
        (F.col("replay_number") * 1_000_000 + F.row_number().over(w))
        .cast("long")
        .alias("id"),
        "id_from_json",
        "replay_number",
        "side",
        "slot",
    )
    dim_updates = exploded.select("id_from_json", "nickname").dropDuplicates(
        ["id_from_json"]
    )
    return players, dim_updates


def flatten_frags(parsed: DataFrame) -> DataFrame:
    """playersDead double map → frags rows (functions.py:196-205).

    The two-level Python loop is two explodes; the epoch-seconds key
    becomes the 'HH:mm:ss' time-of-day string exactly as the reference's
    ``to_timestamp(...)::time`` does (F2, functions.py:203); ``is_tk`` is
    the ``(flag = 1)`` comparison (F4)."""
    outer = parsed.select(
        "replay_number", F.explode("doc.playersDead").alias("epoch", "victims")
    )
    inner = outer.select(
        "replay_number",
        F.col("epoch").cast("long").alias("epoch_s"),
        F.explode("victims").alias("victim_id", "arr"),
    )
    w = Window.partitionBy("replay_number").orderBy(
        "epoch_s", F.col("victim_id").cast("long")
    )
    return inner.select(
        (F.col("replay_number") * 1_000_000 + F.row_number().over(w))
        .cast("long")
        .alias("id"),
        "replay_number",
        F.date_format(F.timestamp_seconds(F.col("epoch_s")), "HH:mm:ss").alias(
            "time"
        ),
        F.col("victim_id").cast("long").alias("victim"),
        F.col("arr").getItem(0).alias("victim_vehicle"),
        F.col("arr").getItem(1).cast("long").alias("killer"),
        F.col("arr").getItem(2).alias("killer_vehicle"),
        F.col("arr").getItem(3).alias("gun"),
        F.col("arr").getItem(4).cast("long").alias("distance"),
        (F.col("arr").getItem(5).cast("long") == 1).alias("is_tk"),
    )


def faction_counts(parsed: DataFrame) -> DataFrame:
    """factions map → per-side player counts (functions.py:138-141):
    position 2 of each faction array, keyed 1..4 = EAST/WEST/GUER/CIV."""
    return parsed.select(
        "replay_number", F.explode("doc.factions").alias("faction_id", "arr")
    ).select(
        "replay_number",
        F.col("faction_id").cast("long").alias("faction_id"),
        F.coalesce(F.col("arr").getItem(2).cast("long"), F.lit(0)).alias(
            "player_count"
        ),
    )
