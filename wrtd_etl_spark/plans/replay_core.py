"""Core implementations of the reference's eight queries as pure
DataFrame transforms over the replay tables.

Shared by plans/replay_queries.py (driver-graded, over derived tables) and
pipeline.py (entry-point-A flow, over stored warehouse tables). Reference:
docker/airflow/dags/tasks/queries.py:4-74.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.joins import broadcast_dim_join, double_role_dim_join, lookup_map_join
from ..operators.windows import dense_rank_top_k

#: vehicle type → display name, literally the reference's dict
#: (functions.py:211-221); unmapped types pass through (functions.py:227)
VEHICLE_TYPE_MAPPING = {
    "static-mortar": "Миномет",
    "static-weapon": "Стационарное",
    "apc": "БМП/БТР",
    "car": "Автомобиль",
    "tank": "Танк",
    "truck": "Грузовик",
    "parachute": "Парашют",
    "plane": "Авиация",
    "heli": "Вертолет",
    "sea": "Флот",
}


def q_vehicles(vehicles: DataFrame, replay_number: int) -> DataFrame:
    """fs_vehicles (queries.py:4-8)."""
    v = vehicles.filter(F.col("replay_number") == replay_number)
    return (
        v.groupBy("name", "type")
        .agg(F.count("*").alias("cnt"))
        .orderBy("type", "name")
    )


def q_vehicles_grouped(
    vehicles: DataFrame,
    replay_number: int,
    mapping: dict[str, str] | None = None,
) -> DataFrame:
    """group_vehicles (functions.py:208-231) + the per-type embed grouping
    (bot/botrun.py:225-229): counted vehicles remapped through the display
    dictionary (unmatched types pass through), grouped into a
    deterministic sorted list per display type (A5 + J6)."""
    counted = q_vehicles(vehicles, replay_number)
    mapped = lookup_map_join(
        counted, "type", mapping or VEHICLE_TYPE_MAPPING, "display_type"
    )
    entry = F.concat(F.col("name"), F.lit(":"), F.col("cnt").cast("string"))
    return (
        mapped.groupBy("display_type")
        .agg(F.array_join(F.array_sort(F.collect_list(entry)), ",").alias("items"))
        .orderBy("display_type")
    )


def q_cutlets(
    frags: DataFrame, d_players: DataFrame, replay_number: int, is_tk: bool
) -> DataFrame:
    """fs_cutlets / fs_tks (queries.py:11-26); deterministic tiebreaker."""
    f = frags.filter(
        (F.col("is_tk") == is_tk) & (F.col("replay_number") == replay_number)
    )
    joined = broadcast_dim_join(f, d_players, "killer", "id_from_json").select(
        "killer", "nickname"
    )
    return dense_rank_top_k(
        joined,
        ["killer", "nickname"],
        F.count("killer"),
        "kills",
        k=5,
        tiebreaker="killer",
        rank_alias="rank",
    )


def q_frag_detail(
    frags: DataFrame,
    d_players: DataFrame,
    replay_number: int,
    order: list[Column],
) -> DataFrame:
    """fs_fb / fs_lh / fs_ls (queries.py:29-53): double left join on the
    role-playing dimension, top-1 by the given order (+ id tiebreaker)."""
    f = frags.filter(F.col("replay_number") == replay_number)
    both = double_role_dim_join(
        f,
        d_players,
        roles=[
            ("dp", "killer", [("nickname", "killer_nickname")]),
            ("dp2", "victim", [("nickname", "victim_nickname")]),
        ],
        dim_key="id_from_json",
        how="left",
    )
    return (
        both.orderBy(*order, F.col("id"))
        .limit(1)
        .select(
            F.col("time").cast("string").alias("time"),
            "killer",
            "victim",
            "killer_nickname",
            "victim_nickname",
            "killer_vehicle",
            "victim_vehicle",
            "distance",
            "is_tk",
            "gun",
        )
    )


def q_survivors(
    players: DataFrame,
    d_players: DataFrame,
    frags: DataFrame,
    replay_number: int,
    cross_replay: bool = True,
) -> DataFrame:
    """fs_survivors (queries.py:56-59). ``cross_replay=True`` preserves the
    reference's literal semantics: the NOT IN subquery scans frags of ALL
    replays (quirk §4.3.1); False is the corrected per-replay variant."""
    p = players.filter(F.col("replay_number") == replay_number)
    f = frags if cross_replay else frags.filter(
        F.col("replay_number") == replay_number
    )
    joined = broadcast_dim_join(p, d_players, "id_from_json", "id_from_json").select(
        p["id_from_json"].alias("id_from_json"), "nickname", "side"
    )
    victims = f.select(F.col("victim").alias("id_from_json"))
    return joined.join(victims, on="id_from_json", how="left_anti")


SIDE_LABELS = {
    1: ":red_square: EAST",
    2: ":blue_square: WEST",
    3: ":green_square: GUER",
    4: ":purple_square: CIV",
}


def q_survivors_group(
    players: DataFrame,
    d_players: DataFrame,
    frags: DataFrame,
    replay_number: int,
    cross_replay: bool = True,
) -> DataFrame:
    """fs_survivors_group (queries.py:62-74)."""
    surv = q_survivors(players, d_players, frags, replay_number, cross_replay)
    expr = None
    for side, text in SIDE_LABELS.items():
        expr = (
            F.when(F.col("side") == side, text)
            if expr is None
            else expr.when(F.col("side") == side, text)
        )
    return (
        surv.groupBy(expr.alias("side_label"))
        .agg(F.count("id_from_json").alias("cnt"))
        .orderBy(F.desc("cnt"), "side_label")
    )
