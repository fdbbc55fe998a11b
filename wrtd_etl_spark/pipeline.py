"""End-to-end replay pipeline (SURVEY.md §3 — all three entry points).

The reference's flow (main.py:259-268 and the 3-DAG chain):

    detect new replay → idempotency check → parse HTML+JSON → load 5
    tables (replay_main, vehicles, d_players upsert, players, frags) →
    compute 8 analytics queries → materialize one JSON document into the
    ``messages`` outbox → a consumer drains it and renders the message.

Here that collapses into one Spark job per replay batch over a parquet
warehouse directory. Connection-per-statement boundaries (functions.py:
56-70) become stage boundaries; the Airflow Variable cursor becomes
streaming.cursor; DAG branching becomes empty-DataFrame short-circuits.

Scale notes: facts are written partitioned by a replay-number bucket
(sinks.append_partitioned) so the per-replay analytics prune partitions;
the dimension upsert never shuffles the fact tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import sinks
from .operators.upsert import upsert_parquet
from .plans import replay_core as core
from .schemas import D_PLAYERS, FRAGS, MESSAGES, PLAYERS, REPLAY_MAIN, VEHICLES
from .sources.html_page import parse_replay_page
from .sources.json_ingest import (
    flatten_frags,
    flatten_players,
    flatten_vehicles,
    parse_replay_json,
)
from .streaming.cursor import dedup_against_processed
from .streaming.outbox import drain_outbox, make_outbox

_SCHEMAS = {
    "replay_main": REPLAY_MAIN,
    "vehicles": VEHICLES,
    "players": PLAYERS,
    "d_players": D_PLAYERS,
    "frags": FRAGS,
    "messages": MESSAGES,
}

_PARTITIONED = {"vehicles", "players", "frags"}  # facts, bucketed by replay


class ReplayWarehouse:
    """Parquet-backed warehouse with the reference's six-table schema."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def table(self, name: str) -> DataFrame:
        path = self._path(name)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], _SCHEMAS[name])
        if name in _PARTITIONED:
            return sinks.read_partitioned(self.spark, path)
        return self.spark.read.parquet(path)

    # --- load (K1-K3, T7) ---------------------------------------------------

    def existing_replays(self) -> DataFrame:
        return self.table("replay_main").select("replay_number")

    def load_replay(self, html_df: DataFrame, json_df: DataFrame) -> int:
        """Parse + load one batch of replays; idempotent per replay key.

        Mirrors load_data_to_db's fixed order (main.py:116-173):
        replay_main → vehicles → d_players upsert → players → frags.
        Already-loaded replays are skipped (is_exists, functions.py:79-86)
        via an anti-join instead of the reference's full-scan Python loop.
        """
        main_rows = parse_replay_page(html_df, "html", "replay_number")
        main_rows = dedup_against_processed(
            main_rows, self.existing_replays(), "replay_number"
        )
        fresh = main_rows.select("replay_number")
        n_new = fresh.count()
        if n_new == 0:
            return 0

        parsed = parse_replay_json(json_df, "body", "replay_number").join(
            F.broadcast(fresh), "replay_number"
        )
        players, dim_updates = flatten_players(parsed)

        # count_players_* come from the JSON factions, active/slots from the
        # HTML — two sources that can disagree, preserved (§4.3.5)
        from .sources.json_ingest import faction_counts

        fc = (
            faction_counts(parsed)
            .groupBy("replay_number")
            .pivot("faction_id", [1, 2, 3, 4])
            .agg(F.first("player_count"))
        )
        main_full = (
            main_rows.join(fc, "replay_number", "left")
            .withColumns(
                {
                    "count_players_east": F.coalesce(F.col("1"), F.lit(0)),
                    "count_players_west": F.coalesce(F.col("2"), F.lit(0)),
                    "count_players_guer": F.coalesce(F.col("3"), F.lit(0)),
                    "count_players_civ": F.coalesce(F.col("4"), F.lit(0)),
                    "replay_url": F.concat(
                        F.lit("https://stats.wogames.info/games/"),
                        F.col("replay_number").cast("string"),
                        F.lit("/"),
                    ),
                }
            )
            .drop("1", "2", "3", "4")
            .select([f.name for f in REPLAY_MAIN.fields])
        )

        sinks.append(main_full, self._path("replay_main"))
        sinks.append_partitioned(
            flatten_vehicles(parsed), self._path("vehicles"), "replay_number"
        )
        upsert_parquet(
            self.spark, self._path("d_players"), dim_updates, "id_from_json"
        )
        sinks.append_partitioned(players, self._path("players"), "replay_number")
        sinks.append_partitioned(
            flatten_frags(parsed), self._path("frags"), "replay_number"
        )
        return n_new

    # --- analytics + outbox (the data_message step) --------------------------

    def analytics(self, replay_number: int) -> dict[str, DataFrame]:
        """The eight queries over the warehouse (functions.py:243-264)."""
        frags, dp = self.table("frags"), self.table("d_players")
        players, vehicles = self.table("players"), self.table("vehicles")
        return {
            "vehicles": core.q_vehicles(vehicles, replay_number),
            "grouped_vehicles": core.q_vehicles_grouped(vehicles, replay_number),
            "cutlets": core.q_cutlets(frags, dp, replay_number, is_tk=False),
            "tks": core.q_cutlets(frags, dp, replay_number, is_tk=True),
            "fb": core.q_frag_detail(
                frags, dp, replay_number, [F.col("time").asc()]
            ),
            "lh": core.q_frag_detail(
                frags, dp, replay_number, [F.col("time").desc()]
            ),
            "ls": core.q_frag_detail(
                frags, dp, replay_number, [F.col("distance").desc_nulls_last()]
            ),
            "survivors": core.q_survivors(players, dp, frags, replay_number),
            "survivors_group": core.q_survivors_group(
                players, dp, frags, replay_number
            ),
        }

    def data_message(self, replay_number: int) -> None:
        """Materialize the analytics as one JSON outbox row (K4;
        functions.py:234-274: ROW_TO_JSON of the replay row + the eight
        result lists, json.dumps'd into messages.text_data)."""
        main_row = self.table("replay_main").filter(
            F.col("replay_number") == replay_number
        )
        doc = {"replay": main_row.select(F.to_json(F.struct("*"))).collect()[0][0]}
        for name, df in self.analytics(replay_number).items():
            doc[name] = [r.asDict(recursive=True) for r in df.collect()]

        import json

        outbox_row = self.spark.createDataFrame(
            [(replay_number, None, json.dumps(doc, ensure_ascii=False), None)],
            MESSAGES,
        )
        upsert_parquet(
            self.spark, self._path("messages"), outbox_row, "replay_number"
        )

    # --- consumer (entry point C) --------------------------------------------

    def drain_messages(self, send=None) -> None:
        """One bot tick: send unposted, flip flags (bot/botrun.py:295-309)."""
        outbox = self.table("messages")
        drained = drain_outbox(outbox, "replay_number", send=send)
        drained.write.mode("overwrite").parquet(self._path("messages") + ".tmp")
        import shutil

        shutil.rmtree(self._path("messages"))
        os.rename(self._path("messages") + ".tmp", self._path("messages"))


_SIDE_SQUARES = {
    "EAST": ":red_square: ",
    "WEST": ":blue_square: ",
    "GUER": ":green_square: ",
    "CIV": ":purple_square: ",
}


def _square(winner: str | None) -> str:
    """bot/botrun.py:173-184 — side-colored emoji prefix ('' if unknown)."""
    return _SIDE_SQUARES.get(winner, "")


def _kill_sentence(rows: list[dict]) -> str:
    """bot/botrun.py:112-129 (``sk``): one frag as a human sentence —
    victim, killer (if known), distance, weapon precedence gun > vehicle >
    unknown, optional teamkill suffix."""
    k = rows[0]
    # no leading space / period: the format below adds both uniformly
    weapon = "Орудие убийства неизвестно"
    if k.get("killer_vehicle"):
        weapon = f"Орудие убийства - {k['killer_vehicle']}"
    if k.get("gun"):
        weapon = f"Орудие убийства - {k['gun']}"
    tk = " Кажется, это был тимкилл." if k.get("is_tk") else ""
    if k.get("killer_nickname"):
        return (
            f"Жертвой стал **{k['victim_nickname']}**, погибший от выстрела "
            f"**{k['killer_nickname']}** с расстояния {k['distance']} м. "
            f"{weapon}.{tk}"
        )
    return f"Жертвой стал **{k['victim_nickname']}**. Убийца неизвестен."


def _tks_or_not(tks: list[dict]) -> str:
    """bot/botrun.py:105-109 — teamkiller list or the no-teamkills line."""
    if not tks:
        return "Удивительно, но тимкиллов не зафиксировано."
    return "\n".join(f"{r['nickname']} **{r['kills']}**" for r in tks)


def render_embeds(doc: dict) -> list[dict]:
    """The 4+1 Discord embeds as plain dicts (K6 presentation;
    bot/botrun.py:187-231): same titles, colors, field layout, zero-count
    side filtering, ``[:-3]`` time trims and kill sentences. discord.py is
    deliberately absent — a sender maps each dict 1:1 onto
    ``discord.Embed``/``add_field`` (keys: title/color/fields[name, value,
    inline] or description).
    """
    import json

    m = json.loads(doc["replay"]) if isinstance(doc["replay"], str) else doc["replay"]

    sides = []
    for side in ("east", "west", "guer", "civ"):
        if (m.get(f"count_players_{side}") or 0) > 0:
            sides.append(
                f"{_SIDE_SQUARES[side.upper()]}**{side.upper()}:** "
                f"{m[f'count_players_{side}']}, {m.get(f'commander_{side}')}"
            )
    survivors = "\n".join(
        f"**{r['side_label']}:** {r['cnt']}" for r in doc.get("survivors_group", [])
    )
    embeds = [
        {
            "title": ":chart_with_downwards_trend: Общая статистика:",
            "color": 2326507,
            "fields": [
                {
                    "name": "Информация",
                    "value": f"**Дата:** {m.get('date')}\n"
                    f"**Миссия:** {m.get('name_mission')}\n"
                    f"**Остров:** {m.get('island')}",
                    "inline": True,
                },
                {"name": "Стороны и командиры", "value": "\n".join(sides), "inline": True},
                {
                    "name": "Всего игроков",
                    "value": f"{m.get('count_players_active')}/{m.get('count_players_slots')}",
                    "inline": True,
                },
                {
                    "name": "Время",
                    "value": f"Начало {str(m.get('start_time'))[:-3]},\n"
                    f"конец {str(m.get('end_time'))[:-3]},\n"
                    f"длительность {m.get('duration')}",
                    "inline": True,
                },
                {
                    "name": "Итоги",
                    "value": f"Победитель:\n{_square(m.get('winner'))} **{m.get('winner')}**",
                    "inline": True,
                },
                {"name": "До конца миссии дожили", "value": survivors, "inline": True},
            ],
        },
        {
            "title": ":pencil: Личная статистика:",
            "color": 2326507,
            "fields": [
                {
                    "name": "Лучшие кибератлеты",
                    "value": "\n".join(
                        f"{r['nickname']} **{r['kills']}**"
                        for r in doc.get("cutlets", [])
                    ),
                    "inline": True,
                },
                {
                    "name": "Лучшие тимкиллеры",
                    "value": _tks_or_not(doc.get("tks", [])),
                    "inline": True,
                },
            ],
        },
        {
            "title": ":gun: Выдающиеся фраги:",
            "color": 2326507,
            "fields": [
                {
                    "name": name,
                    "value": f"Произошел в {rows[0]['time']}. {_kill_sentence(rows)}",
                    "inline": True,
                }
                for name, rows in (
                    ("Первый фраг", doc.get("fb")),
                    ("Последний фраг", doc.get("lh")),
                    ("Самый дальний фраг", doc.get("ls")),
                )
                if rows
            ],
        },
        {
            "title": ":truck: Доступная техника:",
            "color": 2326507,
            "fields": [
                {
                    "name": r["display_type"],
                    "value": "\n".join(
                        f"{item.rsplit(':', 1)[1]}x{item.rsplit(':', 1)[0]}"
                        for item in r["items"].split(",")
                        if item
                    ),
                    "inline": True,
                }
                for r in doc.get("grouped_vehicles", [])
            ],
        },
        {
            "description": "С полным реплеем и статистикой миссии можно "
            f"ознакомиться по ссылке: {m.get('replay_url')}/",
            "color": 0x0099FF,
        },
    ]
    return embeds


def render_message(doc: dict) -> str:
    """Presentation layer (F14): the Discord message text from the outbox
    JSON document (bot/botrun.py:131-170). Driver-side string formatting of
    an already-collected small dict — not a query concern."""
    import json

    replay = json.loads(doc["replay"]) if isinstance(doc["replay"], str) else doc["replay"]
    lines = [
        f"Реплей {replay.get('replay_number')} — {replay.get('name_mission')}",
        f"Остров: {replay.get('island')} | Победитель: {replay.get('winner')}",
        f"Старт: {str(replay.get('start_time'))[:5]} | Длительность: {replay.get('duration')}",
        "",
        "Котлеты:",
    ]
    for row in doc.get("cutlets", []):
        lines.append(f"  {row['rank']}. {row['nickname']} — {row['kills']}")
    lines.append("Выжившие:")
    for row in doc.get("survivors_group", []):
        lines.append(f"  {row['side_label']}: {row['cnt']}")
    return "\n".join(lines)
